import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.ops.vq import (
    codebook_usage,
    ema_codebook_update,
    vq_lookup,
    vq_lookup_reference,
)


def _data(key, n=100, d=16, k=33):
    kz, ke = jax.random.split(key)
    z = jax.random.normal(kz, (n, d))
    codebook = jax.random.normal(ke, (k, d)) * 0.1
    return z, codebook


def test_reference_lookup_is_nearest():
    z, cb = _data(jax.random.PRNGKey(0))
    z_q, idx = vq_lookup_reference(z, cb)
    # brute force in numpy
    zn, cn = np.asarray(z), np.asarray(cb)
    d = ((zn[:, None, :] - cn[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))
    np.testing.assert_allclose(np.asarray(z_q), cn[d.argmin(1)], atol=1e-6)


@pytest.mark.parametrize("n,d,k", [(64, 16, 33), (1000, 256, 128), (257, 32, 512)])
def test_pallas_kernel_matches_reference(n, d, k):
    z, cb = _data(jax.random.PRNGKey(1), n, d, k)
    zq_ref, idx_ref = vq_lookup_reference(z, cb)
    zq, idx, usage = vq_lookup(z, cb, "fp32", True)  # exact kernel, interpret
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(zq), np.asarray(zq_ref), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(usage), np.asarray(codebook_usage(idx_ref, k))
    )


@pytest.mark.parametrize("n,d,k", [(256, 64, 128)])
def test_pallas_kernel_bf16_near_optimal(n, d, k):
    """The fast bf16-MXU kernel must pick codes whose TRUE fp32 distance is
    within bf16-rounding slack of the optimum (indices may differ from the
    fp32 argmin only on effective ties)."""
    z, cb = _data(jax.random.PRNGKey(2), n, d, k)
    _, idx = vq_lookup_reference(z, cb)
    _, idx_bf, _ = vq_lookup(z, cb, True, True)  # bf16 kernel, interpret

    zn, cn = np.asarray(z, np.float64), np.asarray(cb, np.float64)
    dist = ((zn[:, None, :] - cn[None, :, :]) ** 2).sum(-1)
    d_best = dist[np.arange(n), np.asarray(idx)]
    d_pick = dist[np.arange(n), np.asarray(idx_bf)]
    # slack ~ 2 * |2 z·e| * 2^-8 ; normalize by the distance scale
    slack = 0.04 * (np.abs(zn[:, None] @ cn[np.asarray(idx_bf)][..., None])
                    .squeeze() + 1.0)
    assert np.all(d_pick <= d_best + slack)
    assert np.mean(np.asarray(idx) == np.asarray(idx_bf)) > 0.95


def test_fused_usage_histogram_matches_scatter():
    """fuse_usage=True computes the histogram inside the kernel (tiled
    one-hot accumulation across grid programs, padded rows excluded) and
    must agree with the XLA scatter-add default."""
    from vqgan_tpu.ops.vq import _vq_forward_pallas

    z, cb = _data(jax.random.PRNGKey(5), n=257, d=32, k=100)
    _, idx, usage = _vq_forward_pallas(
        z, cb, block_n=128, block_k=64, interpret=True,
        mxu_bf16=False, fuse_usage=True)
    np.testing.assert_array_equal(
        np.asarray(usage), np.asarray(codebook_usage(idx, 100)))
    assert int(jnp.sum(usage)) == 257  # padded z rows not counted


def test_usage_histogram():
    idx = jnp.array([0, 0, 2, 5, 5, 5])
    usage = codebook_usage(idx, 8)
    np.testing.assert_array_equal(np.asarray(usage), [2, 0, 1, 0, 0, 3, 0, 0])


def test_gradient_flows_to_codebook_only():
    z, cb = _data(jax.random.PRNGKey(2), 50, 8, 16)

    def loss(z, cb):
        z_q, idx, _ = vq_lookup(z, cb, False, False)
        return jnp.sum(z_q**2)

    gz, gcb = jax.grad(loss, argnums=(0, 1))(z, cb)
    assert float(jnp.abs(gz).max()) == 0.0  # no grad to z through the gather
    # codebook grad = scatter-add of 2*z_q rows
    _, idx = vq_lookup_reference(z, cb)
    expected = np.zeros_like(np.asarray(cb))
    zq = np.asarray(cb)[np.asarray(idx)]
    np.testing.assert_allclose(
        np.asarray(gcb),
        np.add.at(expected, np.asarray(idx), 2 * zq) or expected,
        atol=1e-5,
    )


def test_vq_loss_gradient_semantics():
    # mirror the torch autograd graph: codebook_loss moves codebook,
    # commitment moves z, STE passes recon grads to z
    z, cb = _data(jax.random.PRNGKey(3), 30, 8, 16)
    beta = 0.25

    def loss(z, cb):
        z_q, _, _ = vq_lookup(z, cb, False, False)
        z32 = z.astype(jnp.float32)
        codebook_loss = jnp.mean((z_q - jax.lax.stop_gradient(z32)) ** 2)
        commitment = jnp.mean((jax.lax.stop_gradient(z_q) - z32) ** 2)
        return codebook_loss + beta * commitment

    gz, gcb = jax.grad(loss, argnums=(0, 1))(z, cb)
    zn = np.asarray(z)
    _, idx = vq_lookup_reference(z, cb)
    zq = np.asarray(cb)[np.asarray(idx)]
    n_total = zn.size
    # d commitment/dz = 2(z - z_q)/numel * beta
    np.testing.assert_allclose(
        np.asarray(gz), beta * 2 * (zn - zq) / n_total, atol=1e-6
    )
    # d codebook_loss/dcb = scatter-add of 2(z_q - z)/numel
    expected = np.zeros_like(np.asarray(cb))
    np.add.at(expected, np.asarray(idx), 2 * (zq - zn) / n_total)
    np.testing.assert_allclose(np.asarray(gcb), expected, atol=1e-6)


def test_ste_composition():
    z, cb = _data(jax.random.PRNGKey(4), 20, 8, 16)

    def recon_loss(z, cb):
        z_q, _, _ = vq_lookup(z, cb, False, False)
        z_q_ste = z + jax.lax.stop_gradient(z_q - z)
        return jnp.sum(z_q_ste * 3.0)

    gz = jax.grad(recon_loss)(z, cb)
    # straight-through: grad w.r.t z equals grad w.r.t z_q (here, 3)
    np.testing.assert_allclose(np.asarray(gz), 3.0, atol=1e-6)


def test_ema_update_moves_codebook_toward_data():
    k, d = 4, 2
    codebook = jnp.zeros((k, d))
    size = jnp.zeros((k,))
    csum = jnp.zeros((k, d))
    z = jnp.array([[1.0, 1.0]] * 10)
    idx = jnp.zeros((10,), jnp.int32)
    cb, size, csum = ema_codebook_update(codebook, size, csum, z, idx, decay=0.5)
    # code 0 should move toward (1,1); others stay near 0
    assert float(cb[0, 0]) > 0.5
    np.testing.assert_allclose(np.asarray(cb[1:]), 0.0, atol=1e-2)


def test_auto_dispatch_policy(monkeypatch):
    """Pin the measured shape policy (BASELINE.md VQ roofline table): kernel
    at K<=2048 and K>=16384 on TPU, XLA in the tied middle and always on the
    CPU test platform; env var overrides both ways."""
    from vqgan_tpu.ops.vq import auto_use_kernel

    monkeypatch.delenv("VQGAN_TPU_VQ_KERNEL", raising=False)
    # measured winners on TPU
    assert auto_use_kernel(1024, on_tpu=True)
    assert auto_use_kernel(2048, on_tpu=True)
    assert auto_use_kernel(16384, on_tpu=True)
    assert auto_use_kernel(32768, on_tpu=True)
    # statistical tie at the reference config -> XLA (compile-time cost)
    assert not auto_use_kernel(8192, on_tpu=True)
    assert not auto_use_kernel(4096, on_tpu=True)
    # Mosaic kernels cannot run on the CPU platform
    assert not auto_use_kernel(1024, on_tpu=False)
    # platform auto-detection: this suite runs on CPU
    assert not auto_use_kernel(1024)
    # env overrides win in both directions
    monkeypatch.setenv("VQGAN_TPU_VQ_KERNEL", "1")
    assert auto_use_kernel(8192, on_tpu=True)
    monkeypatch.setenv("VQGAN_TPU_VQ_KERNEL", "0")
    assert not auto_use_kernel(1024, on_tpu=True)


def test_auto_dispatch_runs_in_training_graph():
    """use_kernel="auto" must trace cleanly inside jit/grad on this (CPU)
    platform, resolving to the XLA path."""
    z, cb = _data(jax.random.PRNGKey(5), 16, 8, 1024)

    @jax.jit
    def loss(z, cb):
        z_q, _, _ = vq_lookup(z, cb, "auto", False)
        return jnp.mean((z_q - z) ** 2)

    g = jax.grad(loss, argnums=1)(z, cb)
    assert np.isfinite(np.asarray(g)).all()
