import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.models.karras_unet import (
    KarrasUnet,
    MPConv,
    inv_sqrt_decay_schedule,
    mp_add,
    mp_cat,
    mp_silu,
    normalize_karras_params,
    normalize_weight,
    pixel_norm,
)


def test_mp_ops_preserve_magnitude():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (10_000,))
    b = jax.random.normal(jax.random.PRNGKey(1), (10_000,))
    # mp_add of two unit-variance signals stays unit variance
    assert abs(float(jnp.std(mp_add(a, b, 0.3))) - 1.0) < 0.05
    # mp_cat too
    assert abs(float(jnp.std(mp_cat(a[None], b[None], 0.5))) - 1.0) < 0.05
    # mp_silu: silu(x)/0.596 has ~unit second moment for unit gaussian input
    assert abs(float(jnp.sqrt(jnp.mean(mp_silu(a) ** 2))) - 1.0) < 0.05
    # pixel_norm gives exactly sqrt(C) norms
    x = jax.random.normal(key, (4, 8, 8, 16))
    n = jnp.linalg.norm(pixel_norm(x), axis=-1)
    np.testing.assert_allclose(np.asarray(n), np.sqrt(16), rtol=1e-4)


def test_normalize_weight_filterwise():
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 16)) * 5.0
    wn = normalize_weight(w)
    # each output filter has norm sqrt(fan_in)
    flat = np.asarray(wn.reshape(-1, 16))
    np.testing.assert_allclose(
        np.linalg.norm(flat, axis=0), np.sqrt(flat.shape[0]), rtol=1e-4)
    # idempotent
    np.testing.assert_allclose(
        np.asarray(normalize_weight(wn)), np.asarray(wn), atol=1e-5)


def test_mpconv_output_magnitude():
    # MPConv of unit-gaussian input stays ~unit variance regardless of the
    # raw weight scale (that's the point of forced normalization)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 32))
    conv = MPConv(features=32, kernel_size=3)
    params = conv.init(jax.random.PRNGKey(4), x)
    big = jax.tree.map(lambda w: w * 100.0, params)
    out = conv.apply(big, x)
    assert 0.7 < float(jnp.std(out)) < 1.4


def test_normalize_karras_params_targets_mp_kernels_only():
    params = {
        "params": {
            "a": {"mp_kernel": jnp.ones((3, 3, 4, 8)) * 7},
            "b": {"kernel": jnp.ones((4, 8)) * 7},
        }
    }
    out = normalize_karras_params(params)
    flat = np.asarray(out["params"]["a"]["mp_kernel"]).reshape(-1, 8)
    np.testing.assert_allclose(
        np.linalg.norm(flat, axis=0), np.sqrt(36), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["params"]["b"]["kernel"]), 7.0)


@pytest.fixture(scope="module")
def tiny_karras():
    model = KarrasUnet(
        image_size=16, dim=16, dim_max=32, num_classes=5, channels=3,
        num_downsamples=1, num_blocks_per_stage=1, attn_res=(8,),
        attn_dim_head=8, dropout=0.0)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,))
    c = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, class_labels=c)
    return model, params


def test_karras_unet_shapes(tiny_karras):
    model, params = tiny_karras
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.array([0.1, 0.7])
    c = jnp.array([0, 4])
    out = model.apply(params, x, t, class_labels=c)
    assert out.shape == (2, 16, 16, 3)
    assert bool(jnp.isfinite(out).all())


def test_karras_unet_output_initially_zero(tiny_karras):
    # output Gain initializes at 0 → the net starts as the zero function
    model, params = tiny_karras
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
    out = model.apply(params, x, jnp.array([0.5]),
                      class_labels=jnp.array([1]))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_karras_unet_class_conditioning_matters(tiny_karras):
    model, params = tiny_karras
    # perturb the output gain so outputs are nonzero
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.1 if "gain" in str(p[-1]) else v, params)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 3))
    t = jnp.array([0.5])
    o1 = model.apply(params, x, t, class_labels=jnp.array([0]))
    o2 = model.apply(params, x, t, class_labels=jnp.array([3]))
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


def test_karras_unet_trains_with_edm(tiny_karras):
    from vqgan_tpu.diffusion import ElucidatedDiffusion

    model, params = tiny_karras

    def net_apply(p, x, t_noise, self_cond=None):
        return model.apply(p, x, t_noise,
                           class_labels=jnp.zeros((x.shape[0],), jnp.int32))

    ed = ElucidatedDiffusion(net_apply, image_size=16, channels=3,
                             num_sample_steps=4)
    imgs = jax.random.uniform(jax.random.PRNGKey(4), (2, 16, 16, 3))
    loss, grads = jax.value_and_grad(
        lambda p: ed.loss(p, jax.random.PRNGKey(5), imgs))(params)
    assert jnp.isfinite(loss)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0
    # post-step renormalization keeps kernels on the sphere
    stepped = jax.tree.map(lambda p, g: p - 0.1 * g, params, grads)
    renormed = normalize_karras_params(stepped)
    k = renormed["params"]["input_block"]["mp_kernel"]
    flat = np.asarray(k).reshape(-1, k.shape[-1])
    np.testing.assert_allclose(
        np.linalg.norm(flat, axis=0), np.sqrt(flat.shape[0]), rtol=1e-3)
    # EDM sampling end-to-end
    out = ed.sample(renormed, jax.random.PRNGKey(6), batch_size=1)
    assert bool(jnp.isfinite(out).all())


def test_inv_sqrt_decay_schedule():
    fn = inv_sqrt_decay_schedule(1.0, t_ref=100, sigma_ref=0.01)
    np.testing.assert_allclose(float(fn(0)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(fn(100)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(fn(400)), 0.005, rtol=1e-6)


def test_normalize_forward_false_exact_on_normalized_params(tiny_karras):
    # inference mode: on params maintained by normalize_karras_params the
    # per-forward re-normalization is the identity, so skipping it
    # (normalize_forward=False) must give the same output — it only removes
    # the re-normalization work the sampler scan repeats every iteration
    model, params = tiny_karras
    from vqgan_tpu.models.karras_unet import normalize_karras_params

    inference = model.clone(normalize_forward=False)
    # the output Gain is zero-init (output identically 0), so open it up
    params = jax.tree_util.tree_map(jnp.asarray, params)
    params["params"]["output_gain"]["gain"] = jnp.asarray(1.0)
    normed = normalize_karras_params(params)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 3))
    t = jnp.array([0.3, 0.9])
    c = jnp.array([1, 2])
    ref = model.apply(normed, x, t, class_labels=c)
    fast = inference.apply(normed, x, t, class_labels=c)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # on NON-normalized params the two must differ (guards against the flag
    # silently not reaching the MP kernels)
    ref_raw = model.apply(params, x, t, class_labels=c)
    fast_raw = inference.apply(params, x, t, class_labels=c)
    assert float(jnp.abs(ref_raw - fast_raw).max()) > 1e-6
