import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.ops.attention import flash_attention, sdpa, sdpa_reference


def _rand_qkv(key, b, s, h, d, dtype=jnp.float32, s_kv=None):
    kq, kk, kv = jax.random.split(key, 3)
    s_kv = s_kv or s
    q = jax.random.normal(kq, (b, s, h, d), dtype)
    k = jax.random.normal(kk, (b, s_kv, h, d), dtype)
    v = jax.random.normal(kv, (b, s_kv, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "b,s,h,d",
    [(2, 256, 4, 32), (1, 1024, 8, 64), (2, 100, 1, 512), (1, 7, 2, 16)],
)
def test_flash_matches_reference_fwd(b, s, h, d):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), b, s, h, d)
    ref = sdpa_reference(q, k, v)
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_kv=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_cross_attention_shapes():
    # kv sequence length != q sequence length (cross attention)
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 2, 64, 4, 32, s_kv=17)
    ref = sdpa_reference(q, k, v)
    out = flash_attention(q, k, v, interpret=True, block_q=64, block_kv=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_gradients_match_reference():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 64, 2, 32)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, interpret=True, block_q=64, block_kv=64)
            ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_reference(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4
        )


def test_flash_bf16_close():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 2, 128, 4, 64, jnp.bfloat16)
    ref = sdpa_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_kv=128)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.04
    )


def test_flash_extreme_logits_stable():
    # large magnitudes must not overflow the online softmax
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 1, 64, 1, 32)
    q = q * 100.0
    out = flash_attention(q, k, v, interpret=True, block_q=64, block_kv=64)
    assert bool(jnp.isfinite(out).all())
    ref = sdpa_reference(q, k, v)
    # logits ~100x larger than normal amplify fp32 rounding; tolerance scaled
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sdpa_dispatch_cpu_uses_reference():
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), 1, 32, 2, 16)
    out = sdpa(q, k, v)  # auto → reference on CPU
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
