"""Ring (sequence-parallel) attention == single-device attention, exactly.

Oracle: ops.attention.sdpa_reference on the full sequence. The ring version
shards Q/K/V over an 8-way 'seq' mesh axis and must reproduce it (forward
and gradients) to fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vqgan_tpu.ops.attention import sdpa_reference
from vqgan_tpu.ops.ring_attention import attention_with_lse, ring_attention


def seq_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("seq",))


def rand_qkv(key, b=2, sq=64, skv=64, h=2, d=8):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (b, sq, h, d)),
            jax.random.normal(kk, (b, skv, h, d)),
            jax.random.normal(kv, (b, skv, h, d)))


def test_attention_with_lse_matches_reference():
    q, k, v = rand_qkv(jax.random.PRNGKey(0))
    out, lse = attention_with_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(sdpa_reference(q, k, v)),
                               rtol=1e-5, atol=1e-5)
    assert lse.shape == (2, 2, 64) and bool(jnp.isfinite(lse).all())


@pytest.mark.parametrize("sq,skv", [(64, 64), (64, 128), (128, 64)])
def test_ring_matches_full_attention(sq, skv):
    mesh = seq_mesh()
    q, k, v = rand_qkv(jax.random.PRNGKey(1), sq=sq, skv=skv)
    want = sdpa_reference(q, k, v)
    got = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ring_gradients_match():
    mesh = seq_mesh()
    q, k, v = rand_qkv(jax.random.PRNGKey(2))

    def ref_loss(q, k, v):
        return jnp.mean(sdpa_reference(q, k, v) ** 2)

    def ring_loss(q, k, v):
        return jnp.mean(ring_attention(q, k, v, mesh) ** 2)

    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    got = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)


def test_ring_single_shard_degenerates():
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("seq",))
    q, k, v = rand_qkv(jax.random.PRNGKey(3), sq=16, skv=16)
    got = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(sdpa_reference(q, k, v)),
                               rtol=1e-5, atol=1e-5)
