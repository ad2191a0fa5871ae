import jax
import jax.numpy as jnp
import numpy as np

from vqgan_tpu.core import apply_cfg, project


def test_project_decomposition():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (3, 4, 4, 2))
    y = jax.random.normal(k2, (3, 4, 4, 2))
    parallel, orthog = project(x, y)
    # reconstruction
    np.testing.assert_allclose(
        np.asarray(parallel + orthog), np.asarray(x), atol=1e-5
    )
    # orthogonality per batch element
    dots = jnp.sum(orthog.reshape(3, -1) * y.reshape(3, -1), axis=-1)
    np.testing.assert_allclose(np.asarray(dots), 0.0, atol=1e-3)
    # parallel is a scalar multiple of y per batch element
    pf = np.asarray(parallel.reshape(3, -1))
    yf = np.asarray(y.reshape(3, -1))
    for i in range(3):
        cross = np.outer(pf[i], yf[i]) - np.outer(yf[i], pf[i])
        assert np.abs(cross).max() < 1e-3


def test_cfg_scale_one_identity():
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (2, 8, 8, 4))
    null = jax.random.normal(k2, (2, 8, 8, 4))
    out = apply_cfg(logits, null, cond_scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits), atol=1e-5)


def test_cfg_no_projection_matches_classic_formula():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (2, 8, 8, 4))
    null = jax.random.normal(k2, (2, 8, 8, 4))
    out = apply_cfg(
        logits, null, cond_scale=3.0, remove_parallel_component=False
    )
    expected = logits + (logits - null) * 2.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_cfg_rescaled_phi_full_restores_std():
    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (2, 8, 8, 4))
    null = jax.random.normal(k2, (2, 8, 8, 4))
    out = apply_cfg(logits, null, cond_scale=6.0, rescaled_phi=1.0)
    std_out = np.asarray(jnp.std(out.reshape(2, -1), axis=-1, ddof=1))
    std_logits = np.asarray(jnp.std(logits.reshape(2, -1), axis=-1, ddof=1))
    np.testing.assert_allclose(std_out, std_logits, rtol=1e-4)


def test_cfg_keep_parallel_frac():
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (2, 16))
    null = jax.random.normal(k2, (2, 16))
    # keep_parallel_frac=1 should reduce to the classic formula
    out_keep = apply_cfg(
        logits, null, cond_scale=4.0, keep_parallel_frac=1.0
    )
    expected = logits + (logits - null) * 3.0
    np.testing.assert_allclose(np.asarray(out_keep), np.asarray(expected), atol=1e-4)
