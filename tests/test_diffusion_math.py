import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.core import (
    ddim_step,
    make_schedule,
    predict_noise_from_start,
    predict_start_from_noise,
    predict_start_from_v,
    predict_v,
    q_posterior,
    q_sample,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule("cosine", 1000)


@pytest.fixture(scope="module")
def batch():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (4, 8, 8, 3))
    noise = jax.random.normal(k2, (4, 8, 8, 3))
    t = jax.random.randint(k3, (4,), 0, 1000)
    return x0, noise, t


def test_q_sample_noise_roundtrip(sched, batch):
    x0, noise, t = batch
    xt = q_sample(sched, x0, t, noise)
    x0_rec = predict_start_from_noise(sched, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=2e-3)


def test_noise_from_start_inverse(sched, batch):
    x0, noise, t = batch
    xt = q_sample(sched, x0, t, noise)
    n_rec = predict_noise_from_start(sched, xt, t, x0)
    np.testing.assert_allclose(np.asarray(n_rec), np.asarray(noise), atol=2e-2)


def test_v_parameterization_roundtrip(sched, batch):
    x0, noise, t = batch
    xt = q_sample(sched, x0, t, noise)
    v = predict_v(sched, x0, t, noise)
    x0_rec = predict_start_from_v(sched, xt, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=2e-3)


def test_q_sample_fp32_under_bf16(sched, batch):
    # q_sample must compute in fp32 even for bf16 inputs (reference forces
    # this under autocast) — result should match the fp32 computation after
    # casting back.
    x0, noise, t = batch
    xt32 = q_sample(sched, x0, t, noise)
    xt16 = q_sample(sched, x0.astype(jnp.bfloat16), t, noise.astype(jnp.bfloat16))
    assert xt16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(xt16, np.float32), np.asarray(xt32), atol=0.05
    )


def test_posterior_zero_noise_mean(sched):
    # x_t built from x0 with zero noise => posterior mean = sqrt(ac_prev) x0
    x0 = jnp.ones((2, 4, 4, 1))
    t = jnp.array([100, 500])
    xt = q_sample(sched, x0, t, jnp.zeros_like(x0))
    mean, var, logvar = q_posterior(sched, x0, xt, t)
    expected = np.sqrt(np.asarray(sched.alphas_cumprod_prev)[np.asarray(t)])
    np.testing.assert_allclose(
        np.asarray(mean)[:, 0, 0, 0], expected, rtol=1e-4
    )
    assert var.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(jnp.exp(logvar)), np.asarray(var), rtol=1e-4)


def test_ddim_step_final(sched):
    # time_next < 0 returns x_start exactly
    img = jnp.ones((2, 4, 4, 1)) * 3.0
    x_start = jnp.ones((2, 4, 4, 1)) * 0.5
    noise = jnp.ones((2, 4, 4, 1))
    out = ddim_step(
        sched, img, x_start, noise, jnp.array(0), jnp.array(-1), noise, eta=1.0
    )
    np.testing.assert_allclose(np.asarray(out), 0.5)


def test_ddim_step_eta0_deterministic_consistency(sched, batch):
    # with eta=0 and a perfect model (true x0/noise), one giant DDIM jump from
    # t to t' reproduces q_sample(x0, t') with the same noise
    x0, noise, _ = batch
    t = jnp.full((4,), 800)
    t_next = jnp.array(100)
    xt = q_sample(sched, x0, t, noise)
    out = ddim_step(sched, xt, x0, noise, jnp.array(800), t_next, jnp.zeros_like(x0), eta=0.0)
    expected = q_sample(sched, x0, jnp.full((4,), 100), noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-3)
