import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vqgan_tpu.core import (
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
    sigmoid_beta_schedule,
)


def test_linear_schedule_endpoints():
    betas = linear_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert betas.dtype == np.float64
    np.testing.assert_allclose(betas[0], 1e-4)
    np.testing.assert_allclose(betas[-1], 0.02)
    # linear in t
    np.testing.assert_allclose(np.diff(betas), np.diff(betas)[0])


def test_linear_schedule_rescales_with_T():
    # the schedule keeps total noise roughly invariant with T via 1000/T scale
    betas = linear_beta_schedule(500)
    np.testing.assert_allclose(betas[0], 2e-4)
    np.testing.assert_allclose(betas[-1], 0.04)


def test_cosine_schedule_properties():
    betas = cosine_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert np.all(betas > 0)
    assert np.all(betas <= 0.999)
    ac = np.cumprod(1 - betas)
    assert np.all(np.diff(ac) < 0)  # strictly decreasing
    # closed-form check: alphas_cumprod[t] == f(t+1)/f(0) while beta < clip,
    # with f(u) = cos^2(((u/T + s)/(1+s)) * pi/2)
    s, T = 0.008, 1000
    f = lambda u: np.cos(((u / T) + s) / (1 + s) * np.pi / 2) ** 2
    t = np.arange(1, 900)  # avoid the clipped tail
    np.testing.assert_allclose(ac[t - 1], f(t) / f(0), rtol=1e-10)


def test_sigmoid_schedule_valid():
    betas = sigmoid_beta_schedule(1000)
    assert np.all(betas > 0) and np.all(betas <= 0.999)
    assert np.all(np.diff(np.cumprod(1 - betas)) < 0)


@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0", "pred_v"])
def test_loss_weights(objective):
    sched = make_schedule("cosine", 100, objective=objective)
    snr = np.asarray(sched.snr, dtype=np.float64)
    lw = np.asarray(sched.loss_weight, dtype=np.float64)
    if objective == "pred_noise":
        np.testing.assert_allclose(lw, 1.0, rtol=1e-5)
    elif objective == "pred_x0":
        np.testing.assert_allclose(lw, snr, rtol=1e-5)
    else:
        np.testing.assert_allclose(lw, snr / (snr + 1), rtol=1e-5)


def test_min_snr_clipping():
    sched = make_schedule(
        "cosine", 100, objective="pred_v", min_snr_loss_weight=True, min_snr_gamma=5.0
    )
    snr = np.asarray(sched.snr, dtype=np.float64)
    expected = np.minimum(snr, 5.0) / (snr + 1)
    np.testing.assert_allclose(
        np.asarray(sched.loss_weight, np.float64), expected, rtol=1e-5
    )


def test_posterior_identities():
    sched = make_schedule("cosine", 200)
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    ac_prev = np.asarray(sched.alphas_cumprod_prev, np.float64)
    betas = np.asarray(sched.betas, np.float64)
    c1 = np.asarray(sched.posterior_mean_coef1, np.float64)
    c2 = np.asarray(sched.posterior_mean_coef2, np.float64)
    # with x_t = sqrt(ac_t) * x0 (no noise), posterior mean must be
    # sqrt(ac_prev) * x0  =>  c1 + c2 * sqrt(ac) == sqrt(ac_prev)
    np.testing.assert_allclose(c1 + c2 * np.sqrt(ac), np.sqrt(ac_prev), rtol=1e-4)
    # posterior variance formula
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance, np.float64),
        betas * (1 - ac_prev) / (1 - ac),
        rtol=1e-4,
    )


def test_schedule_is_jittable_pytree():
    sched = make_schedule("cosine", 50)

    @jax.jit
    def f(s, t):
        return s.sqrt_alphas_cumprod[t]

    out = f(sched, jnp.array([0, 10, 49]))
    assert out.shape == (3,)
    leaves = jax.tree_util.tree_leaves(sched)
    assert all(l.dtype == jnp.float32 for l in leaves)
