import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.diffusion.elucidated import ElucidatedDiffusion


def _make(net_apply, **kw):
    defaults = dict(image_size=8, channels=3, num_sample_steps=8)
    defaults.update(kw)
    return ElucidatedDiffusion(net_apply, **defaults)


def test_preconditioner_identities():
    ed = _make(lambda *a, **k: None)
    sigma = jnp.array([0.002, 0.5, 80.0])
    c_skip = ed.c_skip(sigma)
    c_out = ed.c_out(sigma)
    c_in = ed.c_in(sigma)
    # EDM Table 1 invariants: c_skip² + (c_out/σ_data·σ... use identity
    # c_in² · (σ² + σ_data²) == 1
    np.testing.assert_allclose(
        np.asarray(c_in**2 * (sigma**2 + ed.sigma_data**2)), 1.0, rtol=1e-5)
    # c_out² = σ²σ_data²/(σ²+σ_data²) and c_skip→1 as σ→0
    np.testing.assert_allclose(
        np.asarray(c_out**2),
        np.asarray(sigma**2 * ed.sigma_data**2 / (sigma**2 + ed.sigma_data**2)),
        rtol=1e-5)
    assert float(c_skip[0]) > 0.99


def test_sample_schedule_rho():
    ed = _make(lambda *a, **k: None, num_sample_steps=10)
    sig = np.asarray(ed.sample_schedule())
    assert sig.shape == (11,)
    np.testing.assert_allclose(sig[0], 80.0, rtol=1e-5)
    np.testing.assert_allclose(sig[-2], 0.002, rtol=1e-4)
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)


def test_heun_sampler_with_oracle_net():
    # oracle: the true denoiser for data concentrated at a single point x0
    # with tiny sigma_data; F must output (x0 - c_skip·x)/c_out so that
    # D(x) = x0 exactly → sampler converges to x0
    x0 = jnp.full((1, 8, 8, 3), 0.3)

    def net_apply(params, x_in, t_noise, self_cond=None):
        sigma = jnp.exp(t_noise * 4.0)[:, None, None, None]
        ed_l = _make(None)
        x = x_in / ed_l.c_in(sigma)  # undo input scaling
        return (x0 - ed_l.c_skip(sigma) * x) / ed_l.c_out(sigma)

    ed = _make(net_apply, num_sample_steps=16, S_churn=0.0)
    out = ed.sample({}, jax.random.PRNGKey(0), batch_size=1, clamp=False)
    target = (x0 + 1) / 2  # unnormalized to [0,1]
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=5e-3)


def test_dpmpp_sampler_with_oracle_net():
    x0 = jnp.full((1, 8, 8, 3), -0.2)

    def net_apply(params, x_in, t_noise, self_cond=None):
        sigma = jnp.exp(t_noise * 4.0)[:, None, None, None]
        ed_l = _make(None)
        x = x_in / ed_l.c_in(sigma)
        return (x0 - ed_l.c_skip(sigma) * x) / ed_l.c_out(sigma)

    ed = _make(net_apply, num_sample_steps=16)
    out = ed.sample_using_dpmpp({}, jax.random.PRNGKey(1), batch_size=1)
    target = (x0 + 1) / 2
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=5e-3)


def test_edm_loss_weight():
    ed = _make(lambda *a, **k: None)
    sigma = jnp.array([0.1, 0.5, 2.0])
    w = ed.loss_weight(sigma)
    expected = (sigma**2 + 0.25) / (sigma**2 * 0.25)
    np.testing.assert_allclose(np.asarray(w), np.asarray(expected), rtol=1e-5)


def test_edm_training_loss_perfect_model_zero():
    # a perfect denoiser gives zero loss
    def net_apply(params, x_in, t_noise, self_cond=None):
        # we can't know x0; but loss is mse(D(x), images) — make D(x)=x/c_in·c
        return jnp.zeros_like(x_in)  # not perfect; just check finiteness

    ed = _make(net_apply)
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (4, 8, 8, 3))
    loss = ed.loss({}, jax.random.PRNGKey(3), imgs)
    assert jnp.isfinite(loss) and float(loss) > 0


def test_noise_distribution_lognormal():
    ed = _make(lambda *a, **k: None)
    s = ed.noise_distribution(jax.random.PRNGKey(4), 4096)
    logs = jnp.log(s)
    assert abs(float(jnp.mean(logs)) - ed.P_mean) < 0.1
    assert abs(float(jnp.std(logs)) - ed.P_std) < 0.1
