import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.diffusion.continuous_time import (
    ContinuousTimeGaussianDiffusion,
    LearnedLogSNR,
    VParamContinuousTimeGaussianDiffusion,
    alpha_cosine_log_snr,
    beta_linear_log_snr,
)
from vqgan_tpu.diffusion.guided import (
    GuidedGaussianDiffusion,
    make_classifier_cond_fn,
)
from vqgan_tpu.diffusion.learned_variance import (
    LearnedVarianceGaussianDiffusion,
    discretized_gaussian_log_likelihood,
    normal_kl,
)
from vqgan_tpu.diffusion.repaint import RePaintDiffusion, build_repaint_schedule
from vqgan_tpu.diffusion.weighted_objective import (
    WeightedObjectiveGaussianDiffusion,
)


# ---------------------------------------------------------------- repaint

def test_repaint_schedule_structure():
    ops = build_repaint_schedule(10, resample=True, resample_iter=2,
                                 resample_jump=3, resample_every=5)
    # contains denoise ops for all t and renoise blocks at t=5 and t=1
    denoise_ts = ops[ops[:, 0] == 0][:, 1]
    assert set(range(10)).issubset(set(denoise_ts.tolist()))
    renoise = ops[ops[:, 0] == 1]
    assert len(renoise) == 2 * 2 * 3  # 2 trigger points × iters × jump
    ops_off = build_repaint_schedule(10, resample=False)
    assert (ops_off[:, 0] == 0).all() and len(ops_off) == 10


def test_repaint_inpaint_oracle_keeps_known_region():
    target = jnp.tile(
        jnp.linspace(0, 1, 8)[None, :, None, None], (1, 1, 8, 3))

    def model_apply(params, x, t, classes=None, **kw):
        return jnp.broadcast_to(target * 2 - 1, x.shape)  # pred_x0 oracle

    rp = RePaintDiffusion(
        model_apply, image_size=8, channels=3, timesteps=20,
        objective="pred_x0", resample=True, resample_iter=1,
        resample_jump=2, resample_every=10)
    gt = jnp.ones((1, 8, 8, 3)) * 0.75
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)  # top half known
    out = rp.inpaint({}, jax.random.PRNGKey(0), gt, mask)
    # known region == gt exactly (hard paste at t=0)
    np.testing.assert_allclose(np.asarray(out[:, :4]), 0.75, atol=1e-5)
    # unknown region converges to the oracle target
    np.testing.assert_allclose(
        np.asarray(out[:, 4:]), np.asarray(target[:, 4:]), atol=0.1)


# ----------------------------------------------------- learned variance

def test_normal_kl_zero_for_identical():
    m = jnp.array([0.3]); lv = jnp.array([-1.0])
    np.testing.assert_allclose(
        np.asarray(normal_kl(m, lv, m, lv)), 0.0, atol=1e-7)


def test_discretized_nll_peak_at_mean():
    x = jnp.array([0.0]);
    ll_at_mean = discretized_gaussian_log_likelihood(
        x, means=jnp.array([0.0]), log_scales=jnp.array([-4.0]))
    ll_off = discretized_gaussian_log_likelihood(
        x, means=jnp.array([0.5]), log_scales=jnp.array([-4.0]))
    assert float(ll_at_mean[0]) > float(ll_off[0])


def test_learned_variance_loss_and_sampling():
    def model_apply(params, x, t, classes=None, **kw):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)

    lv = LearnedVarianceGaussianDiffusion(
        model_apply, image_size=8, channels=3, timesteps=20,
        objective="pred_noise", auto_normalize=False)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3)) * 0.5
    t = jnp.array([3, 15])
    loss = lv.p_losses({}, jax.random.PRNGKey(1), imgs, t)
    assert jnp.isfinite(loss)
    out = lv.p_sample_loop({}, jax.random.PRNGKey(2), (1, 8, 8, 3))
    assert bool(jnp.isfinite(out).all())


# ----------------------------------------------------- continuous time

def test_log_snr_schedules_monotone_decreasing():
    t = jnp.linspace(0.0, 1.0, 50)
    for fn in (beta_linear_log_snr, alpha_cosine_log_snr):
        vals = np.asarray(fn(t))
        assert np.all(np.diff(vals) < 0)


def test_learned_log_snr_monotone_and_anchored():
    lo_max, lo_min = ContinuousTimeGaussianDiffusion.learned_endpoints()
    mod = LearnedLogSNR(log_snr_max=lo_max, log_snr_min=lo_min, hidden_dim=32)
    t = jnp.linspace(0.0, 1.0, 64)
    params = mod.init(jax.random.PRNGKey(0), t)
    out = np.asarray(mod.apply(params, t))
    np.testing.assert_allclose(out[0], lo_max, rtol=1e-4)
    np.testing.assert_allclose(out[-1], lo_min, rtol=1e-4)
    assert np.all(np.diff(out) <= 1e-5)  # monotone decreasing


def test_continuous_time_loss_and_sample():
    def model_apply(params, x, log_snr):
        return jnp.zeros_like(x)

    ct = ContinuousTimeGaussianDiffusion(
        model_apply, image_size=8, channels=3, noise_schedule="cosine",
        num_sample_steps=10)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    loss = ct.loss({}, jax.random.PRNGKey(2), imgs)
    assert jnp.isfinite(loss) and 0.5 < float(loss) < 1.5
    out = ct.sample({}, jax.random.PRNGKey(3), batch_size=1)
    assert out.shape == (1, 8, 8, 3)
    assert bool(jnp.isfinite(out).all())


def test_vparam_continuous_loss_and_sample():
    def model_apply(params, x, log_snr):
        return jnp.zeros_like(x)

    vp = VParamContinuousTimeGaussianDiffusion(
        model_apply, image_size=8, channels=3, num_sample_steps=10)
    imgs = jax.random.uniform(jax.random.PRNGKey(4), (2, 8, 8, 3))
    loss = vp.loss({}, jax.random.PRNGKey(5), imgs)
    assert jnp.isfinite(loss)
    out = vp.sample({}, jax.random.PRNGKey(6), batch_size=1)
    assert bool(jnp.isfinite(out).all())


# ----------------------------------------------------- weighted objective

def test_weighted_objective_loss_and_sample():
    c = 3

    def model_apply(params, x, t, classes=None, **kw):
        return jnp.zeros(x.shape[:-1] + (2 * c + 2,), x.dtype)

    wo = WeightedObjectiveGaussianDiffusion(
        model_apply, image_size=8, channels=c, timesteps=20,
        objective="pred_noise", auto_normalize=False)
    imgs = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, c)) * 0.3
    loss = wo.p_losses({}, jax.random.PRNGKey(8), imgs, jnp.array([3, 10]))
    assert jnp.isfinite(loss)
    out = wo.p_sample_loop({}, jax.random.PRNGKey(9), (1, 8, 8, c))
    assert bool(jnp.isfinite(out).all())


def test_weighted_objective_rejects_ddim():
    with pytest.raises(AssertionError):
        WeightedObjectiveGaussianDiffusion(
            lambda *a, **k: None, image_size=8, channels=3, timesteps=20,
            sampling_timesteps=5)


# ----------------------------------------------------- classifier guidance

def test_classifier_cond_fn_gradient_direction():
    # classifier: logit_y = mean(x) for class 1, -mean(x) for class 0 →
    # guidance toward class 1 should push pixels up
    def classifier_apply(x, t):
        m = jnp.mean(x, axis=(1, 2, 3))
        return jnp.stack([-m, m], axis=1)

    cond_fn = make_classifier_cond_fn(classifier_apply, scale=2.0)
    x = jnp.zeros((2, 4, 4, 1))
    t = jnp.zeros((2,), jnp.int32)
    g = cond_fn(x, t, y=jnp.array([1, 1]))
    assert float(g.min()) > 0  # pushes toward class 1
    g0 = cond_fn(x, t, y=jnp.array([0, 0]))
    assert float(g0.max()) < 0


def test_guided_sampler_shifts_output():
    def model_apply(params, x, t, classes=None, **kw):
        return jnp.zeros_like(x)  # predicts zero noise

    gd = GuidedGaussianDiffusion(
        model_apply, image_size=8, channels=1, timesteps=20,
        objective="pred_noise", auto_normalize=False)

    def classifier_apply(x, t):
        m = jnp.mean(x, axis=(1, 2, 3))
        return jnp.stack([-m, m], axis=1)

    cond_fn = make_classifier_cond_fn(classifier_apply, scale=20.0)
    y = jnp.array([1])
    out_guided = gd.p_sample_loop_guided(
        {}, jax.random.PRNGKey(0), (1, 8, 8, 1), cond_fn, {"y": y})
    out_plain = gd.p_sample_loop_guided(
        {}, jax.random.PRNGKey(0), (1, 8, 8, 1), None)
    # guidance toward class 1 (high mean) must raise the sample mean
    assert float(jnp.mean(out_guided)) > float(jnp.mean(out_plain))
    # ddim variant runs
    out_ddim = gd.ddim_sample_guided(
        {}, jax.random.PRNGKey(1), (1, 8, 8, 1), cond_fn, {"y": y})
    assert bool(jnp.isfinite(out_ddim).all())
