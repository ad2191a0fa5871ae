import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.diffusion import GaussianDiffusion
from vqgan_tpu.models import CFGUnet, VQVAE
from vqgan_tpu.models.discriminator import PatchGANDiscriminator
from vqgan_tpu.training import (
    LDMTrainState,
    VQGANTrainState,
    make_gan_optimizers,
    make_ldm_optimizer,
    make_ldm_train_step,
    make_vqgan_split_steps,
    make_vqgan_train_step,
)


@pytest.fixture(scope="module")
def vqgan_setup():
    vqvae = VQVAE(ch=16, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
                  z_channels=16, num_embeddings=8, embedding_dim=16)
    disc = PatchGANDiscriminator(ndf=8, n_layers=2, norm="batch")
    x = jnp.zeros((2, 32, 32, 3))
    vq_params = vqvae.init(jax.random.PRNGKey(0), x)
    disc_vars = disc.init(jax.random.PRNGKey(1), x)
    disc_params = {"params": disc_vars["params"]}
    disc_stats = {"batch_stats": disc_vars["batch_stats"]}

    def vqvae_apply(params, images):
        return vqvae.apply(params, images)

    def disc_apply(params, stats, images, train):
        if train:
            logits, updates = disc.apply(
                {**params, **stats}, images, train=True,
                mutable=["batch_stats"])
            return logits, {"batch_stats": updates["batch_stats"]}
        logits = disc.apply({**params, **stats}, images, train=False)
        return logits, stats

    return vqvae_apply, disc_apply, vq_params, disc_params, disc_stats


def _make_state(vq_params, disc_params, disc_stats, opt_g, opt_d, step=0):
    return VQGANTrainState(
        step=jnp.asarray(step),
        vqvae_params=vq_params,
        disc_params=disc_params,
        disc_stats=disc_stats,
        opt_g=opt_g.init(vq_params),
        opt_d=opt_d.init(disc_params),
    )


def test_vqgan_step_pre_disc_start(vqgan_setup):
    vqvae_apply, disc_apply, vq_params, disc_params, disc_stats = vqgan_setup
    opt_g, opt_d = make_gan_optimizers()
    step_fn = make_vqgan_train_step(
        vqvae_apply, disc_apply, opt_g, opt_d, disc_start=5, donate=False)
    state = _make_state(vq_params, disc_params, disc_stats, opt_g, opt_d)
    images = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))

    new_state, log = step_fn(state, images)
    assert int(new_state.step) == 1
    assert jnp.isfinite(log["loss_total"])
    # generator moved
    diff_g = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.vqvae_params, new_state.vqvae_params)
    assert max(jax.tree.leaves(diff_g)) > 0
    # discriminator frozen before disc_start
    diff_d = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.disc_params, new_state.disc_params)
    assert max(jax.tree.leaves(diff_d)) == 0.0


def test_vqgan_step_post_disc_start(vqgan_setup):
    vqvae_apply, disc_apply, vq_params, disc_params, disc_stats = vqgan_setup
    opt_g, opt_d = make_gan_optimizers()
    step_fn = make_vqgan_train_step(
        vqvae_apply, disc_apply, opt_g, opt_d, disc_start=5, donate=False)
    state = _make_state(vq_params, disc_params, disc_stats, opt_g, opt_d,
                        step=10)
    images = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3))

    new_state, log = step_fn(state, images)
    diff_d = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.disc_params, new_state.disc_params)
    assert max(jax.tree.leaves(diff_d)) > 0  # D now trains
    assert jnp.isfinite(log["d_loss"])
    assert "d_acc" in log and "g_loss" in log


def test_vqgan_split_matches_fused(vqgan_setup):
    """The production split G/D programs are numerically identical to the
    fused single-program step, across the disc_start boundary (the split
    path skips the D dispatch entirely before disc_start)."""
    vqvae_apply, disc_apply, vq_params, disc_params, disc_stats = vqgan_setup
    opt_g, opt_d = make_gan_optimizers()
    kwargs = dict(disc_start=2, donate=False)
    fused = make_vqgan_train_step(
        vqvae_apply, disc_apply, opt_g, opt_d, **kwargs)
    g_step, d_step = make_vqgan_split_steps(
        vqvae_apply, disc_apply, opt_g, opt_d, **kwargs)

    s_f = _make_state(vq_params, disc_params, disc_stats, opt_g, opt_d)
    s_s = _make_state(vq_params, disc_params, disc_stats, opt_g, opt_d)
    images = jax.random.uniform(jax.random.PRNGKey(5), (2, 32, 32, 3))

    for step in range(4):  # steps 0,1 pre-disc; 2,3 post-disc
        s_f, log_f = fused(s_f, images)
        s_s, recon, log_s = g_step(s_s, images)
        if step >= 2:
            s_s, d_log = d_step(s_s, images, recon)
            log_s = {**log_s, **d_log}
        for k in ("loss_total", "nll_loss"):
            np.testing.assert_allclose(
                float(log_s[k]), float(log_f[k]), rtol=1e-6)

    for name in ("vqvae_params", "disc_params", "opt_g", "opt_d"):
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(jnp.asarray(a, jnp.float32)
                                       - jnp.asarray(b, jnp.float32)).max()),
            getattr(s_f, name), getattr(s_s, name))
        leaves = [d for d in jax.tree.leaves(diffs)]
        assert max(leaves, default=0.0) == 0.0, (name, diffs)
    assert int(s_f.step) == int(s_s.step) == 4


def test_vqgan_loss_decreases(vqgan_setup):
    vqvae_apply, disc_apply, vq_params, disc_params, disc_stats = vqgan_setup
    opt_g, opt_d = make_gan_optimizers(learning_rate=1e-3)
    step_fn = make_vqgan_train_step(
        vqvae_apply, disc_apply, opt_g, opt_d, disc_start=10_000, donate=False)
    state = _make_state(vq_params, disc_params, disc_stats, opt_g, opt_d)
    images = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 3))

    losses = []
    for _ in range(8):
        state, log = step_fn(state, images)
        losses.append(float(log["nll_loss"]))
    assert losses[-1] < losses[0]


@pytest.fixture(scope="module")
def ldm_setup():
    model = CFGUnet(dim=16, num_classes=4, dim_mults=(1, 2), channels=4,
                    attn_heads=2, attn_dim_head=8)
    x = jnp.zeros((2, 8, 8, 4))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x, jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32),
        cond_drop_mask=jnp.zeros((2,), bool))

    def model_apply(p, x, t, classes, cond_drop_mask=None,
                    cond_drop_prob=None, rng=None, return_features=False):
        rngs = {"cond_drop": rng} if rng is not None else None
        return model.apply(p, x, t, classes, cond_drop_mask=cond_drop_mask,
                           cond_drop_prob=cond_drop_prob, rngs=rngs,
                           return_features=return_features)

    diffusion = GaussianDiffusion(
        model_apply, image_size=8, channels=4, timesteps=50,
        sampling_timesteps=5, objective="pred_v", min_snr_loss_weight=True,
        auto_normalize=False)
    return diffusion, params


def test_ldm_step_runs_and_updates_ema(ldm_setup):
    diffusion, params = ldm_setup
    tx = make_ldm_optimizer(learning_rate=1e-3, warmup_steps=10)
    step_fn = make_ldm_train_step(
        diffusion, tx, cond_drop_prob=0.5, ema_decay=0.9, ema_update_every=1,
        ema_update_after_step=0, donate=False)
    state = LDMTrainState(
        step=jnp.asarray(0), params=params, opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params))
    latents = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    classes = jnp.array([0, 1, 2, 3])

    for i in range(3):
        state, log = step_fn(state, latents, classes, jax.random.PRNGKey(7))
        assert jnp.isfinite(log["loss"])
        assert jnp.isfinite(log["grad_norm"])
    assert int(state.step) == 3
    # EMA moved away from init copy toward online params
    dist = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.ema_params, params)
    assert max(jax.tree.leaves(dist)) > 0


def test_ldm_step_contrastive_branch(ldm_setup):
    diffusion, params = ldm_setup
    tx = make_ldm_optimizer(learning_rate=1e-4)
    step_fn = make_ldm_train_step(
        diffusion, tx, cond_drop_prob=0.0, contrastive_weight=0.1,
        contrastive_start_step=1, donate=False)
    state = LDMTrainState(
        step=jnp.asarray(0), params=params, opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params))
    latents = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 4))
    classes = jnp.array([0, 0, 1, 1])
    state, log = step_fn(state, latents, classes, jax.random.PRNGKey(8))
    assert "contrastive_loss" in log
    assert jnp.isfinite(log["contrastive_loss"])


def test_ldm_warmup_schedule():
    tx = make_ldm_optimizer(learning_rate=1.0, warmup_steps=10,
                            weight_decay=0.0, max_grad_norm=None)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((4,))}
    # first update uses lr≈0 → tiny step; later updates grow
    u1, opt_state = tx.update(grads, opt_state, params)
    step1 = float(jnp.abs(u1["w"]).max())
    for _ in range(10):
        u, opt_state = tx.update(grads, opt_state, params)
    step_late = float(jnp.abs(u["w"]).max())
    assert step1 < 0.2 * step_late


def test_gan_optimizer_gradient_accumulation():
    """make_gan_optimizers(gradient_accumulate_every=k): params move only on
    every k-th micro-step, using the averaged gradient."""
    import optax

    opt_g, _ = make_gan_optimizers(learning_rate=1e-2, max_grad_norm=None,
                                   gradient_accumulate_every=2)
    params = {"w": jnp.ones((3,))}
    state = opt_g.init(params)

    g1 = {"w": jnp.array([1.0, 0.0, 2.0])}
    g2 = {"w": jnp.array([3.0, 4.0, 0.0])}
    up1, state = opt_g.update(g1, state, params)
    p_mid = optax.apply_updates(params, up1)
    np.testing.assert_array_equal(np.asarray(p_mid["w"]),
                                  np.asarray(params["w"]))  # no-op step
    up2, state = opt_g.update(g2, state, p_mid)
    p_end = optax.apply_updates(p_mid, up2)
    assert float(jnp.abs(p_end["w"] - params["w"]).max()) > 0

    # reference: plain Adam fed the averaged gradient once
    ref_opt, _ = make_gan_optimizers(learning_rate=1e-2, max_grad_norm=None)
    ref_state = ref_opt.init(params)
    g_avg = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    ref_up, _ = ref_opt.update(g_avg, ref_state, params)
    ref_p = optax.apply_updates(params, ref_up)
    np.testing.assert_allclose(np.asarray(p_end["w"]),
                               np.asarray(ref_p["w"]), rtol=1e-6)
