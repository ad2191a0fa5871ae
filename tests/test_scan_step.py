"""Multi-step scan dispatch (training/vqgan_step.py make_vqgan_scan_steps).

Pins the contract that `dispatch_block` — one compiled program running K
full G/D training steps via lax.scan — is step-for-step IDENTICAL math to K
sequential `dispatch_step` calls (the per-step path the reference's host
loop uses, train_vqgan.py:240-296), including across the disc_start
boundary, so the trainer can switch dispatch modes freely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.models import VQVAE
from vqgan_tpu.models.discriminator import PatchGANDiscriminator
from vqgan_tpu.training import (
    VQGANTrainState,
    make_gan_optimizers,
    make_vqgan_scan_steps,
    make_vqgan_split_steps,
)


@pytest.fixture(scope="module")
def setup():
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


def _state(vq_params, disc_params, disc_stats, opt_g, opt_d, step=0):
    return VQGANTrainState(
        step=jnp.asarray(step),
        vqvae_params=vq_params,
        disc_params=disc_params,
        disc_stats=disc_stats,
        opt_g=opt_g.init(vq_params),
        opt_d=opt_d.init(disc_params),
    )


def _run_per_step(g_step, d_step, state, superbatch, start, disc_start):
    losses = []
    for i in range(superbatch.shape[0]):
        state, recon, log = g_step(state, superbatch[i])
        if start + i >= disc_start:
            state, d_log = d_step(state, superbatch[i], recon)
        losses.append(float(log["loss_total"]))
    return state, losses


def _max_leaf_diff(a, b):
    diffs = jax.tree.map(
        lambda x, y: float(jnp.abs(
            jnp.asarray(x, jnp.float32) - jnp.asarray(y, jnp.float32)
        ).max()), a, b)
    return max(jax.tree.leaves(diffs))


def _sgd_optimizers(lr=1e-3):
    """Plain SGD for the exactness comparison: Adam's m/sqrt(v) amplifies
    fp-reassociation noise in near-zero grads to O(lr) param steps (measured
    ~1e-4 after 4 steps), which would mask real semantic bugs. SGD keeps the
    scan-vs-eager deviation at grad-noise scale (~1e-7) so the tolerance can
    stay tight; the Adam path is covered separately below."""
    import optax

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(lr))
    return tx, tx


@pytest.mark.parametrize("start,disc_start", [
    (4, 0),    # steady state: D active every step of the block
    (0, 100),  # pre-disc_start: D frozen every step
    (2, 4),    # block straddles disc_start (steps 2,3 frozen; 4,5 live)
])
def test_scan_block_matches_per_step(setup, start, disc_start):
    vqvae_apply, disc_apply, vq_params, disc_params, disc_stats = setup
    opt_g, opt_d = _sgd_optimizers()
    kwargs = dict(disc_start=disc_start, donate=False)
    g_step, d_step = make_vqgan_split_steps(
        vqvae_apply, disc_apply, opt_g, opt_d, **kwargs)
    scan_gd, scan_g = make_vqgan_scan_steps(
        vqvae_apply, disc_apply, opt_g, opt_d, **kwargs)

    block = 4
    superbatch = jax.random.uniform(
        jax.random.PRNGKey(7), (block, 2, 32, 32, 3))
    s0 = _state(vq_params, disc_params, disc_stats, opt_g, opt_d, step=start)

    ref_state, ref_losses = _run_per_step(
        g_step, d_step, s0, superbatch, start, disc_start)
    scan_fn = scan_g if start + block <= disc_start else scan_gd
    scan_state, logs = scan_fn(s0, superbatch)

    assert int(scan_state.step) == start + block
    np.testing.assert_allclose(
        np.asarray(logs["loss_total"]), np.asarray(ref_losses),
        rtol=2e-5, atol=2e-6)
    assert _max_leaf_diff(scan_state.vqvae_params,
                          ref_state.vqvae_params) < 1e-5
    assert _max_leaf_diff(scan_state.disc_params,
                          ref_state.disc_params) < 1e-5
    assert _max_leaf_diff(scan_state.disc_stats,
                          ref_state.disc_stats) < 1e-5


def test_scan_block_matches_per_step_adam(setup):
    """Production Adam optimizers: losses and D trajectory stay tight; G
    params agree to O(steps * lr) — Adam's normalized update turns fp
    reassociation noise in near-zero grads into lr-scale param deltas, so
    the bound is steps*lr (4 * 4.5e-5), not machine epsilon."""
    vqvae_apply, disc_apply, vq_params, disc_params, disc_stats = setup
    opt_g, opt_d = make_gan_optimizers()
    g_step, d_step = make_vqgan_split_steps(
        vqvae_apply, disc_apply, opt_g, opt_d, disc_start=0, donate=False)
    scan_gd, _ = make_vqgan_scan_steps(
        vqvae_apply, disc_apply, opt_g, opt_d, disc_start=0, donate=False)

    block = 4
    superbatch = jax.random.uniform(
        jax.random.PRNGKey(7), (block, 2, 32, 32, 3))
    s0 = _state(vq_params, disc_params, disc_stats, opt_g, opt_d, step=4)

    ref_state, ref_losses = _run_per_step(
        g_step, d_step, s0, superbatch, 4, 0)
    scan_state, logs = scan_gd(s0, superbatch)

    np.testing.assert_allclose(
        np.asarray(logs["loss_total"]), np.asarray(ref_losses),
        rtol=1e-4, atol=1e-5)
    lr_bound = block * 4.5e-5 * 1.5
    assert _max_leaf_diff(scan_state.vqvae_params,
                          ref_state.vqvae_params) < lr_bound
    assert _max_leaf_diff(scan_state.disc_params,
                          ref_state.disc_params) < lr_bound


def test_scan_g_skips_disc_and_matches_scan_gd_masked(setup):
    """Before disc_start the cheap G-only program and the masked scan_gd
    must agree: same G trajectory, D untouched by both."""
    vqvae_apply, disc_apply, vq_params, disc_params, disc_stats = setup
    opt_g, opt_d = _sgd_optimizers()
    scan_gd, scan_g = make_vqgan_scan_steps(
        vqvae_apply, disc_apply, opt_g, opt_d, disc_start=100, donate=False)

    superbatch = jax.random.uniform(
        jax.random.PRNGKey(9), (3, 2, 32, 32, 3))
    s0 = _state(vq_params, disc_params, disc_stats, opt_g, opt_d)

    s_g, logs_g = scan_g(s0, superbatch)
    s_gd, _ = scan_gd(s0, superbatch)
    # different compiled programs → fp-reassociation noise only
    assert _max_leaf_diff(s_g.vqvae_params, s_gd.vqvae_params) < 1e-5
    # masked D update selects the OLD leaves → bitwise frozen
    assert _max_leaf_diff(s_gd.disc_params, s0.disc_params) == 0.0
    assert "d_loss" not in logs_g  # no D compute in the G-only program
    assert logs_g["loss_total"].shape == (3,)


def _tiny_trainer_cfg(tmp_path, **overrides):
    from vqgan_tpu.configs import VQGANConfig

    base = dict(
        image_size=32, ch=16, ch_mult=(1, 2), num_res_blocks=1,
        z_channels=16, num_embeddings=8, embedding_dim=16,
        batch_size=2, disc_start=2, train_steps=7,
        save_and_sample_every=5, results_folder=str(tmp_path),
        images_per_user_train=1,
    )
    base.update(overrides)
    return VQGANConfig(**base)


def test_trainer_scan_mode_mesh_superbatch_sharding(tmp_path):
    """step_mode='scan' under the production mesh: the stacked superbatch
    gets an EXPLICIT (None, 'data') placement — batch axis sharded, block
    axis replicated — instead of relying on implicit GSPMD propagation for
    the new leading axis (a silently replicated superbatch would cost
    block× the HBM and transfer), and the block dispatch runs finite."""
    from vqgan_tpu.training.vqgan_trainer import VQGANTrainer

    cfg = _tiny_trainer_cfg(tmp_path, batch_size=8, disc_start=0)
    trainer = VQGANTrainer(cfg, use_mesh=True, step_mode="scan",
                           scan_block=2)
    assert trainer.mesh is not None
    n_data = trainer.mesh.shape["data"]
    assert n_data > 1, "test needs the multi-device CPU mesh from conftest"

    block = 2
    superbatch = trainer._put_super(jnp.asarray(
        np.random.RandomState(0).rand(block, 8, 32, 32, 3), jnp.float32))
    assert tuple(superbatch.sharding.spec)[:2] == (None, "data")
    # sharded, not replicated: each device holds 1/n_data of the bytes
    shard = superbatch.addressable_shards[0].data
    assert shard.nbytes * n_data == superbatch.nbytes

    state, logs = trainer.dispatch_block(trainer.state, superbatch, 0)
    assert logs["loss_total"].shape == (block,)
    assert bool(jnp.isfinite(logs["loss_total"]).all())
    assert int(jax.device_get(state.step)) == block


def test_drain_scan_losses_nonfinite_detection(tmp_path):
    """The scan loop's watchdog drain flags non-finite blocks (which drops
    the one-dispatch pipelining) and still enforces the 3-strike
    TrainingDiverged abort across blocks."""
    from vqgan_tpu.training.vqgan_trainer import VQGANTrainer
    from vqgan_tpu.training.watchdog import TrainingDiverged

    trainer = VQGANTrainer(_tiny_trainer_cfg(tmp_path), use_mesh=False,
                           step_mode="scan", scan_block=2)
    assert trainer._drain_scan_losses((2, jnp.asarray([1.0, 2.0]))) is False
    nan = float("nan")
    # strikes are CONSECUTIVE (a finite loss resets them); the 3rd in a row
    # aborts even when the run spans block boundaries
    assert trainer._drain_scan_losses((4, jnp.asarray([1.0, nan]))) is True
    with pytest.raises(TrainingDiverged):
        trainer._drain_scan_losses((6, jnp.asarray([nan, nan])))


def test_trainer_scan_mode_train_loop(tmp_path, setup):
    """End-to-end: VQGANTrainer(step_mode='scan') trains over block +
    per-step boundary segments and leaves a loadable checkpoint."""
    from vqgan_tpu.configs import VQGANConfig
    from vqgan_tpu.training.vqgan_trainer import VQGANTrainer

    cfg = VQGANConfig(
        image_size=32, ch=16, ch_mult=(1, 2), num_res_blocks=1,
        z_channels=16, num_embeddings=8, embedding_dim=16,
        batch_size=2, disc_start=2, train_steps=7,
        save_and_sample_every=5, results_folder=str(tmp_path),
        images_per_user_train=1,
    )
    trainer = VQGANTrainer(cfg, use_mesh=False, step_mode="scan",
                           scan_block=3)

    class _DS:
        def __iter__(self):
            while True:
                yield (np.random.RandomState(0).rand(2, 32, 32, 3)
                       .astype(np.float32), np.zeros((2,), np.int64))

    trainer.loader = _DS()
    trainer.train(num_steps=7, log_every=4)
    assert int(jax.device_get(trainer.state.step)) == 7
    # off-cadence end still saved a checkpoint (same rule as per-step loop)
    assert trainer.ckpt.latest_milestone() is not None
