"""Block dispatch for the stage-2 LDM hot loop
(training/ldm_step.py::make_ldm_scan_step).

Pins the contract that one compiled scan program running K full training
steps (loss + grad + Adam + EMA) is step-for-step IDENTICAL to K sequential
`train_step` calls — including the PRNG stream (the step core folds the
base rng by state.step, so per-step and in-scan dispatch draw the same
noise/timesteps), the EMA trajectory, and the contrastive gate — so the
trainer can switch dispatch modes freely. Reference loop being accelerated:
/root/reference/train_latent_cfg.py:536-647.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vqgan_tpu.configs import LDMConfig
from vqgan_tpu.data import create_data_split, save_split
from vqgan_tpu.training.ldm_step import (
    LDMTrainState,
    make_ldm_scan_step,
    make_ldm_train_step,
)
from vqgan_tpu.training.ldm_trainer import build_cfg_unet_diffusion


def _tiny_cfg(**overrides):
    base = dict(
        num_users=3, image_size=32, latent_size=4, latent_channels=4,
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        train_batch_size=2, timesteps=20, sampling_timesteps=3,
        compute_dtype="float32", use_ema=True, ema_update_every=1,
    )
    base.update(overrides)
    return LDMConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    model, diffusion = build_cfg_unet_diffusion(cfg)
    x0 = jnp.zeros((2, 4, 4, 4))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32), cond_drop_mask=jnp.zeros((2,), bool))
    return cfg, diffusion, params


def _max_leaf_diff(a, b):
    diffs = jax.tree.map(
        lambda x, y: float(jnp.abs(
            jnp.asarray(x, jnp.float32) - jnp.asarray(y, jnp.float32)
        ).max()), a, b)
    return max(jax.tree.leaves(diffs))


def _state(params, tx, step=0):
    return LDMTrainState(
        step=jnp.asarray(step), params=params, opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params))


@pytest.mark.parametrize("start", [0, 7])
def test_ldm_scan_block_matches_per_step(setup, start):
    """SGD for the exactness bound (same rationale as test_scan_step's
    _sgd_optimizers: Adam amplifies fp-reassociation noise to lr scale);
    both dispatches must produce identical losses, params, EMA, and step."""
    cfg, diffusion, params = setup
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-3))
    kwargs = dict(ema_decay=0.9, ema_update_every=2, ema_update_after_step=2,
                  donate=False)
    step_fn = make_ldm_train_step(diffusion, tx, **kwargs)
    scan_fn = make_ldm_scan_step(diffusion, tx, **kwargs)

    block = 4
    rng = jax.random.PRNGKey(3)
    latents = jax.random.normal(
        jax.random.PRNGKey(7), (block, 2, 4, 4, 4))
    classes = (jnp.arange(block * 2).reshape(block, 2) % 3).astype(jnp.int32)

    ref_state = _state(params, tx, step=start)
    ref_losses = []
    for i in range(block):
        ref_state, log = step_fn(ref_state, latents[i], classes[i], rng)
        ref_losses.append(float(log["loss"]))

    scan_state, logs = scan_fn(
        _state(params, tx, step=start), latents, classes, rng)

    assert int(scan_state.step) == start + block
    assert logs["loss"].shape == (block,)
    np.testing.assert_allclose(
        np.asarray(logs["loss"]), np.asarray(ref_losses),
        rtol=2e-5, atol=2e-6)
    assert _max_leaf_diff(scan_state.params, ref_state.params) < 1e-5
    # EMA trajectory (cadence + warmup gating by step) matches exactly
    assert _max_leaf_diff(scan_state.ema_params, ref_state.ema_params) < 1e-5


def test_ldm_scan_contrastive_gate_matches(setup):
    """The SupCon gate compares state.step against contrastive_start_step
    INSIDE the step — the scan body must apply it per-step (steps 1,2
    ungated, 3.. gated) exactly like the per-step program."""
    cfg, diffusion, params = setup
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-3))
    kwargs = dict(contrastive_weight=0.5, contrastive_start_step=2,
                  donate=False)
    step_fn = make_ldm_train_step(diffusion, tx, **kwargs)
    scan_fn = make_ldm_scan_step(diffusion, tx, **kwargs)

    block = 4
    rng = jax.random.PRNGKey(5)
    latents = jax.random.normal(jax.random.PRNGKey(8), (block, 2, 4, 4, 4))
    classes = jnp.zeros((block, 2), jnp.int32)

    ref_state = _state(params, tx)
    ref = []
    for i in range(block):
        ref_state, log = step_fn(ref_state, latents[i], classes[i], rng)
        ref.append(float(log["loss"]))
    _, logs = scan_fn(_state(params, tx), latents, classes, rng)
    np.testing.assert_allclose(np.asarray(logs["loss"]), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    assert "contrastive_loss" in logs


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("gait_scan")
    rng = np.random.default_rng(0)
    for u in range(1, 4):
        d = root / f"ID_{u}"
        d.mkdir()
        for i in range(10):
            arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"f{i:02d}.jpg")
    split = create_data_split(root, num_users=3, images_per_user_train=6)
    split_path = root / "data_split.json"
    save_split(split, split_path)
    return root, split_path


def test_ldm_trainer_scan_mode_train_loop(fake_data, tmp_path):
    """End-to-end: LatentDiffusionTrainer(step_mode='scan') trains over
    block + per-step boundary segments, superbatch gets the explicit
    (None, 'data') placement under the mesh, and the run leaves a loadable
    checkpoint."""
    from vqgan_tpu.models import KLVAE
    from vqgan_tpu.models.autoencoder import AutoencoderConfig
    from vqgan_tpu.training.ldm_trainer import LatentDiffusionTrainer

    root, split_path = fake_data
    cfg = _tiny_cfg(
        data_path=str(root), results_folder=str(tmp_path / "ldm"),
        latents_cache_folder=str(tmp_path / "cache"),
        images_per_user_train=4, train_batch_size=8,
        save_and_sample_every=5, num_samples=2)
    vae = KLVAE(config=AutoencoderConfig(
        ch=8, ch_mult=(1, 2, 2, 4), num_res_blocks=1, resolution=32,
        z_channels=4))
    vae_params = vae.init(
        {"params": jax.random.PRNGKey(0),
         "gaussian": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)))

    trainer = LatentDiffusionTrainer(
        cfg, split_path=str(split_path), vae_params=vae_params,
        step_mode="scan", scan_block=3)
    trainer.vae = vae

    if trainer.mesh is not None:
        sup = trainer._put_super(jnp.zeros((3, 8, 4, 4, 4)))
        assert tuple(sup.sharding.spec)[:2] == (None, "data")

    trainer.train(num_steps=7, log_every=4)
    assert int(jax.device_get(trainer.state.step)) == 7
    # milestone 1 at step 5 (cadence), milestone 2 = off-cadence final save
    assert trainer.ckpt.all_milestones() == [1, 2]
    assert (tmp_path / "ldm" / "sample-1.png").exists()


def test_ldm_drain_scan_losses_nonfinite(fake_data, tmp_path):
    from vqgan_tpu.models import KLVAE
    from vqgan_tpu.models.autoencoder import AutoencoderConfig
    from vqgan_tpu.training.ldm_trainer import LatentDiffusionTrainer
    from vqgan_tpu.training.watchdog import TrainingDiverged

    root, split_path = fake_data
    cfg = _tiny_cfg(
        data_path=str(root), results_folder=str(tmp_path / "ldm_wd"),
        latents_cache_folder=str(tmp_path / "cache_wd"),
        images_per_user_train=4)
    trainer = LatentDiffusionTrainer(
        cfg, split_path=str(split_path), step_mode="scan", scan_block=2,
        use_mesh=False)
    assert trainer._drain_scan_losses((2, jnp.asarray([1.0, 2.0]))) is False
    nan = float("nan")
    assert trainer._drain_scan_losses((4, jnp.asarray([1.0, nan]))) is True
    with pytest.raises(TrainingDiverged):
        trainer._drain_scan_losses((6, jnp.asarray([nan, nan])))
