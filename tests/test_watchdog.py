"""Training-health watchdog: unit behavior + the per-step abort contract.

Reference behavior target: /root/reference/train_latent_cfg.py:653-694 —
health is checked EVERY step and training aborts after 3 consecutive
non-finite losses. The TPU trainers pipeline the check one step behind the
dispatch (the device queue never drains), so the abort lands within
nan_strikes + 1 dispatched steps.
"""

import numpy as np
import pytest

import jax

from vqgan_tpu.training.watchdog import (
    TrainingDiverged,
    TrainingWatchdog,
    check_sample_range,
)


def test_three_strikes_raises():
    wd = TrainingWatchdog(nan_strikes=3)
    wd.check(1, float("nan"))
    wd.check(2, float("inf"))
    with pytest.raises(TrainingDiverged):
        wd.check(3, float("nan"))


def test_finite_loss_resets_strikes():
    wd = TrainingWatchdog(nan_strikes=3)
    wd.check(1, float("nan"))
    wd.check(2, float("nan"))
    wd.check(3, 0.5)  # reset
    wd.check(4, float("nan"))
    wd.check(5, float("nan"))
    with pytest.raises(TrainingDiverged):
        wd.check(6, float("nan"))


def test_overfit_and_high_loss_warnings():
    wd = TrainingWatchdog(high_loss_threshold=1.0, high_loss_after_step=10,
                          overfit_loss_floor=1e-3)
    assert wd.check(5, 2.0) == []  # before the grace step
    assert any("still above" in w for w in wd.check(11, 2.0))
    assert any("suspiciously low" in w for w in wd.check(12, 1e-5))


def test_sample_range_checks():
    assert check_sample_range(np.random.rand(2, 4, 4, 3)) is None
    assert "out of range" in check_sample_range(
        np.full((2, 4, 4, 3), 1.5, np.float32))
    assert "nearly constant" in check_sample_range(
        np.full((2, 4, 4, 3), 0.5, np.float32))


@pytest.mark.slow
def test_ldm_trainer_aborts_on_nan_within_strikes(tmp_path):
    """End-to-end: poisoned batches must kill training within
    nan_strikes (3) + 1 pipelined steps, not at the old log_every=50
    cadence."""
    from vqgan_tpu.configs import LDMConfig
    from vqgan_tpu.training.ldm_trainer import LatentDiffusionTrainer

    cfg = LDMConfig(
        results_folder=str(tmp_path), num_users=3, image_size=32,
        latent_size=4, latent_channels=4, dim=8, dim_mults=(1, 2),
        attn_heads=2, attn_dim_head=4, train_batch_size=4, timesteps=20,
        sampling_timesteps=3, save_and_sample_every=10 ** 9,
        compute_dtype="float32", use_ema=False,
    )
    trainer = LatentDiffusionTrainer(cfg, split_path=None, use_mesh=False)

    class PoisonLoader:
        dataset = object()  # no fully_cached attr -> plain iterator path

        def __iter__(self):
            while True:
                yield (np.full((4, 4, 4, 4), np.nan, np.float32),
                       np.zeros((4,), np.int32))

    trainer.loader = PoisonLoader()
    with pytest.raises(TrainingDiverged):
        trainer.train(num_steps=50, log_every=10 ** 6)
    assert int(jax.device_get(trainer.state.step)) <= 4, (
        "abort must land within nan_strikes + 1 dispatched steps")
