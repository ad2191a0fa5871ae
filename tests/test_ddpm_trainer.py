"""Unconditional DDPM Trainer end-to-end on a synthetic image folder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqgan_tpu.diffusion import GaussianDiffusion
from vqgan_tpu.models import Unet
from vqgan_tpu.training.ddpm_trainer import FolderDataset, Trainer


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(16):
        arr = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")
    return d


def test_folder_dataset(folder):
    ds = FolderDataset(folder, image_size=16)
    assert len(ds) == 16
    img, _ = ds[0]
    assert img.shape == (16, 16, 3)


def test_ddpm_trainer_end_to_end(folder, tmp_path):
    model = Unet(dim=8, dim_mults=(1, 2), channels=3, attn_heads=1,
                 attn_dim_head=8)
    x0 = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,), jnp.int32))

    def model_apply(p, x, t, x_self_cond=None, return_features=False):
        return model.apply(p, x, t, x_self_cond,
                           return_features=return_features)

    diffusion = GaussianDiffusion(
        model_apply, image_size=16, channels=3, timesteps=20,
        sampling_timesteps=3, objective="pred_noise", ddim_sampling_eta=0.0)

    trainer = Trainer(
        diffusion, params, str(folder), train_batch_size=4,
        train_num_steps=4, save_and_sample_every=3, num_samples=4,
        results_folder=str(tmp_path / "ddpm"))
    trainer.train(log_every=2)

    assert (tmp_path / "ddpm" / "sample-1.png").exists()
    assert trainer.ckpt.all_milestones() == [1]
    step = trainer.load()
    assert step == 3


def test_ddpm_trainer_best_latest_retention(folder, tmp_path):
    model = Unet(dim=8, dim_mults=(1, 2), channels=3, attn_heads=1,
                 attn_dim_head=8)
    x0 = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,), jnp.int32))

    def model_apply(p, x, t, x_self_cond=None, return_features=False):
        return model.apply(p, x, t, x_self_cond,
                           return_features=return_features)

    diffusion = GaussianDiffusion(
        model_apply, image_size=16, channels=3, timesteps=10,
        sampling_timesteps=2, objective="pred_noise")

    # trivial FID evaluator: pixel-mean features
    from vqgan_tpu.eval.fid import FIDEvaluation

    fid = FIDEvaluation(
        lambda x: jnp.mean(x, axis=(1, 2)), batch_size=8,
        num_fid_samples=8, dim=3)
    ds = FolderDataset(folder, 16)
    fid.load_or_precalc_real_stats(
        iter([np.stack([ds[i][0] for i in range(8)])]))

    trainer = Trainer(
        diffusion, params, str(folder), train_batch_size=4,
        train_num_steps=3, save_and_sample_every=3, num_samples=4,
        results_folder=str(tmp_path / "ddpm2"), calculate_fid=True,
        fid_evaluator=fid, save_best_and_latest_only=True)
    trainer.train(log_every=2)
    # milestone 0 = best, 1 = latest
    assert set(trainer.ckpt.all_milestones()) == {0, 1}
    assert trainer.best_fid < float("inf")
