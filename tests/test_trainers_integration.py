"""End-to-end trainer orchestration on a synthetic dataset (tiny configs,
CPU 8-device mesh): split creation → VQ-GAN training with checkpoints →
LDM training with latent cache → checkpoint reload → generation."""

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.configs import LDMConfig, VQGANConfig
from vqgan_tpu.data import create_data_split, save_split


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("gait")
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


def test_vqgan_trainer_end_to_end(fake_data, tmp_path):
    from vqgan_tpu.training.vqgan_trainer import VQGANTrainer

    root, split_path = fake_data
    cfg = VQGANConfig(
        data_path=str(root), results_folder=str(tmp_path / "vqgan"),
        num_users=3, images_per_user_train=6, image_size=32,
        ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        num_embeddings=8, embedding_dim=8, disc_ndf=8, disc_n_layers=2,
        batch_size=8, disc_start=2, save_and_sample_every=3,
        compute_dtype="float32", train_steps=4,
    )
    trainer = VQGANTrainer(cfg, split_path=str(split_path))
    trainer.train(num_steps=4, log_every=2)
    # milestone 1 at step 3 (cadence), milestone 2 = off-cadence final save
    assert trainer.ckpt.all_milestones() == [1, 2]
    assert (tmp_path / "vqgan" / "reconstruction-1.png").exists()
    # reload restores the final step counter from the latest milestone
    trainer2 = VQGANTrainer(cfg, split_path=str(split_path))
    step = trainer2.load()
    assert step == 4
    # an explicit milestone still loads the on-cadence snapshot
    assert trainer2.load(1) == 3


def test_ldm_trainer_end_to_end(fake_data, tmp_path):
    from vqgan_tpu.models import KLVAE
    from vqgan_tpu.models.autoencoder import AutoencoderConfig
    from vqgan_tpu.training.ldm_trainer import LatentDiffusionTrainer

    root, split_path = fake_data
    cfg = LDMConfig(
        data_path=str(root), results_folder=str(tmp_path / "ldm"),
        latents_cache_folder=str(tmp_path / "cache"),
        num_users=3, images_per_user_train=4, image_size=32, latent_size=4,
        latent_channels=4, dim=8, dim_mults=(1, 2), attn_heads=2,
        attn_dim_head=4, train_batch_size=4, timesteps=20,
        sampling_timesteps=3, save_and_sample_every=3, num_samples=4,
        compute_dtype="float32", use_ema=True, ema_update_every=1,
    )

    # small real VAE for encode/decode
    vae = KLVAE(config=AutoencoderConfig(
        ch=8, ch_mult=(1, 2, 2, 4), num_res_blocks=1, resolution=32,
        z_channels=4))
    vae_params = vae.init(
        {"params": jax.random.PRNGKey(0),
         "gaussian": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)))

    trainer = LatentDiffusionTrainer(
        cfg, split_path=str(split_path), vae_params=vae_params)
    # patch the vae module to the tiny config (trainer builds a default one)
    trainer.vae = vae
    trainer.train(num_steps=4, log_every=2)

    # latent cache populated by on-miss encoding
    cache_files = list((tmp_path / "cache").glob("*.npy"))
    assert len(cache_files) > 0
    # milestone 1 at step 3 (cadence), milestone 2 = off-cadence final save
    assert trainer.ckpt.all_milestones() == [1, 2]
    assert (tmp_path / "ldm" / "sample-1.png").exists()
    cfg_json = trainer.ckpt.load_config(1)
    assert cfg_json["dim"] == 8

    # --- generation-CLI model reload path -------------------------------
    import sys
    sys.path.insert(0, str(Path(__file__).parent.parent / "cli"))
    import importlib
    gen = importlib.import_module("generate")

    diffusion, params, config = gen.load_model(str(tmp_path / "ldm"))
    assert config.dim == 8
    latents = gen.generate_samples(
        diffusion, params, jax.random.PRNGKey(2), user_label=1, n=2,
        cond_scale=1.0, rescaled_phi=0.0)
    assert latents.shape == (2, 4, 4, 4)
    assert bool(jnp.isfinite(latents).all())


def test_ldm_trainer_fsdp_param_sharding(fake_data, tmp_path):
    """The trainer's --param_sharding=fsdp product path: params, Adam
    moments, and EMA stored ZeRO-3-sharded over 'data'; training runs,
    loss is finite, checkpoint restore keeps the layout."""
    from vqgan_tpu.models import KLVAE
    from vqgan_tpu.models.autoencoder import AutoencoderConfig
    from vqgan_tpu.training.ldm_trainer import LatentDiffusionTrainer

    root, split_path = fake_data
    cfg = LDMConfig(
        data_path=str(root), results_folder=str(tmp_path / "ldm_fsdp"),
        latents_cache_folder=str(tmp_path / "cache_fsdp"),
        num_users=3, images_per_user_train=4, image_size=32, latent_size=4,
        latent_channels=4, dim=16, dim_mults=(1, 2), attn_heads=2,
        attn_dim_head=4, train_batch_size=8, timesteps=20,
        sampling_timesteps=3, save_and_sample_every=100,
        compute_dtype="float32", use_ema=True, ema_update_every=1,
    )
    vae = KLVAE(config=AutoencoderConfig(
        ch=8, ch_mult=(1, 2, 2, 4), num_res_blocks=1, resolution=32,
        z_channels=4))
    vae_params = vae.init(
        {"params": jax.random.PRNGKey(0),
         "gaussian": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)))

    # fsdp_min_size lowered so the tiny test model's conv kernels shard
    trainer = LatentDiffusionTrainer(
        cfg, split_path=str(split_path), vae_params=vae_params,
        param_sharding="fsdp", fsdp_min_size=2 ** 10)
    trainer.vae = vae

    def sharded_leaves(tree):
        return [leaf for leaf in jax.tree.leaves(tree)
                if hasattr(leaf, "sharding")
                and any(s is not None for s in leaf.sharding.spec)]

    assert sharded_leaves(trainer.state.params)
    assert sharded_leaves(trainer.state.ema_params)
    assert sharded_leaves(trainer.state.opt_state)

    trainer.train(num_steps=2, log_every=1)
    assert bool(jnp.isfinite(trainer.state.step))

    # save + restore keeps the FSDP layout
    trainer.ckpt.save(1, jax.device_get(trainer.state),
                      config=dataclasses.asdict(cfg))
    step = trainer.load(1)
    assert step == 2
    assert sharded_leaves(trainer.state.params)
