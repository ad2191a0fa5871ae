#!/usr/bin/env python
"""Generation CLI: sample per-user images from a trained LDM checkpoint.

Behavior target: /root/reference/generate.py — loads the LDM checkpoint
(preferring EMA weights), rebuilds the model from the embedded config with
fallback defaults (:50-86), samples per user in batches of ≤16, decodes with
the frozen VAE, and writes `ID_X/generated_###.jpg` at quality 95
(:283-322). `rescaled_phi=0.7` default mirrors :204.
"""

import argparse
from pathlib import Path

import numpy as np

from _common import REPO, load_vae  # noqa: E402


def load_model(checkpoint: str, milestone=None):
    """Rebuild CFG U-Net + diffusion from a checkpoint directory, preferring
    EMA weights (reference generate.py:89-139)."""
    import jax

    from vqgan_tpu.checkpoint import CheckpointManager
    from vqgan_tpu.configs import LDMConfig
    from vqgan_tpu.training.ldm_trainer import build_cfg_unet_diffusion

    mgr = CheckpointManager(checkpoint, prefix="model")
    raw_config = mgr.load_config(milestone) or {}
    fields = LDMConfig.__dataclass_fields__
    kwargs = {}
    for k, v in raw_config.items():
        if k in fields:
            if k == "dim_mults" and isinstance(v, list):
                v = tuple(v)
            if k == "adam_betas" and isinstance(v, list):
                v = tuple(v)
            kwargs[k] = v
    config = LDMConfig(**kwargs)

    model, diffusion = build_cfg_unet_diffusion(config)
    restored = mgr.restore(milestone)
    # prefer EMA weights; tolerate checkpoints without them
    params = restored.get("ema_params") or restored.get("params")
    if params is None:
        raise ValueError(
            f"checkpoint has neither ema_params nor params: "
            f"{list(restored)}")
    return diffusion, params, config


def generate_samples(diffusion, params, key, user_label: int, n: int,
                     cond_scale: float, rescaled_phi: float):
    import jax.numpy as jnp

    classes = jnp.full((n,), user_label, jnp.int32)
    return diffusion.sample(params, key, classes=classes,
                            cond_scale=cond_scale, rescaled_phi=rescaled_phi)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="results folder containing model-* checkpoints")
    ap.add_argument("--milestone", type=int, default=None)
    ap.add_argument("--vae_path", required=True)
    ap.add_argument("--output_dir", default="./generated")
    ap.add_argument("--user_ids", type=int, nargs="*", default=None,
                    help="1-based user ids; default all users")
    ap.add_argument("--all_users", action="store_true")
    ap.add_argument("--num_images", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--cond_scale", type=float, default=None)
    ap.add_argument("--rescaled_phi", type=float, default=0.7)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    from PIL import Image

    from vqgan_tpu.models import KLVAE

    diffusion, params, config = load_model(args.checkpoint, args.milestone)
    vae, vae_params = load_vae(args.vae_path, config.latent_channels,
                               config.image_size)
    cond_scale = (args.cond_scale if args.cond_scale is not None
                  else config.cond_scale)

    users = (args.user_ids if args.user_ids
             else list(range(1, config.num_users + 1)))

    decode = jax.jit(lambda z: vae.apply(vae_params, z,
                                         method=KLVAE.decode_latents))
    key = jax.random.PRNGKey(args.seed)

    out_root = Path(args.output_dir)
    for user in users:
        user_dir = out_root / f"ID_{user}"
        user_dir.mkdir(parents=True, exist_ok=True)
        produced = 0
        while produced < args.num_images:
            n = min(args.batch_size, args.num_images - produced)
            key, k = jax.random.split(key)
            latents = generate_samples(
                diffusion, params, k, user - 1, n, cond_scale,
                args.rescaled_phi)
            images = np.asarray(decode(latents))
            for img in images:
                arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    user_dir / f"generated_{produced:03d}.jpg", quality=95)
                produced += 1
        print(f"ID_{user}: {produced} images → {user_dir}")


if __name__ == "__main__":
    main()
