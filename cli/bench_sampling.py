#!/usr/bin/env python
"""Benchmark: CFG latent-diffusion sampling throughput at 256px
(BASELINE config #4 — flagship CFG U-Net dim=96, DDIM-150, 32x32x4 latents,
KL-VAE decode to 256px).

Prints one JSON line: {"metric": ..., "value": samples/sec/chip, ...}.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--sampling_timesteps", type=int, default=150)
    ap.add_argument("--cond_scale", type=float, default=1.0,
                    help="1.0 = reference inference config (CFG disabled); "
                         ">1 doubles U-Net work per step")
    ap.add_argument("--decode", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="include KL-VAE decode to 256px (full pipeline); "
                         "--no-decode times the DDIM scan alone")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from vqgan_tpu.configs import LDMConfig
    from vqgan_tpu.models import KLVAE
    from vqgan_tpu.models.autoencoder import AutoencoderConfig
    from vqgan_tpu.training.ldm_trainer import build_cfg_unet_diffusion

    cfg = LDMConfig(sampling_timesteps=args.sampling_timesteps)
    model, diffusion = build_cfg_unet_diffusion(cfg)

    b = args.batch
    x0 = jnp.zeros((b, cfg.latent_size, cfg.latent_size, cfg.latent_channels))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32), cond_drop_mask=jnp.zeros((b,), bool))
    classes = (jnp.arange(b) % cfg.num_users).astype(jnp.int32)

    vae = KLVAE(config=AutoencoderConfig(resolution=cfg.image_size,
                                         z_channels=cfg.latent_channels),
                dtype=jnp.bfloat16)
    vae_params = vae.init(
        {"params": jax.random.PRNGKey(1),
         "gaussian": jax.random.PRNGKey(2)},
        jnp.zeros((2, cfg.image_size, cfg.image_size, 3)))

    @jax.jit
    def pipeline(p, vp, key, classes):
        latents = diffusion.sample(p, key, classes=classes,
                                   cond_scale=args.cond_scale,
                                   rescaled_phi=cfg.rescaled_phi)
        if args.decode:
            return vae.apply(vp, latents, method=KLVAE.decode_latents)
        return latents

    key = jax.random.PRNGKey(3)
    t0 = time.time()
    out = pipeline(params, vae_params, key, classes)
    jax.block_until_ready(out)
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(args.iters):
        out = pipeline(params, vae_params, jax.random.fold_in(key, i),
                       classes)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    sps = b / dt

    print(json.dumps({
        "metric": f"CFG DDIM-{args.sampling_timesteps} sampling + VAE decode "
                  f"at 256px (dim=96 U-Net, cond_scale={args.cond_scale})",
        "value": round(sps, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
