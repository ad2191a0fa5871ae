#!/usr/bin/env python
"""LDM pipeline sanity checks.

Behavior target: /root/reference/vqgan_ldm_baseline/debug_ldm_pipeline.py —
decode-from-random-latent variance check (std > 0.01, :64-68), real
encode-decode MSE tiers (:70-129), normalize/denormalize invariance
(:117-129), checkpoint field presence (:133-152). Note: the reference script
crashes at import on a missing config module (SURVEY.md §5.6 "bug to not
replicate"); this one is self-contained.
"""

import argparse
from pathlib import Path

import numpy as np

from _common import REPO, load_vae  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae_path", required=True)
    ap.add_argument("--data_path", default=None)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--latent_channels", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqgan_tpu.models import KLVAE

    model, params = load_vae(args.vae_path, args.latent_channels,
                             args.image_size)
    latent_size = args.image_size // 8
    ok = True

    # 1. decode from random latent must produce non-constant output
    z = jax.random.normal(
        jax.random.PRNGKey(0),
        (1, latent_size, latent_size, args.latent_channels)) * 0.18215
    dec = np.asarray(model.apply(params, z, method=KLVAE.decode_latents))
    std = float(dec.std())
    status = "OK" if std > 0.01 else "FAIL"
    ok &= std > 0.01
    print(f"[{status}] random-latent decode std = {std:.4f} (want > 0.01)")

    # 2. real encode-decode MSE tiers
    if args.data_path:
        from vqgan_tpu.data import load_image
        from vqgan_tpu.data.splits import IMAGE_EXTENSIONS

        files = sorted(
            p for p in Path(args.data_path).rglob("*")
            if p.suffix.lower() in IMAGE_EXTENSIONS)[:8]
        imgs = jnp.asarray(np.stack(
            [load_image(p, args.image_size) for p in files]))
        z = model.apply(params, imgs, method=KLVAE.encode_images_mean)
        rec = np.asarray(model.apply(params, z, method=KLVAE.decode_latents))
        mse = float(np.mean((rec - np.asarray(imgs)) ** 2))
        tier = ("excellent" if mse < 0.01 else
                "good" if mse < 0.05 else "POOR")
        ok &= mse < 0.05
        print(f"[{'OK' if mse < 0.05 else 'FAIL'}] real recon MSE = "
              f"{mse:.5f} ({tier})")

    # 3. scale-factor invariance: encode → decode_latents must undo 0.18215
    post = model.apply(params, z / 0.18215, method=KLVAE.decode)
    direct = model.apply(params, z, method=KLVAE.decode_latents)
    diff = float(jnp.abs(jnp.clip(post, 0, 1) - direct).max())
    ok &= diff < 1e-5
    print(f"[{'OK' if diff < 1e-5 else 'FAIL'}] scale-factor "
          f"normalize/denormalize invariance (max diff {diff:.2e})")

    # 4. checkpoint structural check
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"[OK] checkpoint loads; {n_params / 1e6:.1f}M parameters")

    print("\npipeline " + ("HEALTHY" if ok else "HAS PROBLEMS"))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
