#!/usr/bin/env python
"""Latent-distribution audit for a trained stage-1 model.

Behavior target: /root/reference/vqgan_ldm_baseline/diagnose_latent_range.py
— encode N images, report latent min/max/mean/std (:96-122), give
normalization advice (:124-141), and dump codebook weight statistics
(:144-154).
"""

import argparse
from pathlib import Path

import numpy as np

from _common import REPO, load_vae  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae_path", default=None, help="KL-VAE checkpoint")
    ap.add_argument("--vqgan_path", default=None,
                    help="VQ-GAN checkpoint dir (ours) or vqgan-*.pt")
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--num_images", type=int, default=100)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqgan_tpu.data import load_image
    from vqgan_tpu.data.datasets import pad_to_batch
    from vqgan_tpu.data.splits import IMAGE_EXTENSIONS

    root = Path(args.data_path)
    files = sorted(p for p in root.rglob("*")
                   if p.suffix.lower() in IMAGE_EXTENSIONS)[: args.num_images]

    codebook = None
    if args.vqgan_path:
        from vqgan_tpu.checkpoint.torch_import import load_torch_vqvae
        from vqgan_tpu.models import VQVAE

        if str(args.vqgan_path).endswith(".pt"):
            params = load_torch_vqvae(args.vqgan_path)
        else:
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(
                Path(args.vqgan_path).absolute())
            params = restored["vqvae_params"] \
                if "vqvae_params" in restored else restored
        model = VQVAE(resolution=args.image_size)
        encode = jax.jit(lambda x: model.apply(
            params, x, method=VQVAE.encode_images))
        codebook = np.asarray(params["params"]["quantizer"]["embedding"])
    else:
        assert args.vae_path, "pass --vae_path or --vqgan_path"
        model, params = load_vae(args.vae_path, image_size=args.image_size)
        from vqgan_tpu.models import KLVAE

        encode = jax.jit(lambda x: model.apply(
            params, x, method=KLVAE.encode_images_mean))

    lat_stats = []
    for s in range(0, len(files), args.batch_size):
        chunk = files[s : s + args.batch_size]
        imgs = np.stack([load_image(p, args.image_size) for p in chunk])
        imgs = pad_to_batch(imgs, args.batch_size)
        z = np.asarray(encode(jnp.asarray(imgs)))[: len(chunk)]
        lat_stats.append(z.reshape(len(chunk), -1))
    lat = np.concatenate(lat_stats)

    mn, mx = float(lat.min()), float(lat.max())
    mean, std = float(lat.mean()), float(lat.std())
    print(f"latents over {len(lat)} images:")
    print(f"  min={mn:.4f} max={mx:.4f} mean={mean:.4f} std={std:.4f}")
    print(f"  p1={np.percentile(lat, 1):.4f} p99={np.percentile(lat, 99):.4f}")

    print("\nnormalization advice:")
    if -1.2 < mn and mx < 1.2:
        print("  latents already ≈[-1,1]; auto_normalize=False is correct")
    elif 0.0 <= mn and mx <= 1.0:
        print("  latents in [0,1]; set auto_normalize=True for the LDM")
    else:
        print(f"  latents outside [-1,1]; consider normalizing with "
              f"mean={mean:.4f} std={std:.4f} before diffusion")

    if codebook is not None:
        print(f"\ncodebook: {codebook.shape[0]} x {codebook.shape[1]}")
        print(f"  weight min={codebook.min():.4f} max={codebook.max():.4f} "
              f"mean={codebook.mean():.4f} std={codebook.std():.4f}")
        norms = np.linalg.norm(codebook, axis=1)
        print(f"  row norms: min={norms.min():.4f} max={norms.max():.4f}")


if __name__ == "__main__":
    main()
