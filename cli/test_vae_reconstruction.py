#!/usr/bin/env python
"""KL-VAE reconstruction quality check (BASELINE config #1).

Behavior target: /root/reference/test_vae_reconstruction.py — encode→decode
round trip on N real images, MSE/PSNR/simplified-SSIM per image, side-by-side
grids, and the same verdict thresholds (PSNR>30 & SSIM>0.9 "very good";
PSNR<25 or SSIM<0.85 "bad", :176-198).
"""

import argparse
import json
from pathlib import Path

import numpy as np

from _common import REPO, load_vae  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae_path", required=True)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--num_images", type=int, default=10)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--latent_channels", type=int, default=4)
    ap.add_argument("--output_dir", default="./vae_reconstruction_test")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqgan_tpu.data import load_image
    from vqgan_tpu.data.splits import IMAGE_EXTENSIONS
    from vqgan_tpu.eval.metrics import mse, psnr, ssim_simplified
    from vqgan_tpu.models import KLVAE

    model, params = load_vae(args.vae_path, args.latent_channels,
                             args.image_size)

    # gather images across user folders
    root = Path(args.data_path)
    files = sorted(
        p for p in root.rglob("*") if p.suffix.lower() in IMAGE_EXTENSIONS)
    rng = np.random.default_rng(args.seed)
    picks = rng.choice(len(files), min(args.num_images, len(files)),
                       replace=False)
    images = np.stack(
        [load_image(files[i], args.image_size) for i in picks])

    @jax.jit
    def roundtrip(x):
        z = model.apply(params, x, method=KLVAE.encode_images_mean)
        return model.apply(params, z, method=KLVAE.decode_latents)

    recon = np.asarray(roundtrip(jnp.asarray(images)))

    m = np.asarray(mse(jnp.asarray(images), jnp.asarray(recon)))
    p = np.asarray(psnr(jnp.asarray(images), jnp.asarray(recon)))
    s = np.asarray(ssim_simplified(jnp.asarray(images), jnp.asarray(recon)))

    print(f"{'image':<30} {'MSE':>10} {'PSNR':>8} {'SSIM':>8}")
    for i, idx in enumerate(picks):
        print(f"{files[idx].name:<30} {m[i]:>10.6f} {p[i]:>8.2f} {s[i]:>8.4f}")
    mean_psnr, mean_ssim = float(p.mean()), float(s.mean())
    print("-" * 60)
    print(f"{'mean':<30} {float(m.mean()):>10.6f} {mean_psnr:>8.2f} "
          f"{mean_ssim:>8.4f}")

    if mean_psnr > 30 and mean_ssim > 0.9:
        verdict = "very good — VAE reconstruction quality is excellent"
    elif mean_psnr > 25 and mean_ssim > 0.85:
        verdict = "medium — usable, but check latent-space quality"
    else:
        verdict = "bad — VAE needs retraining"
    print(f"verdict: {verdict}")

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    rows = [np.concatenate([a, b], axis=1) for a, b in zip(images, recon)]
    grid = (np.clip(np.concatenate(rows, axis=0), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(grid).save(out / "reconstructions.png")
    (out / "metrics.json").write_text(json.dumps({
        "mse": m.tolist(), "psnr": p.tolist(), "ssim": s.tolist(),
        "mean_psnr": mean_psnr, "mean_ssim": mean_ssim, "verdict": verdict,
    }, indent=2))
    print(f"saved grid + metrics to {out}")


if __name__ == "__main__":
    main()
