#!/usr/bin/env python
"""Export the generation pipeline as an AOT serving artifact.

Packages the generate.py hot path — CFG DDIM sampling + KL-VAE decode, one
compiled program (the exact pipeline bench.py config #4 times) — as a
self-contained StableHLO directory via vqgan_tpu.serving: reload and serve
with jax + numpy only, no model-building code, no re-trace, version-stable
serialization. Complements generate.py (which re-runs the Python model) the
way a saved-model export complements a training repo.

Usage:
  python cli/export_serving.py --checkpoint results/ldm --vae_path ... \
      --out serving_artifact [--batch_size 16] [--cond_scale 1.0] \
      [--platforms tpu cpu] [--selftest]

Serving host:
  from vqgan_tpu.serving import load_cfg_sampler   # or vendor export.py
  sample = load_cfg_sampler("serving_artifact")
  images = sample(jax.random.PRNGKey(0), class_labels)   # [B,256,256,3]
"""

import argparse
from pathlib import Path

from _common import REPO, load_vae  # noqa: E402
from generate import load_model  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--milestone", type=int, default=None)
    ap.add_argument("--vae_path", required=True)
    ap.add_argument("--out", default="./serving_artifact")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--cond_scale", type=float, default=None)
    ap.add_argument("--rescaled_phi", type=float, default=0.7)
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="lowering platforms (default: current backend); "
                         "e.g. --platforms tpu cpu for a portable artifact")
    ap.add_argument("--selftest", action="store_true",
                    help="reload the artifact and check it matches the live "
                         "pipeline on one batch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqgan_tpu.models import KLVAE
    from vqgan_tpu.serving import export_cfg_sampler, load_cfg_sampler

    diffusion, params, config = load_model(args.checkpoint, args.milestone)
    vae, vae_params = load_vae(args.vae_path, config.latent_channels,
                               config.image_size)
    cond_scale = (config.cond_scale if args.cond_scale is None
                  else args.cond_scale)
    b = args.batch_size

    def pipeline(p, key, classes):
        latents = diffusion.sample(p["ldm"], key, classes=classes,
                                   cond_scale=cond_scale,
                                   rescaled_phi=args.rescaled_phi)
        return vae.apply(p["vae"], latents, method=KLVAE.decode_latents)

    key = jax.random.PRNGKey(0)
    classes = jnp.zeros((b,), jnp.int32)
    export_cfg_sampler(
        pipeline, {"ldm": params, "vae": vae_params}, (key, classes),
        args.out, platforms=args.platforms,
        config={"batch_size": b, "cond_scale": cond_scale,
                "rescaled_phi": args.rescaled_phi,
                "image_size": config.image_size,
                "num_users": config.num_users})
    print(f"exported serving artifact to {args.out} "
          f"(batch {b}, cond_scale {cond_scale})")

    if args.selftest:
        call = load_cfg_sampler(args.out)
        got = np.asarray(call(key, classes))
        want = np.asarray(jax.jit(pipeline)(
            {"ldm": params, "vae": vae_params}, key, classes))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        print(f"selftest OK: artifact == live pipeline, "
              f"output {got.shape} in [{got.min():.3f}, {got.max():.3f}]")


if __name__ == "__main__":
    main()
