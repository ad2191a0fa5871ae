#!/usr/bin/env python
"""One-time export of pretrained torch weights to .npz for the flax modules.

This environment has no network egress, so pretrained VGG16 (LPIPS) and
InceptionV3 (FID) weights can't be downloaded here — but a user of the
reference stack already has them on disk (the `lpips` and `pytorch-fid`
wheels cache them). This tool converts those torch checkpoints into plain
.npz archives that vqgan_tpu loads without torch at runtime:

  python cli/export_torch_weights.py lpips \
      --vgg16 ~/.cache/torch/hub/checkpoints/vgg16-397923af.pth \
      --lpips ~/.../lpips/weights/v0.1/vgg.pth --out lpips_weights.npz

  python cli/export_torch_weights.py inception \
      --weights ~/.cache/torch/hub/checkpoints/pt_inception-2015-12-05.pth \
      --out inception_weights.npz

  python cli/export_torch_weights.py klvae \
      --weights kl_vae_best.pt --out kl_vae_params  # Orbax dir
"""

import argparse
from pathlib import Path

import numpy as np

from _common import REPO  # noqa: E402


def _load(path):
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    for key in ("state_dict", "model_state_dict"):
        if isinstance(state, dict) and key in state:
            state = state[key]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in state.items()}


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("lpips")
    p1.add_argument("--vgg16", required=True)
    p1.add_argument("--lpips", required=True)
    p1.add_argument("--out", default="lpips_weights.npz")

    p2 = sub.add_parser("inception")
    p2.add_argument("--weights", required=True)
    p2.add_argument("--out", default="inception_weights.npz")

    p3 = sub.add_parser("klvae")
    p3.add_argument("--weights", required=True)
    p3.add_argument("--out", default="kl_vae_params")

    args = ap.parse_args()

    if args.cmd == "lpips":
        vgg = _load(args.vgg16)
        lin = _load(args.lpips)
        merged = {f"vgg.{k}": v for k, v in vgg.items()}
        merged.update({f"lin.{k}": v for k, v in lin.items()})
        np.savez(args.out, **merged)
        print(f"wrote {args.out} ({len(merged)} tensors)")
    elif args.cmd == "inception":
        state = _load(args.weights)
        np.savez(args.out, **state)
        print(f"wrote {args.out} ({len(state)} tensors)")
    else:  # klvae → Orbax params dir usable by cli/_common.load_vae
        import orbax.checkpoint as ocp

        from vqgan_tpu.checkpoint.torch_import import load_torch_klvae

        params = load_torch_klvae(args.weights)
        out = Path(args.out).absolute()
        ocp.StandardCheckpointer().save(out, params)
        print(f"wrote Orbax params to {out}")


if __name__ == "__main__":
    main()
