#!/usr/bin/env python
"""Serving-host generation: produce images from an AOT artifact directory.

The deployment counterpart of generate.py — same output contract
(`ID_X/generated_###.jpg` at quality 95, reference generate.py:283-322) but
driven entirely from a serving artifact written by cli/export_serving.py:
a serialized StableHLO program + params.npz + meta.json. No model-building
code runs here; nothing from vqgan_tpu/models or vqgan_tpu/diffusion is
imported. This file plus jax + numpy + PIL is the complete serving host.

The artifact's program has a fixed batch size (meta.json "batch_size");
requests are tiled into full batches and the surplus images dropped, so any
--num_images works against any artifact.

Usage:
  python cli/serve_generate.py --artifact serving_artifact \
      --output_dir generated [--user_ids 1 2 3 | --all_users] \
      [--num_images 8] [--seed 42]
"""

import argparse
import json
from pathlib import Path

from _common import REPO  # noqa: E402  (sys.path + platform override only)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True,
                    help="serving directory from cli/export_serving.py")
    ap.add_argument("--output_dir", default="./generated")
    ap.add_argument("--user_ids", type=int, nargs="*", default=None,
                    help="1-based user ids; default all users (from meta)")
    ap.add_argument("--all_users", action="store_true")
    ap.add_argument("--num_images", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import numpy as np
    from PIL import Image

    from vqgan_tpu.serving import load_cfg_sampler

    meta = json.loads((Path(args.artifact) / "meta.json").read_text())
    cfg = meta.get("config", {})
    batch = int(cfg.get("batch_size") or meta["arg_shapes"][-1][0])
    num_users = int(cfg.get("num_users", 31))
    sample = load_cfg_sampler(args.artifact)

    if args.user_ids:
        users = args.user_ids
    else:
        users = list(range(1, num_users + 1))

    out_root = Path(args.output_dir)
    key = jax.random.PRNGKey(args.seed)
    for user in users:
        udir = out_root / f"ID_{user}"
        udir.mkdir(parents=True, exist_ok=True)
        # labels are 0-based inside the model (generate.py convention)
        classes = np.full((batch,), user - 1, np.int32)
        written = 0
        while written < args.num_images:
            key, sub = jax.random.split(key)
            imgs = np.asarray(sample(sub, classes))  # [B,H,W,3] in [0,1]
            take = min(batch, args.num_images - written)
            for i in range(take):
                arr = np.clip(imgs[i] * 255.0, 0, 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    udir / f"generated_{written + i:03d}.jpg", quality=95)
            written += take
        print(f"ID_{user}: {written} images -> {udir}")
    print(f"done: {len(users)} users x {args.num_images} images "
          f"(artifact batch {batch})")


if __name__ == "__main__":
    main()
