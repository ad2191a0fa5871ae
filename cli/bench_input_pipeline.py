#!/usr/bin/env python
"""Input-pipeline microbench: Python BatchLoader (PIL) vs the native C++
async pipeline (native/image_decoder.cpp pipeline_*).

Generates a synthetic JPEG folder, then measures steady-state batches/sec
for (a) the PIL-decoding BatchLoader, (b) the BatchLoader over the native
get_batch fast path, and (c) NativeBatchLoader (async C++ ring). A
consumer-side sleep simulates the accelerator step so the async pipeline's
decode/compute overlap shows up (pass --step_ms 0 for raw decode rate).

Prints one JSON line per config.
"""

import argparse
import json
import tempfile
import time
from pathlib import Path

from _common import REPO  # noqa: E402


def make_dataset(root: Path, n: int, size: int):
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    (root / "ID_1").mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        p = root / "ID_1" / f"img{i:03d}.jpg"
        Image.fromarray(arr).save(p, quality=92)
        names.append(p.name)
    return {"users": {"ID_1": {"train_images": names, "test_images": []}}}


def run(loader, n_batches: int, step_ms: float, warmup: int = 3):
    it = iter(loader)
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
        if step_ms:
            time.sleep(step_ms / 1e3)
    return n_batches / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=96)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--decode_size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_batches", type=int, default=30)
    ap.add_argument("--step_ms", type=float, default=20.0,
                    help="simulated accelerator step per batch")
    ap.add_argument("--threads", type=int, default=2)
    args = ap.parse_args()

    from vqgan_tpu.data.datasets import BatchLoader, ImageFolderDataset
    from vqgan_tpu.data.native_image import (NativeBatchLoader,
                                             load_decoder_lib)

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        split = make_dataset(root, args.n_images, args.image_size)
        ds = ImageFolderDataset(root, split, "train",
                                image_size=args.decode_size)

        results = {}

        # (a) PIL __getitem__ path (bypass the native get_batch fast path)
        class PILOnly:
            image_size = ds.image_size
            imagenet_norm = False

            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                return ds[i]

        results["pil_batchloader"] = run(
            BatchLoader(PILOnly(), args.batch, repeat=True, seed=0),
            args.n_batches, args.step_ms)

        if load_decoder_lib() is not None:
            # (b) native decode through the synchronous get_batch fast path
            results["native_get_batch"] = run(
                BatchLoader(ds, args.batch, repeat=True, seed=0),
                args.n_batches, args.step_ms)
            # (c) async C++ ring pipeline
            loader = NativeBatchLoader(ds, args.batch, seed=0,
                                       n_threads=args.threads)
            if loader.available:
                results["native_async_pipeline"] = run(
                    loader, args.n_batches, args.step_ms)
                loader.close()

        base = results["pil_batchloader"]
        for name, bps in results.items():
            print(json.dumps({
                "metric": f"input pipeline {name} "
                          f"({args.decode_size}px b{args.batch}, "
                          f"step {args.step_ms:.0f}ms)",
                "value": round(bps, 2), "unit": "batches/sec",
                "vs_baseline": round(bps / base, 2)}))


if __name__ == "__main__":
    main()
