#!/usr/bin/env python
"""Microbenchmark: native C++ JPEG batch decoder vs the PIL path.

Writes synthetic JPEGs once, then times batch assembly through both paths
(identical Resize+CenterCrop+[0,1] semantics, tests/test_native_image.py).

Usage: python cli/bench_decode.py [--n 256] [--src 256] [--size 128]
"""

import argparse
import tempfile
import time
from pathlib import Path

import numpy as np

from _common import REPO  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--src", type=int, default=256, help="stored JPEG size")
    ap.add_argument("--size", type=int, default=128, help="target size")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from PIL import Image

    from vqgan_tpu.data.datasets import load_image
    from vqgan_tpu.data.native_image import decode_jpeg_batch

    rng = np.random.default_rng(0)
    tmp = Path(tempfile.mkdtemp(prefix="bench_decode_"))
    paths = []
    for i in range(args.n):
        arr = rng.integers(0, 255, (args.src, args.src, 3), dtype=np.uint8)
        p = tmp / f"{i:04d}.jpg"
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)

    def timeit(fn):
        fn()  # warm page cache / lib build
        t0 = time.perf_counter()
        for _ in range(args.iters):
            fn()
        return (time.perf_counter() - t0) / args.iters

    dt_pil = timeit(lambda: np.stack(
        [load_image(p, args.size) for p in paths]))
    out = decode_jpeg_batch(paths, args.size, args.threads)
    assert out is not None, "native decoder unavailable"
    dt_nat = timeit(
        lambda: decode_jpeg_batch(paths, args.size, args.threads))

    print(f"PIL per-item:      {args.n / dt_pil:8.1f} img/s")
    print(f"native (x{args.threads} thr): {args.n / dt_nat:8.1f} img/s "
          f"({dt_pil / dt_nat:.2f}x)")


if __name__ == "__main__":
    main()
