#!/usr/bin/env python
"""Microbenchmark: fused Pallas VQ lookup vs the XLA dist+argmin+gather path.

The fused kernel's advantage is the single HBM pass (the [N, K] distance
matrix never materializes — XLA round-trips it through HBM, 536 MB at
N=K=8192); the XLA path wins on compile time when embedded in big training
graphs (see the dispatch comment in ops/vq.py for the measured roofline of
both). This tool measures the raw-op runtime trade on the current device
across codebook sizes.

Usage: python cli/bench_vq.py [--n 8192] [--k 1024 8192 16384] [--d 256]
"""

import argparse
import time

from _common import REPO  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192,
                    help="flattened spatial positions (B*H*W)")
    ap.add_argument("--k", type=int, nargs="+",
                    default=[1024, 8192, 16384])
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqgan_tpu.ops.vq import vq_lookup

    print(f"device: {jax.devices()[0]}, N={args.n}, D={args.d}")
    key = jax.random.PRNGKey(0)

    for k in args.k:
        kz, ke = jax.random.split(jax.random.fold_in(key, k))
        z = jax.random.normal(kz, (args.n, args.d))
        cb = jax.random.normal(ke, (k, args.d)) * 0.1

        for name, use_kernel in (("xla", False), ("pallas", True)):
            iters = args.iters

            # chain iterations inside one jitted loop with a data dependency
            # so nothing is hoisted or pipelined away
            def loop(z, cb, uk=use_kernel):
                def body(i, carry):
                    zc, acc = carry
                    zq, idx, usage = vq_lookup(zc, cb, uk, False)
                    return (zc + zq * 1e-20, acc + zq[0, 0])

                return jax.lax.fori_loop(0, iters, body, (z, 0.0))[1]

            fn = jax.jit(loop)
            float(fn(z, cb))  # compile + true sync (scalar fetch)
            t0 = time.perf_counter()
            float(fn(z, cb))
            dt = (time.perf_counter() - t0) / iters
            gb = (args.n * args.d * 2 + k * args.d) * 4 / 1e9
            print(f"K={k:6d} {name:>7}: {dt * 1e6:9.1f} us "
                  f"({gb / dt:6.1f} GB/s effective)")


if __name__ == "__main__":
    main()
