#!/usr/bin/env python
"""Microbenchmark: fused Pallas flash attention vs the XLA einsum reference,
forward and forward+backward, on the current default device.

Usage: python cli/bench_attention.py [--seq 1024 4096] [--dim 64] [--bf16]
"""

import argparse
import time

from _common import REPO  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--seq", type=int, nargs="+", default=[1024, 4096])
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqgan_tpu.ops.attention import flash_attention, sdpa_reference

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    print(f"device: {jax.devices()[0]}, dtype: {dtype.__name__}")

    for s in args.seq:
        shape = (args.batch, s, args.heads, args.dim)
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, shape, dtype)
        k = jax.random.normal(kk, shape, dtype)
        v = jax.random.normal(kv, shape, dtype)

        flops_fwd = 4 * args.batch * args.heads * s * s * args.dim

        for name, fn in (
            ("xla-einsum", jax.jit(sdpa_reference)),
            ("pallas-flash", jax.jit(flash_attention)),
        ):
            out = fn(q, k, v)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(q, k, v)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"S={s:5d} {name:>13} fwd: {dt * 1e3:8.2f} ms "
                  f"({flops_fwd / dt / 1e12:6.2f} TFLOP/s)")

        for name, base in (
            ("xla-einsum", sdpa_reference),
            ("pallas-flash", flash_attention),
        ):
            loss = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(base(q, k, v).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2)))
            g = loss(q, k, v)
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                g = loss(q, k, v)
            jax.block_until_ready(g)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"S={s:5d} {name:>13} fwd+bwd: {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
