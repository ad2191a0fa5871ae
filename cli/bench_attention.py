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

        iters = args.iters

        def chained(base):
            # iterations chained inside one jitted loop (data dependency on
            # q) so timings reflect real per-call latency
            def loop(q, k, v):
                def body(i, carry):
                    qc, acc = carry
                    out = base(qc, k, v)
                    return (qc + out * 1e-3, acc + out[0, 0, 0, 0])

                return jax.lax.fori_loop(0, iters, body, (q, 0.0))[1]

            return jax.jit(loop)

        for name, base in (
            ("xla-einsum", sdpa_reference),
            ("pallas-flash", flash_attention),
        ):
            fn = chained(base)
            jax.block_until_ready(fn(q, k, v))
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q, k, v))
            dt = (time.perf_counter() - t0) / iters
            print(f"S={s:5d} {name:>13} fwd: {dt * 1e3:8.2f} ms "
                  f"({flops_fwd / dt / 1e12:6.2f} TFLOP/s)")

        def chained_grad(base):
            g1 = jax.grad(
                lambda q, k, v: jnp.sum(
                    base(q, k, v).astype(jnp.float32) ** 2))

            def loop(q, k, v):
                def body(i, carry):
                    qc, acc = carry
                    dq = g1(qc, k, v)
                    return (qc + dq * 1e-6, acc + dq[0, 0, 0, 0])

                return jax.lax.fori_loop(0, iters, body, (q, 0.0))[1]

            return jax.jit(loop)

        for name, base in (
            ("xla-einsum", sdpa_reference),
            ("pallas-flash", flash_attention),
        ):
            fn = chained_grad(base)
            jax.block_until_ready(fn(q, k, v))
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q, k, v))
            dt = (time.perf_counter() - t0) / iters
            print(f"S={s:5d} {name:>13} fwd+bwd: {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
