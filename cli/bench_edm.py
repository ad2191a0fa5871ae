#!/usr/bin/env python
"""Benchmark: Elucidated (EDM) sampling with the Karras MP U-Net
(BASELINE config #5 — Heun 2nd-order sampler, 32 steps, and DPM++(2M)).

Prints one JSON line with Heun-sampler throughput.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--num_sample_steps", type=int, default=32)
    ap.add_argument("--num_classes", type=int, default=31)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sampler", choices=("both", "heun", "dpmpp"),
                    default="both",
                    help="which sampler(s) to compile and time — dpmpp-only "
                         "skips the Heun compile (expensive at big batches; "
                         "its 2-NFE carry hits a memory cliff past b64)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from vqgan_tpu.diffusion import ElucidatedDiffusion
    from vqgan_tpu.models.karras_unet import KarrasUnet

    model = KarrasUnet(
        image_size=args.image_size, dim=args.dim, dim_max=args.dim * 4,
        num_classes=args.num_classes, channels=3, num_downsamples=2,
        num_blocks_per_stage=2, attn_res=(16, 8), dtype=jnp.bfloat16)

    b = args.batch
    x0 = jnp.zeros((b, args.image_size, args.image_size, 3))
    classes = (jnp.arange(b) % args.num_classes).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((b,)),
                        class_labels=classes)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"KarrasUnet parameters: {n_params / 1e6:.1f}M", file=sys.stderr)

    def net_apply(p, x, t_noise, self_cond=None):
        return model.apply(p, x, t_noise, class_labels=classes)

    ed = ElucidatedDiffusion(
        net_apply, image_size=args.image_size, channels=3,
        num_sample_steps=args.num_sample_steps)

    sps = None
    if args.sampler in ("both", "heun"):
        heun = jax.jit(lambda p, k: ed.sample(p, k, batch_size=b))
        t0 = time.time()
        out = heun(params, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        print(f"heun compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

        t0 = time.perf_counter()
        for i in range(args.iters):
            out = heun(params, jax.random.fold_in(jax.random.PRNGKey(2), i))
        # true sync: fetch a scalar derived from the result
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / args.iters
        sps = b / dt

    if args.sampler in ("both", "dpmpp"):
        dpmpp = jax.jit(lambda p, k: ed.sample_using_dpmpp(p, k,
                                                           batch_size=b))
        t0 = time.time()
        out2 = dpmpp(params, jax.random.PRNGKey(3))
        jax.block_until_ready(out2)
        print(f"dpmpp compile+first: {time.time() - t0:.1f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out2 = dpmpp(params, jax.random.fold_in(jax.random.PRNGKey(4), i))
        float(jnp.sum(out2))
        dt2 = (time.perf_counter() - t0) / args.iters
        print(f"dpmpp(2m): {b / dt2:.2f} samples/sec", file=sys.stderr)
        if sps is None:
            sps = b / dt2

    name = ("Heun" if args.sampler != "dpmpp" else "DPM++(2M)")
    print(json.dumps({
        "metric": f"EDM {name}-{args.num_sample_steps} sampling, KarrasUnet "
                  f"dim={args.dim} @ {args.image_size}px b{b}",
        "value": round(sps, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
