#!/usr/bin/env python
"""Roofline attribution for the sampling paths (BASELINE configs #4/#5).

The VQ op got a full roofline treatment (ops/vq.py dispatch comment); this
gives the flagship samplers the same rigor. For each timed program it
reports, from XLA's own cost analysis of the compiled executable:

  flops            total FLOPs of the program
  bytes            total HBM bytes accessed (XLA "bytes accessed")
  t_measured       wall time per run
  t_mxu            FLOPs / chip bf16 peak      (compute roofline)
  t_hbm            bytes / HBM bandwidth       (memory roofline)
  bound            which roofline dominates and the achieved fraction

A program whose t_measured sits near max(t_mxu, t_hbm) is at its roofline:
the remaining "missing MFU" is not recoverable by scheduling — it is the
shape of the model (arithmetic intensity), and samples/s is the right
metric. A large gap to BOTH bounds means overhead (dispatch, layout
conversion, pipeline fill) worth hunting.

Decomposition: the DDIM pipeline is also split into its scan (150 U-Net
steps) and the VAE decode so the attribution is per-phase, and one single
U-Net forward is timed standalone to expose per-step scan overhead.

Writes results/sampling_roofline.json and optionally a jax.profiler trace.

Usage: python cli/profile_sampling.py [--trace] [--out FILE]
"""

import argparse
import json
import time
from pathlib import Path

from _common import REPO  # noqa: E402

# v5e HBM bandwidth, bytes/s (public spec: 819 GB/s)
HBM_BW = 819e9


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return (float(ca.get("flops", 0.0) or 0.0),
                float(ca.get("bytes accessed", 0.0) or 0.0))
    except Exception:
        return 0.0, 0.0


def profile(name, fn, args, n_items, iters=3):
    """Compile, time, and roofline-attribute one jitted program."""
    import jax

    from vqgan_tpu.utils.flops import peak_tflops

    jitted = jax.jit(fn)
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    flops, bytes_ = _cost(compiled)

    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    peak = (peak_tflops() or 197.0) * 1e12
    t_mxu = flops / peak if flops else None
    t_hbm = bytes_ / HBM_BW if bytes_ else None
    rec = {
        "program": name,
        "t_measured_ms": round(dt * 1e3, 3),
        "items_per_sec": round(n_items / dt, 2),
        "flops": flops, "bytes": bytes_,
        "t_mxu_ms": round(t_mxu * 1e3, 5) if t_mxu else None,
        "t_hbm_ms": round(t_hbm * 1e3, 5) if t_hbm else None,
        "mfu": round(flops / dt / peak, 4) if flops else None,
        "hbm_util": round(bytes_ / dt / HBM_BW, 4) if bytes_ else None,
    }
    if t_mxu and t_hbm:
        bound = "mxu" if t_mxu >= t_hbm else "hbm"
        t_bound = max(t_mxu, t_hbm)
        rec["bound"] = bound
        rec["roofline_fraction"] = round(t_bound / dt, 4)
        rec["arith_intensity_flops_per_byte"] = round(flops / bytes_, 2)
    print(json.dumps(rec))
    return rec


def build_cfg4(steps=150, batch=16, cond_scale=1.0):
    import jax
    import jax.numpy as jnp

    from vqgan_tpu.configs import LDMConfig
    from vqgan_tpu.models import KLVAE
    from vqgan_tpu.models.autoencoder import AutoencoderConfig
    from vqgan_tpu.training.ldm_trainer import build_cfg_unet_diffusion

    cfg = LDMConfig(sampling_timesteps=steps)
    model, diffusion = build_cfg_unet_diffusion(cfg)
    b = batch
    x0 = jnp.zeros((b, cfg.latent_size, cfg.latent_size, cfg.latent_channels))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32), cond_drop_mask=jnp.zeros((b,), bool))
    classes = (jnp.arange(b) % cfg.num_users).astype(jnp.int32)
    vae = KLVAE(config=AutoencoderConfig(resolution=cfg.image_size,
                                         z_channels=cfg.latent_channels),
                dtype=jnp.bfloat16)
    vae_params = vae.init(
        {"params": jax.random.PRNGKey(1), "gaussian": jax.random.PRNGKey(2)},
        jnp.zeros((2, cfg.image_size, cfg.image_size, 3)))
    return cfg, model, diffusion, vae, params, vae_params, classes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--cond_scale", type=float, default=1.0)
    ap.add_argument("--trace", action="store_true",
                    help="also capture a jax.profiler trace of the pipeline")
    ap.add_argument("--out",
                    default=str(REPO / "results" / "sampling_roofline.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

    (cfg, model, diffusion, vae, params, vae_params,
     classes) = build_cfg4(args.steps, args.batch, args.cond_scale)
    b = args.batch
    key = jax.random.PRNGKey(3)
    records = []

    # --- config #4 decomposition ---------------------------------------
    def full_pipeline(p, vp, key, classes):
        from vqgan_tpu.models import KLVAE

        latents = diffusion.sample(p, key, classes=classes,
                                   cond_scale=args.cond_scale,
                                   rescaled_phi=cfg.rescaled_phi)
        return vae.apply(vp, latents, method=KLVAE.decode_latents)

    def scan_only(p, key, classes):
        return diffusion.sample(p, key, classes=classes,
                                cond_scale=args.cond_scale,
                                rescaled_phi=cfg.rescaled_phi)

    def decode_only(vp, latents):
        from vqgan_tpu.models import KLVAE

        return vae.apply(vp, latents, method=KLVAE.decode_latents)

    def unet_once(p, x, t, classes):
        return diffusion.model_apply(p, x, t, classes,
                                     cond_drop_mask=jnp.zeros((b,), bool))

    latents0 = jnp.zeros(
        (b, cfg.latent_size, cfg.latent_size, cfg.latent_channels))
    t0 = jnp.full((b,), 500, jnp.int32)

    records.append(profile(
        f"cfg4 full pipeline (DDIM-{args.steps} + VAE decode, "
        f"b{b}, cond_scale={args.cond_scale})",
        full_pipeline, (params, vae_params, key, classes), b))
    records.append(profile(
        f"cfg4 DDIM-{args.steps} scan only", scan_only,
        (params, key, classes), b))
    records.append(profile(
        "cfg4 VAE decode only", decode_only, (vae_params, latents0), b))
    records.append(profile(
        "cfg4 single U-Net forward", unet_once,
        (params, latents0, t0, classes), b))

    # per-step scan overhead: scan time vs steps x single forward
    scan_ms = records[1]["t_measured_ms"]
    fwd_ms = records[3]["t_measured_ms"]
    nfe = args.steps * (2 if args.cond_scale != 1.0 else 1)
    records.append({
        "program": "cfg4 scan overhead analysis",
        "scan_ms": scan_ms, "single_fwd_ms": fwd_ms, "nfe": nfe,
        "nfe_x_fwd_ms": round(nfe * fwd_ms, 3),
        "scan_overhead_pct": round(
            100 * (scan_ms - nfe * fwd_ms) / scan_ms, 2),
    })
    print(json.dumps(records[-1]))

    # --- config #5 (EDM Heun, Karras MP U-Net) -------------------------
    from vqgan_tpu.diffusion import ElucidatedDiffusion
    from vqgan_tpu.models.karras_unet import (
        KarrasUnet, normalize_karras_params)

    kmodel = KarrasUnet(
        image_size=64, dim=64, dim_max=256, num_classes=31, channels=3,
        num_downsamples=2, num_blocks_per_stage=2, attn_res=(16, 8),
        dtype=jnp.bfloat16, normalize_forward=False)
    kclasses = (jnp.arange(b) % 31).astype(jnp.int32)
    kparams = normalize_karras_params(kmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((b, 64, 64, 3)), jnp.zeros((b,)),
        class_labels=kclasses))

    def knet(p, x, t_noise, self_cond=None):
        return kmodel.apply(p, x, t_noise, class_labels=kclasses)

    ed = ElucidatedDiffusion(knet, image_size=64, channels=3,
                             num_sample_steps=32)
    records.append(profile(
        f"cfg5 EDM Heun-32 (KarrasUnet dim=64 @64px, b{b})",
        lambda p, k: ed.sample(p, k, batch_size=b),
        (kparams, jax.random.PRNGKey(1)), b))
    records.append(profile(
        "cfg5 single Karras U-Net forward",
        lambda p, x, t: kmodel.apply(p, x, t, class_labels=kclasses),
        (kparams, jnp.zeros((b, 64, 64, 3)), jnp.ones((b,))), b))

    if args.trace:
        trace_dir = REPO / "results" / "profiler_trace"
        with jax.profiler.trace(str(trace_dir)):
            out = jax.jit(full_pipeline)(params, vae_params, key, classes)
            jax.block_until_ready(out)
        print(f"trace written to {trace_dir}")

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(records, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
