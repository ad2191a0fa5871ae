#!/usr/bin/env python
"""One-time CPU anchors for the sampling benchmarks (BASELINE configs #4/#5).

Measures the identical compiled pipelines bench.py times on TPU — the CFG
DDIM-150 + KL-VAE-decode chain and the EDM Heun-32 chain — on this host's
single CPU core at batch 1, and writes `results/cpu_sampling_baseline.json`.
bench.py reads that artifact to fill `vs_baseline` for configs #4/#5 (the
driver's ≥10×-CPU target, BASELINE.md). Batch 1 is deliberate: it is the
CPU-friendliest batching (no cache pressure), so the reported ratio is a
floor on the true speedup.

The axon TPU backend is pinned at interpreter start in this environment;
CPU selection needs the live-config switch (see bench.py cpu_baseline).
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge  # noqa: E402

xla_bridge._clear_backends()


def cfg_sampling_sps(batch: int = 1, steps: int = 150) -> float:
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

    @jax.jit
    def pipeline(p, vp, key, classes):
        latents = diffusion.sample(p, key, classes=classes, cond_scale=1.0,
                                   rescaled_phi=cfg.rescaled_phi)
        return vae.apply(vp, latents, method=KLVAE.decode_latents)

    key = jax.random.PRNGKey(3)
    jax.block_until_ready(pipeline(params, vae_params, key, classes))
    t0 = time.perf_counter()
    jax.block_until_ready(
        pipeline(params, vae_params, jax.random.fold_in(key, 1), classes))
    return b / (time.perf_counter() - t0)


def edm_sps(batch: int = 1, image_size: int = 64, dim: int = 64,
            num_sample_steps: int = 32, sampler: str = "heun") -> float:
    import jax.numpy as jnp

    from vqgan_tpu.diffusion import ElucidatedDiffusion
    from vqgan_tpu.models.karras_unet import (KarrasUnet,
                                              normalize_karras_params)

    net = KarrasUnet(
        image_size=image_size, dim=dim, dim_max=dim * 4, num_classes=31,
        channels=3, num_downsamples=2, num_blocks_per_stage=2,
        attn_res=(16, 8), dtype=jnp.bfloat16, normalize_forward=False)
    b = batch
    classes = (jnp.arange(b) % 31).astype(jnp.int32)
    params = normalize_karras_params(net.init(
        jax.random.PRNGKey(0), jnp.zeros((b, image_size, image_size, 3)),
        jnp.zeros((b,)), class_labels=classes))

    def model_apply(p, x, t_noise, self_cond=None):
        return net.apply(p, x, t_noise, class_labels=classes)

    ed = ElucidatedDiffusion(model_apply, image_size=image_size, channels=3,
                             num_sample_steps=num_sample_steps)
    sample_fn = ed.sample if sampler == "heun" else ed.sample_using_dpmpp
    run = jax.jit(lambda p, k: sample_fn(p, k, batch_size=b))
    jax.block_until_ready(run(params, jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    jax.block_until_ready(run(params, jax.random.PRNGKey(2)))
    return b / (time.perf_counter() - t0)


# anchor key -> measurement (all batch-1, single CPU core); bench.py's
# sampling_cpu_anchor() reads these keys to fill vs_baseline for the
# config #4 / #5 / #5b metric lines
MEASUREMENTS = {
    "cfg4_sps": lambda: cfg_sampling_sps(),
    "cfg5_sps": lambda: edm_sps(sampler="heun"),
    # 5b (DPM++(2M)-32, reference elucidated_diffusion.py:202-237): CPU
    # anchor for bench.py's throughput-mode serving point
    "cfg5_dpmpp_sps": lambda: edm_sps(sampler="dpmpp"),
}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    choices=sorted(MEASUREMENTS),
                    help="measure just these keys, merging into the "
                         "existing artifact (default: any missing keys; "
                         "use --force for all)")
    ap.add_argument("--force", action="store_true",
                    help="re-measure even keys already present")
    args = ap.parse_args()

    out = REPO / "results" / "cpu_sampling_baseline.json"
    data = json.loads(out.read_text()) if out.exists() else {}
    selected = args.only or list(MEASUREMENTS)
    for key in selected:
        if key in data and not args.force and not args.only:
            print(f"{key}: {data[key]} (kept; --force to re-measure)",
                  flush=True)
            continue
        sps = MEASUREMENTS[key]()
        print(f"{key}: {sps:.5f} samples/sec", flush=True)
        data[key] = round(sps, 6)
    data.update({
        "what": "single-CPU-core samples/sec of the identical jitted "
                "sampling pipelines bench.py times on TPU (batch 1 — the "
                "CPU-friendliest batching, so TPU/CPU ratios are floors)",
        "remeasure": "python cli/measure_cpu_sampling.py (~10 min on this "
                     "1-core host)",
    })
    out.write_text(json.dumps(data, indent=2) + "\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
