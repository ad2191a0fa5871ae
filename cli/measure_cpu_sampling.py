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
            num_sample_steps: int = 32) -> float:
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
    heun = jax.jit(lambda p, k: ed.sample(p, k, batch_size=b))
    jax.block_until_ready(heun(params, jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    jax.block_until_ready(heun(params, jax.random.PRNGKey(2)))
    return b / (time.perf_counter() - t0)


def main():
    out = REPO / "results" / "cpu_sampling_baseline.json"
    cfg4 = cfg_sampling_sps()
    print(f"config #4 CPU: {cfg4:.5f} samples/sec", flush=True)
    cfg5 = edm_sps()
    print(f"config #5 CPU: {cfg5:.5f} samples/sec", flush=True)
    out.write_text(json.dumps({
        "cfg4_sps": round(cfg4, 6),
        "cfg5_sps": round(cfg5, 6),
        "what": "single-CPU-core samples/sec of the identical jitted "
                "sampling pipelines bench.py times on TPU (batch 1 — the "
                "CPU-friendliest batching, so TPU/CPU ratios are floors)",
        "remeasure": "python cli/measure_cpu_sampling.py (~10 min on this "
                     "1-core host)",
    }, indent=2) + "\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
