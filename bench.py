"""Benchmark: stage-1 VQ-GAN training images/sec/chip (BASELINE config #2 —
128×128, codebook 8192, LPIPS + PatchGAN, two-optimizer fused step).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline = TPU images/sec divided by the same step measured on one CPU
host (the driver's "≥10× CPU-baseline" target). The CPU number is measured
once in a subprocess (JAX_PLATFORMS must be pinned in-process — the
environment re-pins axon at interpreter startup) and cached in
.bench_cache.json.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent
sys.path.insert(0, str(REPO))

# persistent XLA compilation cache: first-run remote compiles of the big
# stage-1 graphs take minutes through the TPU tunnel; cached reruns are fast
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BATCH = 8
IMAGE_SIZE = 128
CODEBOOK = 8192
EMBED_DIM = 256
TIMED_STEPS = 10
CACHE = REPO / ".bench_cache.json"


def build_step(dtype_str: str = "bfloat16"):
    """Split G / D programs measuring the same per-step work as the fused
    trainer step. This environment's TPU compiler takes hour-scale on the
    fused G+D backward graph even at reduced optimization effort; two
    smaller programs compile in minutes and dispatch back-to-back."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from vqgan_tpu.losses.gan import discriminator_loss, generator_loss
    from vqgan_tpu.models import VQVAE
    from vqgan_tpu.models.discriminator import PatchGANDiscriminator
    from vqgan_tpu.models.lpips import LPIPS, perceptual_loss_fn
    from vqgan_tpu.training import make_gan_optimizers

    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32

    vqvae = VQVAE(ch=128, ch_mult=(1, 2, 2, 4), num_res_blocks=2,
                  resolution=IMAGE_SIZE, z_channels=256,
                  num_embeddings=CODEBOOK, embedding_dim=EMBED_DIM,
                  dtype=dtype)
    disc = PatchGANDiscriminator(ndf=64, n_layers=3, norm="batch",
                                 dtype=dtype)
    lpips = LPIPS(dtype=dtype)

    x = jnp.zeros((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3))
    vq_params = vqvae.init(jax.random.PRNGKey(0), x)
    disc_vars = disc.init(jax.random.PRNGKey(1), x)
    lpips_params = lpips.init(jax.random.PRNGKey(2), x, x)
    disc_params = {"params": disc_vars["params"]}
    disc_stats = {"batch_stats": disc_vars["batch_stats"]}
    perceptual_fn = perceptual_loss_fn(lpips_params, lpips)

    opt_g, opt_d = make_gan_optimizers()
    # default-effort compile is fast for the split G/D programs (the hour-
    # scale pathology was the fused step with the embedded Pallas VQ call)
    # and yields 2.15x better step time than effort -1 (222.6 vs 103.5
    # img/s measured)
    fast = os.environ.get("BENCH_FAST_COMPILE", "0") == "1"
    options = {"exec_time_optimization_effort": -1.0} if fast else None

    def g_step(vq_params, opt_g_state, disc_params, disc_stats, images):
        def loss_fn(p):
            recon, loss_dict, _ = vqvae.apply(p, images)
            logits_fake = disc.apply({**disc_params, **disc_stats}, recon,
                                     train=False)
            total, log = generator_loss(
                images, recon, logits_fake, disc_active=True,
                disc_weight=0.1, perceptual_fn=perceptual_fn)
            return total + loss_dict["vq_loss"], (recon, log)

        (loss, (recon, log)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(vq_params)
        updates, opt_g_state = opt_g.update(grads, opt_g_state, vq_params)
        return (optax.apply_updates(vq_params, updates), opt_g_state,
                jax.lax.stop_gradient(recon), loss)

    def d_step(disc_params, disc_stats, opt_d_state, images, recon):
        def loss_fn(p):
            lr_, stats = disc.apply({**p, **disc_stats}, images, train=True,
                                    mutable=["batch_stats"])
            lf_, stats = disc.apply({**p, **stats}, recon, train=True,
                                    mutable=["batch_stats"])
            d_loss, _ = discriminator_loss(lr_, lf_, disc_active=True)
            return d_loss, stats

        (d_loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(disc_params)
        updates, opt_d_state = opt_d.update(grads, opt_d_state, disc_params)
        return (optax.apply_updates(disc_params, updates),
                {"batch_stats": stats["batch_stats"]}, opt_d_state, d_loss)

    g_jit = jax.jit(g_step, compiler_options=options)
    d_jit = jax.jit(d_step, compiler_options=options)

    state = dict(
        vq_params=vq_params, disc_params=disc_params, disc_stats=disc_stats,
        opt_g=opt_g.init(vq_params), opt_d=opt_d.init(disc_params))
    images = jax.random.uniform(
        jax.random.PRNGKey(3), (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3))

    def step_fn(state, images):
        vq_params, opt_g_state, recon, g_loss = g_jit(
            state["vq_params"], state["opt_g"], state["disc_params"],
            state["disc_stats"], images)
        disc_params, disc_stats, opt_d_state, d_loss = d_jit(
            state["disc_params"], state["disc_stats"], opt_d_state_in :=
            state["opt_d"], images, recon)
        new_state = dict(vq_params=vq_params, disc_params=disc_params,
                         disc_stats=disc_stats, opt_g=opt_g_state,
                         opt_d=opt_d_state)
        return new_state, {"loss_total": g_loss, "d_loss": d_loss}

    return step_fn, state, images


def measure(timed_steps: int = TIMED_STEPS, warmup: int = 3) -> float:
    import jax

    step_fn, state, images = build_step()
    for _ in range(warmup):
        state, log = step_fn(state, images)
    jax.block_until_ready(log["loss_total"])

    t0 = time.perf_counter()
    for _ in range(timed_steps):
        state, log = step_fn(state, images)
    jax.block_until_ready(log["loss_total"])
    dt = time.perf_counter() - t0
    return timed_steps * BATCH / dt


def cpu_baseline() -> float:
    env = os.environ.get("BENCH_CPU_IPS")
    if env:
        try:
            return float(env)
        except ValueError:
            return float("nan")  # e.g. BENCH_CPU_IPS=skip
    if CACHE.exists():
        try:
            return json.loads(CACHE.read_text())["cpu_ips"]
        except Exception:
            pass
    # NOTE: this environment pins the axon TPU backend at interpreter start;
    # selecting CPU requires the live-config switch, not env vars.
    code = (
        "import jax;"
        "jax.config.update('jax_platforms', 'cpu');"
        "from jax._src import xla_bridge; xla_bridge._clear_backends();"
        f"import sys; sys.path.insert(0, {str(REPO)!r});"
        "from bench import measure; import json;"
        "print('CPU_IPS=' + json.dumps(measure(timed_steps=2, warmup=1)))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=3600,
        )
        for line in out.stdout.splitlines():
            if line.startswith("CPU_IPS="):
                ips = float(line.split("=", 1)[1])
                CACHE.write_text(json.dumps({"cpu_ips": ips}))
                return ips
        print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
    except subprocess.TimeoutExpired:
        print("CPU baseline timed out", file=sys.stderr)
    return float("nan")


def main():
    ips = measure()
    cpu_ips = cpu_baseline()
    vs = ips / cpu_ips if cpu_ips == cpu_ips and cpu_ips > 0 else None
    print(json.dumps({
        "metric": "stage1 VQ-GAN train throughput "
                  f"({IMAGE_SIZE}px, codebook {CODEBOOK}, LPIPS+PatchGAN)",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
