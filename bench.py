"""Benchmarks on production code paths, with FLOP/MFU accounting.

Headline (BASELINE config #2): stage-1 VQ-GAN training images/sec/chip —
128×128, codebook 8192, LPIPS + PatchGAN — timed through
`VQGANTrainer.dispatch_step`, i.e. the EXACT programs the trainer runs
(split G/D steps, training/vqgan_step.py), not a bench-only rebuild.

Also measured (unless BENCH_SKIP_EXTRAS=1):
  config #4 — CFG latent-diffusion DDIM-150 sampling + KL-VAE decode @256px
  config #5 — EDM stochastic-Heun-32 sampling with the Karras MP U-Net @64px

Each metric prints one JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "flops_per_step": F, "tflops_per_sec": T, "mfu": M}
with FLOPs taken from XLA's cost analysis of the timed executable and MFU
relative to the chip's bf16 peak (197 TFLOP/s on TPU v5e). The headline
line prints LAST (the driver parses the final JSON line).

vs_baseline = TPU images/sec divided by the same step measured on one CPU
host (the driver's "≥10× CPU-baseline" target), cached in .bench_cache.json.

Capture hardening (round 2 lost its official number to a flaky extra +
driver timeout — rc=124, parsed=null):
  1. the TPU backend is verified up front in a bounded-retry subprocess;
     on persistent failure the last-known-good headline is emitted instead
     of crashing;
  2. the headline is measured FIRST and printed immediately, then cached
     (.bench_cache.json + committed results/bench_headline.json);
  3. each extra runs in its OWN subprocess under a hard timeout
     (BENCH_EXTRA_TIMEOUT_S, default 420 s) — a hung or crashed extra
     cannot take the run down — and the headline line is RE-printed after
     every extra so the final JSON line is the headline at any kill point;
  4. a wall-clock alarm (BENCH_BUDGET_S, default 3000 s) prints the
     best-known headline and exits 0 if anything runs long;
  5. a cold .jax_cache with no cached headline degrades the headline to
     fast-compile (exec_time_optimization_effort=-1, marked
     "fast_compile": true in the JSON) so SOME number always lands within
     budget.
Fault-injection coverage: tests/test_bench_harness.py (BENCH_FAKE knobs).
"""

import json
import os
import signal
import subprocess
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).parent
sys.path.insert(0, str(REPO))

JAX_CACHE = REPO / ".jax_cache"

# persistent XLA compilation cache: first-run remote compiles of the big
# stage-1 graphs take minutes through the TPU tunnel; cached reruns are fast.
# BENCH_FAKE mode (tests/test_bench_harness.py) never touches jax — skipping
# the import there keeps fake subprocess starts ~100 ms, so the harness
# tests' injected timeouts can't race a loaded host's multi-second jax import
if os.environ.get("BENCH_FAKE") != "1":
    import jax  # noqa: E402

    jax.config.update("jax_compilation_cache_dir", str(JAX_CACHE))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BATCH = 8
IMAGE_SIZE = 128
CODEBOOK = 8192
EMBED_DIM = 256
TIMED_STEPS = 10
CACHE = Path(os.environ.get("BENCH_CACHE", REPO / ".bench_cache.json"))
# committed copy of the last good headline: survives fresh clones, unlike
# the gitignored .bench_cache.json
HEADLINE_FALLBACK = Path(os.environ.get(
    "BENCH_HEADLINE_FALLBACK", REPO / "results" / "bench_headline.json"))

EXTRAS = ("cfg_sampling", "edm", "edm_dpmpp")
# per-extra hard timeouts: the CFG DDIM-150 + VAE-decode program is the one
# whose cold full-effort compile (~10 min through the TPU tunnel) exceeded
# the generic 420 s budget in round 3 and dropped config #4 from the record
EXTRA_TIMEOUTS_S = {"cfg_sampling": 900.0, "edm_dpmpp": 900.0}


# --------------------------------------------------------------------------
# cache + fault-injection helpers


def _read_cache() -> dict:
    try:
        return json.loads(CACHE.read_text())
    except Exception:
        return {}


def _update_cache(**kw) -> None:
    try:
        data = _read_cache()
        data.update(kw)
        CACHE.write_text(json.dumps(data))
    except Exception as e:  # cache write failure must never kill the run
        print(f"bench cache write failed: {e}", file=sys.stderr)


def cached_headline() -> dict | None:
    """Last-known-good headline: session cache first, committed fallback
    second."""
    h = _read_cache().get("headline")
    if isinstance(h, dict):
        return h
    try:
        h = json.loads(HEADLINE_FALLBACK.read_text())
        return h if isinstance(h, dict) else None
    except Exception:
        return None


def _fake(name: str) -> dict | None:
    """Test-only fault injection (BENCH_FAKE=1): canned metrics with
    injectable failures/hangs so tests/test_bench_harness.py can exercise
    the capture harness without TPU compiles."""
    if os.environ.get("BENCH_FAKE") != "1":
        return None
    time.sleep(float(os.environ.get("BENCH_FAKE_SLEEP", "0")))
    if os.environ.get("BENCH_FAKE_FAIL") == name:
        raise RuntimeError(f"injected failure in {name}")
    if os.environ.get("BENCH_FAKE_HANG") == name:
        # fast-compile mode rescues a hang (simulates the cold-compile
        # overrun that the BENCH_FAST_SAMPLER retry exists for)
        if os.environ.get("BENCH_FAST_SAMPLER") == "1":
            return {"metric": f"fake {name}", "value": 1.0,
                    "unit": "fake/sec", "vs_baseline": None,
                    "fast_compile": True}
        time.sleep(100000)
    return {"metric": f"fake {name}", "value": 1.0, "unit": "fake/sec",
            "vs_baseline": None}


def sampling_cpu_anchor(key: str) -> float | None:
    """Committed single-core CPU samples/sec for configs #4/#5 (batch-1 —
    the CPU-friendliest batching, so the TPU/CPU ratio is a floor).
    Regenerate with cli/measure_cpu_sampling.py."""
    anchor = REPO / "results" / "cpu_sampling_baseline.json"
    try:
        return json.loads(anchor.read_text())[key]
    except Exception:
        return None


# --------------------------------------------------------------------------
# metric functions (unchanged measurement logic)


def build_trainer(fast_compile: bool = False, step_mode: str = "split",
                  scan_block: int = 8):
    """The production stage-1 trainer at BASELINE config #2 sizes."""
    from vqgan_tpu.configs import VQGANConfig
    from vqgan_tpu.training.vqgan_trainer import VQGANTrainer

    cfg = VQGANConfig(
        image_size=IMAGE_SIZE, num_embeddings=CODEBOOK,
        embedding_dim=EMBED_DIM, batch_size=BATCH,
        # validation couples codebook size to dataset size; the bench
        # codebook (8192) needs the cap raised (31*300 > 8192)
        images_per_user_train=300,
    )
    return VQGANTrainer(cfg, use_mesh=False, fast_compile=fast_compile,
                        step_mode=step_mode, scan_block=scan_block)


def _split_step_flops(trainer, state, images):
    """Per-training-step FLOPs from the split G/D programs (cost analysis
    compiles from abstract avals, never executes)."""
    from vqgan_tpu.utils.flops import jit_flops

    abstract = lambda tree: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)
    a_state, a_images = abstract(state), abstract(images)
    g_f = jit_flops(trainer.g_step, a_state, a_images)
    if g_f is None:
        return None
    _, a_recon, _ = jax.eval_shape(trainer.g_step, a_state, a_images)
    d_f = jit_flops(trainer.d_step, a_state, a_images, a_recon)
    return g_f + (d_f or 0.0)


def measure(timed_steps: int = TIMED_STEPS, warmup: int = 3,
            with_flops: bool = True, fast_compile: bool = False):
    """Time `trainer.dispatch_step` in the steady state (D active)."""
    import jax.numpy as jnp

    trainer = build_trainer(fast_compile=fast_compile)
    # steady state: both optimizers active (step >= disc_start)
    disc_start = trainer.config.disc_start
    state = trainer.state.replace(step=jnp.asarray(disc_start))
    images = jax.random.uniform(
        jax.random.PRNGKey(3), (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3))

    step = disc_start
    for _ in range(warmup):
        state, log = trainer.dispatch_step(state, images, step)
        step += 1
    jax.block_until_ready(log["loss_total"])

    t0 = time.perf_counter()
    for _ in range(timed_steps):
        state, log = trainer.dispatch_step(state, images, step)
        step += 1
    jax.block_until_ready(log["loss_total"])
    dt = (time.perf_counter() - t0) / timed_steps

    flops = None
    if with_flops and trainer.step_mode == "split":
        # the steps donate their state arg, so lower from abstract avals —
        # cost analysis only compiles, never executes
        flops = _split_step_flops(trainer, state, images)
    return BATCH / dt, dt, flops


def measure_scan(block: int = 8, timed_blocks: int = 4, warmup_blocks: int = 2,
                 with_flops: bool = True, fast_compile: bool = True):
    """Time `trainer.dispatch_block` (step_mode="scan": `block` full G+D
    steps per compiled program) in the steady state. fast_compile defaults
    True: the scan body is the fused G+D graph, whose full-effort compile is
    hour-scale through this environment's remote TPU compiler
    (training/vqgan_step.py docstring); the measured exec-quality cost of
    the dialed-down effort is a few %, far below the ~23% host-dispatch
    overhead the block dispatch removes (results/training_roofline.json)."""
    import jax.numpy as jnp

    trainer = build_trainer(fast_compile=fast_compile, step_mode="scan",
                            scan_block=block)
    disc_start = trainer.config.disc_start
    state = trainer.state.replace(step=jnp.asarray(disc_start))
    superbatch = jax.random.uniform(
        jax.random.PRNGKey(3), (block, BATCH, IMAGE_SIZE, IMAGE_SIZE, 3))

    step = disc_start
    for _ in range(warmup_blocks):
        state, logs = trainer.dispatch_block(state, superbatch, step)
        step += block
    jax.block_until_ready(logs["loss_total"])

    t0 = time.perf_counter()
    for _ in range(timed_blocks):
        state, logs = trainer.dispatch_block(state, superbatch, step)
        step += block
    jax.block_until_ready(logs["loss_total"])
    dt = (time.perf_counter() - t0) / (timed_blocks * block)

    flops = None
    if with_flops:
        # per-step program cost from the split steps (same math per step;
        # XLA's cost model counts a scan body once, so measuring the scan
        # program directly would undercount by ~block x)
        images = jax.random.uniform(
            jax.random.PRNGKey(3), (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3))
        flops = _split_step_flops(trainer, trainer.state, images)
    return BATCH / dt, dt, flops


def bench_stage1_scan(block: int = 8) -> dict:
    """Stage-1 throughput with the scan-over-steps dispatch
    (trainer.dispatch_block): `block` full G+D training steps per compiled
    program, amortizing the 1-core host's per-program dispatch floor."""
    fake = _fake("stage1_scan")
    if fake is not None:
        return fake
    from vqgan_tpu.utils.flops import flops_report

    ips, dt, flops = measure_scan(block=block)
    cpu_ips = cpu_baseline()
    vs = ips / cpu_ips if cpu_ips == cpu_ips and cpu_ips > 0 else None
    return {
        "metric": "stage1 VQ-GAN train throughput "
                  f"({IMAGE_SIZE}px, codebook {CODEBOOK}, LPIPS+PatchGAN, "
                  f"trainer dispatch_block[{block}] scan-over-steps)",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        **flops_report(flops, dt),
    }


def bench_stage1(fast_compile: bool = False) -> dict:
    fake = _fake("stage1")
    if fake is not None:
        return fake
    from vqgan_tpu.utils.flops import flops_report

    ips, dt, flops = measure(fast_compile=fast_compile)
    cpu_ips = cpu_baseline()
    vs = ips / cpu_ips if cpu_ips == cpu_ips and cpu_ips > 0 else None
    out = {
        "metric": "stage1 VQ-GAN train throughput "
                  f"({IMAGE_SIZE}px, codebook {CODEBOOK}, LPIPS+PatchGAN, "
                  "trainer dispatch_step)",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        **flops_report(flops, dt),
    }
    if fast_compile:
        out["fast_compile"] = True
    return out


def bench_cfg_sampling(batch: int = 16, steps: int = 150,
                       cond_scale: float = 1.0) -> dict:
    """BASELINE config #4: CFG DDIM sampling + KL-VAE decode to 256px, the
    generate.py production pipeline as ONE compiled lax.scan program."""
    fake = _fake("cfg_sampling")
    if fake is not None:
        return fake
    import jax.numpy as jnp

    from vqgan_tpu.configs import LDMConfig
    from vqgan_tpu.models import KLVAE
    from vqgan_tpu.models.autoencoder import AutoencoderConfig
    from vqgan_tpu.training.ldm_trainer import build_cfg_unet_diffusion
    from vqgan_tpu.utils.flops import flops_report, jit_flops

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

    # serving-mode bf16 param buffers (BENCH_BF16_PARAMS=1): halves the
    # per-NFE weight HBM traffic inside the scan; same cast the serving
    # artifacts ship (cli/export_serving.py --params_dtype bfloat16,
    # measured max 0.0094 pixel drift on [0,1] across the full pipeline)
    if os.environ.get("BENCH_BF16_PARAMS") == "1":
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
        params, vae_params = cast(params), cast(vae_params)

    # fast-compile escape hatch (BENCH_FAST_SAMPLER=1): same trade as the
    # stage-1 step's fast_compile (training/vqgan_step.py::_compile_options)
    # — a few % exec time for minute-scale compiles — used by the capture
    # harness only as a retry after a full-effort cold compile times out
    fast = os.environ.get("BENCH_FAST_SAMPLER") == "1"
    options = {"exec_time_optimization_effort": -1.0} if fast else None

    @partial(jax.jit, compiler_options=options)
    def pipeline(p, vp, key, classes):
        latents = diffusion.sample(p, key, classes=classes,
                                   cond_scale=cond_scale,
                                   rescaled_phi=cfg.rescaled_phi)
        return vae.apply(vp, latents, method=KLVAE.decode_latents)

    key = jax.random.PRNGKey(3)
    out = pipeline(params, vae_params, key, classes)
    jax.block_until_ready(out)
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = pipeline(params, vae_params, jax.random.fold_in(key, i),
                       classes)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    flops = jit_flops(pipeline, params, vae_params, key, classes)
    # XLA cost analysis counts the DDIM scan body ONCE (see utils/flops.py)
    # — reconstruct the true count from the per-step network call, costed
    # from unoptimized HLO (no extra backend compile).
    from vqgan_tpu.utils.flops import lowered_flops, scan_corrected_flops

    def scan_body_net(p, x, t):
        return diffusion.model_predictions(
            p, x, t, classes, cond_scale=cond_scale,
            rescaled_phi=cfg.rescaled_phi)

    body_flops = lowered_flops(
        scan_body_net, params, x0, jnp.full((b,), 500, jnp.int32))
    flops = scan_corrected_flops(flops, body_flops, steps) or flops
    cpu = sampling_cpu_anchor("cfg4_sps")
    out = {
        "metric": f"CFG DDIM-{steps} sampling + VAE decode at 256px "
                  f"(dim=96 U-Net, cond_scale={cond_scale})",
        "value": round(b / dt, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(b / dt / cpu, 2) if cpu else None,
        **flops_report(flops, dt),
        "scan_flops_corrected": body_flops is not None,
    }
    if fast:
        out["fast_compile"] = True
    return out


def bench_edm_dpmpp(batch: int = 128) -> dict:
    """EDM throughput mode: DPM++(2M) (reference
    elucidated_diffusion.py:202-237) does 1 NFE/step vs Heun's 2 and keeps
    scaling with batch where Heun-b128 hits a memory cliff — measured best
    serving point for config #5 (139.5 samples/s vs Heun-b16's 59.7)."""
    fake = _fake("edm_dpmpp")
    if fake is not None:
        return fake
    return bench_edm(batch=batch, sampler="dpmpp")


def bench_edm(batch: int = 16, image_size: int = 64, dim: int = 64,
              num_sample_steps: int = 32, sampler: str = "heun") -> dict:
    """BASELINE config #5: EDM stochastic Heun sampling, Karras MP U-Net."""
    fake = _fake("edm")
    if fake is not None:
        return fake
    import jax.numpy as jnp

    from vqgan_tpu.diffusion import ElucidatedDiffusion
    from vqgan_tpu.models.karras_unet import KarrasUnet
    from vqgan_tpu.utils.flops import flops_report, jit_flops

    from vqgan_tpu.models.karras_unet import normalize_karras_params

    # inference mode: params are kept normalized by normalize_karras_params
    # (the training-loop invariant), so the per-forward re-normalization is
    # the identity and normalize_forward=False skips it — XLA cannot hoist
    # it out of the sampler's while loop (tests pin the exactness)
    model = KarrasUnet(
        image_size=image_size, dim=dim, dim_max=dim * 4, num_classes=31,
        channels=3, num_downsamples=2, num_blocks_per_stage=2,
        attn_res=(16, 8), dtype=jnp.bfloat16, normalize_forward=False)
    b = batch
    classes = (jnp.arange(b) % 31).astype(jnp.int32)
    params = normalize_karras_params(model.init(
        jax.random.PRNGKey(0), jnp.zeros((b, image_size, image_size, 3)),
        jnp.zeros((b,)), class_labels=classes))
    if os.environ.get("BENCH_BF16_PARAMS") == "1":  # serving-mode weights
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    def net_apply(p, x, t_noise, self_cond=None):
        return model.apply(p, x, t_noise, class_labels=classes)

    ed = ElucidatedDiffusion(net_apply, image_size=image_size, channels=3,
                             num_sample_steps=num_sample_steps)
    sample_fn = (ed.sample if sampler == "heun"
                 else ed.sample_using_dpmpp)
    run = jax.jit(lambda p, k: sample_fn(p, k, batch_size=b))
    out = run(params, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(params, jax.random.fold_in(jax.random.PRNGKey(2), i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    flops = jit_flops(run, params, jax.random.PRNGKey(1))
    # XLA cost analysis counts the sampler scan body ONCE (utils/flops.py)
    # — reconstruct: Heun does 2 preconditioned forwards per step, DPM++ 1.
    from vqgan_tpu.utils.flops import lowered_flops, scan_corrected_flops

    fwd_flops = lowered_flops(
        lambda p, x, s: ed.preconditioned_forward(p, x, s, clamp=True),
        params, jnp.zeros((b, image_size, image_size, 3)),
        jnp.ones((b,)))
    body_flops = (fwd_flops * (2 if sampler == "heun" else 1)
                  if fwd_flops else None)
    flops = scan_corrected_flops(flops, body_flops, num_sample_steps) or flops
    # the committed CPU anchor is Heun batch-1; only Heun compares to it
    cpu = sampling_cpu_anchor("cfg5_sps") if sampler == "heun" else None
    name = ("Heun" if sampler == "heun"
            else f"DPM++(2M) b{b} throughput-mode")
    return {
        "metric": f"EDM {name}-{num_sample_steps} sampling, KarrasUnet "
                  f"dim={dim} @ {image_size}px",
        "value": round(b / dt, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(b / dt / cpu, 2) if cpu else None,
        **flops_report(flops, dt),
        "scan_flops_corrected": body_flops is not None,
    }


def cpu_baseline() -> float:
    env = os.environ.get("BENCH_CPU_IPS")
    if env:
        try:
            return float(env)
        except ValueError:
            return float("nan")  # e.g. BENCH_CPU_IPS=skip
    cached = _read_cache().get("cpu_ips")
    if cached:
        return cached
    # committed anchor: the CPU host is fixed, so the round-1 measured CPU
    # throughput of the identical step is a stable constant; re-measuring
    # costs ~35 min on this 1-core host (0.0116 img/s × 3 steps × batch 8)
    anchor = REPO / "results" / "cpu_baseline.json"
    if anchor.exists():
        try:
            return json.loads(anchor.read_text())["cpu_ips"]
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
        "ips, dt, _ = measure(timed_steps=2, warmup=1, with_flops=False);"
        "print('CPU_IPS=' + json.dumps(ips))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=3600,
        )
        for line in out.stdout.splitlines():
            if line.startswith("CPU_IPS="):
                ips = float(line.split("=", 1)[1])
                _update_cache(cpu_ips=ips)
                return ips
        print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
    except subprocess.TimeoutExpired:
        print("CPU baseline timed out", file=sys.stderr)
    return float("nan")


# --------------------------------------------------------------------------
# capture harness


def check_backend(retries: int | None = None,
                  timeout_s: float | None = None) -> bool:
    """Verify the TPU backend initializes, in a subprocess so a hung init
    can't stall the run, with bounded retries for transient UNAVAILABLE
    errors (the round-2 failure mode)."""
    if os.environ.get("BENCH_FAKE") == "1":
        return os.environ.get("BENCH_FAKE_FAIL") != "backend"
    if retries is None:
        retries = int(os.environ.get("BENCH_BACKEND_RETRIES", "3"))
    if timeout_s is None:
        timeout_s = float(os.environ.get("BENCH_BACKEND_TIMEOUT_S", "240"))
    code = "import jax; print('NDEV=%d' % len(jax.devices()))"
    for attempt in range(retries):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=timeout_s)
            if any(line.startswith("NDEV=") and int(line[5:]) >= 1
                   for line in out.stdout.splitlines()):
                return True
            print(f"backend check attempt {attempt + 1}: "
                  f"{out.stderr[-500:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"backend check attempt {attempt + 1}: timed out",
                  file=sys.stderr)
        time.sleep(5 * (attempt + 1))
    return False


def _emit(metric: dict) -> None:
    print(json.dumps(metric), flush=True)


def _run_extra(name: str, timeout_s: float,
               env: dict | None = None) -> dict | None:
    """One extra in its own interpreter under a hard timeout; returns its
    metric dict or None."""
    try:
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--only", name],
            capture_output=True, text=True, timeout=timeout_s,
            env={**os.environ, **(env or {})})
    except subprocess.TimeoutExpired:
        print(f"extra bench {name}: killed after {timeout_s:.0f}s",
              file=sys.stderr)
        return None
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except Exception:
                break
    print(f"extra bench {name} failed (rc={out.returncode}): "
          f"{out.stderr[-500:]}", file=sys.stderr)
    return None


def main():
    budget = float(os.environ.get("BENCH_BUDGET_S", "3000"))
    best: dict = {"headline": None}

    def on_alarm(signum, frame):
        h = best["headline"] or cached_headline()
        if h:
            _emit({**h, "note": f"wall-clock budget {budget:.0f}s expired; "
                                "best-known headline"})
            os._exit(0)
        print("bench budget expired with no headline available",
              file=sys.stderr)
        os._exit(1)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(max(1, int(budget)))

    if not check_backend():
        h = cached_headline()
        if h is None:
            sys.exit("TPU backend init failed and no cached headline exists")
        _emit({**h, "cached": True,
               "note": "TPU backend init failed; last-known-good headline"})
        return

    # headline FIRST. Cold compilation cache with no cached fallback is the
    # only case where a full-effort compile could leave the round with NO
    # number — degrade to fast-compile there (a worse-but-real measurement
    # beats an empty record).
    cold = not JAX_CACHE.exists() or not any(JAX_CACHE.iterdir())
    fast = (os.environ.get("BENCH_FAST_COMPILE") == "1"
            or (cold and cached_headline() is None))
    try:
        headline = bench_stage1(fast_compile=fast)
        best["headline"] = headline
        _update_cache(headline=headline)
        try:
            HEADLINE_FALLBACK.parent.mkdir(parents=True, exist_ok=True)
            stamped = {**headline, "measured": (
                f"{time.strftime('%Y-%m-%d')}, TPU v5e-1 (BASELINE.md); "
                "refreshed automatically on every successful bench.py run")}
            HEADLINE_FALLBACK.write_text(json.dumps(stamped, indent=1) + "\n")
        except Exception as e:
            print(f"headline fallback write failed: {e}", file=sys.stderr)
    except Exception as e:
        print(f"headline measurement failed: {e}", file=sys.stderr)
        headline = cached_headline()
        if headline is None:
            raise
        headline = {**headline, "cached": True,
                    "note": "headline measurement failed; last-known-good"}
        best["headline"] = headline
    _emit(headline)

    # extras: informative lines, each isolated + bounded; the headline is
    # re-printed after each so the FINAL JSON line is the headline even if
    # the driver kills this process mid-extras
    if os.environ.get("BENCH_SKIP_EXTRAS", "0") != "1":
        env_timeout = os.environ.get("BENCH_EXTRA_TIMEOUT_S")
        extra_timeout = float(env_timeout) if env_timeout else 420.0
        for name in EXTRAS:
            # per-extra defaults apply only when no explicit env override
            budget_s = (extra_timeout if env_timeout
                        else EXTRA_TIMEOUTS_S.get(name, extra_timeout))
            metric = _run_extra(name, budget_s)
            if metric is None and name == "cfg_sampling":
                # full-effort cold compile overran: retry once in
                # fast-compile mode so config #4 always lands a number
                metric = _run_extra(name, extra_timeout,
                                    env={"BENCH_FAST_SAMPLER": "1"})
            if metric is not None:
                _emit(metric)
                _emit(headline)
    signal.alarm(0)


if __name__ == "__main__":
    if "--only" in sys.argv:
        name = sys.argv[sys.argv.index("--only") + 1]
        fn = {"stage1": bench_stage1, "stage1_scan": bench_stage1_scan,
              "cfg_sampling": bench_cfg_sampling,
              "edm": bench_edm, "edm_dpmpp": bench_edm_dpmpp}[name]
        _emit(fn())
    else:
        main()
