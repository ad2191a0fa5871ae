"""utils/profiling: StepTimer EMA semantics and the jax.profiler trace
context (writes a trace directory without disturbing the computation)."""

import time

import jax
import jax.numpy as jnp

from vqgan_tpu.utils.profiling import StepTimer, trace


def test_step_timer_warmup_and_throughput():
    t = StepTimer(warmup=2, ema=0.5)
    assert t.avg_seconds is None
    for _ in range(2):  # warmup steps produce no measurement
        assert t.step() is None
    time.sleep(0.01)
    dt = t.step()
    assert dt is not None and dt > 0
    avg = t.avg_seconds
    assert avg is not None and avg > 0
    thr = t.throughput(items_per_step=8)
    assert abs(thr - 8.0 / avg) < 1e-9


def test_step_timer_syncs_on_array():
    t = StepTimer(warmup=0)
    x = jax.jit(lambda a: a * 2)(jnp.ones((4,)))
    dt = t.step(sync_array=x)
    assert dt is not None and dt >= 0


def test_trace_context_writes_profile(tmp_path):
    out = tmp_path / "prof"
    with trace(out):
        jax.block_until_ready(jax.jit(lambda a: a @ a)(jnp.ones((8, 8))))
    files = list(out.rglob("*"))
    assert files, "no profiler output written"


def test_training_roofline_helpers():
    """cli/profile_training: the roofline record builder and the
    forward-profiling path (the full config-#2 run is TPU-scale; the
    helpers carry all the logic)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "cli"))
    from profile_training import _roofline, profile_fwd

    # peak falls back to 197 TFLOP/s when unknown (CPU test platform):
    # t_mxu = 1e12/197e12 = 5.08 ms >> t_hbm = 1e6/819e9 = 1.2 us
    rec = _roofline("toy", flops=1e12, bytes_=1e6, dt=0.01, n_items=8)
    assert rec["t_mxu_ms"] > 0 and rec["t_hbm_ms"] > 0
    assert rec["bound"] == "mxu"
    assert abs(rec["roofline_fraction"] - 0.5076) < 0.01
    assert rec["arith_intensity_flops_per_byte"] == 1e6

    fwd = profile_fwd("matmul", lambda a, b: a @ b,
                      (jnp.ones((256, 256)), jnp.ones((256, 256))),
                      n_items=4, iters=2)
    assert fwd["t_measured_ms"] > 0 and fwd["items_per_sec"] > 0


def test_roofline_profile_record():
    """cli/profile_sampling.profile: times a jitted program, reads XLA cost
    analysis, and computes the roofline attribution fields."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "cli"))
    from profile_sampling import profile

    def f(a, b):
        return jnp.tanh(a @ b)

    a = jnp.ones((512, 512), jnp.float32)
    rec = profile("matmul-tanh", f, (a, a), n_items=4, iters=2)
    assert rec["t_measured_ms"] > 0
    assert rec["items_per_sec"] > 0
    # XLA's CPU/TPU backends both report cost analysis for a dot
    if rec["flops"]:
        assert rec["mfu"] is not None and rec["mfu"] >= 0
        assert rec["t_mxu_ms"] > 0
    if rec["flops"] and rec["bytes"]:
        assert rec["bound"] in ("mxu", "hbm")
        assert rec["roofline_fraction"] > 0
        assert rec["arith_intensity_flops_per_byte"] > 0


def test_scan_flops_counted_once_and_corrected():
    """XLA cost analysis counts a lax.scan body ONCE (the trip count is not
    in the HLO cost model) — the documented undercount behind the round-3
    'single-digit sampling MFU'. scan_corrected_flops reconstructs the true
    count; lowered_flops costs a body with no backend compile."""
    from vqgan_tpu.utils.flops import (jit_flops, lowered_flops,
                                       scan_corrected_flops)

    w = jnp.ones((64, 64), jnp.float32)
    x = jnp.ones((64, 64), jnp.float32)

    def body_net(c):
        return jnp.tanh(c @ w)

    def scanned(c):
        return jax.lax.scan(
            lambda c, _: (body_net(c), None), c, None, length=10)[0]

    program = jit_flops(jax.jit(scanned), x)
    body = lowered_flops(body_net, x)
    if program is None or body is None:  # backend without cost analysis
        return
    # the body's dot dominates; the scan program reports ~one body, not 10
    assert program < 2 * body
    true = scan_corrected_flops(program, body, 10)
    assert true >= 10 * body * 0.9
    assert scan_corrected_flops(None, body, 10) is None
    assert scan_corrected_flops(program, None, 10) is None
