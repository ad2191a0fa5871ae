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
