"""Tracing / profiling hooks (SURVEY.md §5.1 — the reference has none; the
TPU build exposes jax.profiler traces and per-step timing as first-class
utilities)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Optional

import jax

__all__ = ["trace", "StepTimer", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str | Path = "./profile",
          host_tracer_level: int = 2):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf:

        with trace("./profile"):
            for _ in range(10):
                state, log = train_step(state, batch)
    """
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation  # named region inside a trace


class StepTimer:
    """Lightweight step timing with warmup exclusion and EMA smoothing.

    step_time() blocks on the given array (the step's output) so timings
    reflect device completion, not dispatch."""

    def __init__(self, warmup: int = 2, ema: float = 0.9):
        self.warmup = warmup
        self.ema = ema
        self._count = 0
        self._avg: Optional[float] = None
        self._last = time.perf_counter()

    def step(self, sync_array=None) -> Optional[float]:
        if sync_array is not None:
            jax.block_until_ready(sync_array)
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._count += 1
        if self._count <= self.warmup:
            return None
        self._avg = dt if self._avg is None else (
            self.ema * self._avg + (1 - self.ema) * dt)
        return dt

    @property
    def avg_seconds(self) -> Optional[float]:
        return self._avg

    def throughput(self, items_per_step: int) -> Optional[float]:
        if self._avg is None:
            return None
        return items_per_step / self._avg
