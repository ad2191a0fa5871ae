"""FLOP accounting and MFU (model-FLOPs-utilization) reporting.

The reference publishes no performance numbers (SURVEY.md §6), so "fast"
must be demonstrated, not asserted: every benchmark reports the FLOPs of the
exact compiled program it times (from XLA's own cost analysis) alongside the
achieved TFLOP/s and the fraction of the chip's peak that represents.

Using XLA cost analysis counts the FLOPs of the program as compiled
(including rematerialization), so the reported number is strictly an HFU
(hardware-FLOPs utilization); for programs without remat it equals MFU.

CRITICAL caveat for sampler programs: XLA's cost analysis counts the body
of a `lax.scan` / `lax.while_loop` ONCE — the trip count is not part of the
HLO cost model — so the raw number undercounts an N-step sampler by ~N×
(measured: the compiled DDIM-150 scan reports exactly the FLOPs of one
U-Net forward). `scan_corrected_flops` reconstructs the true count from the
body FLOPs; `lowered_flops` costs a body from its UNOPTIMIZED lowered HLO,
which needs no backend compile (cheap even through a remote-compile tunnel)
and matches compiled counts for fusion-insensitive math (dots/convs).
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["peak_tflops", "compiled_flops", "lowered_flops",
           "scan_corrected_flops", "mfu", "flops_report"]

# bf16 dense peak per chip, TFLOP/s (public Google Cloud TPU specs).
_PEAK_BF16_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5e": 197.0,
    "TPU v5": 197.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,   # v6e / Trillium
    "TPU v6e": 918.0,
    "TPU v7": 2307.0,       # Ironwood (fp8 4614; bf16 half)
}


def peak_tflops(device=None) -> Optional[float]:
    """Peak bf16 TFLOP/s of the given (default: first) device, or None when
    unknown (e.g. the CPU test platform)."""
    device = device if device is not None else jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    # longest prefix first: "TPU v5p" must not fall through to "TPU v5"
    for name in sorted(_PEAK_BF16_TFLOPS, key=len, reverse=True):
        if kind.startswith(name):
            return _PEAK_BF16_TFLOPS[name]
    return None


def compiled_flops(compiled) -> Optional[float]:
    """Total FLOPs of a compiled executable per XLA's cost analysis.

    Accepts the object returned by `jitted.lower(*args).compile()`. Returns
    None when the backend does not expose cost analysis.
    """
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if ca is None:
        return None
    if isinstance(ca, (list, tuple)):  # older jax returned [dict]
        ca = ca[0] if ca else {}
    flops = ca.get("flops")
    return float(flops) if flops and flops > 0 else None


def jit_flops(jitted, *args, **kwargs) -> Optional[float]:
    """FLOPs of `jitted(*args, **kwargs)` (triggers a compile if uncached)."""
    try:
        return compiled_flops(jitted.lower(*args, **kwargs).compile())
    except Exception:
        return None


def lowered_flops(fn, *args, **kwargs) -> Optional[float]:
    """FLOPs of `fn(*args, **kwargs)` from the unoptimized lowered HLO —
    no backend compile, so it is cheap even when compiles are minute-scale
    (remote tunnel). Dot/conv counts match the compiled analysis; fusion
    and remat effects are absent, which is fine for pure model forwards.

    Some backends (the axon TPU plugin) return None from a Lowered's
    cost_analysis; flop counts of unoptimized HLO are backend-independent,
    so fall back to lowering against the CPU backend (still no compile)."""
    for jit_kw in ({}, {"backend": "cpu"}):
        try:
            ca = jax.jit(fn, **jit_kw).lower(*args, **kwargs).cost_analysis()
            if isinstance(ca, (list, tuple)):  # older jax returned [dict]
                ca = ca[0] if ca else {}
            flops = ca.get("flops")
            if flops and flops > 0:
                return float(flops)
        except Exception:
            pass
    return None


def scan_corrected_flops(program_flops: Optional[float],
                         body_flops: Optional[float],
                         n_iters: int) -> Optional[float]:
    """True FLOPs of a program whose hot loop is a `lax.scan`/`while_loop`
    with `n_iters` trips: XLA's cost analysis counted the body once, so the
    remaining (n_iters - 1) trips are added back. `body_flops` is the cost
    of ONE trip (e.g. via lowered_flops on the per-step network call)."""
    if program_flops is None or body_flops is None:
        return None
    return program_flops + (n_iters - 1) * body_flops


def mfu(flops_per_step: Optional[float], step_time_s: float,
        device=None) -> Optional[float]:
    """Fraction of chip peak achieved: (flops/step ÷ time) ÷ peak."""
    peak = peak_tflops(device)
    if flops_per_step is None or peak is None or step_time_s <= 0:
        return None
    return (flops_per_step / step_time_s) / (peak * 1e12)


def flops_report(flops_per_step: Optional[float],
                 step_time_s: float, device=None) -> dict:
    """The three driver-facing numbers: FLOPs/step, achieved TFLOP/s, MFU."""
    out = {"flops_per_step": flops_per_step}
    if flops_per_step is not None and step_time_s > 0:
        out["tflops_per_sec"] = round(flops_per_step / step_time_s / 1e12, 2)
    u = mfu(flops_per_step, step_time_s, device)
    out["mfu"] = round(u, 4) if u is not None else None
    return out
