"""Classifier-free guidance combination math.

Pure functions that combine conditional / unconditional network outputs:
standard CFG, parallel-component projection removal, and rescaled-phi
interpolation (arXiv 2305.08891).

Parity targets: reference classifier_free_guidance.py:87-98 (`project`) and
:435-465 (`forward_with_cond_scale`). The reference upcasts to float64 for the
projection; on TPU fp64 is emulated and slow, so we use fp32 — the projection
is a normalized inner product over ~4k elements, well within fp32 range.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["project", "apply_cfg"]


def project(x: jax.Array, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Decompose x into components (parallel, orthogonal) w.r.t. y, per batch
    element, flattening all non-batch dims."""
    b = x.shape[0]
    dtype = x.dtype
    xf = x.reshape(b, -1).astype(jnp.float32)
    yf = y.reshape(b, -1).astype(jnp.float32)

    unit = yf / jnp.maximum(jnp.linalg.norm(yf, axis=-1, keepdims=True), 1e-12)
    parallel = jnp.sum(xf * unit, axis=-1, keepdims=True) * unit
    orthogonal = xf - parallel

    return (
        parallel.reshape(x.shape).astype(dtype),
        orthogonal.reshape(x.shape).astype(dtype),
    )


def apply_cfg(
    logits: jax.Array,
    null_logits: jax.Array,
    cond_scale: float,
    rescaled_phi: float = 0.0,
    remove_parallel_component: bool = True,
    keep_parallel_frac: float = 0.0,
) -> jax.Array:
    """Combine conditional and unconditional predictions.

    scaled = cond + (cond_scale - 1) * update, where update is (cond - null)
    with its component parallel to cond optionally removed; then optionally
    rescale to match the conditional prediction's per-sample std and
    interpolate by `rescaled_phi`.
    """
    update = logits - null_logits

    if remove_parallel_component:
        parallel, orthog = project(update, logits)
        update = orthog + parallel * keep_parallel_frac

    scaled_logits = logits + update * (cond_scale - 1.0)

    if rescaled_phi == 0.0:
        return scaled_logits

    reduce_axes = tuple(range(1, scaled_logits.ndim))
    # ddof=1 to match torch.std's default (unbiased).
    std_logits = jnp.std(logits, axis=reduce_axes, keepdims=True, ddof=1)
    std_scaled = jnp.std(scaled_logits, axis=reduce_axes, keepdims=True, ddof=1)
    rescaled_logits = scaled_logits * (std_logits / jnp.maximum(std_scaled, 1e-12))
    return rescaled_logits * rescaled_phi + scaled_logits * (1.0 - rescaled_phi)
