"""Exponential moving average of parameters, updated inside the jitted step.

The reference keeps EMA on the host main process only (ema_pytorch,
train_latent_cfg.py:487-495); on TPU it is cheaper to keep the EMA replica
on-device and fuse the update into the train step (SURVEY.md §5.8).

Semantics match ema_pytorch's defaults: `update_every` steps between decay
updates and a `update_after_step` warmup during which the EMA just copies the
online params.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["ema_update"]


def ema_update(
    ema_params: Any,
    new_params: Any,
    step: jax.Array,
    *,
    decay: float = 0.995,
    update_every: int = 10,
    update_after_step: int = 100,
):
    """Functional EMA update, safe inside jit (branchless)."""
    do_update = (step % update_every) == 0
    warm = step < update_after_step

    def leaf(e, p):
        p = p.astype(e.dtype) if hasattr(p, "astype") else p
        decayed = e * decay + p * (1.0 - decay)
        candidate = jnp.where(warm, p, decayed)
        return jnp.where(do_update, candidate, e)

    return jax.tree.map(leaf, ema_params, new_params)
