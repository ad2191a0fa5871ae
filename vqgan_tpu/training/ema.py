"""Exponential moving average of parameters, updated inside the jitted step.

The reference keeps EMA on the host main process only (ema_pytorch,
train_latent_cfg.py:487-495); on TPU it is cheaper to keep the EMA replica
on-device and fuse the update into the train step (SURVEY.md §5.8).

Semantics match ema_pytorch's update() algorithm, including its decay ramp:
at internal step ``s`` (one per ``update()`` call — the reference trainer
calls it once per train step),

  - ``s % update_every != 0``        -> no-op
  - ``s <= update_after_step``       -> copy online params into the EMA
  - otherwise                        -> ``ema = d*ema + (1-d)*online`` with
      ``epoch = max(s - update_after_step - 1, 0)``
      ``d = 0 if epoch <= 0 else
           clip(1 - (1 + epoch/inv_gamma)**(-power), min_value, beta)``

(defaults ``inv_gamma=1.0, power=2/3, min_value=0.0``; ``beta`` is the
reference's ``config.ema_decay``). The ramp makes early EMA track the online
params closely and asymptote to ``beta`` — constant decay is recovered with
``use_ramp=False``. Trajectory pinned against a literal transcription of the
torch formula in tests/test_ema.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["ema_update", "ema_decay_at_step"]


def ema_decay_at_step(
    step: jax.Array,
    *,
    beta: float = 0.995,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> jax.Array:
    """ema_pytorch's ``get_current_decay`` as a pure function of the step."""
    epoch = jnp.maximum(
        jnp.asarray(step, jnp.float32) - update_after_step - 1.0, 0.0)
    value = 1.0 - (1.0 + epoch / inv_gamma) ** (-power)
    ramped = jnp.clip(value, min_value, beta)
    return jnp.where(epoch <= 0.0, 0.0, ramped)


def ema_update(
    ema_params: Any,
    new_params: Any,
    step: jax.Array,
    *,
    decay: float = 0.995,
    update_every: int = 10,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
    use_ramp: bool = True,
):
    """Functional EMA update, safe inside jit (branchless).

    ``decay`` is the asymptotic/maximum decay (ema_pytorch's ``beta``); with
    ``use_ramp=True`` (the reference's behavior) the effective decay ramps up
    from 0 per ``ema_decay_at_step``.
    """
    do_update = (step % update_every) == 0
    warm = step <= update_after_step

    if use_ramp:
        d = ema_decay_at_step(
            step, beta=decay, update_after_step=update_after_step,
            inv_gamma=inv_gamma, power=power, min_value=min_value)
    else:
        d = jnp.asarray(decay, jnp.float32)

    def leaf(e, p):
        p = p.astype(e.dtype) if hasattr(p, "astype") else p
        dl = d.astype(e.dtype) if hasattr(e, "dtype") else d
        decayed = e * dl + p * (1.0 - dl)
        candidate = jnp.where(warm, p, decayed)
        return jnp.where(do_update, candidate, e)

    return jax.tree.map(leaf, ema_params, new_params)
