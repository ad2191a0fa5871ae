"""The jitted stage-2 latent-diffusion training step.

Behavior target: the reference LDM hot loop
(/root/reference/train_latent_cfg.py:536-647) — diffusion loss (+ optional
SupCon contrastive branch gated by `contrastive_start_step`), grad clipping,
linear LR warmup, EMA update on a cadence.

TPU-native: one compiled function per step; EMA params live on-device and
update inside the step (no host round-trip); gradient accumulation, when
wanted, is optax.MultiSteps rather than a Python inner loop.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..losses.contrastive import supcon_loss
from .ema import ema_update

__all__ = ["LDMTrainState", "make_ldm_optimizer", "make_ldm_train_step",
           "make_ldm_scan_step"]


class LDMTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: optax.OptState
    ema_params: Any


def make_ldm_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
    betas=(0.9, 0.999),
    max_grad_norm: Optional[float] = 1.0,
    warmup_steps: int = 0,
    gradient_accumulate_every: int = 1,
):
    """Adam(+wd) with clipping and linear warmup (reference
    train_latent_cfg.py:456-461, 601-616)."""
    if warmup_steps > 0:
        schedule = optax.linear_schedule(0.0, learning_rate, warmup_steps)
    else:
        schedule = learning_rate

    parts = []
    if max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay > 0:
        parts.append(optax.adamw(schedule, b1=betas[0], b2=betas[1],
                                 weight_decay=weight_decay))
    else:
        parts.append(optax.adam(schedule, b1=betas[0], b2=betas[1]))
    tx = optax.chain(*parts)
    if gradient_accumulate_every > 1:
        tx = optax.MultiSteps(tx, gradient_accumulate_every)
    return tx


def _make_step_core(
    diffusion,
    optimizer: optax.GradientTransformation,
    *,
    cond_drop_prob: float = 0.0,
    contrastive_weight: float = 0.0,
    contrastive_start_step: int = 0,
    contrastive_temperature: float = 0.07,
    ema_decay: float = 0.995,
    ema_update_every: int = 10,
    ema_update_after_step: int = 100,
):
    """The unjitted step body, shared by the per-step program and the
    scan-block program. PRNG is folded by state.step inside, so per-step
    and in-scan dispatch of the same base rng produce identical noise
    streams (pinned by tests/test_ldm_scan.py)."""

    use_contrastive = contrastive_weight > 0.0

    def train_step(state: LDMTrainState, latents, classes, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            if use_contrastive:
                diff_loss, feats = diffusion.loss(
                    params, rng, latents, classes,
                    cond_drop_prob=cond_drop_prob, return_features=True)
                closs = supcon_loss(
                    feats[:, None, :], classes,
                    temperature=contrastive_temperature)
                gate = (state.step >= contrastive_start_step).astype(
                    jnp.float32)
                total = diff_loss + contrastive_weight * gate * closs
                return total, {"diffusion_loss": diff_loss,
                               "contrastive_loss": closs,
                               "loss": total}
            diff_loss = diffusion.loss(
                params, rng, latents, classes, cond_drop_prob=cond_drop_prob)
            return diff_loss, {"diffusion_loss": diff_loss,
                               "loss": diff_loss}

        (_, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        log["grad_norm"] = optax.global_norm(grads)

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = ema_update(
            state.ema_params, new_params, state.step,
            decay=ema_decay, update_every=ema_update_every,
            update_after_step=ema_update_after_step,
        )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, log

    return train_step


def make_ldm_train_step(
    diffusion,
    optimizer: optax.GradientTransformation,
    *,
    donate: bool = True,
    **step_kwargs,
):
    """diffusion: GaussianDiffusion over the CFG U-Net apply fn."""
    core = _make_step_core(diffusion, optimizer, **step_kwargs)
    return jax.jit(core, donate_argnums=(0,) if donate else ())


def make_ldm_scan_step(
    diffusion,
    optimizer: optax.GradientTransformation,
    *,
    donate: bool = True,
    **step_kwargs,
):
    """Block dispatch for the stage-2 hot loop: `block` full training steps
    (loss + grad + Adam + EMA) as ONE compiled `lax.scan` program over a
    [block, B, ...] superbatch, amortizing the host's per-program dispatch
    floor exactly like the stage-1 trainer's step_mode="scan"
    (training/vqgan_step.py::make_vqgan_scan_steps). Step-for-step
    identical math and PRNG stream to per-step dispatch (the core folds
    the base rng by state.step). Returns (state, stacked_logs) with a
    leading [block] axis on every log entry."""
    core = _make_step_core(diffusion, optimizer, **step_kwargs)

    def block_step(state: LDMTrainState, latents, classes, rng):
        def body(carry, xs):
            lat, cls = xs
            return core(carry, lat, cls, rng)

        return jax.lax.scan(body, state, (latents, classes))

    return jax.jit(block_step, donate_argnums=(0,) if donate else ())
