"""GAN losses for stage-1 VQ-GAN training.

Behavior targets: /root/reference/vqgan_ldm_baseline/models/losses.py:18-231
(LPIPSWithDiscriminator) and discriminator.py:187-242 (standalone losses).

Everything here is a pure function — the two-optimizer step in
training/vqgan_trainer.py composes them inside one jitted update. The
reference's `torch.autograd.grad` adaptive-weight dance (losses.py:63-94)
becomes a pair of targeted `jax.grad` calls w.r.t. the decoder's output conv
kernel.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "hinge_d_loss",
    "vanilla_d_loss",
    "hinge_g_loss",
    "vanilla_g_loss",
    "adaptive_disc_weight",
    "generator_loss",
    "discriminator_loss",
]


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def hinge_g_loss(logits_fake: jax.Array) -> jax.Array:
    return -jnp.mean(logits_fake)


def vanilla_g_loss(logits_fake: jax.Array) -> jax.Array:
    return jnp.mean(jax.nn.softplus(-logits_fake))


_G_LOSSES = {"hinge": hinge_g_loss, "vanilla": vanilla_g_loss}
_D_LOSSES = {"hinge": hinge_d_loss, "vanilla": vanilla_d_loss}


def adaptive_disc_weight(
    nll_grad_norm: jax.Array, g_grad_norm: jax.Array,
    clip_max: float = 1e4,
) -> jax.Array:
    """w = ‖∇nll‖ / (‖∇g‖ + 1e-4), clipped (reference losses.py:89-92)."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, clip_max))


def generator_loss(
    inputs: jax.Array,
    reconstructions: jax.Array,
    logits_fake: Optional[jax.Array],
    *,
    disc_active: jax.Array | bool,
    disc_weight: float = 0.1,
    perceptual_weight: float = 1.0,
    disc_loss_type: str = "hinge",
    perceptual_fn: Optional[Callable] = None,
    adaptive_weight: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """L1 + perceptual + (gated) adversarial generator loss
    (reference losses.py:120-184).

    `disc_active` may be a traced bool (step >= disc_start) so the whole
    two-phase schedule stays inside one compiled step function.
    perceptual_fn(recon, inputs) takes [0,1] images; renormalization to
    [-1,1] is the callee's responsibility (ours does it internally).
    """
    rec_loss = jnp.mean(jnp.abs(inputs - reconstructions))

    if perceptual_fn is not None:
        p_loss = jnp.mean(perceptual_fn(reconstructions, inputs))
    else:
        p_loss = jnp.float32(0.0)

    nll_loss = rec_loss + perceptual_weight * p_loss

    log = {
        "rec_loss": rec_loss,
        "perceptual_loss": p_loss,
        "nll_loss": nll_loss,
    }

    if logits_fake is None:
        return nll_loss, {**log, "total_loss": nll_loss}

    g_loss = _G_LOSSES[disc_loss_type](logits_fake)
    weight = disc_weight if adaptive_weight is None else (
        adaptive_weight * disc_weight
    )
    active = jnp.asarray(disc_active, jnp.float32)
    loss = nll_loss + active * weight * g_loss
    log.update({
        "g_loss": g_loss,
        "disc_weight": jnp.asarray(weight, jnp.float32) * active,
        "total_loss": loss,
    })
    return loss, log


def discriminator_loss(
    logits_real: jax.Array,
    logits_fake: jax.Array,
    *,
    disc_active: jax.Array | bool,
    disc_loss_type: str = "hinge",
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Hinge/vanilla discriminator loss with the accuracy monitor
    (reference losses.py:186-227)."""
    d_loss = _D_LOSSES[disc_loss_type](logits_real, logits_fake)
    active = jnp.asarray(disc_active, jnp.float32)
    loss = active * d_loss

    real_acc = jnp.mean((logits_real > 0).astype(jnp.float32))
    fake_acc = jnp.mean((logits_fake < 0).astype(jnp.float32))
    log = {
        "d_loss": loss,
        "logits_real": jnp.mean(logits_real),
        "logits_fake": jnp.mean(logits_fake),
        "d_acc": 0.5 * (real_acc + fake_acc) * active,
    }
    return loss, log
