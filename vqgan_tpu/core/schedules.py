"""Noise schedules and precomputed diffusion constants.

Pure host-side construction in float64 (numpy), cast once to fp32 device
arrays — mirrors the numerical convention of the reference implementation
(/root/reference/denoising_diffusion_pytorch/classifier_free_guidance.py:644-698
registers fp32 buffers computed from fp64 math).

Everything downstream (q_sample, posterior, samplers) consumes a single
immutable `DiffusionSchedule` pytree, which jits cleanly and shards as
fully-replicated constants.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

Objective = Literal["pred_noise", "pred_x0", "pred_v"]

__all__ = [
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "sigmoid_beta_schedule",
    "make_beta_schedule",
    "DiffusionSchedule",
    "make_schedule",
]


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Linear beta schedule, scaled so beta range matches T=1000 conventions.

    Parity target: reference classifier_free_guidance.py:570-574.
    """
    scale = 1000 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule (Nichol & Dhariwal 2021).

    Parity target: reference classifier_free_guidance.py:576-586.
    """
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3, end: float = 3, tau: float = 1.0
) -> np.ndarray:
    """Sigmoid schedule (Jabri et al.), better for high-res images.

    Parity target: reference denoising_diffusion_pytorch.py:463-476.
    """
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    v_start = 1.0 / (1.0 + math.exp(-start / tau))
    v_end = 1.0 / (1.0 + math.exp(-end / tau))
    sig = 1.0 / (1.0 + np.exp(-((t * (end - start) + start) / tau)))
    alphas_cumprod = (-sig + v_end) / (v_end - v_start)
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


def make_beta_schedule(name: str, timesteps: int, **kwargs) -> np.ndarray:
    try:
        fn = _SCHEDULES[name]
    except KeyError:
        raise ValueError(
            f"unknown beta schedule {name!r}; choose from {sorted(_SCHEDULES)}"
        ) from None
    return fn(timesteps, **kwargs)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed DDPM constants, all fp32 arrays of shape [T].

    Field-for-field match with the buffers the reference registers
    (classifier_free_guidance.py:648-693), so golden parity tests can compare
    directly.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    snr: jax.Array
    loss_weight: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    beta_schedule: str = "cosine",
    timesteps: int = 1000,
    objective: Objective = "pred_noise",
    min_snr_loss_weight: bool = False,
    min_snr_gamma: float = 5.0,
    **schedule_kwargs,
) -> DiffusionSchedule:
    """Build the full constant pack in fp64, cast to fp32 device arrays."""
    betas = make_beta_schedule(beta_schedule, timesteps, **schedule_kwargs)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.pad(alphas_cumprod[:-1], (1, 0), constant_values=1.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    snr = alphas_cumprod / (1.0 - alphas_cumprod)
    maybe_clipped_snr = np.minimum(snr, min_snr_gamma) if min_snr_loss_weight else snr

    if objective == "pred_noise":
        loss_weight = maybe_clipped_snr / snr
    elif objective == "pred_x0":
        loss_weight = maybe_clipped_snr
    elif objective == "pred_v":
        loss_weight = maybe_clipped_snr / (snr + 1)
    else:
        raise ValueError(f"unknown objective {objective!r}")

    as_f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=as_f32(betas),
        alphas_cumprod=as_f32(alphas_cumprod),
        alphas_cumprod_prev=as_f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=as_f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=as_f32(posterior_variance),
        posterior_log_variance_clipped=as_f32(
            np.log(np.clip(posterior_variance, 1e-20, None))
        ),
        posterior_mean_coef1=as_f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=as_f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        snr=as_f32(snr),
        loss_weight=as_f32(loss_weight),
    )
