"""Simple diffusion: continuous-time logSNR diffusion for UViT
(arXiv 2301.11093).

Behavior target: /root/reference/denoising_diffusion_pytorch/
simple_diffusion.py:502-705 — cosine logSNR with min/max clamps, the SHIFTED
schedule (+2·log(noise_d/image_d)) and the t-INTERPOLATED low/high variant,
v/eps objectives, ancestral sampler with the corrected posterior mean,
Min-SNR loss weighting (clamped from above here, unlike
continuous_time_gaussian_diffusion.py's from-below quirk).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.diffusion_math import (
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
)

__all__ = [
    "logsnr_schedule_cosine",
    "logsnr_schedule_shifted",
    "logsnr_schedule_interpolated",
    "SimpleDiffusion",
]


def logsnr_schedule_cosine(t, logsnr_min=-15.0, logsnr_max=15.0):
    t_min = math.atan(math.exp(-0.5 * logsnr_max))
    t_max = math.atan(math.exp(-0.5 * logsnr_min))
    return -2.0 * jnp.log(
        jnp.maximum(jnp.tan(t_min + t * (t_max - t_min)), 1e-20))


def logsnr_schedule_shifted(fn: Callable, image_d: float, noise_d: float):
    shift = 2.0 * math.log(noise_d / image_d)

    def inner(t, *args, **kwargs):
        return fn(t, *args, **kwargs) + shift

    return inner


def logsnr_schedule_interpolated(fn: Callable, image_d: float,
                                 noise_d_low: float, noise_d_high: float):
    low = logsnr_schedule_shifted(fn, image_d, noise_d_low)
    high = logsnr_schedule_shifted(fn, image_d, noise_d_high)

    def inner(t, *args, **kwargs):
        return t * low(t, *args, **kwargs) + (1 - t) * high(t, *args, **kwargs)

    return inner


@dataclasses.dataclass
class SimpleDiffusion:
    """model_apply(params, x, log_snr[B]) -> prediction (v or eps)."""

    model_apply: Callable
    image_size: int
    channels: int = 3
    pred_objective: str = "v"  # "v" | "eps"
    noise_schedule: Callable = logsnr_schedule_cosine
    noise_d: Optional[float] = None
    noise_d_low: Optional[float] = None
    noise_d_high: Optional[float] = None
    num_sample_steps: int = 500
    clip_sample_denoised: bool = True
    min_snr_loss_weight: bool = True
    min_snr_gamma: float = 5.0

    def __post_init__(self):
        assert self.pred_objective in ("v", "eps")
        assert not (self.noise_d is not None
                    and self.noise_d_low is not None), (
            "set noise_d OR (noise_d_low, noise_d_high), not both")
        self.log_snr = self.noise_schedule
        if self.noise_d is not None:
            self.log_snr = logsnr_schedule_shifted(
                self.log_snr, self.image_size, self.noise_d)
        if self.noise_d_low is not None or self.noise_d_high is not None:
            assert (self.noise_d_low is not None
                    and self.noise_d_high is not None)
            self.log_snr = logsnr_schedule_interpolated(
                self.noise_schedule, self.image_size, self.noise_d_low,
                self.noise_d_high)

    # training ------------------------------------------------------------

    def p_losses(self, params, key, x_start, times):
        noise = jax.random.normal(key, x_start.shape, jnp.float32)
        log_snr = self.log_snr(times)
        padded = log_snr.reshape(log_snr.shape + (1,) * (x_start.ndim - 1))
        alpha = jnp.sqrt(jax.nn.sigmoid(padded))
        sigma = jnp.sqrt(jax.nn.sigmoid(-padded))
        x = alpha * x_start + sigma * noise

        pred = self.model_apply(params, x, log_snr)
        if self.pred_objective == "v":
            target = alpha * noise - sigma * x_start
        else:
            target = noise
        losses = jnp.mean((pred - target) ** 2,
                          axis=tuple(range(1, x_start.ndim)))
        if self.min_snr_loss_weight:
            snr = jnp.exp(log_snr)
            clamped = jnp.minimum(snr, self.min_snr_gamma)
            weight = clamped / snr if self.pred_objective == "eps" \
                else clamped / (snr + 1)
            losses = losses * weight
        return jnp.mean(losses)

    def loss(self, params, key, img):
        k_t, k_p = jax.random.split(key)
        times = jax.random.uniform(k_t, (img.shape[0],))
        return self.p_losses(params, k_p,
                             normalize_to_neg_one_to_one(img), times)

    # sampling ------------------------------------------------------------

    def sample(self, params, key, batch_size: int = 16):
        shape = (batch_size, self.image_size, self.image_size, self.channels)
        steps = jnp.linspace(1.0, 0.0, self.num_sample_steps + 1)
        pairs = jnp.stack([steps[:-1], steps[1:]], axis=1)
        k_init, k_loop = jax.random.split(key)
        img0 = jax.random.normal(k_init, shape, jnp.float32)

        def body(carry, pair):
            img, k = carry
            time, time_next = pair[0], pair[1]
            log_snr = self.log_snr(time)
            log_snr_next = self.log_snr(time_next)
            c = -jnp.expm1(log_snr - log_snr_next)
            alpha = jnp.sqrt(jax.nn.sigmoid(log_snr))
            sigma = jnp.sqrt(jax.nn.sigmoid(-log_snr))
            alpha_next = jnp.sqrt(jax.nn.sigmoid(log_snr_next))
            sq_sigma_next = jax.nn.sigmoid(-log_snr_next)

            blog = jnp.full((batch_size,), log_snr)
            pred = self.model_apply(params, img, blog)
            if self.pred_objective == "v":
                x_start = alpha * img - sigma * pred
            else:
                x_start = (img - sigma * pred) / jnp.maximum(alpha, 1e-8)
            if self.clip_sample_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
            mean = alpha_next * (img * (1 - c) / alpha + c * x_start)
            var = sq_sigma_next * c

            k, kn = jax.random.split(k)
            noise = jax.random.normal(kn, shape, jnp.float32)
            img = jnp.where(time_next == 0.0, mean,
                            mean + jnp.sqrt(var) * noise)
            return (img, k), None

        (img, _), _ = jax.lax.scan(body, (img0, k_loop), pairs)
        return unnormalize_to_zero_to_one(jnp.clip(img, -1.0, 1.0))
