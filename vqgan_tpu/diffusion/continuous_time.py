"""Continuous-time (VDM-style) diffusion over logSNR, including the learned
monotonic noise schedule, plus the v-parameterized continuous-time variant.

Behavior targets:
- /root/reference/denoising_diffusion_pytorch/
  continuous_time_gaussian_diffusion.py:49-275 — linear/cosine/learned logSNR
  schedules (learned = monotonic abs-weight MLP, normalized to the endpoint
  range, with a gradient fraction), noise-prediction loss, ancestral sampler
  with the corrected posterior mean.
- v_param_continuous_time_gaussian_diffusion.py:48-186 — same machinery with
  the v objective over the cosine logSNR schedule.

Note on Min-SNR here: the reference file clamps snr from BELOW
(`snr.clamp(min=γ)/snr`, :266) — opposite of the discrete-time files. We
preserve that file's behavior and document the asymmetry.

Samplers compile as single `lax.scan`s over the step grid.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.diffusion_math import (
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
)

__all__ = [
    "beta_linear_log_snr",
    "alpha_cosine_log_snr",
    "LearnedLogSNR",
    "ContinuousTimeGaussianDiffusion",
    "VParamContinuousTimeGaussianDiffusion",
]


def _log(t, eps=1e-20):
    return jnp.log(jnp.maximum(t, eps))


def beta_linear_log_snr(t):
    """logSNR approximating the original linear beta schedule."""
    return -_log(jnp.expm1(1e-4 + 10 * (t**2)))


def alpha_cosine_log_snr(t, s: float = 0.008):
    return -_log(
        jnp.cos((t + s) / (1 + s) * math.pi * 0.5) ** -2 - 1, eps=1e-5
    )


class _MonotonicDense(nn.Module):
    """Dense layer with |W|, |b| — monotonically increasing in its input."""

    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return jnp.dot(x, jnp.abs(w)) + jnp.abs(b)


class LearnedLogSNR(nn.Module):
    """Learned monotonic logSNR (VDM supplementary §H/I.2): a monotone MLP
    normalized so t=0 → log_snr_max and t=1 → log_snr_min, with a gradient
    fraction controlling how fast the schedule itself learns."""

    log_snr_max: float
    log_snr_min: float
    hidden_dim: int = 1024
    frac_gradient: float = 1.0

    @nn.compact
    def __call__(self, t):
        slope = self.log_snr_min - self.log_snr_max
        intercept = self.log_snr_max

        lin1 = _MonotonicDense(1, name="lin1")
        lin2 = _MonotonicDense(self.hidden_dim, name="lin2")
        lin3 = _MonotonicDense(1, name="lin3")

        def net(x):
            x = lin1(x[..., None])
            res = lin3(jax.nn.sigmoid(lin2(x)))
            return (x + res)[..., 0]

        out_zero = net(jnp.zeros_like(t))
        out_one = net(jnp.ones_like(t))
        out = net(t)

        normed = slope * ((out - out_zero) / (out_one - out_zero)) + intercept
        return (
            normed * self.frac_gradient
            + jax.lax.stop_gradient(normed) * (1 - self.frac_gradient)
        )


def _right_pad(t, ndim):
    return t.reshape(t.shape + (1,) * (ndim - t.ndim))


@dataclasses.dataclass
class ContinuousTimeGaussianDiffusion:
    """model_apply(params, x, log_snr[B]) -> pred_noise.

    For the learned schedule, pass `log_snr_apply(params, t)` and keep its
    params inside the same trained pytree.
    """

    model_apply: Callable
    image_size: int
    channels: int = 3
    noise_schedule: str = "linear"  # "linear" | "cosine" | "learned"
    num_sample_steps: int = 500
    clip_sample_denoised: bool = True
    min_snr_loss_weight: bool = False
    min_snr_gamma: float = 5.0
    log_snr_apply: Optional[Callable] = None  # for "learned"

    def __post_init__(self):
        if self.noise_schedule == "linear":
            self._log_snr = lambda params, t: beta_linear_log_snr(t)
        elif self.noise_schedule == "cosine":
            self._log_snr = lambda params, t: alpha_cosine_log_snr(t)
        elif self.noise_schedule == "learned":
            assert self.log_snr_apply is not None
            self._log_snr = self.log_snr_apply
        else:
            raise ValueError(
                f"unknown noise schedule {self.noise_schedule!r}")

    @staticmethod
    def learned_endpoints():
        """(log_snr_max, log_snr_min) anchoring the learned schedule to the
        linear one's range."""
        return (
            float(beta_linear_log_snr(jnp.array(0.0))),
            float(beta_linear_log_snr(jnp.array(1.0))),
        )

    # training ------------------------------------------------------------

    def q_sample(self, params, key, x_start, times):
        noise = jax.random.normal(key, x_start.shape, jnp.float32)
        log_snr = self._log_snr(params, times)
        padded = _right_pad(log_snr, x_start.ndim)
        alpha = jnp.sqrt(jax.nn.sigmoid(padded))
        sigma = jnp.sqrt(jax.nn.sigmoid(-padded))
        return x_start * alpha + noise * sigma, log_snr, noise, alpha, sigma

    def p_losses(self, params, key, x_start, times):
        k_q, _ = jax.random.split(key)
        x, log_snr, noise, _, _ = self.q_sample(params, k_q, x_start, times)
        model_out = self.model_apply(params, x, log_snr)
        losses = jnp.mean(
            (model_out - noise) ** 2, axis=tuple(range(1, x_start.ndim)))
        if self.min_snr_loss_weight:
            snr = jnp.exp(log_snr)
            # file-local convention: clamp from below (reference :263-267)
            losses = losses * (jnp.maximum(snr, self.min_snr_gamma) / snr)
        return jnp.mean(losses)

    def loss(self, params, key, img):
        k_t, k_p = jax.random.split(key)
        times = jax.random.uniform(k_t, (img.shape[0],))
        return self.p_losses(params, k_p, normalize_to_neg_one_to_one(img),
                             times)

    # sampling ------------------------------------------------------------

    def _model_x_start_and_mean(self, params, x, time, time_next):
        log_snr = self._log_snr(params, time)
        log_snr_next = self._log_snr(params, time_next)
        c = -jnp.expm1(log_snr - log_snr_next)

        alpha = jnp.sqrt(jax.nn.sigmoid(log_snr))
        sigma = jnp.sqrt(jax.nn.sigmoid(-log_snr))
        alpha_next = jnp.sqrt(jax.nn.sigmoid(log_snr_next))
        sq_sigma_next = jax.nn.sigmoid(-log_snr_next)

        batch_log_snr = jnp.full((x.shape[0],), log_snr)
        pred_noise = self.model_apply(params, x, batch_log_snr)

        if self.clip_sample_denoised:
            x_start = jnp.clip((x - sigma * pred_noise) / alpha, -1.0, 1.0)
            model_mean = alpha_next * (x * (1 - c) / alpha + c * x_start)
        else:
            model_mean = alpha_next / alpha * (x - c * sigma * pred_noise)
        return model_mean, sq_sigma_next * c

    def sample(self, params, key, batch_size: int = 16):
        shape = (batch_size, self.image_size, self.image_size, self.channels)
        steps = jnp.linspace(1.0, 0.0, self.num_sample_steps + 1)
        pairs = jnp.stack([steps[:-1], steps[1:]], axis=1)
        k_init, k_loop = jax.random.split(key)
        img0 = jax.random.normal(k_init, shape, jnp.float32)

        def body(carry, pair):
            img, k = carry
            mean, var = self._model_x_start_and_mean(
                params, img, pair[0], pair[1])
            k, kn = jax.random.split(k)
            noise = jax.random.normal(kn, shape, jnp.float32)
            img = jnp.where(
                pair[1] == 0.0, mean, mean + jnp.sqrt(var) * noise)
            return (img, k), None

        (img, _), _ = jax.lax.scan(body, (img0, k_loop), pairs)
        return unnormalize_to_zero_to_one(jnp.clip(img, -1.0, 1.0))


@dataclasses.dataclass
class VParamContinuousTimeGaussianDiffusion:
    """v-objective over the cosine logSNR schedule (Appendix D of the
    progressive-distillation paper)."""

    model_apply: Callable
    image_size: int
    channels: int = 3
    num_sample_steps: int = 500
    clip_sample_denoised: bool = True

    def q_sample(self, key, x_start, times):
        noise = jax.random.normal(key, x_start.shape, jnp.float32)
        log_snr = alpha_cosine_log_snr(times)
        padded = _right_pad(log_snr, x_start.ndim)
        alpha = jnp.sqrt(jax.nn.sigmoid(padded))
        sigma = jnp.sqrt(jax.nn.sigmoid(-padded))
        return x_start * alpha + noise * sigma, log_snr, noise, alpha, sigma

    def p_losses(self, params, key, x_start, times):
        x, log_snr, noise, alpha, sigma = self.q_sample(key, x_start, times)
        v = alpha * noise - sigma * x_start
        model_out = self.model_apply(params, x, log_snr)
        return jnp.mean((model_out - v) ** 2)

    def loss(self, params, key, img):
        k_t, k_p = jax.random.split(key)
        times = jax.random.uniform(k_t, (img.shape[0],))
        return self.p_losses(params, k_p, normalize_to_neg_one_to_one(img),
                             times)

    def sample(self, params, key, batch_size: int = 16):
        shape = (batch_size, self.image_size, self.image_size, self.channels)
        steps = jnp.linspace(1.0, 0.0, self.num_sample_steps + 1)
        pairs = jnp.stack([steps[:-1], steps[1:]], axis=1)
        k_init, k_loop = jax.random.split(key)
        img0 = jax.random.normal(k_init, shape, jnp.float32)

        def body(carry, pair):
            img, k = carry
            time, time_next = pair[0], pair[1]
            log_snr = alpha_cosine_log_snr(time)
            log_snr_next = alpha_cosine_log_snr(time_next)
            c = -jnp.expm1(log_snr - log_snr_next)
            alpha = jnp.sqrt(jax.nn.sigmoid(log_snr))
            sigma = jnp.sqrt(jax.nn.sigmoid(-log_snr))
            alpha_next = jnp.sqrt(jax.nn.sigmoid(log_snr_next))
            sq_sigma_next = jax.nn.sigmoid(-log_snr_next)

            batch_log_snr = jnp.full((batch_size,), log_snr)
            pred_v = self.model_apply(params, img, batch_log_snr)
            # Appendix D: x0 = α·x − σ·v
            x_start = alpha * img - sigma * pred_v
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
