"""Improved-DDPM learned-variance diffusion (Nichol & Dhariwal 2021).

Behavior target: /root/reference/denoising_diffusion_pytorch/
learned_gaussian_diffusion.py:34-155 — model emits 2C channels (prediction +
variance-interpolation fraction), hybrid loss = simple MSE + λ·VLB where VLB
is KL(q‖p) per step and a discretized Gaussian NLL at t=0, with the model
mean detached inside the VLB term.

Channel-last convention: the 2C split is on the trailing axis.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..core import diffusion_math as dm
from .gaussian import GaussianDiffusion

__all__ = [
    "LearnedVarianceGaussianDiffusion",
    "normal_kl",
    "discretized_gaussian_log_likelihood",
]

NAT = 1.0 / math.log(2.0)


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def _approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales, thres=0.999):
    """Log-likelihood of 8-bit-discretized data under a Gaussian."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = _approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = _approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_ = lambda t: jnp.log(jnp.maximum(t, 1e-15))
    log_cdf_plus = log_(cdf_plus)
    log_one_minus_cdf_min = log_(1.0 - cdf_min)
    log_cdf_delta = log_(cdf_plus - cdf_min)
    return jnp.where(
        x < -thres,
        log_cdf_plus,
        jnp.where(x > thres, log_one_minus_cdf_min, log_cdf_delta),
    )


def _meanflat(x):
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


@dataclasses.dataclass
class LearnedVarianceGaussianDiffusion(GaussianDiffusion):
    """model_apply must emit 2·channels on the last axis."""

    vb_loss_weight: float = 0.001

    def _split(self, model_output):
        return jnp.split(model_output, 2, axis=-1)

    def model_predictions(self, params, x, t, classes=None, *,
                          cond_scale=1.0, rescaled_phi=0.0,
                          clip_x_start=False):
        model_output = self.model_apply(params, x, t)
        pred, _ = self._split(model_output)
        maybe_clip = (
            (lambda z: jnp.clip(z, -1.0, 1.0)) if clip_x_start else (lambda z: z)
        )
        if self.objective == "pred_noise":
            pred_noise = pred
            x_start = maybe_clip(
                dm.predict_start_from_noise(self.schedule, x, t, pred))
        elif self.objective == "pred_x0":
            x_start = maybe_clip(pred)
            pred_noise = dm.predict_noise_from_start(self.schedule, x, t, x_start)
        else:
            raise ValueError("learned variance supports pred_noise/pred_x0")
        return pred_noise, x_start

    def p_mean_variance(self, params, x, t, *, clip_denoised=False,
                        model_output=None):
        if model_output is None:
            model_output = self.model_apply(params, x, t)
        pred_noise, var_frac_raw = self._split(model_output)

        sched = self.schedule
        min_log = dm.extract(sched.posterior_log_variance_clipped, t, x.ndim)
        max_log = dm.extract(jnp.log(sched.betas), t, x.ndim)
        frac = dm.unnormalize_to_zero_to_one(var_frac_raw)
        model_log_variance = frac * max_log + (1 - frac) * min_log

        x_start = dm.predict_start_from_noise(sched, x, t, pred_noise)
        if clip_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        model_mean, _, _ = dm.q_posterior(sched, x_start, x, t)
        return model_mean, jnp.exp(model_log_variance), model_log_variance, x_start

    def p_losses(self, params, key, x_start, t, classes=None, *, noise=None,
                 clip_denoised=False, **_):
        if noise is None:
            noise = jax.random.normal(key, x_start.shape, jnp.float32)
        x_t = dm.q_sample(self.schedule, x_start, t, noise)
        model_output = self.model_apply(params, x_t, t)

        true_mean, _, true_log_var = dm.q_posterior(
            self.schedule, x_start, x_t, t)
        model_mean, _, model_log_var, _ = self.p_mean_variance(
            params, x_t, t, clip_denoised=clip_denoised,
            model_output=model_output)

        detached_mean = jax.lax.stop_gradient(model_mean)
        kl = _meanflat(
            normal_kl(true_mean, true_log_var, detached_mean, model_log_var)
        ) * NAT
        decoder_nll = -_meanflat(
            discretized_gaussian_log_likelihood(
                x_start, means=detached_mean, log_scales=0.5 * model_log_var)
        ) * NAT
        vb_losses = jnp.where(t == 0, decoder_nll, kl)

        pred_noise, _ = self._split(model_output)
        simple = jnp.mean((pred_noise - noise) ** 2)
        return simple + jnp.mean(vb_losses) * self.vb_loss_weight

    def p_sample_loop(self, params, key, shape, classes=None, *,
                      cond_scale=1.0, rescaled_phi=0.0, clip_denoised=True):
        """Ancestral sampling with the learned variance."""
        k_init, k_loop = jax.random.split(key)
        img0 = jax.random.normal(k_init, shape, jnp.float32)
        ts = jnp.arange(self.timesteps - 1, -1, -1, dtype=jnp.int32)

        def body(carry, t):
            img, k = carry
            tb = jnp.full((shape[0],), t, jnp.int32)
            mean, _, log_var, _ = self.p_mean_variance(
                params, img, tb, clip_denoised=clip_denoised)
            k, kn = jax.random.split(k)
            noise = jnp.where(
                t > 0, jax.random.normal(kn, shape, jnp.float32), 0.0)
            return (mean + jnp.exp(0.5 * log_var) * noise, k), None

        (img, _), _ = jax.lax.scan(body, (img0, k_loop), ts)
        return self.unnormalize(img)
