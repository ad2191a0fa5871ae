"""Weighted-objective diffusion: the model predicts noise, x0, AND a 2-way
softmax weighting; the posterior uses the weighted x0 ensemble.

Behavior target: /root/reference/denoising_diffusion_pytorch/
weighted_objective_gaussian_diffusion.py:22-82. Channel-last: the model's
output is [..., C + C + 2].
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import diffusion_math as dm
from .gaussian import GaussianDiffusion

__all__ = ["WeightedObjectiveGaussianDiffusion"]


@dataclasses.dataclass
class WeightedObjectiveGaussianDiffusion(GaussianDiffusion):
    pred_noise_loss_weight: float = 0.1
    pred_x_start_loss_weight: float = 0.1

    def __post_init__(self):
        super().__post_init__()
        assert not self.is_ddim_sampling, "ddim sampling cannot be used"

    def _split(self, model_output):
        c = self.channels
        return (
            model_output[..., :c],
            model_output[..., c : 2 * c],
            model_output[..., 2 * c :],  # [..., 2] weights
        )

    def _weighted_x_start(self, x, t, pred_noise, pred_x_start, weights,
                          noise_clip=None):
        x_from_noise = dm.predict_start_from_noise(self.schedule, x, t,
                                                   pred_noise)
        if noise_clip is not None:
            x_from_noise = jnp.clip(x_from_noise, -noise_clip, noise_clip)
        w = jax.nn.softmax(weights, axis=-1)  # [..., H, W, 2] per-pixel
        return (
            w[..., 0:1] * x_from_noise + w[..., 1:2] * pred_x_start
        )

    def p_mean_variance(self, params, x, t, *, clip_denoised=True):
        model_output = self.model_apply(params, x, t)
        pred_noise, pred_x_start, weights = self._split(model_output)
        weighted = self._weighted_x_start(x, t, pred_noise, pred_x_start,
                                          weights)
        if clip_denoised:
            weighted = jnp.clip(weighted, -1.0, 1.0)
        return dm.q_posterior(self.schedule, weighted, x, t)

    def p_losses(self, params, key, x_start, t, classes=None, *, noise=None,
                 **_):
        if noise is None:
            noise = jax.random.normal(key, x_start.shape, jnp.float32)
        x_t = dm.q_sample(self.schedule, x_start, t, noise)
        model_output = self.model_apply(params, x_t, t)
        pred_noise, pred_x_start, weights = self._split(model_output)

        noise_loss = jnp.mean((noise - pred_noise) ** 2) * \
            self.pred_noise_loss_weight
        x_start_loss = jnp.mean((x_start - pred_x_start) ** 2) * \
            self.pred_x_start_loss_weight

        weighted = self._weighted_x_start(
            x_t, t, pred_noise, pred_x_start, weights, noise_clip=2.0)
        weighted_loss = jnp.mean((x_start - weighted) ** 2)
        return weighted_loss + x_start_loss + noise_loss

    def p_sample_loop(self, params, key, shape, classes=None, *,
                      cond_scale=1.0, rescaled_phi=0.0, clip_denoised=True):
        k_init, k_loop = jax.random.split(key)
        img0 = jax.random.normal(k_init, shape, jnp.float32)
        ts = jnp.arange(self.timesteps - 1, -1, -1, dtype=jnp.int32)

        def body(carry, t):
            img, k = carry
            tb = jnp.full((shape[0],), t, jnp.int32)
            mean, _, log_var = self.p_mean_variance(
                params, img, tb, clip_denoised=clip_denoised)
            k, kn = jax.random.split(k)
            noise = jnp.where(
                t > 0, jax.random.normal(kn, shape, jnp.float32), 0.0)
            return (mean + jnp.exp(0.5 * log_var) * noise, k), None

        (img, _), _ = jax.lax.scan(body, (img0, k_loop), ts)
        return self.unnormalize(img)
