"""Classifier-guided diffusion (Sohl-Dickstein / Dhariwal-Nichol style).

Behavior target: /root/reference/denoising_diffusion_pytorch/
guided_diffusion.py:420-991 — `condition_mean` shifts the posterior mean by
`variance · ∇ₓ log p(y|x)`; the cond_fn is threaded through p_sample/ddim.

In JAX the classifier gradient is just `jax.grad` of a pure function — no
`torch.enable_grad` dance (the reference needs :979-991 to re-enable
autograd inside inference mode). The example `classifier_cond_fn` below shows
the idiom.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core import diffusion_math as dm
from .gaussian import GaussianDiffusion

__all__ = ["GuidedGaussianDiffusion", "make_classifier_cond_fn"]


def make_classifier_cond_fn(classifier_apply: Callable, scale: float = 1.0):
    """cond_fn(x, t, y) = scale · ∇ₓ log p(y | x, t) for a jittable
    classifier_apply(x, t) -> logits (reference guided_diffusion.py:979-991).
    """

    def log_prob_selected(x, t, y):
        logits = classifier_apply(x, t)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return jnp.sum(jnp.take_along_axis(log_probs, y[:, None], axis=1))

    def cond_fn(x, t, y):
        return jax.grad(log_prob_selected)(x, t, y) * scale

    return cond_fn


@dataclasses.dataclass
class GuidedGaussianDiffusion(GaussianDiffusion):
    """Sampling accepts `cond_fn(x, t, **guidance_kwargs) -> grad` and shifts
    the posterior mean: mean + variance · grad (condition_mean,
    reference :593-608)."""

    def condition_mean(self, mean, variance, x, t, cond_fn, guidance_kwargs):
        gradient = cond_fn(x, t, **guidance_kwargs)
        return mean + variance * gradient

    def p_sample_loop_guided(
        self,
        params,
        key,
        shape,
        cond_fn: Optional[Callable] = None,
        guidance_kwargs: Optional[dict] = None,
        *,
        clip_denoised: bool = True,
    ):
        guidance_kwargs = guidance_kwargs or {}
        k_init, k_loop = jax.random.split(key)
        img0 = jax.random.normal(k_init, shape, jnp.float32)
        ts = jnp.arange(self.timesteps - 1, -1, -1, dtype=jnp.int32)

        def body(carry, t):
            img, k = carry
            tb = jnp.full((shape[0],), t, jnp.int32)
            _, x_start = self.model_predictions(params, img, tb,
                                                cond_scale=1.0)
            if clip_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
            mean, var, log_var = dm.q_posterior(self.schedule, x_start, img, tb)
            if cond_fn is not None:
                mean = self.condition_mean(
                    mean, var, img, tb, cond_fn, guidance_kwargs)
            k, kn = jax.random.split(k)
            noise = jnp.where(
                t > 0, jax.random.normal(kn, shape, jnp.float32), 0.0)
            return (mean + jnp.exp(0.5 * log_var) * noise, k), None

        (img, _), _ = jax.lax.scan(body, (img0, k_loop), ts)
        return self.unnormalize(img)

    def ddim_sample_guided(
        self,
        params,
        key,
        shape,
        cond_fn: Optional[Callable] = None,
        guidance_kwargs: Optional[dict] = None,
        *,
        clip_denoised: bool = True,
    ):
        """DDIM with the guidance gradient folded into pred_noise
        (reference :642-690)."""
        guidance_kwargs = guidance_kwargs or {}
        pairs = self._ddim_time_pairs()
        k_init, k_loop = jax.random.split(key)
        img0 = jax.random.normal(k_init, shape, jnp.float32)
        sched = self.schedule

        def body(carry, pair):
            img, k = carry
            time, time_next = pair[0], pair[1]
            tb = jnp.full((shape[0],), time, jnp.int32)
            pred_noise, x_start = self.model_predictions(
                params, img, tb, cond_scale=1.0, clip_x_start=clip_denoised)
            if cond_fn is not None:
                # ε̂ = ε − √(1−ᾱ)·∇ log p(y|x) (classifier-guided DDIM)
                grad = cond_fn(img, tb, **guidance_kwargs)
                pred_noise = pred_noise - dm.extract(
                    sched.sqrt_one_minus_alphas_cumprod, tb, img.ndim
                ) * grad
                x_start = dm.predict_start_from_noise(sched, img, tb,
                                                      pred_noise)
                if clip_denoised:
                    x_start = jnp.clip(x_start, -1.0, 1.0)
            k, kn = jax.random.split(k)
            noise = jax.random.normal(kn, shape, jnp.float32)
            img = dm.ddim_step(sched, img, x_start, pred_noise, time,
                               time_next, noise, self.ddim_sampling_eta)
            return (img, k), None

        (img, _), _ = jax.lax.scan(body, (img0, k_loop), pairs)
        return self.unnormalize(img)
