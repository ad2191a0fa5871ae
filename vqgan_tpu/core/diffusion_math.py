"""Pure diffusion-process math: q_sample, parameterization conversions,
posterior, DDIM step.

All functions are shape-polymorphic pure jnp — they trace once under jit and
fuse into surrounding kernels. `t` is an int32 array of shape [B]; gathered
schedule coefficients broadcast over trailing image dims.

Parity targets (reference, behavior only):
  classifier_free_guidance.py:565-568 (extract), :704-735 (conversions +
  posterior), :865-876 (q_sample), :807-840 (DDIM update).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule

__all__ = [
    "extract",
    "q_sample",
    "predict_start_from_noise",
    "predict_noise_from_start",
    "predict_v",
    "predict_start_from_v",
    "q_posterior",
    "ddim_step",
    "normalize_to_neg_one_to_one",
    "unnormalize_to_zero_to_one",
]


def extract(a: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep coefficients and reshape to broadcast over an
    `ndim`-dimensional batch of samples: [B] -> [B, 1, ..., 1]."""
    out = a[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def normalize_to_neg_one_to_one(img: jax.Array) -> jax.Array:
    return img * 2.0 - 1.0


def unnormalize_to_zero_to_one(t: jax.Array) -> jax.Array:
    return (t + 1.0) * 0.5


def q_sample(
    sched: DiffusionSchedule, x_start: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """Forward diffusion q(x_t | x_0). Computed in fp32 regardless of input
    dtype (the reference forces this under autocast, cfg.py:865)."""
    x32 = x_start.astype(jnp.float32)
    n32 = noise.astype(jnp.float32)
    out = (
        extract(sched.sqrt_alphas_cumprod, t, x32.ndim) * x32
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, x32.ndim) * n32
    )
    return out.astype(x_start.dtype)


def predict_start_from_noise(sched, x_t, t, noise):
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def predict_noise_from_start(sched, x_t, t, x0):
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def predict_v(sched, x_start, t, noise):
    return (
        extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * noise
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * x_start
    )


def predict_start_from_v(sched, x_t, t, v):
    return (
        extract(sched.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
    )


def q_posterior(sched, x_start, x_t, t):
    """Posterior q(x_{t-1} | x_t, x_0): (mean, variance, log_variance)."""
    posterior_mean = (
        extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    posterior_variance = extract(sched.posterior_variance, t, x_t.ndim)
    posterior_log_variance = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return posterior_mean, posterior_variance, posterior_log_variance


def ddim_step(
    sched: DiffusionSchedule,
    img: jax.Array,
    x_start: jax.Array,
    pred_noise: jax.Array,
    time: jax.Array,
    time_next: jax.Array,
    noise: jax.Array,
    eta: float,
) -> jax.Array:
    """One DDIM update, valid for scalar traced `time`/`time_next`.

    When `time_next < 0` the result is `x_start` (final step) — expressed as a
    `jnp.where` so the whole sampler compiles to a single `lax.scan`.
    """
    alpha = sched.alphas_cumprod[time]
    alpha_next_raw = sched.alphas_cumprod[jnp.maximum(time_next, 0)]
    # At time_next < 0 substitute 1.0 so sqrt terms are well-defined; the
    # where() below discards the value anyway.
    alpha_next = jnp.where(time_next < 0, 1.0, alpha_next_raw)

    sigma = eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
    c = jnp.sqrt(jnp.maximum(1.0 - alpha_next - sigma**2, 0.0))

    out = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
    return jnp.where(time_next < 0, x_start, out)
