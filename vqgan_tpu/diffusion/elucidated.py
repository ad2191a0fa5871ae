"""Elucidated diffusion (EDM, Karras et al. 2022).

Behavior target: /root/reference/denoising_diffusion_pytorch/
elucidated_diffusion.py:35-277 — Table-1 preconditioners (c_skip/c_out/c_in/
c_noise), ρ-schedule (eq. 5), stochastic Heun 2nd-order sampler with churn,
the DPM-Solver++(2M) sampler, log-normal training σ distribution and the EDM
loss weight.

TPU-native: both samplers compile as single `lax.scan`s. The Heun
second-order correction ("skip when σ_next == 0") and DPM++'s "first step /
σ==0" branch become masked selects — all shapes static. Self-conditioning's
coin-flip uses an explicit PRNG key.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.diffusion_math import (
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
)

__all__ = ["ElucidatedDiffusion"]


@dataclasses.dataclass
class ElucidatedDiffusion:
    """net_apply(params, x, t_noise_cond, self_cond=None) -> denoised-space
    output; the net must use a continuous (fourier) time conditioning."""

    net_apply: Callable
    image_size: int
    channels: int = 3
    num_sample_steps: int = 32
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    rho: float = 7.0
    P_mean: float = -1.2
    P_std: float = 1.2
    S_churn: float = 80.0
    S_tmin: float = 0.05
    S_tmax: float = 50.0
    S_noise: float = 1.003
    self_condition: bool = False

    # Table-1 preconditioners ------------------------------------------------

    def c_skip(self, sigma):
        return (self.sigma_data**2) / (sigma**2 + self.sigma_data**2)

    def c_out(self, sigma):
        return sigma * self.sigma_data * (self.sigma_data**2 + sigma**2) ** -0.5

    def c_in(self, sigma):
        return (sigma**2 + self.sigma_data**2) ** -0.5

    def c_noise(self, sigma):
        return jnp.log(jnp.maximum(sigma, 1e-20)) * 0.25

    def preconditioned_forward(
        self, params, noised, sigma, self_cond=None, clamp: bool = False
    ):
        """EDM eq. (7): D(x) = c_skip·x + c_out·F(c_in·x, c_noise)."""
        if sigma.ndim == 1:
            padded = sigma[:, None, None, None]
        else:
            padded = sigma
            sigma = sigma.reshape(sigma.shape[0])

        net_out = self.net_apply(
            params, self.c_in(padded) * noised, self.c_noise(sigma), self_cond
        )
        out = self.c_skip(padded) * noised + self.c_out(padded) * net_out
        if clamp:
            out = jnp.clip(out, -1.0, 1.0)
        return out

    # schedule ---------------------------------------------------------------

    def sample_schedule(self, num_sample_steps: Optional[int] = None):
        """σ_i per EDM eq. (5), with a trailing 0 (host-side numpy)."""
        n = num_sample_steps or self.num_sample_steps
        inv_rho = 1.0 / self.rho
        steps = np.arange(n, dtype=np.float64)
        sigmas = (
            self.sigma_max**inv_rho
            + steps / (n - 1) * (self.sigma_min**inv_rho - self.sigma_max**inv_rho)
        ) ** self.rho
        return jnp.asarray(np.append(sigmas, 0.0), jnp.float32)

    # samplers ---------------------------------------------------------------

    def sample(
        self,
        params,
        key,
        batch_size: int = 16,
        num_sample_steps: Optional[int] = None,
        clamp: bool = True,
    ):
        """Stochastic Heun sampler with churn (reference :142-200), one scan."""
        n = num_sample_steps or self.num_sample_steps
        shape = (batch_size, self.image_size, self.image_size, self.channels)
        sigmas = self.sample_schedule(n)
        gammas = jnp.where(
            (sigmas >= self.S_tmin) & (sigmas <= self.S_tmax),
            min(self.S_churn / n, math.sqrt(2) - 1),
            0.0,
        )
        triples = jnp.stack([sigmas[:-1], sigmas[1:], gammas[:-1]], axis=1)

        k_init, k_loop = jax.random.split(key)
        images0 = sigmas[0] * jax.random.normal(k_init, shape, jnp.float32)
        x_start0 = jnp.zeros(shape, jnp.float32)

        def body(carry, trip):
            images, x_start, k = carry
            sigma, sigma_next, gamma = trip[0], trip[1], trip[2]
            k, ke = jax.random.split(k)
            eps = self.S_noise * jax.random.normal(ke, shape, jnp.float32)

            sigma_hat = sigma + gamma * sigma
            images_hat = images + jnp.sqrt(
                jnp.maximum(sigma_hat**2 - sigma**2, 0.0)) * eps

            sc = x_start if self.self_condition else None
            bs = jnp.full((batch_size,), sigma_hat)
            model_output = self.preconditioned_forward(
                params, images_hat, bs, sc, clamp=clamp)
            denoised_over_sigma = (images_hat - model_output) / sigma_hat

            images_next = images_hat + (sigma_next - sigma_hat) * denoised_over_sigma

            # 2nd-order correction — always computed, masked at σ_next == 0
            sc2 = model_output if self.self_condition else None
            bs2 = jnp.full((batch_size,), jnp.maximum(sigma_next, 1e-8))
            model_output_next = self.preconditioned_forward(
                params, images_next, bs2, sc2, clamp=clamp)
            denoised_prime = (images_next - model_output_next) / jnp.maximum(
                sigma_next, 1e-8)
            images_heun = images_hat + 0.5 * (sigma_next - sigma_hat) * (
                denoised_over_sigma + denoised_prime)

            last = sigma_next == 0.0
            images = jnp.where(last, images_next, images_heun)
            x_start = jnp.where(last, model_output, model_output_next)
            return (images, x_start, k), None

        (images, _, _), _ = jax.lax.scan(
            body, (images0, x_start0, k_loop), triples)
        return unnormalize_to_zero_to_one(jnp.clip(images, -1.0, 1.0))

    def sample_using_dpmpp(
        self,
        params,
        key,
        batch_size: int = 16,
        num_sample_steps: Optional[int] = None,
    ):
        """DPM-Solver++(2M) (reference :202-237), one scan with the
        previous-σ/denoised history carried."""
        n = num_sample_steps or self.num_sample_steps
        shape = (batch_size, self.image_size, self.image_size, self.channels)
        sigmas = self.sample_schedule(n)
        images0 = sigmas[0] * jax.random.normal(key, shape, jnp.float32)

        t_fn = lambda s: -jnp.log(jnp.maximum(s, 1e-20))
        sigma_fn = lambda t: jnp.exp(-t)

        idx = jnp.arange(len(sigmas) - 1)

        def body(carry, i):
            images, old_denoised, has_old = carry
            sigma, sigma_next = sigmas[i], sigmas[i + 1]
            bs = jnp.full((batch_size,), sigma)
            denoised = self.preconditioned_forward(params, images, bs)
            t, t_next = t_fn(sigma), t_fn(sigma_next)
            h = t_next - t

            sigma_prev = sigmas[jnp.maximum(i - 1, 0)]
            h_last = t - t_fn(sigma_prev)
            r = h_last / jnp.where(h == 0, 1.0, h)
            gamma = -1.0 / (2.0 * jnp.where(r == 0, 1.0, r))
            denoised_mix = (1 - gamma) * denoised + gamma * old_denoised

            use_plain = jnp.logical_or(
                jnp.logical_not(has_old), sigma_next == 0.0)
            denoised_d = jnp.where(use_plain, denoised, denoised_mix)

            images = (sigma_fn(t_next) / sigma_fn(t)) * images - (
                jnp.expm1(-h)) * denoised_d
            return (images, denoised, jnp.asarray(True)), None

        (images, _, _), _ = jax.lax.scan(
            body, (images0, jnp.zeros(shape, jnp.float32), jnp.asarray(False)),
            idx)
        return unnormalize_to_zero_to_one(jnp.clip(images, -1.0, 1.0))

    # training ---------------------------------------------------------------

    def loss_weight(self, sigma):
        return (sigma**2 + self.sigma_data**2) * (sigma * self.sigma_data) ** -2

    def noise_distribution(self, key, batch_size):
        return jnp.exp(
            self.P_mean
            + self.P_std * jax.random.normal(key, (batch_size,), jnp.float32)
        )

    def loss(self, params, key, images):
        b = images.shape[0]
        k_sigma, k_noise, k_flip = jax.random.split(key, 3)
        images = normalize_to_neg_one_to_one(images)

        sigmas = self.noise_distribution(k_sigma, b)
        padded = sigmas[:, None, None, None]
        noise = jax.random.normal(k_noise, images.shape, jnp.float32)
        noised = images + padded * noise

        self_cond = None
        if self.self_condition:
            sc = jax.lax.stop_gradient(
                self.preconditioned_forward(params, noised, sigmas))
            coin = jax.random.uniform(k_flip, ()) < 0.5
            self_cond = jnp.where(coin, sc, jnp.zeros_like(sc))

        denoised = self.preconditioned_forward(params, noised, sigmas, self_cond)
        losses = jnp.mean(
            (denoised - images) ** 2, axis=tuple(range(1, images.ndim)))
        return jnp.mean(losses * self.loss_weight(sigmas))
