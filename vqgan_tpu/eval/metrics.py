"""Image quality metrics: PSNR, SSIM (full Wang et al. windowed version and
the reference's simplified global variant).

Behavior targets: /root/reference/test_vae_reconstruction.py:74-98 computes
MSE/PSNR and a simplified global-statistics SSIM; we provide that exact
variant (`ssim_simplified`) for threshold parity plus a proper 11×11
Gaussian-windowed SSIM (`ssim`) — all jit-able and batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mse", "psnr", "ssim", "ssim_simplified"]


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-image MSE over [B, H, W, C] in [0, 1]."""
    return jnp.mean((a - b) ** 2, axis=tuple(range(1, a.ndim)))


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    m = mse(a, b)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(m, 1e-12))


def ssim_simplified(a: jax.Array, b: jax.Array, max_val: float = 1.0):
    """Global-statistics SSIM (no windowing) — matches the reference's
    simplified computation (test_vae_reconstruction.py:86-98)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    axes = tuple(range(1, a.ndim))
    mu_a = jnp.mean(a, axis=axes)
    mu_b = jnp.mean(b, axis=axes)
    var_a = jnp.var(a, axis=axes)
    var_b = jnp.var(b, axis=axes)
    cov = jnp.mean(
        (a - mu_a.reshape(-1, *([1] * (a.ndim - 1))))
        * (b - mu_b.reshape(-1, *([1] * (a.ndim - 1)))),
        axis=axes,
    )
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(
    a: jax.Array, b: jax.Array, max_val: float = 1.0,
    window_size: int = 11, sigma: float = 1.5,
) -> jax.Array:
    """Windowed SSIM over [B, H, W, C], averaged over space and channels."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    kernel = _gaussian_kernel(window_size, sigma)
    kernel = kernel[:, :, None, None]  # HWIO, depthwise per channel

    chans = a.shape[-1]
    k = jnp.tile(kernel, (1, 1, 1, chans))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=chans,
        )

    mu_a = filt(a)
    mu_b = filt(b)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = filt(a * a) - mu_aa
    sigma_bb = filt(b * b) - mu_bb
    sigma_ab = filt(a * b) - mu_ab

    ssim_map = ((2 * mu_ab + c1) * (2 * sigma_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))
