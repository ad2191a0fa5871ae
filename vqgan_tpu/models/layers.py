"""Shared NHWC building blocks for the conv autoencoders and U-Nets.

TPU-first conventions:
- NHWC layout everywhere (XLA's native conv layout on TPU; the reference is
  NCHW torch — /root/reference/vae/kl_vae.py).
- Parameters in fp32; compute dtype configurable (bf16 for MXU throughput).
- Normalization always computed in fp32 for stability.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

__all__ = [
    "GroupNorm",
    "ResnetBlock",
    "AttnBlock",
    "Downsample",
    "UpsampleTranspose",
    "UpsampleNearest",
    "RMSNorm",
]


class GroupNorm(nn.Module):
    """GroupNorm(32) with eps 1e-6, fp32 math, matching the convention at
    reference kl_vae.py:21."""

    num_groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        # fall back to fewer groups when channels < 32 (small test configs)
        groups = min(self.num_groups, x.shape[-1])
        while x.shape[-1] % groups != 0:
            groups -= 1
        out = nn.GroupNorm(
            num_groups=groups, epsilon=self.eps, dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return out.astype(orig_dtype)


class RMSNorm(nn.Module):
    """Channel RMSNorm with learned gain, fp32 math.

    Behavior target: reference classifier_free_guidance.py:119-125
    (F.normalize over channel dim * g * sqrt(C))."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(
            jnp.sum(x32 * x32, axis=-1, keepdims=True) + 1e-12
        )
        out = normed * g * (dim**0.5)
        return out.astype(orig_dtype)


class ResnetBlock(nn.Module):
    """GroupNorm → SiLU → Conv3x3 (×2) residual block with optional 1x1
    shortcut when channels change. Behavior target: kl_vae.py:13-44."""

    out_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch

        h = GroupNorm(dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)

        h = GroupNorm(dtype=self.dtype)(h)
        h = nn.silu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)

        if in_ch != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions with 1x1 qkv
    projections and residual connection. Behavior target: kl_vae.py:47-83.

    Uses the framework attention op (flash kernel on TPU when profitable,
    einsum fallback otherwise) via `vqgan_tpu.ops.attention.sdpa`.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.attention import sdpa

        b, h, w, c = x.shape
        hn = GroupNorm(dtype=self.dtype)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="q")(hn)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="k")(hn)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="v")(hn)

        # [B, H*W, 1 head, C]
        q = q.reshape(b, h * w, 1, c)
        k = k.reshape(b, h * w, 1, c)
        v = v.reshape(b, h * w, 1, c)
        out = sdpa(q, k, v)
        out = out.reshape(b, h, w, c)

        out = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """Stride-2 3x3 conv (reference kl_vae.py:127)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.Conv(c, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, param_dtype=jnp.float32)(x)


class UpsampleTranspose(nn.Module):
    """ConvTranspose k4 s2 giving exact 2x upsampling
    (reference kl_vae.py:206)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME",
                                dtype=self.dtype, param_dtype=jnp.float32)(x)


class UpsampleNearest(nn.Module):
    """Nearest-neighbor 2x upsample + 3x3 conv (U-Net style,
    reference classifier_free_guidance.py:110-114)."""

    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        out_ch = self.out_channels or c
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)
