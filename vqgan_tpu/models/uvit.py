"""UViT: conv U-Net with a ViT middle (simple diffusion, arXiv 2301.11093).

Behavior target: /root/reference/denoising_diffusion_pytorch/
simple_diffusion.py:118-476 — ResnetBlock + LinearAttention down/up stages
with configurable per-stage downsample factors, a time-conditioned
transformer bottleneck (FeedForward FiLM on time, :239-305), optional
patching with dual patch-norm (:346-360), and pluggable init/final image
transforms (the DWT hook, :330-335).

NHWC; bottleneck attention uses the fused flash kernel.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from .layers import RMSNorm
from .unet_cfg import RandomOrLearnedSinusoidalPosEmb

Dtype = Any

__all__ = ["UViT"]


def _cast_tuple(t, n):
    return tuple(t) if isinstance(t, (tuple, list)) else (t,) * n


class _ResnetBlock(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t=None):
        scale_shift = None
        if t is not None:
            cond = nn.Dense(self.dim_out * 2, dtype=self.dtype,
                            param_dtype=jnp.float32, name="mlp")(nn.silu(t))
            scale_shift = jnp.split(cond[:, None, None, :], 2, axis=-1)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj1")(x)
        h = RMSNorm(dtype=self.dtype, name="norm1")(h)
        if scale_shift is not None:
            scale, shift = scale_shift
            h = h * (scale + 1.0) + shift
        h = nn.silu(h)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj2")(h)
        h = nn.silu(RMSNorm(dtype=self.dtype, name="norm2")(h))
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="res_conv")(x)
        return h + x


class _LinearAttention(nn.Module):
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        x_in = x
        x = RMSNorm(dtype=self.dtype, name="norm")(x)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(b, h * w, self.heads, self.dim_head
                                      ).transpose(0, 2, 3, 1)
        q, k, v = reshape(q), reshape(k), reshape(v)
        q = jax.nn.softmax(q.astype(jnp.float32), axis=-2) * \
            self.dim_head**-0.5
        k = jax.nn.softmax(k.astype(jnp.float32), axis=-1)
        ctx = jnp.einsum("bhdn,bhen->bhde", k, v.astype(jnp.float32))
        out = jnp.einsum("bhde,bhdn->bhen", ctx, q).astype(x.dtype)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)
        return x_in + nn.Conv(c, (1, 1), dtype=self.dtype,
                              param_dtype=jnp.float32, name="to_out")(out)


class _VitAttention(nn.Module):
    heads: int = 4
    dim_head: int = 32
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        b, n, c = x.shape
        hidden = self.heads * self.dim_head
        h = RMSNorm(dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(b, n, self.heads, self.dim_head)
        out = sdpa(reshape(q), reshape(k), reshape(v))
        out = out.reshape(b, n, hidden)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return nn.Dense(c, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="to_out")(out)


class _VitFeedForward(nn.Module):
    """Time-FiLM'd feedforward (reference simple_diffusion.py:239-276,
    scale/shift projection zero-initialized)."""

    mult: int = 4
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, *, deterministic=True):
        dim = x.shape[-1]
        hidden = dim * self.mult
        h = RMSNorm(dtype=self.dtype, name="norm")(x)
        h = nn.silu(nn.Dense(hidden, use_bias=False, dtype=self.dtype,
                             param_dtype=jnp.float32, name="proj_in")(h))
        ss = nn.Dense(hidden * 2, dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="to_scale_shift")(nn.silu(t))
        scale, shift = jnp.split(ss[:, None, :], 2, axis=-1)
        h = h * (scale + 1.0) + shift
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj_out")(h)


class UViT(nn.Module):
    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    downsample_factor: Any = 2
    channels: int = 3
    vit_depth: int = 6
    vit_dropout: float = 0.2
    attn_dim_head: int = 32
    attn_heads: int = 4
    ff_mult: int = 4
    learned_sinusoidal_dim: int = 16
    patch_size: int = 1
    dual_patchnorm: bool = False
    init_img_transform: Optional[Callable] = None  # e.g. DWT
    final_img_itransform: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time, *, deterministic=True):
        if self.init_img_transform is not None:
            x = self.init_img_transform(x)
        x = x.astype(self.dtype)

        dim = self.dim
        init_dim = self.init_dim or dim
        channels = x.shape[-1]
        input_channels = channels * self.patch_size**2

        # initial patching / conv
        if self.patch_size > 1:
            p = self.patch_size
            if self.dual_patchnorm:
                b, h, w, c = x.shape
                x = x.reshape(b, h // p, p, w // p, p, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, h // p, w // p, c * p * p)
                x = nn.LayerNorm(name="patch_norm_in")(x)
                x = nn.Dense(init_dim, dtype=self.dtype,
                             param_dtype=jnp.float32, name="patch_proj")(x)
                x = nn.LayerNorm(name="patch_norm_out")(x)
            else:
                x = nn.Conv(init_dim, (p, p), strides=(p, p),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="init_conv")(x)
        else:
            x = nn.Conv(init_dim, (7, 7), padding=3, dtype=self.dtype,
                        param_dtype=jnp.float32, name="init_conv")(x)
        r = x

        # time embedding (learned sinusoidal)
        temb = RandomOrLearnedSinusoidalPosEmb(
            self.learned_sinusoidal_dim, False, name="sinu_pos_emb")(time)
        t = nn.Sequential([
            nn.Dense(dim * 4, dtype=self.dtype, param_dtype=jnp.float32),
            nn.gelu,
            nn.Dense(dim * 4, dtype=self.dtype, param_dtype=jnp.float32),
        ], name="time_mlp")(temb)

        dims = [init_dim, *(dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        factors = _cast_tuple(self.downsample_factor, len(self.dim_mults))

        hs = []
        for ind, ((dim_in, dim_out), f) in enumerate(zip(in_out, factors)):
            x = _ResnetBlock(dim_in, dtype=self.dtype,
                             name=f"down_{ind}_block1")(x, t)
            hs.append(x)
            x = _ResnetBlock(dim_in, dtype=self.dtype,
                             name=f"down_{ind}_block2")(x, t)
            x = _LinearAttention(dtype=self.dtype,
                                 name=f"down_{ind}_attn")(x)
            hs.append(x)
            # space-to-depth downsample by factor f + 1x1 conv
            b, h, w, c = x.shape
            x = x.reshape(b, h // f, f, w // f, f, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // f, w // f, c * f * f)
            x = nn.Conv(dim_out, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name=f"down_{ind}_downsample")(x)

        # ViT middle over flattened tokens
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        for d in range(self.vit_depth):
            x = x + _VitAttention(self.attn_heads, self.attn_dim_head,
                                  self.vit_dropout, dtype=self.dtype,
                                  name=f"vit_{d}_attn")(
                x, deterministic=deterministic)
            x = x + _VitFeedForward(self.ff_mult, self.vit_dropout,
                                    dtype=self.dtype,
                                    name=f"vit_{d}_ff")(
                x, t, deterministic=deterministic)
        x = x.reshape(b, h, w, c)

        for ind, ((dim_in, dim_out), f) in enumerate(
                zip(reversed(in_out), reversed(factors))):
            # depth-to-space upsample by factor f via 1x1 conv
            b, h, w, c = x.shape
            x = nn.Conv(dim_in * f * f, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name=f"up_{ind}_upsample")(x)
            x = x.reshape(b, h, w, f, f, dim_in)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h * f, w * f, dim_in)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = _ResnetBlock(dim_in, dtype=self.dtype,
                             name=f"up_{ind}_block1")(x, t)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = _ResnetBlock(dim_in, dtype=self.dtype,
                             name=f"up_{ind}_block2")(x, t)
            x = _LinearAttention(dtype=self.dtype, name=f"up_{ind}_attn")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = _ResnetBlock(init_dim, dtype=self.dtype,
                         name="final_res_block")(x, t)
        out_dim = self.out_dim or input_channels
        x = nn.Conv(out_dim, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32, name="final_conv")(x)

        if self.patch_size > 1:
            x = nn.ConvTranspose(channels, (self.patch_size, self.patch_size),
                                 strides=(self.patch_size, self.patch_size),
                                 param_dtype=jnp.float32,
                                 name="unpatchify")(x)
        if self.final_img_itransform is not None:
            x = self.final_img_itransform(x)
        return x
