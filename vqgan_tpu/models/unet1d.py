"""1D U-Net for sequence diffusion.

Behavior target: /root/reference/denoising_diffusion_pytorch/
denoising_diffusion_pytorch_1d.py:258-414 (Unet1D) — the 2D plain U-Net's
topology with Conv1d ops: RMSNorm blocks, FiLM time conditioning,
linear/full attention per stage, stride-4 is replaced by factor-2 conv
resampling.

Layout: [B, L, C] (length-major channel-last — the TPU-native analog of the
reference's [B, C, L]).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from .unet_cfg import SinusoidalPosEmb, RandomOrLearnedSinusoidalPosEmb

Dtype = Any

__all__ = ["Unet1D"]


class _RMSNorm1D(nn.Module):
    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(
            jnp.sum(x32 * x32, axis=-1, keepdims=True) + 1e-12)
        return (normed * g * dim**0.5).astype(x.dtype)


class _Block(nn.Module):
    dim_out: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None, *, deterministic=True):
        x = nn.Conv(self.dim_out, (3,), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj")(x)
        x = _RMSNorm1D()(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        x = nn.silu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class _ResnetBlock(nn.Module):
    dim_out: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t=None, *, deterministic=True):
        scale_shift = None
        if t is not None:
            cond = nn.Dense(self.dim_out * 2, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name="mlp")(nn.silu(t))
            scale_shift = jnp.split(cond[:, None, :], 2, axis=-1)
        h = _Block(self.dim_out, self.dropout, dtype=self.dtype,
                   name="block1")(x, scale_shift,
                                  deterministic=deterministic)
        h = _Block(self.dim_out, dtype=self.dtype, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1,), dtype=self.dtype,
                        param_dtype=jnp.float32, name="res_conv")(x)
        return h + x


class _LinearAttention1D(nn.Module):
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        hidden = self.heads * self.dim_head
        x_in = x
        x = _RMSNorm1D(name="norm")(x)
        qkv = nn.Conv(hidden * 3, (1,), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(b, l, self.heads, self.dim_head
                                      ).transpose(0, 2, 3, 1)
        q, k, v = reshape(q), reshape(k), reshape(v)
        q = jax.nn.softmax(q.astype(jnp.float32), axis=-2) * \
            self.dim_head**-0.5
        k = jax.nn.softmax(k.astype(jnp.float32), axis=-1)
        ctx = jnp.einsum("bhdn,bhen->bhde", k, v.astype(jnp.float32))
        out = jnp.einsum("bhde,bhdn->bhen", ctx, q).astype(x.dtype)
        out = out.transpose(0, 3, 1, 2).reshape(b, l, hidden)
        return x_in + nn.Conv(c, (1,), dtype=self.dtype,
                              param_dtype=jnp.float32, name="to_out")(out)


class _Attention1D(nn.Module):
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        hidden = self.heads * self.dim_head
        x_in = x
        x = _RMSNorm1D(name="norm")(x)
        qkv = nn.Conv(hidden * 3, (1,), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(b, l, self.heads, self.dim_head)
        out = sdpa(reshape(q), reshape(k), reshape(v))
        out = out.reshape(b, l, hidden)
        return x_in + nn.Conv(c, (1,), dtype=self.dtype,
                              param_dtype=jnp.float32, name="to_out")(out)


class Unet1D(nn.Module):
    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 3
    self_condition: bool = False
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    dropout: float = 0.0
    attn_dim_head: int = 32
    attn_heads: int = 4
    dtype: Dtype = jnp.float32

    @property
    def default_out_dim(self):
        return self.channels * (2 if self.learned_variance else 1)

    @nn.compact
    def __call__(self, x, time, x_self_cond=None, *, deterministic=True):
        """x: [B, L, C]."""
        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        dim = self.dim
        init_dim = self.init_dim or dim
        x = nn.Conv(init_dim, (7,), padding=3, dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name="init_conv")(x.astype(self.dtype))
        r = x

        if self.learned_sinusoidal_cond or self.random_fourier_features:
            temb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, self.random_fourier_features,
                name="sinu_pos_emb")(time)
        else:
            temb = SinusoidalPosEmb(dim, name="sinu_pos_emb")(time)
        t = nn.Sequential([
            nn.Dense(dim * 4, dtype=self.dtype, param_dtype=jnp.float32),
            nn.gelu,
            nn.Dense(dim * 4, dtype=self.dtype, param_dtype=jnp.float32),
        ], name="time_mlp")(temb)

        dims = [init_dim, *(dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            x = _ResnetBlock(dim_in, self.dropout, dtype=self.dtype,
                             name=f"down_{ind}_block1")(
                x, t, deterministic=deterministic)
            hs.append(x)
            x = _ResnetBlock(dim_in, self.dropout, dtype=self.dtype,
                             name=f"down_{ind}_block2")(
                x, t, deterministic=deterministic)
            x = _LinearAttention1D(self.attn_heads, self.attn_dim_head,
                                   dtype=self.dtype,
                                   name=f"down_{ind}_attn")(x)
            hs.append(x)
            if not is_last:
                x = nn.Conv(dim_out, (4,), strides=(2,), padding=1,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"down_{ind}_downsample")(x)
            else:
                x = nn.Conv(dim_out, (3,), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"down_{ind}_downsample")(x)

        mid_dim = dims[-1]
        x = _ResnetBlock(mid_dim, self.dropout, dtype=self.dtype,
                         name="mid_block1")(x, t,
                                            deterministic=deterministic)
        x = _Attention1D(self.attn_heads, self.attn_dim_head,
                         dtype=self.dtype, name="mid_attn")(x)
        x = _ResnetBlock(mid_dim, self.dropout, dtype=self.dtype,
                         name="mid_block2")(x, t,
                                            deterministic=deterministic)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = _ResnetBlock(dim_out, self.dropout, dtype=self.dtype,
                             name=f"up_{ind}_block1")(
                x, t, deterministic=deterministic)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = _ResnetBlock(dim_out, self.dropout, dtype=self.dtype,
                             name=f"up_{ind}_block2")(
                x, t, deterministic=deterministic)
            x = _LinearAttention1D(self.attn_heads, self.attn_dim_head,
                                   dtype=self.dtype,
                                   name=f"up_{ind}_attn")(x)
            if not is_last:
                b, l, c = x.shape
                x = jax.image.resize(x, (b, l * 2, c), method="nearest")
                x = nn.Conv(dim_in, (3,), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"up_{ind}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3,), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"up_{ind}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = _ResnetBlock(init_dim, self.dropout, dtype=self.dtype,
                         name="final_res_block")(
            x, t, deterministic=deterministic)
        return nn.Conv(self.out_dim or self.default_out_dim, (1,),
                       dtype=jnp.float32, param_dtype=jnp.float32,
                       name="final_conv")(x)
