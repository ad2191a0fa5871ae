"""Unconditional DDPM U-Net (the vendored-library core model).

Behavior target: /root/reference/denoising_diffusion_pytorch/
denoising_diffusion_pytorch.py:90-437 — self-conditioning, space-to-depth
("pixel-unshuffle") downsampling, memory-KV attention, per-stage full/linear
attention choice, dropout in the first conv block.

NHWC; full attention runs through the fused flash kernel.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from .layers import RMSNorm
from .unet_cfg import SinusoidalPosEmb, RandomOrLearnedSinusoidalPosEmb

Dtype = Any

__all__ = ["Unet"]


def _cast_tuple(t, length):
    if isinstance(t, (tuple, list)):
        assert len(t) == length
        return tuple(t)
    return (t,) * length


class _Block(nn.Module):
    dim_out: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None, *, deterministic=True):
        x = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj")(x)
        x = RMSNorm(dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        x = nn.silu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class _ResnetBlock(nn.Module):
    dim_out: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None, *, deterministic=True):
        scale_shift = None
        if time_emb is not None:
            cond = nn.silu(time_emb)
            cond = nn.Dense(self.dim_out * 2, dtype=self.dtype,
                            param_dtype=jnp.float32, name="mlp")(cond)
            scale_shift = jnp.split(cond[:, None, None, :], 2, axis=-1)
        h = _Block(self.dim_out, self.dropout, dtype=self.dtype,
                   name="block1")(x, scale_shift, deterministic=deterministic)
        h = _Block(self.dim_out, dtype=self.dtype, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="res_conv")(x)
        return h + x


class _LinearAttention(nn.Module):
    """Linear attention with learned memory KV and pre-norm
    (reference ddpm.py:193-238)."""

    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4
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
        # [B, heads, dh, N]
        reshape = lambda t: t.reshape(b, h * w, self.heads, self.dim_head
                                      ).transpose(0, 2, 3, 1)
        q, k, v = reshape(q), reshape(k), reshape(v)

        mem_kv = self.param("mem_kv", nn.initializers.normal(1.0),
                            (2, self.heads, self.dim_head, self.num_mem_kv),
                            jnp.float32)
        mk = jnp.broadcast_to(mem_kv[0], (b,) + mem_kv[0].shape)
        mv = jnp.broadcast_to(mem_kv[1], (b,) + mem_kv[1].shape)
        k = jnp.concatenate([mk, k], axis=-1)
        v = jnp.concatenate([mv, v], axis=-1)

        q = jax.nn.softmax(q.astype(jnp.float32), axis=-2)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=-1)
        q = q * (self.dim_head**-0.5)

        context = jnp.einsum("bhdn,bhen->bhde", k, v.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        out = jnp.einsum("bhde,bhdn->bhen", context, q,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)
        out = out.astype(x.dtype)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      name="to_out")(out)
        return RMSNorm(dtype=self.dtype, name="out_norm")(out)


class _FullAttention(nn.Module):
    """Full attention with learned memory KV and pre-norm
    (reference ddpm.py:240-272 + attend.py — here the fused flash kernel)."""

    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head

        x = RMSNorm(dtype=self.dtype, name="norm")(x)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(b, h * w, self.heads, self.dim_head)
        q, k, v = reshape(q), reshape(k), reshape(v)

        mem_kv = self.param("mem_kv", nn.initializers.normal(1.0),
                            (2, self.heads, self.num_mem_kv, self.dim_head),
                            jnp.float32)
        # [B, N_mem, heads, dh]
        mk = jnp.broadcast_to(
            mem_kv[0].transpose(1, 0, 2)[None],
            (b, self.num_mem_kv, self.heads, self.dim_head),
        ).astype(k.dtype)
        mv = jnp.broadcast_to(
            mem_kv[1].transpose(1, 0, 2)[None],
            (b, self.num_mem_kv, self.heads, self.dim_head),
        ).astype(v.dtype)
        k = jnp.concatenate([mk, k], axis=1)
        v = jnp.concatenate([mv, v], axis=1)

        out = sdpa(q, k, v)
        out = out.reshape(b, h, w, hidden)
        return nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                       name="to_out")(out)


class _SpaceToDepthDownsample(nn.Module):
    """2x2 space-to-depth + 1x1 conv (reference ddpm.py:96-101) — a
    conv-free, reshape-only downsample that XLA compiles to a relayout."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        return nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32)(x)


class _UpsampleNearestConv(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)


class Unet(nn.Module):
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
    sinusoidal_pos_emb_theta: int = 10000
    dropout: float = 0.0
    attn_dim_head: Union[int, Tuple[int, ...]] = 32
    attn_heads: Union[int, Tuple[int, ...]] = 4
    full_attn: Optional[Tuple[bool, ...]] = None  # default: innermost only
    dtype: Dtype = jnp.float32

    @property
    def downsample_factor(self):
        return 2 ** (len(self.dim_mults) - 1)

    @property
    def default_out_dim(self):
        return self.channels * (2 if self.learned_variance else 1)

    @nn.compact
    def __call__(self, x, time, x_self_cond=None, *, deterministic=True,
                 return_features: bool = False):
        num_stages = len(self.dim_mults)
        full_attn = self.full_attn or ((False,) * (num_stages - 1) + (True,))
        full_attn = _cast_tuple(full_attn, num_stages)
        attn_heads = _cast_tuple(self.attn_heads, num_stages)
        attn_dim_head = _cast_tuple(self.attn_dim_head, num_stages)

        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        dim = self.dim
        init_dim = self.init_dim or dim
        x = nn.Conv(init_dim, (7, 7), padding=3, dtype=self.dtype,
                    param_dtype=jnp.float32, name="init_conv")(x.astype(self.dtype))
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
            attn_cls = _FullAttention if full_attn[ind] else _LinearAttention
            x = _ResnetBlock(dim_in, self.dropout, dtype=self.dtype,
                             name=f"down_{ind}_block1")(
                x, t, deterministic=deterministic)
            hs.append(x)
            x = _ResnetBlock(dim_in, self.dropout, dtype=self.dtype,
                             name=f"down_{ind}_block2")(
                x, t, deterministic=deterministic)
            x = attn_cls(attn_heads[ind], attn_dim_head[ind],
                         dtype=self.dtype, name=f"down_{ind}_attn")(x) + x
            hs.append(x)
            if not is_last:
                x = _SpaceToDepthDownsample(
                    dim_out, dtype=self.dtype,
                    name=f"down_{ind}_downsample")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"down_{ind}_downsample")(x)

        mid_dim = dims[-1]
        x = _ResnetBlock(mid_dim, self.dropout, dtype=self.dtype,
                         name="mid_block1")(x, t, deterministic=deterministic)
        x = _FullAttention(attn_heads[-1], attn_dim_head[-1],
                           dtype=self.dtype, name="mid_attn")(x) + x

        features = None
        if return_features:
            pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
            features = pooled / jnp.maximum(
                jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)

        x = _ResnetBlock(mid_dim, self.dropout, dtype=self.dtype,
                         name="mid_block2")(x, t, deterministic=deterministic)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            stage = num_stages - 1 - ind
            attn_cls = _FullAttention if full_attn[stage] else _LinearAttention
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = _ResnetBlock(dim_out, self.dropout, dtype=self.dtype,
                             name=f"up_{ind}_block1")(
                x, t, deterministic=deterministic)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = _ResnetBlock(dim_out, self.dropout, dtype=self.dtype,
                             name=f"up_{ind}_block2")(
                x, t, deterministic=deterministic)
            x = attn_cls(attn_heads[stage], attn_dim_head[stage],
                         dtype=self.dtype, name=f"up_{ind}_attn")(x) + x
            if not is_last:
                x = _UpsampleNearestConv(dim_in, dtype=self.dtype,
                                         name=f"up_{ind}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"up_{ind}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = _ResnetBlock(init_dim, self.dropout, dtype=self.dtype,
                         name="final_res_block")(
            x, t, deterministic=deterministic)
        out = nn.Conv(self.out_dim or self.default_out_dim, (1, 1),
                      dtype=jnp.float32, param_dtype=jnp.float32,
                      name="final_conv")(x)
        if return_features:
            return out, features
        return out
