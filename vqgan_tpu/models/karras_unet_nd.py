"""Karras magnitude-preserving U-Nets for sequences (1D) and video (3D).

Behavior targets:
- /root/reference/denoising_diffusion_pytorch/karras_unet_1d.py — the MP
  machinery over Conv1d.
- /root/reference/denoising_diffusion_pytorch/karras_unet_3d.py — Conv3d
  variant with per-stage downsample types {'all','frame','image'} and
  optional FACTORIZED space/time attention (`only_space` then `only_time`
  passes, :412-480, enabled by `factorize_space_time_attn`).

Shares the MP primitives (mp_silu/mp_add/mp_cat/pixel_norm/normalize_weight
and the post-step renormalization contract) with models/karras_unet.py.

Layouts: 1D [B, L, C]; 3D [B, T, H, W, C].
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from .karras_unet import (
    Gain,
    MPFourierEmbedding,
    MPLinear,
    mp_add,
    mp_cat,
    mp_silu,
    normalize_weight,
    pixel_norm,
)

Dtype = Any

__all__ = ["KarrasUnet1D", "KarrasUnet3D"]


class MPConvND(nn.Module):
    """Forced weight-normed bias-less conv over `spatial_rank` dims."""

    features: int
    kernel_size: int = 3
    spatial_rank: int = 2
    concat_ones_to_input: bool = False
    eps: float = 1e-4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.concat_ones_to_input:
            ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
            x = jnp.concatenate([ones, x], axis=-1)
        in_ch = x.shape[-1]
        k = (self.kernel_size,) * self.spatial_rank
        w = self.param("mp_kernel", nn.initializers.normal(1.0),
                       k + (in_ch, self.features), jnp.float32)
        fan_in = in_ch * self.kernel_size**self.spatial_rank
        w = normalize_weight(w, self.eps) / math.sqrt(fan_in)
        spec = {1: ("NHC", "HIO", "NHC"), 2: ("NHWC", "HWIO", "NHWC"),
                3: ("NDHWC", "DHWIO", "NDHWC")}[self.spatial_rank]
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            (1,) * self.spatial_rank, "SAME", dimension_numbers=spec)


class _KarrasAttentionND(nn.Module):
    """Cosine attention over all positions, or factorized per-space /
    per-time for video (reference karras_unet_3d.py:412-480)."""

    heads: int
    dim_head: int = 64
    num_mem_kv: int = 4
    mp_add_t: float = 0.3
    spatial_rank: int = 2
    only_space: bool = False
    only_time: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert not (self.only_space and self.only_time)
        res = x
        orig_shape = x.shape
        c = x.shape[-1]
        hidden = self.heads * self.dim_head
        qkv = MPConvND(hidden * 3, 1, self.spatial_rank, dtype=self.dtype,
                       name="to_qkv")(x)

        if self.spatial_rank == 3 and self.only_space:
            b, t, h, w, _ = qkv.shape
            qkv = qkv.reshape(b * t, h * w, hidden * 3)
        elif self.spatial_rank == 3 and self.only_time:
            b, t, h, w, _ = qkv.shape
            qkv = qkv.transpose(0, 2, 3, 1, 4).reshape(
                b * h * w, t, hidden * 3)
        else:
            b = qkv.shape[0]
            qkv = qkv.reshape(b, -1, hidden * 3)

        bb, n, _ = qkv.shape
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t_: t_.reshape(bb, n, self.heads, self.dim_head)
        q, k, v = reshape(q), reshape(k), reshape(v)

        mem_kv = self.param(
            "mem_kv", nn.initializers.normal(1.0),
            (2, self.heads, self.num_mem_kv, self.dim_head), jnp.float32)
        mk = jnp.broadcast_to(
            mem_kv[0].transpose(1, 0, 2)[None],
            (bb, self.num_mem_kv, self.heads, self.dim_head)).astype(k.dtype)
        mv = jnp.broadcast_to(
            mem_kv[1].transpose(1, 0, 2)[None],
            (bb, self.num_mem_kv, self.heads, self.dim_head)).astype(v.dtype)
        k = jnp.concatenate([mk, k], axis=1)
        v = jnp.concatenate([mv, v], axis=1)

        q, k, v = (pixel_norm(t_, axis=-1) for t_ in (q, k, v))
        out = sdpa(q, k, v).reshape(bb, n, hidden)

        if self.spatial_rank == 3 and self.only_space:
            b, t, h, w, _ = orig_shape[:4] + (0,)
            out = out.reshape(orig_shape[0], orig_shape[1], orig_shape[2],
                              orig_shape[3], hidden)
        elif self.spatial_rank == 3 and self.only_time:
            b, t, h, w = orig_shape[:4]
            out = out.reshape(b, h, w, t, hidden).transpose(0, 3, 1, 2, 4)
        else:
            out = out.reshape(orig_shape[:-1] + (hidden,))

        out = MPConvND(c, 1, self.spatial_rank, dtype=self.dtype,
                       name="to_out")(out)
        return mp_add(out, res, self.mp_add_t)


def _resize_nd(x, factors):
    """Linear resize per spatial axis; factors aligned with spatial dims."""
    shape = list(x.shape)
    for i, f in enumerate(factors):
        shape[1 + i] = int(shape[1 + i] * f)
    method = "linear" if x.ndim == 3 else "trilinear" \
        if x.ndim == 5 else "bilinear"
    # jax.image.resize uses a single method string valid for any rank
    return jax.image.resize(x, tuple(shape), method="linear")


class _EncDecBlockND(nn.Module):
    """Shared MP encoder/decoder block for 1D/3D (reference 1d/3d
    Encoder/Decoder classes)."""

    dim_out: int
    is_decoder: bool
    spatial_rank: int
    dropout: float = 0.1
    mp_add_t: float = 0.3
    has_attn: bool = False
    attn_dim_head: int = 64
    attn_res_mp_add_t: float = 0.3
    factorize_space_time_attn: bool = False
    resample_factors: Optional[Tuple[float, ...]] = None  # down(0.5)/up(2.0)
    dtype: Dtype = jnp.float32

    @property
    def needs_skip(self):
        return self.is_decoder and self.resample_factors is None

    @nn.compact
    def __call__(self, x, emb=None, *, deterministic=True):
        if self.resample_factors is not None:
            x = _resize_nd(x, self.resample_factors)
            if not self.is_decoder:
                x = MPConvND(self.dim_out, 1, self.spatial_rank,
                             dtype=self.dtype, name="downsample_conv")(x)
        if not self.is_decoder:
            x = pixel_norm(x, axis=-1)
            res = x
        else:
            if x.shape[-1] != self.dim_out:
                res = MPConvND(self.dim_out, 1, self.spatial_rank,
                               dtype=self.dtype, name="res_conv")(x)
            else:
                res = x

        h = MPConvND(self.dim_out, 3, self.spatial_rank, dtype=self.dtype,
                     name="conv1")(mp_silu(x))
        if emb is not None:
            scale = Gain(name="emb_gain")(
                MPLinear(self.dim_out, dtype=self.dtype,
                         name="to_emb")(emb)) + 1.0
            scale = scale.reshape(
                scale.shape[0], *((1,) * self.spatial_rank), -1)
            h = h * scale
        h = mp_silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = MPConvND(self.dim_out, 3, self.spatial_rank, dtype=self.dtype,
                     name="conv2")(h)
        x = mp_add(h, res, self.mp_add_t)

        if self.has_attn:
            heads = max(-(-self.dim_out // self.attn_dim_head), 2)
            kwargs = dict(heads=heads, dim_head=self.attn_dim_head,
                          mp_add_t=self.attn_res_mp_add_t,
                          spatial_rank=self.spatial_rank, dtype=self.dtype)
            if self.spatial_rank == 3 and self.factorize_space_time_attn:
                x = _KarrasAttentionND(**kwargs, only_space=True,
                                       name="attn_space")(x)
                x = _KarrasAttentionND(**kwargs, only_time=True,
                                       name="attn_time")(x)
            else:
                x = _KarrasAttentionND(**kwargs, name="attn")(x)
        return x


class _KarrasUnetND(nn.Module):
    spatial_rank: int
    spatial_size: Tuple[int, ...]
    dim: int = 192
    dim_max: int = 768
    num_classes: Optional[int] = None
    channels: int = 4
    num_downsamples: int = 3
    num_blocks_per_stage: int = 4
    attn_res: Tuple[int, ...] = (16, 8)
    fourier_dim: int = 16
    attn_dim_head: int = 64
    mp_cat_t: float = 0.5
    mp_add_emb_t: float = 0.5
    attn_res_mp_add_t: float = 0.3
    resnet_mp_add_t: float = 0.3
    dropout: float = 0.1
    self_condition: bool = False
    downsample_types: Optional[Tuple[str, ...]] = None  # 3D only
    factorize_space_time_attn: bool = False  # 3D only
    dtype: Dtype = jnp.float32

    random_or_learned_sinusoidal_cond = True

    @nn.compact
    def __call__(self, x, time, self_cond=None, class_labels=None, *,
                 deterministic=True):
        sr = self.spatial_rank
        if self.self_condition:
            if self_cond is None:
                self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([self_cond, x], axis=-1)

        emb_dim = self.dim * 4
        temb = MPFourierEmbedding(self.fourier_dim, name="fourier")(time)
        temb = MPLinear(emb_dim, dtype=self.dtype, name="to_time_emb")(temb)
        if self.num_classes is not None:
            assert class_labels is not None
            if jnp.issubdtype(class_labels.dtype, jnp.integer):
                class_labels = jax.nn.one_hot(class_labels, self.num_classes)
            class_labels = class_labels.astype(jnp.float32) * math.sqrt(
                self.num_classes)
            cemb = MPLinear(emb_dim, dtype=self.dtype,
                            name="to_class_emb")(class_labels)
            temb = mp_add(temb, cemb, self.mp_add_emb_t)
        emb = mp_silu(temb)

        dtypes = self.downsample_types or ("all",) * self.num_downsamples
        assert all(t in ("all", "frame", "image") for t in dtypes)

        block_kwargs = dict(
            spatial_rank=sr, dropout=self.dropout,
            attn_dim_head=self.attn_dim_head,
            attn_res_mp_add_t=self.attn_res_mp_add_t,
            mp_add_t=self.resnet_mp_add_t,
            factorize_space_time_attn=self.factorize_space_time_attn,
            dtype=self.dtype)

        # stage plan
        downs, ups = [], []
        curr_dim = self.dim
        curr_image_res = self.spatial_size[-1]
        attn_res = set(self.attn_res)

        ups.insert(0, dict(dim_out=self.dim, has_attn=False, factors=None))
        for _ in range(self.num_blocks_per_stage):
            downs.append(dict(dim_out=curr_dim, has_attn=False, factors=None))
            ups.insert(0, dict(dim_out=curr_dim, has_attn=False,
                               factors=None))
        for stage, ds_type in zip(range(self.num_downsamples), dtypes):
            dim_out = min(self.dim_max, curr_dim * 2)
            if sr == 3:
                df = {"all": (0.5, 0.5, 0.5), "frame": (0.5, 1.0, 1.0),
                      "image": (1.0, 0.5, 0.5)}[ds_type]
            else:
                df = (0.5,) * sr
            uf = tuple(1.0 / f for f in df)
            down_changes_image = df[-1] != 1.0

            ups.insert(0, dict(dim_out=curr_dim,
                               has_attn=curr_image_res in attn_res,
                               factors=uf))
            if down_changes_image:
                curr_image_res //= 2
            has_attn = curr_image_res in attn_res
            downs.append(dict(dim_out=dim_out, has_attn=has_attn,
                              factors=df))
            ups.insert(0, dict(dim_out=dim_out, has_attn=has_attn,
                               factors=None))
            for _ in range(self.num_blocks_per_stage):
                downs.append(dict(dim_out=dim_out, has_attn=has_attn,
                                  factors=None))
                ups.insert(0, dict(dim_out=dim_out, has_attn=has_attn,
                                   factors=None))
            curr_dim = dim_out

        x = MPConvND(self.dim, 3, sr, concat_ones_to_input=True,
                     dtype=self.dtype, name="input_block")(x)
        skips = [x]
        for i, spec in enumerate(downs):
            x = _EncDecBlockND(
                spec["dim_out"], is_decoder=False, has_attn=spec["has_attn"],
                resample_factors=spec["factors"], **block_kwargs,
                name=f"down_{i}")(x, emb, deterministic=deterministic)
            skips.append(x)

        mid_attn = curr_image_res in attn_res
        for i in range(2):
            x = _EncDecBlockND(
                curr_dim, is_decoder=True, has_attn=mid_attn, **block_kwargs,
                name=f"mid_{i}")(x, emb, deterministic=deterministic)

        for i, spec in enumerate(ups):
            if spec["factors"] is None:
                x = mp_cat(x, skips.pop(), t=self.mp_cat_t, axis=-1)
            x = _EncDecBlockND(
                spec["dim_out"], is_decoder=True, has_attn=spec["has_attn"],
                resample_factors=spec["factors"], **block_kwargs,
                name=f"up_{i}")(x, emb, deterministic=deterministic)

        out = MPConvND(self.channels, 3, sr, dtype=self.dtype,
                       name="output_conv")(x)
        return Gain(name="output_gain")(out)


class KarrasUnet1D(_KarrasUnetND):
    """MP U-Net over [B, L, C] sequences (reference karras_unet_1d.py)."""

    spatial_rank: int = 1
    spatial_size: Tuple[int, ...] = (64,)


class KarrasUnet3D(_KarrasUnetND):
    """MP U-Net over [B, T, H, W, C] video (reference karras_unet_3d.py),
    with per-stage {'all','frame','image'} downsampling and optional
    factorized space/time attention."""

    spatial_rank: int = 3
    spatial_size: Tuple[int, ...] = (16, 32, 32)
