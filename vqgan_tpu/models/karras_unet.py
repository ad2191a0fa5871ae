"""Karras magnitude-preserving U-Net (arXiv 2312.02696, config G).

Behavior target: /root/reference/denoising_diffusion_pytorch/karras_unet.py —
MPSiLU (/0.596), Gain, MPCat (eq. 103), MPAdd (eq. 88), PixelNorm (eq. 30),
forced weight-normalized Conv/Linear (Algorithm 1), MP Fourier embedding,
bilinear-resample encoder/decoder blocks, one-hot class conditioning scaled
by √C, and the inverse-sqrt decay LR schedule (eq. 67).

TPU-native difference — forced weight normalization: the reference RE-WRITES
its weights in-place during every training forward (karras_unet.py:151-157).
Under jit that mutation becomes the pure transform
`normalize_karras_params(params)`, applied AFTER each optimizer step
(training loop composes it); the forward always consumes
`normalize_weight(w)/√fan_in` exactly like the reference, so the two
formulations visit identical weight trajectories.

NHWC layout; full attention via the fused flash kernel.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import sdpa

Dtype = Any

__all__ = [
    "mp_silu",
    "mp_cat",
    "mp_add",
    "pixel_norm",
    "normalize_weight",
    "normalize_karras_params",
    "MPConv",
    "MPLinear",
    "MPFourierEmbedding",
    "KarrasUnet",
    "inv_sqrt_decay_schedule",
]


def mp_silu(x):
    return nn.silu(x) / 0.596


def mp_cat(a, b, t: float = 0.5, axis: int = -1):
    na, nb = a.shape[axis], b.shape[axis]
    c = math.sqrt((na + nb) / ((1.0 - t) ** 2 + t**2))
    a = a * (1.0 - t) / math.sqrt(na)
    b = b * t / math.sqrt(nb)
    return c * jnp.concatenate([a, b], axis=axis)


def mp_add(x, res, t: float = 0.3):
    return (x * (1.0 - t) + res * t) / math.sqrt((1 - t) ** 2 + t**2)


def pixel_norm(x, axis: int = -1, eps: float = 1e-4):
    n = x / jnp.maximum(
        jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
    return n * math.sqrt(x.shape[axis])


def normalize_weight(w: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Unit-normalize each output filter, rescaled so ‖W‖² = numel/out
    (reference normalize_weight, karras_unet.py:127-133). Works on HWIO conv
    kernels (out = last axis) and [in, out] dense kernels."""
    flat = w.reshape(-1, w.shape[-1])  # [fan_in, out]
    normed = flat / jnp.maximum(
        jnp.linalg.norm(flat, axis=0, keepdims=True), eps)
    normed = normed * math.sqrt(flat.shape[0])
    return normed.reshape(w.shape)


def normalize_karras_params(params) -> Any:
    """The functional replacement for the reference's in-place weight
    renormalization: re-project every MPConv/MPLinear kernel after an
    optimizer step."""

    def walk(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if names and names[-1] == "mp_kernel":
            return normalize_weight(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(walk, params)


class MPConv(nn.Module):
    """Bias-less conv with forced weight norm; optional ones-channel input
    concat (reference Conv2d, karras_unet.py:127-166)."""

    features: int
    kernel_size: int = 3
    concat_ones_to_input: bool = False
    eps: float = 1e-4
    normalize_forward: bool = True  # False: skip the per-forward weight
    # re-normalization (inference on params maintained by
    # normalize_karras_params — exact since normalize_weight is idempotent;
    # XLA can't hoist the re-normalization out of sampler scans because the
    # hoisted normalized copies would materialize the whole param set)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.concat_ones_to_input:
            ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
            x = jnp.concatenate([ones, x], axis=-1)
        in_ch = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "mp_kernel", nn.initializers.normal(1.0),
            (k, k, in_ch, self.features), jnp.float32)
        fan_in = in_ch * k * k
        if self.normalize_forward:
            w = normalize_weight(w, self.eps)
        w = w / math.sqrt(fan_in)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class MPLinear(nn.Module):
    features: int
    eps: float = 1e-4
    normalize_forward: bool = True  # see MPConv
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param("mp_kernel", nn.initializers.normal(1.0),
                       (in_ch, self.features), jnp.float32)
        if self.normalize_forward:
            w = normalize_weight(w, self.eps)
        w = w / math.sqrt(in_ch)
        return jnp.dot(x.astype(self.dtype), w.astype(self.dtype))


class Gain(nn.Module):
    @nn.compact
    def __call__(self, x):
        g = self.param("gain", nn.initializers.zeros, (), jnp.float32)
        return x * g


class MPFourierEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,),
                       jnp.float32)
        w = jax.lax.stop_gradient(w)  # frozen, like requires_grad=False
        freqs = t.astype(jnp.float32)[:, None] * w[None, :] * 2 * math.pi
        return jnp.concatenate(
            [jnp.sin(freqs), jnp.cos(freqs)], axis=-1) * math.sqrt(2)


class KarrasAttention(nn.Module):
    """Cosine attention: pixel-normed q/k/v with memory KV and MPAdd residual
    (reference karras_unet.py:361-408)."""

    heads: int
    dim_head: int = 64
    num_mem_kv: int = 4
    mp_add_t: float = 0.3
    normalize_forward: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        res = x
        qkv = MPConv(hidden * 3, 1, dtype=self.dtype,
                     normalize_forward=self.normalize_forward,
                     name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(b, h * w, self.heads, self.dim_head)
        q, k, v = reshape(q), reshape(k), reshape(v)

        mem_kv = self.param(
            "mem_kv", nn.initializers.normal(1.0),
            (2, self.heads, self.num_mem_kv, self.dim_head), jnp.float32)
        mk = jnp.broadcast_to(
            mem_kv[0].transpose(1, 0, 2)[None],
            (b, self.num_mem_kv, self.heads, self.dim_head)).astype(k.dtype)
        mv = jnp.broadcast_to(
            mem_kv[1].transpose(1, 0, 2)[None],
            (b, self.num_mem_kv, self.heads, self.dim_head)).astype(v.dtype)
        k = jnp.concatenate([mk, k], axis=1)
        v = jnp.concatenate([mv, v], axis=1)

        q, k, v = (pixel_norm(t, axis=-1) for t in (q, k, v))
        out = sdpa(q, k, v)
        out = out.reshape(b, h, w, hidden)
        out = MPConv(c, 1, dtype=self.dtype,
                     normalize_forward=self.normalize_forward,
                     name="to_out")(out)
        return mp_add(out, res, self.mp_add_t)


def _bilinear_resize(x, factor: float):
    b, h, w, c = x.shape
    nh, nw = int(h * factor), int(w * factor)
    return jax.image.resize(x, (b, nh, nw, c), method="bilinear")


class KarrasEncoderBlock(nn.Module):
    dim_out: int
    emb: bool = True
    dropout: float = 0.1
    mp_add_t: float = 0.3
    has_attn: bool = False
    attn_dim_head: int = 64
    attn_res_mp_add_t: float = 0.3
    downsample: bool = False
    normalize_forward: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb=None, *, deterministic=True):
        if self.downsample:
            x = _bilinear_resize(x, 0.5)
            x = MPConv(self.dim_out, 1, dtype=self.dtype,
                       normalize_forward=self.normalize_forward,
                       name="downsample_conv")(x)
        x = pixel_norm(x, axis=-1)
        res = x
        h = MPConv(self.dim_out, 3, dtype=self.dtype,
                   normalize_forward=self.normalize_forward,
                   name="conv1")(mp_silu(x))
        if emb is not None:
            scale = Gain(name="emb_gain")(
                MPLinear(self.dim_out, dtype=self.dtype,
                         normalize_forward=self.normalize_forward,
                         name="to_emb")(emb)
            ) + 1.0
            h = h * scale[:, None, None, :]
        h = mp_silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = MPConv(self.dim_out, 3, dtype=self.dtype,
                   normalize_forward=self.normalize_forward,
                   name="conv2")(h)
        x = mp_add(h, res, self.mp_add_t)
        if self.has_attn:
            x = KarrasAttention(
                heads=max(-(-self.dim_out // self.attn_dim_head), 2),
                dim_head=self.attn_dim_head,
                mp_add_t=self.attn_res_mp_add_t, dtype=self.dtype,
                normalize_forward=self.normalize_forward,
                name="attn")(x)
        return x


class KarrasDecoderBlock(nn.Module):
    dim_out: int
    dropout: float = 0.1
    mp_add_t: float = 0.3
    has_attn: bool = False
    attn_dim_head: int = 64
    attn_res_mp_add_t: float = 0.3
    upsample: bool = False
    normalize_forward: bool = True
    dtype: Dtype = jnp.float32

    @property
    def needs_skip(self):
        return not self.upsample

    @nn.compact
    def __call__(self, x, emb=None, *, deterministic=True):
        if self.upsample:
            x = _bilinear_resize(x, 2.0)
        if x.shape[-1] != self.dim_out:
            res = MPConv(self.dim_out, 1, dtype=self.dtype,
                         normalize_forward=self.normalize_forward,
                         name="res_conv")(x)
        else:
            res = x
        h = MPConv(self.dim_out, 3, dtype=self.dtype,
                   normalize_forward=self.normalize_forward,
                   name="conv1")(mp_silu(x))
        if emb is not None:
            scale = Gain(name="emb_gain")(
                MPLinear(self.dim_out, dtype=self.dtype,
                         normalize_forward=self.normalize_forward,
                         name="to_emb")(emb)
            ) + 1.0
            h = h * scale[:, None, None, :]
        h = mp_silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = MPConv(self.dim_out, 3, dtype=self.dtype,
                   normalize_forward=self.normalize_forward,
                   name="conv2")(h)
        x = mp_add(h, res, self.mp_add_t)
        if self.has_attn:
            x = KarrasAttention(
                heads=max(-(-self.dim_out // self.attn_dim_head), 2),
                dim_head=self.attn_dim_head,
                mp_add_t=self.attn_res_mp_add_t, dtype=self.dtype,
                normalize_forward=self.normalize_forward,
                name="attn")(x)
        return x


class KarrasUnet(nn.Module):
    """Figure 21 config G. Bias-less, norm-free, magnitude preserving."""

    image_size: int
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
    normalize_forward: bool = True  # False = inference mode on params kept
    # normalized by normalize_karras_params (exact; skips the unhoistable
    # per-forward weight re-normalization in every MPConv/MPLinear)
    dtype: Dtype = jnp.float32

    # the net consumes continuous noise conditioning — EDM pairs it with
    # ElucidatedDiffusion (random_or_learned_sinusoidal in the plain stack)
    random_or_learned_sinusoidal_cond = True

    @property
    def downsample_factor(self):
        return 2**self.num_downsamples

    @nn.compact
    def __call__(self, x, time, self_cond=None, class_labels=None, *,
                 deterministic: bool = True):
        if self.self_condition:
            if self_cond is None:
                self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([self_cond, x], axis=-1)

        # time embedding
        emb_dim = self.dim * 4
        temb = MPFourierEmbedding(self.fourier_dim, name="fourier")(time)
        temb = MPLinear(emb_dim, dtype=self.dtype,
                        normalize_forward=self.normalize_forward,
                        name="to_time_emb")(temb)

        if self.num_classes is not None:
            assert class_labels is not None
            if jnp.issubdtype(class_labels.dtype, jnp.integer):
                class_labels = jax.nn.one_hot(class_labels, self.num_classes)
            class_labels = class_labels.astype(jnp.float32) * math.sqrt(
                self.num_classes)
            cemb = MPLinear(emb_dim, dtype=self.dtype,
                            normalize_forward=self.normalize_forward,
                            name="to_class_emb")(class_labels)
            temb = mp_add(temb, cemb, self.mp_add_emb_t)

        emb = mp_silu(temb)

        block_kwargs = dict(
            dropout=self.dropout, attn_dim_head=self.attn_dim_head,
            attn_res_mp_add_t=self.attn_res_mp_add_t,
            mp_add_t=self.resnet_mp_add_t, dtype=self.dtype,
            normalize_forward=self.normalize_forward,
        )

        # assemble stage plan (mirrors reference construction :500-546)
        downs, ups = [], []
        curr_dim, curr_res = self.dim, self.image_size
        attn_res = set(self.attn_res)

        ups.insert(0, dict(dim_out=self.dim, has_attn=False, upsample=False))
        for _ in range(self.num_blocks_per_stage):
            downs.append(dict(dim_out=curr_dim, has_attn=False,
                              downsample=False))
            ups.insert(0, dict(dim_out=curr_dim, has_attn=False,
                               upsample=False))
        for _ in range(self.num_downsamples):
            dim_out = min(self.dim_max, curr_dim * 2)
            ups.insert(0, dict(dim_out=curr_dim, has_attn=curr_res in attn_res,
                               upsample=True))
            curr_res //= 2
            has_attn = curr_res in attn_res
            downs.append(dict(dim_out=dim_out, has_attn=has_attn,
                              downsample=True))
            ups.insert(0, dict(dim_out=dim_out, has_attn=has_attn,
                               upsample=False))
            for _ in range(self.num_blocks_per_stage):
                downs.append(dict(dim_out=dim_out, has_attn=has_attn,
                                  downsample=False))
                ups.insert(0, dict(dim_out=dim_out, has_attn=has_attn,
                                   upsample=False))
            curr_dim = dim_out

        # input block, encoder
        x = MPConv(self.dim, 3, concat_ones_to_input=True, dtype=self.dtype,
                   normalize_forward=self.normalize_forward,
                   name="input_block")(x)
        skips = [x]
        for i, spec in enumerate(downs):
            x = KarrasEncoderBlock(
                spec["dim_out"], has_attn=spec["has_attn"],
                downsample=spec["downsample"], **block_kwargs,
                name=f"down_{i}")(x, emb, deterministic=deterministic)
            skips.append(x)

        # mid
        mid_attn = curr_res in attn_res
        for i in range(2):
            x = KarrasDecoderBlock(
                curr_dim, has_attn=mid_attn, **block_kwargs,
                name=f"mid_{i}")(x, emb, deterministic=deterministic)

        # decoder
        for i, spec in enumerate(ups):
            if not spec["upsample"]:
                x = mp_cat(x, skips.pop(), t=self.mp_cat_t, axis=-1)
            x = KarrasDecoderBlock(
                spec["dim_out"], has_attn=spec["has_attn"],
                upsample=spec["upsample"], **block_kwargs,
                name=f"up_{i}")(x, emb, deterministic=deterministic)

        out = MPConv(self.channels, 3, dtype=self.dtype,
                     normalize_forward=self.normalize_forward,
                     name="output_conv")(x)
        return Gain(name="output_gain")(out)


class MPFeedForward(nn.Module):
    """Magnitude-preserving transformer feedforward (the reference's bonus
    MP transformer, karras_unet.py:635-660): pixel-norm → 1x1 MP convs with
    MPSiLU → MPAdd residual."""

    mult: int = 4
    mp_add_t: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        res = x
        h = pixel_norm(x, axis=-1)
        h = MPLinear(dim * self.mult, dtype=self.dtype, name="proj_in")(h)
        h = mp_silu(h)
        h = MPLinear(dim, dtype=self.dtype, name="proj_out")(h)
        return mp_add(h, res, self.mp_add_t)


class MPAttentionTokens(nn.Module):
    """Karras cosine attention over token sequences [B, N, D]
    (karras_unet.py:662-687 adapted from the image Attention)."""

    heads: int = 4
    dim_head: int = 64
    num_mem_kv: int = 4
    mp_add_t: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.attention import sdpa

        b, n, c = x.shape
        hidden = self.heads * self.dim_head
        res = x
        h = pixel_norm(x, axis=-1)
        qkv = MPLinear(hidden * 3, dtype=self.dtype, name="to_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(b, n, self.heads, self.dim_head)
        q, k, v = reshape(q), reshape(k), reshape(v)

        mem_kv = self.param(
            "mem_kv", nn.initializers.normal(1.0),
            (2, self.heads, self.num_mem_kv, self.dim_head), jnp.float32)
        mk = jnp.broadcast_to(
            mem_kv[0].transpose(1, 0, 2)[None],
            (b, self.num_mem_kv, self.heads, self.dim_head)).astype(k.dtype)
        mv = jnp.broadcast_to(
            mem_kv[1].transpose(1, 0, 2)[None],
            (b, self.num_mem_kv, self.heads, self.dim_head)).astype(v.dtype)
        k = jnp.concatenate([mk, k], axis=1)
        v = jnp.concatenate([mv, v], axis=1)
        q, k, v = (pixel_norm(t, axis=-1) for t in (q, k, v))
        out = sdpa(q, k, v).reshape(b, n, hidden)
        out = MPLinear(c, dtype=self.dtype, name="to_out")(out)
        return mp_add(out, res, self.mp_add_t)


class MPTransformer(nn.Module):
    """Stack of MP attention + MP feedforward blocks."""

    depth: int
    heads: int = 4
    dim_head: int = 64
    ff_mult: int = 4
    mp_add_t: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = MPAttentionTokens(self.heads, self.dim_head,
                                  mp_add_t=self.mp_add_t, dtype=self.dtype,
                                  name=f"attn_{i}")(x)
            x = MPFeedForward(self.ff_mult, self.mp_add_t, dtype=self.dtype,
                              name=f"ff_{i}")(x)
        return x


def inv_sqrt_decay_schedule(base_lr: float, t_ref: int = 70000,
                            sigma_ref: float = 0.01):
    """EDM2 eq. 67 LR decay as an optax schedule
    (reference InvSqrtDecayLRSched, karras_unet.py:691-702)."""
    import optax

    def fn(step):
        return base_lr * sigma_ref / jnp.sqrt(
            jnp.maximum(step / t_ref, 1.0))

    return fn
