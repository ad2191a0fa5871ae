"""Class-conditional U-Net for classifier-free-guidance latent diffusion.

Behavior target: the reference CFG U-Net
(/root/reference/denoising_diffusion_pytorch/classifier_free_guidance.py:328-561):
class embedding + learned null embedding, FiLM (scale/shift) ResBlocks
conditioned on time+class, per-resolution LinearAttention + CrossAttention
(image queries the condition vector), full attention + cross attention in the
mid block, bottleneck feature tap for contrastive training.

TPU-native differences:
- NHWC layout; full attention runs through ops.attention's size-aware
  dispatcher (XLA einsum at these 16x16-latent sequence lengths, the
  fused flash kernel for long sequences).
- Condition dropout takes an explicit bool mask / PRNG key (no global RNG).
- CFG's cond+null double forward is batched (2B batch, one forward) in the
  diffusion wrapper — better MXU utilization than two sequential forwards.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from .layers import RMSNorm, UpsampleNearest

Dtype = Any

__all__ = ["CFGUnet", "SinusoidalPosEmb"]


class SinusoidalPosEmb(nn.Module):
    """Transformer sinusoidal timestep embedding (reference cfg.py:139-151)."""

    dim: int

    @nn.compact
    def __call__(self, t):
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = t.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """Fourier-feature time embedding, optionally frozen (reference
    cfg.py:153-168). Output dim = fourier_dim + 1 (raw t appended)."""

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t):
        half_dim = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half_dim,),
                       jnp.float32)
        if self.is_random:
            w = jax.lax.stop_gradient(w)
        t = t.astype(jnp.float32)[:, None]
        freqs = t * w[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class Block(nn.Module):
    """conv3x3 → RMSNorm → (FiLM scale/shift) → SiLU (reference cfg.py:172-188)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj")(x)
        x = RMSNorm(dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlockFiLM(nn.Module):
    """Two conv blocks with time+class FiLM conditioning and 1x1 residual
    (reference cfg.py:190-216)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None, class_emb=None):
        scale_shift = None
        embs = [e for e in (time_emb, class_emb) if e is not None]
        if embs:
            cond = jnp.concatenate(embs, axis=-1)
            cond = nn.silu(cond)
            cond = nn.Dense(self.dim_out * 2, dtype=self.dtype,
                            param_dtype=jnp.float32, name="mlp")(cond)
            cond = cond[:, None, None, :]
            scale_shift = jnp.split(cond, 2, axis=-1)

        h = Block(self.dim_out, dtype=self.dtype, name="block1")(
            x, scale_shift=scale_shift)
        h = Block(self.dim_out, dtype=self.dtype, name="block2")(h)

        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="res_conv")(x)
        return h + x


class LinearAttention(nn.Module):
    """Kernel-feature-map linear attention with RMSNorm'd output projection
    (reference cfg.py:218-245). O(n·d²) — used at the outer resolutions."""

    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # [B, HW, heads, dh] → [B, heads, dh, HW] to match the reference's
        # softmax axes (q over tokens' feature dim, k over tokens)
        reshape = lambda t: t.reshape(b, h * w, self.heads, self.dim_head
                                      ).transpose(0, 2, 3, 1)
        q, k, v = reshape(q), reshape(k), reshape(v)

        q = jax.nn.softmax(q.astype(jnp.float32), axis=-2)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=-1)
        q = q * (self.dim_head**-0.5)
        v = v.astype(jnp.float32)

        context = jnp.einsum("bhdn,bhen->bhde", k, v,
                             preferred_element_type=jnp.float32)
        out = jnp.einsum("bhde,bhdn->bhen", context, q,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)
        out = out.astype(x.dtype)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      name="to_out")(out)
        return RMSNorm(dtype=self.dtype, name="out_norm")(out)


class Attention(nn.Module):
    """Full multi-head self-attention over spatial tokens via the
    size-dispatched sdpa (reference cfg.py:247-269 + attend.py)."""

    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(b, h * w, self.heads, self.dim_head)
        out = sdpa(reshape(q), reshape(k), reshape(v))
        out = out.reshape(b, h, w, hidden)
        return nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                       name="to_out")(out)


class CrossAttentionCond(nn.Module):
    """Image-queries-condition cross attention (reference cfg.py:272-324).

    The condition is a single vector per sample; with one context token the
    softmax is degenerate (all mass on it), so attention reduces to injecting
    the learned value projection at every position — semantics preserved."""

    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        if context.ndim == 2:
            context = context[:, None, :]  # [B, 1, Dctx]
        n = context.shape[1]

        to_q = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_q")
        k = nn.Dense(hidden, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_k")(context)
        v = nn.Dense(hidden, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_v")(context)
        to_out = nn.Conv(c, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="to_out")

        if n == 1:
            # One context token ⇒ softmax ≡ 1 and the attention output is
            # the value projection at every position (docstring above), so
            # q·kᵀ/softmax/weighted-sum are dead math. Apply to_out (a 1×1
            # conv = pointwise) to the single token and broadcast the
            # RESULT — exact, and profiling showed the general path's two
            # 16×16-stage instances eating ~330 µs/forward plus their
            # layout reshapes. to_q still runs on one pixel so the param
            # tree (and the torch-checkpoint mapping) is unchanged; XLA
            # dead-code-eliminates it.
            _ = to_q(x[:, :1, :1, :])
            tok = to_out(v.reshape(b, 1, 1, hidden))
            return jnp.broadcast_to(tok, (b, h, w, c))

        q = to_q(x).reshape(b, h * w, self.heads, self.dim_head)
        k = k.reshape(b, n, self.heads, self.dim_head)
        v = v.reshape(b, n, self.heads, self.dim_head)
        out = sdpa(q, k, v)
        out = out.reshape(b, h, w, hidden)
        return to_out(out)


class PreNormResidual(nn.Module):
    """x + fn(RMSNorm(x)) (reference cfg.py:102-135)."""

    fn: nn.Module

    @nn.compact
    def __call__(self, x, *args):
        return x + self.fn(RMSNorm(name="norm")(x), *args)


class CFGUnet(nn.Module):
    """The stage-2 flagship model.

    Defaults follow the LDM trainer config (reference train_latent_cfg.py:
    419-429): dim=96, dim_mults=(1,2,4,4), channels=4, attn 8 heads × 64.
    """

    dim: int
    num_classes: int
    cond_drop_prob: float = 0.5
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 3
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    attn_dim_head: int = 32
    attn_heads: int = 4
    dtype: Dtype = jnp.float32

    @property
    def default_out_dim(self):
        return self.channels * (2 if self.learned_variance else 1)

    @nn.compact
    def __call__(
        self,
        x,
        time,
        classes,
        *,
        cond_drop_mask: Optional[jax.Array] = None,
        cond_drop_prob: Optional[float] = None,
        rng: Optional[jax.Array] = None,
        return_features: bool = False,
    ):
        """x: [B, H, W, C]; time: [B]; classes: [B] int.

        Condition dropout: either pass `cond_drop_mask` (bool [B], True →
        replace class embedding with the learned null embedding — used by the
        CFG sampler), or a `rng` plus `cond_drop_prob` for random dropout
        during training.
        """
        b = x.shape[0]
        dim = self.dim
        init_dim = self.init_dim or dim
        time_dim = dim * 4
        classes_dim = dim * 4

        # --- class conditioning ------------------------------------------
        classes_emb = nn.Embed(self.num_classes, dim, param_dtype=jnp.float32,
                               name="classes_emb")(classes)
        null_emb = self.param("null_classes_emb", nn.initializers.normal(1.0),
                              (dim,), jnp.float32)

        if cond_drop_mask is None:
            p = self.cond_drop_prob if cond_drop_prob is None else cond_drop_prob
            if p > 0.0:
                if rng is None:
                    rng = self.make_rng("cond_drop")
                cond_drop_mask = jax.random.uniform(rng, (b,)) < p
        if cond_drop_mask is not None:
            classes_emb = jnp.where(
                cond_drop_mask[:, None], null_emb[None, :], classes_emb
            )

        c = nn.Sequential([
            nn.Dense(classes_dim, dtype=self.dtype, param_dtype=jnp.float32),
            nn.gelu,
            nn.Dense(classes_dim, dtype=self.dtype, param_dtype=jnp.float32),
        ], name="classes_mlp")(classes_emb)

        # --- time conditioning -------------------------------------------
        if self.learned_sinusoidal_cond or self.random_fourier_features:
            temb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, self.random_fourier_features,
                name="sinu_pos_emb")(time)
        else:
            temb = SinusoidalPosEmb(dim, name="sinu_pos_emb")(time)
        t = nn.Sequential([
            nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32),
            nn.gelu,
            nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32),
        ], name="time_mlp")(temb)

        # --- trunk --------------------------------------------------------
        x = nn.Conv(init_dim, (7, 7), padding=3, dtype=self.dtype,
                    param_dtype=jnp.float32, name="init_conv")(x.astype(self.dtype))
        r = x

        dims = [init_dim, *(dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_resolutions = len(in_out)

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_resolutions - 1
            x = ResnetBlockFiLM(dim_in, dtype=self.dtype,
                                name=f"down_{ind}_block1")(x, t, c)
            hs.append(x)
            x = ResnetBlockFiLM(dim_in, dtype=self.dtype,
                                name=f"down_{ind}_block2")(x, t, c)
            x = PreNormResidual(
                LinearAttention(dtype=self.dtype), name=f"down_{ind}_attn")(x)
            x = PreNormResidual(
                CrossAttentionCond(self.attn_heads, self.attn_dim_head,
                                   dtype=self.dtype),
                name=f"down_{ind}_cross_attn")(x, c)
            hs.append(x)
            if not is_last:
                x = nn.Conv(dim_out, (4, 4), strides=(2, 2), padding=1,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"down_{ind}_downsample")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"down_{ind}_downsample")(x)

        mid_dim = dims[-1]
        x = ResnetBlockFiLM(mid_dim, dtype=self.dtype, name="mid_block1")(x, t, c)
        x = PreNormResidual(
            Attention(self.attn_heads, self.attn_dim_head, dtype=self.dtype),
            name="mid_attn")(x)

        features = None
        if return_features:
            pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
            features = pooled / jnp.maximum(
                jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
            )

        x = PreNormResidual(
            CrossAttentionCond(self.attn_heads, self.attn_dim_head,
                               dtype=self.dtype),
            name="mid_cross_attn")(x, c)
        x = ResnetBlockFiLM(mid_dim, dtype=self.dtype, name="mid_block2")(x, t, c)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlockFiLM(dim_out, dtype=self.dtype,
                                name=f"up_{ind}_block1")(x, t, c)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlockFiLM(dim_out, dtype=self.dtype,
                                name=f"up_{ind}_block2")(x, t, c)
            x = PreNormResidual(
                LinearAttention(dtype=self.dtype), name=f"up_{ind}_attn")(x)
            x = PreNormResidual(
                CrossAttentionCond(self.attn_heads, self.attn_dim_head,
                                   dtype=self.dtype),
                name=f"up_{ind}_cross_attn")(x, c)
            if not is_last:
                x = UpsampleNearest(dim_in, dtype=self.dtype,
                                    name=f"up_{ind}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"up_{ind}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlockFiLM(init_dim, dtype=self.dtype,
                            name="final_res_block")(x, t, c)
        out = nn.Conv(self.out_dim or self.default_out_dim, (1, 1),
                      dtype=jnp.float32, param_dtype=jnp.float32,
                      name="final_conv")(x)

        if return_features:
            return out, features
        return out
