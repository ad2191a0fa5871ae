"""DiT: class-conditional diffusion transformer denoiser (adaLN-zero).

Beyond-reference model family (the reference's stage-2 denoisers are conv
U-Nets): a Diffusion-Transformer backbone (Peebles & Xie, arXiv 2212.09748)
for the same latent-diffusion role as CFGUnet — identical call signature
(`(x, time, classes, *, cond_drop_mask/cond_drop_prob/rng,
return_features)`), so it drops into `GaussianDiffusion`, the LDM train
step, and the CFG samplers unchanged.

Why it earns its place in a TPU-native framework: the backbone is a UNIFORM
stack of identical transformer blocks — exactly the shape the scaling
substrate wants. `dit_pipeline_forward` runs the stack through
`parallel.pp.pipeline_apply` (GPipe over a 'stage' mesh axis, conditioning
riding the pipeline with the tokens), attention goes through the size-aware
`ops.sdpa` dispatch (flash kernel at long sequence), and for sequences past
one chip `ops.ring_attention` shards the tokens. TP's qkv/out rules match
the block's `to_qkv`/`to_out` naming, so `apply_tp_sharding` covers DiT
with no extra configuration.

adaLN-zero: each block's LayerNorms carry no learned affine; a zero-init
projection of the conditioning emits per-block (shift, scale, gate) for the
attention and MLP branches, so every block is the identity at init.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from .unet_cfg import SinusoidalPosEmb

Dtype = Any

__all__ = ["DiT", "DiTBlock", "dit_pipeline_forward", "stacked_block_params"]


def _modulate(h, shift, scale):
    return h * (1.0 + scale[:, None, :]) + shift[:, None, :]


class DiTBlock(nn.Module):
    """One adaLN-zero transformer block: identity at init, shape-preserving
    (the uniform-stack contract of parallel.pp)."""

    dim: int
    heads: int = 6
    dim_head: int = 64
    mlp_mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        # x: [B, N, dim] tokens; c: [B, dim] conditioning
        mods = nn.Dense(6 * self.dim, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="ada_mod")(nn.silu(c))
        (shift_a, scale_a, gate_a,
         shift_m, scale_m, gate_m) = jnp.split(mods, 6, axis=-1)

        hidden = self.heads * self.dim_head
        h = _modulate(nn.LayerNorm(use_scale=False, use_bias=False,
                                   dtype=self.dtype, name="norm1")(x),
                      shift_a, scale_a)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = h.shape
        shape = (b, n, self.heads, self.dim_head)
        out = sdpa(q.reshape(shape), k.reshape(shape), v.reshape(shape))
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       name="to_out")(out.reshape(b, n, hidden))
        x = x + gate_a[:, None, :] * out

        h = _modulate(nn.LayerNorm(use_scale=False, use_bias=False,
                                   dtype=self.dtype, name="norm2")(x),
                      shift_m, scale_m)
        h = nn.Dense(self.dim * self.mlp_mult, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_in")(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_out")(nn.gelu(h))
        return x + gate_m[:, None, :] * h


class DiT(nn.Module):
    dim: int = 384
    depth: int = 8
    heads: int = 6
    dim_head: int = 64
    patch_size: int = 2
    image_size: int = 32
    channels: int = 4
    num_classes: int = 31
    cond_drop_prob: float = 0.1
    mlp_mult: int = 4
    learned_variance: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        p = self.patch_size
        assert self.image_size % p == 0
        self.grid = self.image_size // p
        self.patch_embed = nn.Conv(
            self.dim, (p, p), strides=(p, p), dtype=self.dtype,
            param_dtype=jnp.float32, name="patch_embed")
        self.pos_emb = self.param(
            "pos_emb", nn.initializers.normal(0.02),
            (1, self.grid * self.grid, self.dim), jnp.float32)
        self.sinu_pos_emb = SinusoidalPosEmb(self.dim, name="sinu_pos_emb")
        self.time_mlp_in = nn.Dense(self.dim * 4, dtype=self.dtype,
                                    param_dtype=jnp.float32,
                                    name="time_mlp_in")
        self.time_mlp_out = nn.Dense(self.dim, dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     name="time_mlp_out")
        self.classes_emb = nn.Embed(self.num_classes, self.dim,
                                    param_dtype=jnp.float32,
                                    name="classes_emb")
        self.null_classes_emb = self.param(
            "null_classes_emb", nn.initializers.normal(1.0), (self.dim,),
            jnp.float32)
        self.blocks = [
            DiTBlock(self.dim, self.heads, self.dim_head, self.mlp_mult,
                     dtype=self.dtype)
            for _ in range(self.depth)
        ]
        self.final_mod = nn.Dense(2 * self.dim, dtype=self.dtype,
                                  param_dtype=jnp.float32,
                                  kernel_init=nn.initializers.zeros,
                                  bias_init=nn.initializers.zeros,
                                  name="final_mod")
        self.final_norm = nn.LayerNorm(use_scale=False, use_bias=False,
                                       dtype=self.dtype, name="final_norm")
        out_ch = self.channels * (2 if self.learned_variance else 1)
        self.final_proj = nn.Dense(p * p * out_ch, dtype=jnp.float32,
                                   param_dtype=jnp.float32,
                                   kernel_init=nn.initializers.zeros,
                                   name="final_proj")
        self.out_ch = out_ch

    # --- pipeline-splittable pieces ------------------------------------

    def embed(self, x, time, classes, cond_drop_mask=None,
              cond_drop_prob=None, rng=None):
        """(x, t, classes) → (tokens [B,N,dim], cond [B,dim]); CFG null-class
        dropout identical to CFGUnet's contract."""
        b = x.shape[0]
        tokens = self.patch_embed(x.astype(self.dtype))
        tokens = tokens.reshape(b, -1, self.dim) + self.pos_emb

        cls = self.classes_emb(classes)
        if cond_drop_mask is None:
            p = (self.cond_drop_prob if cond_drop_prob is None
                 else cond_drop_prob)
            if p > 0.0:
                if rng is None:
                    rng = self.make_rng("cond_drop")
                cond_drop_mask = jax.random.uniform(rng, (b,)) < p
        if cond_drop_mask is not None:
            cls = jnp.where(cond_drop_mask[:, None],
                            self.null_classes_emb[None, :], cls)

        temb = self.time_mlp_out(
            nn.gelu(self.time_mlp_in(self.sinu_pos_emb(time))))
        return tokens, temb + cls

    def head(self, tokens, c):
        """Final adaLN + zero-init projection + unpatchify → [B,H,W,out]."""
        mods = self.final_mod(nn.silu(c))
        shift, scale = jnp.split(mods, 2, axis=-1)
        h = _modulate(self.final_norm(tokens), shift, scale)
        out = self.final_proj(h)  # [B, N, p*p*out_ch]
        b = out.shape[0]
        p, g = self.patch_size, self.grid
        out = out.reshape(b, g, g, p, p, self.out_ch)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, g * p, g * p, self.out_ch)
        return out

    def __call__(self, x, time, classes, *, cond_drop_mask=None,
                 cond_drop_prob=None, rng=None, return_features=False):
        tokens, c = self.embed(x, time, classes, cond_drop_mask,
                               cond_drop_prob, rng)
        features = None
        for i, blk in enumerate(self.blocks):
            tokens = blk(tokens, c)
            if return_features and i == self.depth // 2 - 1:
                features = jnp.mean(tokens, axis=1)
        out = self.head(tokens, c)
        if return_features:
            return out, features
        return out


def stacked_block_params(variables, depth: int):
    """Collect the per-block param trees into one [depth, ...] stacked tree
    (the parallel.pp contract)."""
    from ..parallel.pp import stack_params

    p = variables["params"]
    return stack_params([p[f"blocks_{i}"] for i in range(depth)])


def dit_pipeline_forward(model: DiT, variables, x, time, classes, mesh, *,
                         num_microbatches: int,
                         cond_drop_mask=None, stacked=None):
    """DiT forward with the block stack pipelined over the mesh's 'stage'
    axis (embed and head run replicated — they are a tiny fraction of the
    FLOPs). Numerically identical to `model.apply` — tests/test_dit.py.

    Pass `stacked` (pre-sharded via shard_stacked_params) to avoid repeating
    placement per call; by default it is built from `variables`.
    """
    from ..parallel.pp import pipeline_apply, shard_stacked_params

    # inference path: force cond_drop_prob=0.0 so embed never reaches
    # make_rng("cond_drop") when no explicit mask is supplied (flax would
    # raise for the missing rng); CFG dropout belongs to training callers,
    # who pass cond_drop_mask explicitly
    tokens, c = model.apply(
        variables, x, time, classes, cond_drop_mask, 0.0, method=DiT.embed)

    blk = DiTBlock(model.dim, model.heads, model.dim_head, model.mlp_mult,
                   dtype=model.dtype)

    def block_fn(p, carry):
        t_, c_ = carry
        return blk.apply({"params": p}, t_, c_), c_

    if stacked is None:
        stacked = shard_stacked_params(
            stacked_block_params(variables, model.depth), mesh)
    tokens, c = pipeline_apply(block_fn, stacked, (tokens, c), mesh,
                               num_microbatches=num_microbatches)
    return model.apply(variables, tokens, c, method=DiT.head)
