"""Shared conv encoder/decoder trunk + KL-VAE.

One implementation serves both stage-1 autoencoders (the reference duplicates
the same topology in /root/reference/vae/kl_vae.py:86-236 and
/root/reference/vqgan_ldm_baseline/models/encoder_decoder.py:88-255; here the
VQ variant differs only in z_channels and the sigmoid output head).

Architecture (behavior parity with the reference):
- Encoder: conv_in 3x3 → per level [num_res_blocks × ResnetBlock (+ attn when
  the tracked resolution is in attn_resolutions)] → stride-2 conv downsample
  between levels → mid (ResnetBlock, AttnBlock, ResnetBlock) → GroupNorm,
  SiLU, conv_out to (2·)z_channels.
- Decoder: conv_in → mid → per level [(num_res_blocks+1) × ResnetBlock
  (+ attn)] → ConvTranspose k4 s2 upsample between levels → GroupNorm, SiLU,
  conv_out (optional sigmoid for the VQ decoder, encoder_decoder.py:253).
- Resolution tracking starts at `resolution` (the reference hardcodes 256,
  kl_vae.py:106) so attention placement is input-size-independent.

NHWC, fp32 params, configurable compute dtype.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import AttnBlock, Downsample, GroupNorm, ResnetBlock, UpsampleTranspose

Dtype = Any

__all__ = [
    "AutoencoderConfig",
    "Encoder",
    "Decoder",
    "DiagonalGaussian",
    "KLVAE",
]


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    """Topology shared by encoder and decoder."""

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    resolution: int = 256  # resolution assumed for attention placement
    z_channels: int = 4
    out_ch: int = 3
    double_z: bool = True
    final_sigmoid: bool = False  # VQ decoder forces [0,1] output


class Encoder(nn.Module):
    config: AutoencoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.config
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x.astype(self.dtype))

        curr_res = cfg.resolution
        num_levels = len(cfg.ch_mult)
        for i_level in range(num_levels):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(block_out, cfg.dropout, dtype=self.dtype,
                                name=f"down_{i_level}_block_{i_block}")(
                    h, deterministic=deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_levels - 1:
                h = Downsample(dtype=self.dtype,
                               name=f"down_{i_level}_downsample")(h)
                curr_res //= 2

        h = ResnetBlock(dropout=cfg.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=cfg.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, deterministic=deterministic)

        h = GroupNorm(dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(h)
        return h


class Decoder(nn.Module):
    config: AutoencoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        cfg = self.config
        num_levels = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // 2 ** (num_levels - 1)

        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(z.astype(self.dtype))

        h = ResnetBlock(dropout=cfg.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=cfg.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, deterministic=deterministic)

        for i_level in reversed(range(num_levels)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(block_out, cfg.dropout, dtype=self.dtype,
                                name=f"up_{i_level}_block_{i_block}")(
                    h, deterministic=deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = UpsampleTranspose(dtype=self.dtype,
                                      name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = GroupNorm(dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(h)
        if cfg.final_sigmoid:
            h = jax.nn.sigmoid(h)
        return h


class DiagonalGaussian:
    """Diagonal Gaussian posterior from concatenated (mean, logvar) moments.

    Behavior target: reference kl_vae.py:239-266 (logvar clamped to
    [-30, 20]; kl() sums over all non-batch dims). Moments are split on the
    channel (last) axis in NHWC.
    """

    def __init__(self, parameters: jax.Array, deterministic: bool = False):
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.mean = mean.astype(jnp.float32)
        self.logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        if deterministic:
            self.std = self.var = jnp.zeros_like(self.mean)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, dtype=jnp.float32
        )

    def kl(self) -> jax.Array:
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), jnp.float32)
        return 0.5 * jnp.sum(
            self.mean**2 + self.var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


class KLVAE(nn.Module):
    """SD-style AutoencoderKL (behavior target: reference kl_vae.py:269-390).

    encode_images applies `scale_factor` (0.18215); decode_latents removes it
    and clamps to [0,1]. ch_mult=(1,2,2,4) gives 8× spatial reduction
    (256→32); the reference's "4x" comments are wrong (SURVEY.md §2.1 note).
    """

    config: AutoencoderConfig = AutoencoderConfig()
    scale_factor: float = 0.18215
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        enc_cfg = dataclasses.replace(cfg, double_z=True)
        self.encoder = Encoder(enc_cfg, dtype=self.dtype)
        self.decoder = Decoder(cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * cfg.z_channels, (1, 1),
                                  dtype=self.dtype, param_dtype=jnp.float32)
        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1),
                                       dtype=self.dtype,
                                       param_dtype=jnp.float32)

    def encode(self, x, *, deterministic: bool = True) -> DiagonalGaussian:
        h = self.encoder(x, deterministic=deterministic)
        moments = self.quant_conv(h)
        return DiagonalGaussian(moments)

    def decode(self, z, *, deterministic: bool = True):
        z = self.post_quant_conv(z.astype(self.dtype))
        return self.decoder(z, deterministic=deterministic)

    def __call__(self, x, *, rng: jax.Array | None = None,
                 sample_posterior: bool = True, deterministic: bool = True):
        posterior = self.encode(x, deterministic=deterministic)
        if sample_posterior:
            if rng is None:
                rng = self.make_rng("gaussian")
            z = posterior.sample(rng)
        else:
            z = posterior.mean
        dec = self.decode(z, deterministic=deterministic)
        return dec, posterior

    def encode_images(self, x, *, rng: jax.Array):
        """Images ([0,1]) → scaled latents for diffusion training."""
        posterior = self.encode(x)
        return posterior.sample(rng) * self.scale_factor

    def encode_images_mean(self, x):
        """Deterministic variant (posterior mean) for cache preprocessing."""
        return self.encode(x).mean * self.scale_factor

    def decode_latents(self, z):
        """Scaled latents → images clamped to [0,1]."""
        x = self.decode(z / self.scale_factor)
        return jnp.clip(x, 0.0, 1.0)


def kl_vae_loss(
    recon: jax.Array,
    inputs: jax.Array,
    posterior: DiagonalGaussian,
    kl_weight: float = 1e-6,
    perceptual_fn=None,
):
    """MSE (or pluggable perceptual) + kl_weight·KL, matching
    reference kl_vae.py:361-390."""
    if perceptual_fn is not None:
        parts = perceptual_fn(recon, inputs)
        rec_loss = parts["total"]
        perceptual = parts.get("perceptual", jnp.float32(0.0))
    else:
        rec_loss = jnp.mean((inputs - recon) ** 2)
        perceptual = jnp.float32(0.0)
    kl = jnp.mean(posterior.kl())
    loss = rec_loss + kl_weight * kl
    return {
        "loss": loss,
        "rec_loss": rec_loss,
        "kl_loss": kl,
        "perceptual_loss": perceptual,
    }
