"""VQ-VAE: shared conv trunk + fused vector quantizer.

Behavior target: /root/reference/vqgan_ldm_baseline/models/vq_vae.py:18-227
and quantizer.py:17-149. The quantization itself runs through the fused
Pallas op (vqgan_tpu.ops.vq); straight-through estimator and the
codebook/commitment losses are composed here in jnp.

Loss-convention note (`loss_convention`): the VQ-VAE paper (and our default,
"paper") trains the CODEBOOK with the unweighted term and weights the
encoder's commitment by β:

  vq_loss = mse(z_q, sg(z)) + β · mse(sg(z_q), z)

The reference implementation SWAPS the stop-gradients relative to its own
comments (quantizer.py:89-95: `codebook_loss = F.mse_loss(z_q.detach(), z)`
routes gradient to the ENCODER, `commitment_loss = F.mse_loss(z_q,
z.detach())` to the codebook) — so it effectively weights the codebook
update by β and the commitment by 1. The forward loss VALUE is identical
(mse is symmetric); only the gradient routing differs.
`loss_convention="reference"` replicates that quirk exactly — used by the
quality-parity harness (cli/quality_parity.py) for apples-to-apples
trajectory comparison against the installed torch reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.vq import vq_lookup
from .autoencoder import AutoencoderConfig, Decoder, Encoder

Dtype = Any

__all__ = ["VQVAE", "VectorQuantizer"]


class VectorQuantizer(nn.Module):
    """Codebook module. Init U(-1/K, 1/K) matching reference quantizer.py:48.

    __call__ takes NHWC z and returns (z_q_ste, loss_dict, indices [B,h,w]).
    """

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25
    loss_convention: str = "paper"  # "paper" | "reference" (see module doc)

    @nn.compact
    def __call__(self, z):
        k = self.num_embeddings
        codebook = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / k, 1.0 / k
            ),
            (k, self.embedding_dim),
        )

        b, h, w, c = z.shape
        z_flat = z.reshape(-1, c)
        z_q_flat, idx_flat, usage = vq_lookup(
            z_flat.astype(jnp.float32), codebook
        )
        z_q = z_q_flat.reshape(b, h, w, c)
        indices = idx_flat.reshape(b, h, w)

        z32 = z.astype(jnp.float32)
        to_codebook = jnp.mean((z_q - jax.lax.stop_gradient(z32)) ** 2)
        to_encoder = jnp.mean((jax.lax.stop_gradient(z_q) - z32) ** 2)
        if self.loss_convention == "reference":
            # reference quantizer.py:89-95: β weights the CODEBOOK term
            codebook_loss, commitment_loss = to_encoder, to_codebook
        else:
            codebook_loss, commitment_loss = to_codebook, to_encoder
        vq_loss = codebook_loss + self.commitment_cost * commitment_loss

        z_q_ste = z32 + jax.lax.stop_gradient(z_q - z32)

        loss_dict = {
            "usage_counts": usage,  # [K] int32 per-batch counts (the only
            # non-scalar log entry; trainers accumulate it for dead-code
            # revival and drop it from scalar logging)
            "vq_loss": vq_loss,
            "codebook_loss": jax.lax.stop_gradient(codebook_loss),
            "commitment_loss": jax.lax.stop_gradient(commitment_loss),
            "codebook_usage_ratio": jnp.mean((usage > 0).astype(jnp.float32)),
        }
        return z_q_ste.astype(z.dtype), loss_dict, indices

    def lookup(self, indices):
        """indices [B, h, w] → z_q [B, h, w, D] (reference
        get_codebook_entry, quantizer.py:112)."""
        codebook = self.get_variable("params", "embedding")
        return jnp.take(codebook, indices, axis=0)


class VQVAE(nn.Module):
    """Encoder → pre-quant 1x1 → VQ → post-quant 1x1 → Decoder(sigmoid).

    Defaults mirror VQGANConfig (vqgan_config.py:37-53): ch=128,
    ch_mult=(1,2,2,4), z_channels=256, codebook 128×256, β=0.25, decoder
    sigmoid head forcing [0,1] output (encoder_decoder.py:253).
    """

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    resolution: int = 256
    z_channels: int = 256
    num_embeddings: int = 128
    embedding_dim: int = 256
    commitment_cost: float = 0.25
    out_channels: int = 3
    loss_convention: str = "paper"  # see VectorQuantizer
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = AutoencoderConfig(
            ch=self.ch,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            dropout=self.dropout,
            resolution=self.resolution,
            z_channels=self.z_channels,
            out_ch=self.out_channels,
            double_z=False,
            final_sigmoid=True,
        )
        self.encoder = Encoder(cfg, dtype=self.dtype)
        self.decoder = Decoder(cfg, dtype=self.dtype)
        if self.z_channels != self.embedding_dim:
            self.pre_quant_conv = nn.Conv(
                self.embedding_dim, (1, 1), dtype=self.dtype,
                param_dtype=jnp.float32)
            self.post_quant_conv = nn.Conv(
                self.z_channels, (1, 1), dtype=self.dtype,
                param_dtype=jnp.float32)
        else:
            self.pre_quant_conv = self.post_quant_conv = lambda x: x
        self.quantizer = VectorQuantizer(
            self.num_embeddings, self.embedding_dim, self.commitment_cost,
            loss_convention=self.loss_convention,
        )

    def encode(self, x, *, deterministic: bool = True):
        z = self.encoder(x, deterministic=deterministic)
        z = self.pre_quant_conv(z)
        z_q, loss_dict, indices = self.quantizer(z)
        z_q = self.post_quant_conv(z_q)
        return z_q, indices, loss_dict

    def encode_pre_quant(self, x, *, deterministic: bool = True):
        """Images → pre-quant encoder features [B, h, w, D] — the candidate
        pool for dead-code revival (ops.vq.revive_dead_codes)."""
        z = self.encoder(x, deterministic=deterministic)
        return self.pre_quant_conv(z)

    def decode(self, z_q, *, deterministic: bool = True):
        return self.decoder(z_q, deterministic=deterministic)

    def __call__(self, x, *, deterministic: bool = True):
        z_q, indices, loss_dict = self.encode(x, deterministic=deterministic)
        x_recon = self.decode(z_q, deterministic=deterministic)
        return x_recon, loss_dict, indices

    def encode_to_indices(self, x):
        _, indices, _ = self.encode(x)
        return indices

    def decode_from_indices(self, indices):
        z_q = self.quantizer.lookup(indices)
        z_q = self.post_quant_conv(z_q)
        return self.decode(z_q)

    def encode_images(self, x):
        """Images → quantized latents for LDM training (vq_vae.py:192)."""
        z_q, _, _ = self.encode(x)
        return z_q

    def decode_latents(self, z_q):
        """Latents → images clamped to [0,1] (vq_vae.py:206)."""
        return jnp.clip(self.decode(z_q), 0.0, 1.0)
