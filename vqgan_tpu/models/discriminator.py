"""PatchGAN discriminator (pix2pix 70×70) for adversarial VQ-GAN training.

Behavior target: /root/reference/vqgan_ldm_baseline/models/discriminator.py:
17-138 — Conv(k4 s2) + LeakyReLU(0.2) ladder with channel doubling capped at
8×, a stride-1 penultimate conv, and 1-channel patch logits.

Normalization choice on TPU: BatchNorm's cross-device batch stats are awkward
under shard_map (SURVEY.md §7.3); we support three modes:
- "batch": flax BatchNorm with per-device stats (documented deviation: stats
  are not synced across the data mesh — equivalent to torch's default
  non-sync BN under DDP, which is exactly what the reference runs),
- "act": ActNorm (scale/bias with data-dependent first-batch init),
- "group": GroupNorm (stat-free, fully deterministic under sharding).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

__all__ = ["PatchGANDiscriminator", "ActNorm", "MultiScaleDiscriminator"]


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init from the first batch
    (reference discriminator.py:100-138). The init stats live in a mutable
    'actnorm_stats' collection; pass `init_actnorm=True` on the first step."""

    @nn.compact
    def __call__(self, x, *, init_actnorm: bool = False):
        c = x.shape[-1]
        initialized = self.variable(
            "actnorm_stats", "initialized",
            lambda: jnp.zeros((), jnp.int32))
        bias = self.variable(
            "actnorm_stats", "bias", lambda: jnp.zeros((c,), jnp.float32))
        weight = self.variable(
            "actnorm_stats", "weight", lambda: jnp.ones((c,), jnp.float32))

        if init_actnorm and not self.is_initializing():
            mean = jnp.mean(x, axis=(0, 1, 2))
            std = jnp.std(x, axis=(0, 1, 2))
            do_init = initialized.value == 0
            bias.value = jnp.where(do_init, -mean, bias.value)
            weight.value = jnp.where(
                do_init, 1.0 / (std + 1e-6), weight.value)
            initialized.value = jnp.ones((), jnp.int32)

        return x * weight.value + bias.value


def _norm(kind: str, dtype, name: str):
    if kind == "batch":
        # momentum 0.9 == torch BatchNorm2d's default 0.1 (torch counts the
        # NEW-batch fraction, flax the KEPT fraction). Flax's default 0.99
        # would adapt running stats 10x slower than the reference's
        # discriminator — a real dynamics difference in the G pass, which
        # reads these stats frozen (see PARITY.md, discriminator BN mode).
        return nn.BatchNorm(momentum=0.9, dtype=jnp.float32,
                            param_dtype=jnp.float32, name=name)
    if kind == "act":
        return ActNorm(name=name)
    if kind == "group":
        return nn.GroupNorm(num_groups=None, group_size=1, dtype=jnp.float32,
                            param_dtype=jnp.float32, name=name)
    raise ValueError(f"unknown norm kind {kind!r}")


class PatchGANDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"  # "batch" | "act" | "group"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        leaky = lambda h: nn.leaky_relu(h, negative_slope=0.2)

        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_0")(x.astype(self.dtype))
        h = leaky(h)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(2, 2), padding=1,
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv_{n}")(h)
            norm = _norm(self.norm, self.dtype, f"norm_{n}")
            h = norm(h) if self.norm != "batch" else norm(
                h, use_running_average=not train)
            h = leaky(h)

        nf_mult = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(1, 1), padding=1,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"conv_{self.n_layers}")(h)
        norm = _norm(self.norm, self.dtype, f"norm_{self.n_layers}")
        h = norm(h) if self.norm != "batch" else norm(
            h, use_running_average=not train)
        h = leaky(h)

        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1,
                       dtype=jnp.float32, param_dtype=jnp.float32,
                       name="conv_out")(h)


class MultiScaleDiscriminator(nn.Module):
    """N PatchGAN discriminators at successive 2× downsamplings (reference
    discriminator.py:141-184; unused by the baseline but part of the API)."""

    num_scales: int = 2
    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        outs = []
        for i in range(self.num_scales):
            outs.append(
                PatchGANDiscriminator(
                    self.ndf, self.n_layers, self.norm, self.dtype,
                    name=f"scale_{i}")(x, train=train)
            )
            if i != self.num_scales - 1:
                x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        return outs
