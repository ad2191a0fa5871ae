"""1D Gaussian diffusion over sequences.

Behavior target: /root/reference/denoising_diffusion_pytorch/
denoising_diffusion_pytorch_1d.py:415-757 — the 2D process specialized to
[B, L, C] sequences with channel-first/last support (the reference added
`channel_first` handling; ours is channel-last native with a conversion
flag for torch-style [B, C, L] data).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .gaussian import GaussianDiffusion

__all__ = ["GaussianDiffusion1D", "Dataset1D"]


@dataclasses.dataclass
class GaussianDiffusion1D(GaussianDiffusion):
    seq_length: int = 128
    channel_first_data: bool = False  # accept [B, C, L] inputs like torch

    def _to_internal(self, x):
        return jnp.swapaxes(x, 1, 2) if self.channel_first_data else x

    def _from_internal(self, x):
        return jnp.swapaxes(x, 1, 2) if self.channel_first_data else x

    def loss(self, params, key, seq, classes=None, **kwargs):
        seq = self._to_internal(seq)
        b = seq.shape[0]
        k_t, k_p = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, self.timesteps)
        seq = self.normalize(seq)
        return self.p_losses(params, k_p, seq, t, classes, **kwargs)

    def sample(self, params, key, batch_size=16, classes=None, *,
               cond_scale=1.0, rescaled_phi=0.0):
        shape = (batch_size, self.seq_length, self.channels)
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        out = fn(params, key, shape, classes,
                 cond_scale=cond_scale, rescaled_phi=rescaled_phi)
        return self._from_internal(out)


class Dataset1D:
    """In-memory sequence dataset (reference ddpm_1d.py:74-84)."""

    def __init__(self, tensor):
        import numpy as np

        self.data = np.asarray(tensor, dtype="float32")

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return self.data[idx], 0
