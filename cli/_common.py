"""Shared CLI plumbing: repo path setup and VAE checkpoint loading."""

import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def load_vae(vae_path: str, latent_channels: int = 4, image_size: int = 256,
             scale_factor: float = 0.18215):
    """Load KL-VAE params from an Orbax dir (ours) or a torch .pt checkpoint
    (reference format, via the import shim). Returns (model, params)."""
    import jax.numpy as jnp

    from vqgan_tpu.models import KLVAE
    from vqgan_tpu.models.autoencoder import AutoencoderConfig

    model = KLVAE(config=AutoencoderConfig(
        resolution=image_size, z_channels=latent_channels),
        scale_factor=scale_factor)

    p = Path(vae_path)
    if p.suffix == ".pt":
        from vqgan_tpu.checkpoint.torch_import import load_torch_klvae

        params = load_torch_klvae(p)
    else:
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(p.absolute())
    return model, params
