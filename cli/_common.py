"""Shared CLI plumbing: repo path setup, platform override, VAE loading."""

import os
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# Optional platform override for every CLI (e.g. VQGAN_TPU_PLATFORM=cpu for
# a TPU-less dev box, or when the TPU tunnel is down). JAX_PLATFORMS in the
# environment is NOT enough here: this environment's sitecustomize imports
# jax and registers the TPU plugin before any CLI runs, so the value must be
# pushed into the live config and already-initialized backends dropped —
# same mechanism as tests/conftest.py.
_platform = os.environ.get("VQGAN_TPU_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)
    from jax._src import xla_bridge

    xla_bridge._clear_backends()

# Persistent XLA compile cache for every CLI. The big sampling/training
# graphs take minutes to compile through the remote-TPU tunnel; bench.py
# already warms this directory, so any CLI that reuses a benched shape
# (e.g. export_serving at batch 16) loads its executable in seconds.
import jax as _jax  # noqa: E402

_jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
# persist even trivial programs: through the remote-compile tunnel a tiny
# init program can cost seconds-to-a-minute on a congested day, and every
# CLI subprocess would otherwise re-pay it
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


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
