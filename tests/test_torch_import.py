"""Numerical parity of torch-checkpoint import against the actual reference
torch modules (loaded from /root/reference, read-only — skipped when absent).

These tests are the strongest possible check of the import shim AND of our
architecture parity: same weights → same outputs (within fp32 conv noise).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not mounted")


def _load_reference_module(relpath, name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, REFERENCE / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch_klvae():
    import torch

    kl_vae = _load_reference_module("vae/kl_vae.py", "ref_kl_vae")
    torch.manual_seed(0)
    ddconfig = dict(
        double_z=True, z_channels=4, in_channels=3, ch=32,
        ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
        dropout=0.0,
    )
    model = kl_vae.KL_VAE(ddconfig={**ddconfig, "out_ch": 3}, embed_dim=4)
    model.eval()
    return model


def test_klvae_torch_parity(torch_klvae):
    """Same weights, same input → same encoder mean and same decode."""
    import torch
    import jax.numpy as jnp

    from vqgan_tpu.checkpoint.torch_import import load_torch_klvae
    from vqgan_tpu.models import KLVAE
    from vqgan_tpu.models.autoencoder import AutoencoderConfig

    # reference Encoder hardcodes curr_res=256 start; with ch_mult len 2 and
    # attn at 8 there is no down attention — config mirrors that
    config = AutoencoderConfig(
        ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
        resolution=256, z_channels=4)
    model = KLVAE(config=config)
    params = load_torch_klvae(torch_klvae.state_dict())

    x = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)

    with torch.no_grad():
        posterior_t = torch_klvae.encode(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))
        mean_t = posterior_t.mean.numpy().transpose(0, 2, 3, 1)
        dec_t = torch_klvae.decode(posterior_t.mean).numpy().transpose(
            0, 2, 3, 1)

    posterior_j = model.apply(params, jnp.asarray(x), method=KLVAE.encode)
    mean_j = np.asarray(posterior_j.mean)
    np.testing.assert_allclose(mean_j, mean_t, atol=2e-4)

    dec_j = np.asarray(model.apply(params, posterior_j.mean,
                                   method=KLVAE.decode))
    np.testing.assert_allclose(dec_j, dec_t, atol=2e-3)


def test_vqvae_torch_parity():
    import torch
    import jax.numpy as jnp

    vq_mod = _load_reference_module(
        "vqgan_ldm_baseline/models/quantizer.py", "ref_quantizer")
    sys.modules["models"] = type(sys)("models")
    enc_mod = _load_reference_module(
        "vqgan_ldm_baseline/models/encoder_decoder.py", "ref_encdec")
    # stitch the reference package imports
    import types

    pkg = types.ModuleType("refpkg")
    sys.modules[".encoder_decoder"] = enc_mod

    torch.manual_seed(1)
    # reference VQVAE imports relatively; build it manually from parts
    encoder = enc_mod.Encoder(in_channels=3, ch=32, ch_mult=(1, 2),
                              num_res_blocks=1, attn_resolutions=(8,),
                              z_channels=16)
    decoder = enc_mod.Decoder(out_ch=3, ch=32, ch_mult=(1, 2),
                              num_res_blocks=1, attn_resolutions=(8,),
                              z_channels=16)
    quant = vq_mod.VectorQuantizer(num_embeddings=8, embedding_dim=16)
    encoder.eval(); decoder.eval(); quant.eval()

    state = {}
    for prefix, m in (("encoder", encoder), ("decoder", decoder),
                      ("quantizer", quant)):
        for k, v in m.state_dict().items():
            state[f"{prefix}.{k}"] = v

    from vqgan_tpu.checkpoint.torch_import import load_torch_vqvae
    from vqgan_tpu.models import VQVAE

    model = VQVAE(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                  attn_resolutions=(8,), resolution=256, z_channels=16,
                  num_embeddings=8, embedding_dim=16)
    params = load_torch_vqvae(state)

    x = np.random.RandomState(1).rand(1, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        z_t = encoder(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        zq_t, _, idx_t = quant(z_t)
        rec_t = decoder(zq_t).numpy().transpose(0, 2, 3, 1)

    rec_j, _, idx_j = model.apply(params, jnp.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(idx_j).ravel(), idx_t.numpy().ravel())
    np.testing.assert_allclose(np.asarray(rec_j), rec_t, atol=2e-3)
