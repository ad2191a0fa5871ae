"""Import reference torch checkpoints into this framework's param trees.

Supports the reference's stage-1 autoencoder checkpoints so weights trained
with the PyTorch stack can be reused for parity testing and inference:
- KL-VAE `kl_vae_best.pt` (either {'model_state_dict': …} or a raw state
  dict — the tolerant loading of /root/reference/train_latent_cfg.py:373-397)
- VQ-GAN `vqgan-*.pt` ({'vqvae': …}, train_vqgan.py:372-387)

Layout conversions (determined empirically against torch, see
tests/test_torch_import.py):
- Conv2d OIHW → flax HWIO: transpose(2, 3, 1, 0)
- ConvTranspose2d [in, out, kh, kw] → flax ConvTranspose HWIO with spatially
  FLIPPED taps: w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
- GroupNorm weight/bias → scale/bias
- NCHW modules → NHWC modules (handled by kernel layout alone)
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

__all__ = ["load_torch_klvae", "load_torch_vqvae", "torch_state_to_numpy"]


def torch_state_to_numpy(path_or_state) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file (CPU) into {key: ndarray}; unwraps the
    reference's container formats."""
    if isinstance(path_or_state, (str, Path)):
        import torch

        state = torch.load(path_or_state, map_location="cpu",
                           weights_only=True)
    else:
        state = path_or_state
    for container_key in ("model_state_dict", "vqvae", "state_dict"):
        if container_key in state and isinstance(state[container_key], dict):
            state = state[container_key]
            break
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            v = v.detach().numpy()
        out[k] = np.asarray(v)
    return out


def _conv(s, key):
    return {
        "kernel": jnp.asarray(s[f"{key}.weight"].transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(s[f"{key}.bias"]),
    }


def _conv_nobias(s, key):
    return {"kernel": jnp.asarray(s[f"{key}.weight"].transpose(2, 3, 1, 0))}


def _conv_transpose(s, key):
    w = s[f"{key}.weight"]  # [in, out, kh, kw]
    return {
        "kernel": jnp.asarray(
            np.ascontiguousarray(w[:, :, ::-1, ::-1]).transpose(2, 3, 0, 1)),
        "bias": jnp.asarray(s[f"{key}.bias"]),
    }


def _groupnorm(s, key):
    return {"GroupNorm_0": {
        "scale": jnp.asarray(s[f"{key}.weight"]),
        "bias": jnp.asarray(s[f"{key}.bias"]),
    }}


def _resblock(s, prefix, has_shortcut):
    out = {
        "GroupNorm_0": _groupnorm(s, f"{prefix}.norm1"),
        "conv1": _conv(s, f"{prefix}.conv1"),
        "GroupNorm_1": _groupnorm(s, f"{prefix}.norm2"),
        "conv2": _conv(s, f"{prefix}.conv2"),
    }
    if has_shortcut:
        out["nin_shortcut"] = _conv(s, f"{prefix}.nin_shortcut")
    return out


def _attnblock(s, prefix):
    return {
        "GroupNorm_0": _groupnorm(s, f"{prefix}.norm"),
        "q": _conv(s, f"{prefix}.q"),
        "k": _conv(s, f"{prefix}.k"),
        "v": _conv(s, f"{prefix}.v"),
        "proj_out": _conv(s, f"{prefix}.proj_out"),
    }


def _import_encoder(s, prefix="encoder"):
    keys = set(s)
    enc = {"conv_in": _conv(s, f"{prefix}.conv_in")}
    i = 0
    while f"{prefix}.down.{i}.block.0.conv1.weight" in keys:
        j = 0
        while f"{prefix}.down.{i}.block.{j}.conv1.weight" in keys:
            has_sc = f"{prefix}.down.{i}.block.{j}.nin_shortcut.weight" in keys
            enc[f"down_{i}_block_{j}"] = _resblock(
                s, f"{prefix}.down.{i}.block.{j}", has_sc)
            if f"{prefix}.down.{i}.attn.{j}.q.weight" in keys:
                enc[f"down_{i}_attn_{j}"] = _attnblock(
                    s, f"{prefix}.down.{i}.attn.{j}")
            j += 1
        if f"{prefix}.down.{i}.downsample.weight" in keys:
            enc[f"down_{i}_downsample"] = {
                "Conv_0": _conv(s, f"{prefix}.down.{i}.downsample")}
        i += 1
    for mid in ("block_1", "block_2"):
        enc[f"mid_{mid}"] = _resblock(s, f"{prefix}.mid.{mid}", False)
    enc["mid_attn_1"] = _attnblock(s, f"{prefix}.mid.attn_1")
    enc["norm_out"] = _groupnorm(s, f"{prefix}.norm_out")
    enc["conv_out"] = _conv(s, f"{prefix}.conv_out")
    return enc


def _import_decoder(s, prefix="decoder"):
    keys = set(s)
    dec = {"conv_in": _conv(s, f"{prefix}.conv_in")}
    for mid in ("block_1", "block_2"):
        dec[f"mid_{mid}"] = _resblock(s, f"{prefix}.mid.{mid}", False)
    dec["mid_attn_1"] = _attnblock(s, f"{prefix}.mid.attn_1")
    i = 0
    while f"{prefix}.up.{i}.block.0.conv1.weight" in keys:
        j = 0
        while f"{prefix}.up.{i}.block.{j}.conv1.weight" in keys:
            has_sc = f"{prefix}.up.{i}.block.{j}.nin_shortcut.weight" in keys
            dec[f"up_{i}_block_{j}"] = _resblock(
                s, f"{prefix}.up.{i}.block.{j}", has_sc)
            if f"{prefix}.up.{i}.attn.{j}.q.weight" in keys:
                dec[f"up_{i}_attn_{j}"] = _attnblock(
                    s, f"{prefix}.up.{i}.attn.{j}")
            j += 1
        if f"{prefix}.up.{i}.upsample.weight" in keys:
            dec[f"up_{i}_upsample"] = {
                "ConvTranspose_0": _conv_transpose(
                    s, f"{prefix}.up.{i}.upsample")}
        i += 1
    dec["norm_out"] = _groupnorm(s, f"{prefix}.norm_out")
    dec["conv_out"] = _conv(s, f"{prefix}.conv_out")
    return dec


def load_torch_klvae(path_or_state) -> Dict:
    """Reference KL_VAE state dict → flax params for models.KLVAE."""
    s = torch_state_to_numpy(path_or_state)
    params = {
        "encoder": _import_encoder(s, "encoder"),
        "decoder": _import_decoder(s, "decoder"),
        "quant_conv": _conv(s, "quant_conv"),
        "post_quant_conv": _conv(s, "post_quant_conv"),
    }
    return {"params": params}


def load_torch_vqvae(path_or_state) -> Dict:
    """Reference VQVAE state dict → flax params for models.VQVAE."""
    s = torch_state_to_numpy(path_or_state)
    params = {
        "encoder": _import_encoder(s, "encoder"),
        "decoder": _import_decoder(s, "decoder"),
        "quantizer": {"embedding": jnp.asarray(s["quantizer.embedding.weight"])},
    }
    if "pre_quant_conv.weight" in s:
        params["pre_quant_conv"] = _conv(s, "pre_quant_conv")
        params["post_quant_conv"] = _conv(s, "post_quant_conv")
    return {"params": params}
