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

__all__ = [
    "load_torch_klvae",
    "load_torch_vqvae",
    "load_torch_cfg_unet",
    "load_torch_patchgan",
    "torch_state_to_numpy",
]


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
        # copy is load-bearing: .numpy() ALIASES torch storage, and JAX's
        # CPU backend can keep numpy buffers zero-copy — without the copy,
        # later in-place torch updates (e.g. BatchNorm running stats during
        # a parity run) silently mutate the "imported" flax variables.
        out[k] = np.array(v, copy=True)
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


def _dense(s, key):
    return {"kernel": jnp.asarray(s[f"{key}.weight"].T),
            "bias": jnp.asarray(s[f"{key}.bias"])}


def _dense_nobias(s, key):
    return {"kernel": jnp.asarray(s[f"{key}.weight"].T)}


def _rms_g(s, key):
    # reference RMSNorm stores g as [1, C, 1, 1] (cfg.py:119-125); ours is [C]
    return {"g": jnp.asarray(s[key].reshape(-1))}


def _film_resblock(s, prefix):
    """Reference CFG ResnetBlock (classifier_free_guidance.py:190-216) →
    our ResnetBlockFiLM: mlp = Sequential(SiLU, Linear) so the Linear sits
    at `.mlp.1`; each Block holds proj conv + RMSNorm."""
    out = {
        "mlp": _dense(s, f"{prefix}.mlp.1"),
        "block1": {"proj": _conv(s, f"{prefix}.block1.proj"),
                   "RMSNorm_0": _rms_g(s, f"{prefix}.block1.norm.g")},
        "block2": {"proj": _conv(s, f"{prefix}.block2.proj"),
                   "RMSNorm_0": _rms_g(s, f"{prefix}.block2.norm.g")},
    }
    if f"{prefix}.res_conv.weight" in s:
        out["res_conv"] = _conv(s, f"{prefix}.res_conv")
    return out


def _linear_attention(s, prefix):
    """Residual(PreNorm(LinearAttention)) at `prefix` — returns (prenorm
    params, inner-module params). to_out is Sequential(Conv, RMSNorm)."""
    prenorm = {"norm": _rms_g(s, f"{prefix}.fn.norm.g")}
    inner = {
        "to_qkv": _conv_nobias(s, f"{prefix}.fn.fn.to_qkv"),
        "to_out": _conv(s, f"{prefix}.fn.fn.to_out.0"),
        "out_norm": _rms_g(s, f"{prefix}.fn.fn.to_out.1.g"),
    }
    return prenorm, inner


def _full_attention(s, prefix):
    prenorm = {"norm": _rms_g(s, f"{prefix}.fn.norm.g")}
    inner = {
        "to_qkv": _conv_nobias(s, f"{prefix}.fn.fn.to_qkv"),
        "to_out": _conv(s, f"{prefix}.fn.fn.to_out"),
    }
    return prenorm, inner


def _cross_attention(s, prefix):
    prenorm = {"norm": _rms_g(s, f"{prefix}.fn.norm.g")}
    inner = {
        "to_q": _conv_nobias(s, f"{prefix}.fn.fn.to_q"),
        "to_k": _dense_nobias(s, f"{prefix}.fn.fn.to_k"),
        "to_v": _dense_nobias(s, f"{prefix}.fn.fn.to_v"),
        "to_out": _conv(s, f"{prefix}.fn.fn.to_out"),
    }
    return prenorm, inner


def load_torch_cfg_unet(path_or_state) -> Dict:
    """Reference CFG U-Net state dict
    (/root/reference/denoising_diffusion_pytorch/classifier_free_guidance.py:
    328-433) → flax params for models.CFGUnet.

    Flax naming quirks this mapping encodes (see tests/test_torch_parity_
    stage2.py): modules handed to PreNormResidual as constructor args are
    registered in the PARENT scope with autonames in creation order —
    LinearAttention_{0..R-1} (downs) then _{R..2R-1} (ups);
    CrossAttentionCond_{0..R-1} (downs), _R (mid), _{R+1..2R} (ups);
    Attention_0 (mid). The two Sequential MLPs flatten to Dense_0/1
    (classes_mlp) and Dense_2/3 (time_mlp).
    """
    s = torch_state_to_numpy(path_or_state)
    p: Dict = {
        "classes_emb": {"embedding": jnp.asarray(s["classes_emb.weight"])},
        "null_classes_emb": jnp.asarray(s["null_classes_emb"]),
        "Dense_0": _dense(s, "classes_mlp.0"),
        "Dense_1": _dense(s, "classes_mlp.2"),
        "Dense_2": _dense(s, "time_mlp.1"),
        "Dense_3": _dense(s, "time_mlp.3"),
        "init_conv": _conv(s, "init_conv"),
        "final_res_block": _film_resblock(s, "final_res_block"),
        "final_conv": _conv(s, "final_conv"),
    }
    if "time_mlp.0.weights" in s:  # learned/random sinusoidal variant
        p["sinu_pos_emb"] = {"weights": jnp.asarray(s["time_mlp.0.weights"])}

    n_res = 0
    while f"downs.{n_res}.0.block1.proj.weight" in s:
        n_res += 1

    for i in range(n_res):
        p[f"down_{i}_block1"] = _film_resblock(s, f"downs.{i}.0")
        p[f"down_{i}_block2"] = _film_resblock(s, f"downs.{i}.1")
        pre, inner = _linear_attention(s, f"downs.{i}.2")
        p[f"down_{i}_attn"] = pre
        p[f"LinearAttention_{i}"] = inner
        pre, inner = _cross_attention(s, f"downs.{i}.3")
        p[f"down_{i}_cross_attn"] = pre
        p[f"CrossAttentionCond_{i}"] = inner
        p[f"down_{i}_downsample"] = _conv(s, f"downs.{i}.4")

    p["mid_block1"] = _film_resblock(s, "mid_block1")
    pre, inner = _full_attention(s, "mid_attn")
    p["mid_attn"] = pre
    p["Attention_0"] = inner
    pre, inner = _cross_attention(s, "mid_cross_attn")
    p["mid_cross_attn"] = pre
    p[f"CrossAttentionCond_{n_res}"] = inner
    p["mid_block2"] = _film_resblock(s, "mid_block2")

    for i in range(n_res):
        p[f"up_{i}_block1"] = _film_resblock(s, f"ups.{i}.0")
        p[f"up_{i}_block2"] = _film_resblock(s, f"ups.{i}.1")
        pre, inner = _linear_attention(s, f"ups.{i}.2")
        p[f"up_{i}_attn"] = pre
        p[f"LinearAttention_{n_res + i}"] = inner
        pre, inner = _cross_attention(s, f"ups.{i}.3")
        p[f"up_{i}_cross_attn"] = pre
        p[f"CrossAttentionCond_{n_res + 1 + i}"] = inner
        if f"ups.{i}.4.1.weight" in s:  # Upsample = Sequential(nearest, conv)
            p[f"up_{i}_upsample"] = {"Conv_0": _conv(s, f"ups.{i}.4.1")}
        else:  # last resolution: plain 3x3 conv
            p[f"up_{i}_upsample"] = _conv(s, f"ups.{i}.4")

    return {"params": p}


def load_torch_patchgan(path_or_state, n_layers: int = 3) -> Dict:
    """Reference PatchGANDiscriminator `main` Sequential
    (/root/reference/vqgan_ldm_baseline/models/discriminator.py:49-84) →
    flax variables {params, batch_stats} for models.PatchGANDiscriminator
    (BatchNorm variant). Sequential indices: conv_0 at 0, conv_n at 3n-1
    with its BN at 3n, final 1-channel conv at 3·n_layers+2."""
    s = torch_state_to_numpy(path_or_state)
    params: Dict = {"conv_0": _conv(s, "main.0")}
    stats: Dict = {}
    for n in range(1, n_layers + 1):
        idx = 3 * n - 1
        params[f"conv_{n}"] = _conv_nobias(s, f"main.{idx}")
        params[f"norm_{n}"] = {
            "scale": jnp.asarray(s[f"main.{idx + 1}.weight"]),
            "bias": jnp.asarray(s[f"main.{idx + 1}.bias"]),
        }
        stats[f"norm_{n}"] = {
            "mean": jnp.asarray(s[f"main.{idx + 1}.running_mean"]),
            "var": jnp.asarray(s[f"main.{idx + 1}.running_var"]),
        }
    params["conv_out"] = _conv(s, f"main.{3 * n_layers + 2}")
    return {"params": params, "batch_stats": stats}


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
