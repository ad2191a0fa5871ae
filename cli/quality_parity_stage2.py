#!/usr/bin/env python
"""Stage-2 quality parity: train the torch reference CFG diffusion stack and
this rebuild side-by-side from IDENTICAL initialization with identical
per-step (data, t, noise) draws, and compare the loss trajectories.

Complements cli/quality_parity.py (stage-1 VQ-GAN recon curves) and the
unit-level stage-2 proofs (tests/test_torch_parity_stage2.py: forward /
p_losses / gradient / 3-step Adam parity) with a longer optimization
trajectory on the flagship path: reference
/root/reference/denoising_diffusion_pytorch/classifier_free_guidance.py
(Unet :377, GaussianDiffusion :598, p_losses :878) vs vqgan_tpu's CFGUnet +
GaussianDiffusion, both under Adam with the same hyperparameters.

The dataset is deterministic synthetic "latents" with class-dependent means
so the denoising objective has real structure to learn.

Usage: python cli/quality_parity_stage2.py [--steps 200] [--out FILE]
Prints per-eval records and a final verdict JSON line.
"""

import argparse
import importlib.util
import json
import sys
from pathlib import Path

import numpy as np

from _common import REPO  # noqa: E402

REFERENCE = Path("/root/reference")

DIM, MULTS, CH, NCLS, HEADS, DHEAD = 32, (1, 2), 4, 5, 2, 8
SIZE, T_STEPS = 8, 100
LR, BETAS, EPS = 1e-3, (0.9, 0.99), 1e-8


def _load_reference_module(relpath, name):
    spec = importlib.util.spec_from_file_location(name, REFERENCE / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def make_dataset(n=256, seed=0):
    rs = np.random.RandomState(seed)
    means = rs.randn(NCLS, 1, 1, CH).astype(np.float32)
    classes = rs.randint(0, NCLS, size=n)
    x = means[classes] + 0.3 * rs.randn(n, SIZE, SIZE, CH).astype(np.float32)
    return x.astype(np.float32), classes.astype(np.int64)


def step_draws(steps, n, batch, seed=7):
    rs = np.random.RandomState(seed)
    for _ in range(steps):
        idx = rs.randint(0, n, size=batch)
        t = rs.randint(0, T_STEPS, size=batch).astype(np.int64)
        noise = rs.randn(batch, SIZE, SIZE, CH).astype(np.float32)
        yield idx, t, noise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval_every", type=int, default=10)
    ap.add_argument("--out", default=str(REPO / "results" /
                                         "quality_parity_stage2.json"))
    args = ap.parse_args()

    import torch

    import jax
    import jax.numpy as jnp
    import optax

    # CPU + fp32 on both sides for a like-for-like comparison
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge
    xla_bridge._clear_backends()
    torch.manual_seed(11)
    torch.set_num_threads(1)

    ref_cfg = _load_reference_module(
        "denoising_diffusion_pytorch/classifier_free_guidance.py", "ref_cfg")

    from vqgan_tpu.checkpoint.torch_import import load_torch_cfg_unet
    from vqgan_tpu.diffusion import GaussianDiffusion
    from vqgan_tpu.models import CFGUnet

    tnet = ref_cfg.Unet(dim=DIM, num_classes=NCLS, cond_drop_prob=0.0,
                        dim_mults=MULTS, channels=CH,
                        attn_dim_head=DHEAD, attn_heads=HEADS)
    tdiff = ref_cfg.GaussianDiffusion(
        tnet, image_size=SIZE, timesteps=T_STEPS, sampling_timesteps=10,
        objective="pred_v", beta_schedule="cosine", ddim_sampling_eta=0.0,
        min_snr_loss_weight=True, min_snr_gamma=5, auto_normalize=False)
    tdiff.eval()  # no dropout modules; keeps behavior deterministic
    opt_t = torch.optim.Adam(tnet.parameters(), lr=LR, betas=BETAS, eps=EPS)

    jnet = CFGUnet(dim=DIM, num_classes=NCLS, cond_drop_prob=0.0,
                   dim_mults=MULTS, channels=CH,
                   attn_dim_head=DHEAD, attn_heads=HEADS)
    params = load_torch_cfg_unet(tnet.state_dict())

    def model_apply(p, x, t, classes, cond_drop_mask=None,
                    cond_drop_prob=None, rng=None, return_features=False):
        return jnet.apply(p, x, t, classes, cond_drop_mask=cond_drop_mask,
                          cond_drop_prob=cond_drop_prob,
                          rngs={"cond_drop": rng} if rng is not None else None,
                          return_features=return_features)

    jdiff = GaussianDiffusion(
        model_apply, image_size=SIZE, channels=CH, timesteps=T_STEPS,
        sampling_timesteps=10, objective="pred_v", beta_schedule="cosine",
        ddim_sampling_eta=0.0, min_snr_loss_weight=True, min_snr_gamma=5.0,
        auto_normalize=False)
    tx = optax.adam(LR, b1=BETAS[0], b2=BETAS[1], eps=EPS)
    opt_state = tx.init(params)

    @jax.jit
    def jax_step(p, s, x, t, classes, noise):
        def loss_fn(p):
            return jdiff.p_losses(
                p, jax.random.PRNGKey(0), x, t, classes, noise=noise,
                cond_drop_prob=0.0)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    data, labels = make_dataset()
    nchw = lambda a: torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())

    rows = []
    for step, (idx, t, noise) in enumerate(
            step_draws(args.steps, len(data), args.batch), start=1):
        xb, cb = data[idx], labels[idx]

        loss_t = tdiff.p_losses(nchw(xb), torch.from_numpy(t),
                                classes=torch.from_numpy(cb),
                                noise=nchw(noise))
        opt_t.zero_grad()
        loss_t.backward()
        opt_t.step()

        params, opt_state, loss_j = jax_step(
            params, opt_state, jnp.asarray(xb), jnp.asarray(t),
            jnp.asarray(cb.astype(np.int32)), jnp.asarray(noise))

        if step % args.eval_every == 0 or step == args.steps:
            row = {"step": step, "torch_loss": float(loss_t.item()),
                   "jax_loss": float(loss_j)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    k = max(1, len(rows) // 4)
    tail_t = float(np.mean([r["torch_loss"] for r in rows[-k:]]))
    tail_j = float(np.mean([r["jax_loss"] for r in rows[-k:]]))
    verdict = {
        "steps": args.steps,
        "tail_mean_torch": round(tail_t, 6),
        "tail_mean_jax": round(tail_j, 6),
        "tail_rel_gap": round(abs(tail_t - tail_j) / max(tail_t, 1e-9), 6),
        "max_step_rel_gap": round(max(
            abs(r["torch_loss"] - r["jax_loss"])
            / max(r["torch_loss"], 1e-9) for r in rows), 6),
        "config": {"dim": DIM, "dim_mults": list(MULTS), "channels": CH,
                   "num_classes": NCLS, "size": SIZE, "timesteps": T_STEPS,
                   "lr": LR, "batch": args.batch},
    }
    print(json.dumps({"verdict": verdict}), flush=True)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({"rows": rows, "verdict": verdict}, indent=1))


if __name__ == "__main__":
    main()
