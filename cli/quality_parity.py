#!/usr/bin/env python
"""Quality parity: train the torch reference VQ-GAN and this rebuild
side-by-side from IDENTICAL initialization on a deterministic synthetic
dataset, and compare reconstruction MSE / PSNR trajectories.

This produces the first actual evidence for the BASELINE configs #1/#2
"parity" targets (VERDICT r1 item 3): same init (weights exported from the
torch modules through checkpoint/torch_import), same data order, same
optimizer settings → the two frameworks' quality curves must track.

Scope notes:
- The lpips wheel is not installed in this environment (zero egress), and
  the reference's LPIPSWithDiscriminator imports it at module load
  (/root/reference/vqgan_ldm_baseline/models/losses.py:15), so BOTH sides
  train with perceptual_weight=0: L1 + VQ + (gated) hinge-GAN — the full
  two-optimizer dynamics of train_vqgan.py:240-296 minus the LPIPS term.
- Our quantizer runs with loss_convention="reference" to replicate the
  reference's swapped stop-gradients (quantizer.py:89-95; see
  models/vq_vae.py docstring).
- The torch discriminator is put in eval() for the generator pass and
  train() for the D pass, matching our step semantics (the g phase reads
  frozen BN stats; the reference keeps BN in train mode throughout, a
  batch-statistics difference documented in PARITY.md).

Usage: python cli/quality_parity.py [--steps 300] [--size 48] [--out FILE]
Prints one record per eval point and a final verdict JSON line.
"""

import argparse
import importlib.util
import json
import sys
from pathlib import Path

import numpy as np

from _common import REPO  # noqa: E402

REFERENCE = Path("/root/reference")


# ------------------------------------------------------------------ data --

def make_synthetic_images(n: int, size: int, seed: int = 0) -> np.ndarray:
    """Deterministic structured images in [0,1]: per-image mixture of two
    Gaussian bumps and an oriented sinusoidal grating (micro-Doppler-ish
    banded texture), distinct across images, identical across frameworks."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = np.zeros((n, size, size, 3), np.float32)
    for i in range(n):
        img = np.zeros((size, size, 3), np.float32)
        for _ in range(2):
            cx, cy = rng.rand(2)
            s = 0.05 + 0.15 * rng.rand()
            blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
            img += blob[..., None] * rng.rand(3)
        fx, fy = rng.randint(2, 8, size=2)
        phase = rng.rand() * 2 * np.pi
        grating = 0.5 + 0.5 * np.sin(2 * np.pi * (fx * xx + fy * yy) + phase)
        img += 0.4 * grating[..., None] * rng.rand(3)
        imgs[i] = img / max(img.max(), 1e-6)
    return imgs


def batch_indices(steps: int, n: int, batch: int, seed: int = 123):
    """The shared per-step sample indices (same data order on both sides)."""
    rng = np.random.RandomState(seed)
    order = []
    while len(order) * n < steps * batch + n:
        order.append(rng.permutation(n))
    flat = np.concatenate(order)
    return [flat[i * batch:(i + 1) * batch] for i in range(steps)]


def psnr(mse: float) -> float:
    return float(-10.0 * np.log10(max(mse, 1e-12)))


# ----------------------------------------------------------------- torch --

def _load_reference_module(relpath, name):
    spec = importlib.util.spec_from_file_location(name, REFERENCE / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def build_torch_models(cfg, seed=1):
    """Reference encoder/decoder/quantizer/discriminator with seeded init,
    assembled exactly like VQVAE (vq_vae.py:60-97; z_channels ==
    embedding_dim ⇒ identity pre/post-quant convs, :78-79)."""
    import torch

    enc_mod = _load_reference_module(
        "vqgan_ldm_baseline/models/encoder_decoder.py", "qp_ref_encdec")
    vq_mod = _load_reference_module(
        "vqgan_ldm_baseline/models/quantizer.py", "qp_ref_quantizer")
    disc_mod = _load_reference_module(
        "vqgan_ldm_baseline/models/discriminator.py", "qp_ref_disc")

    torch.manual_seed(seed)
    encoder = enc_mod.Encoder(
        in_channels=3, ch=cfg["ch"], ch_mult=cfg["ch_mult"],
        num_res_blocks=cfg["num_res_blocks"],
        attn_resolutions=cfg["attn_resolutions"],
        z_channels=cfg["z_channels"])
    decoder = enc_mod.Decoder(
        out_ch=3, ch=cfg["ch"], ch_mult=cfg["ch_mult"],
        num_res_blocks=cfg["num_res_blocks"],
        attn_resolutions=cfg["attn_resolutions"],
        z_channels=cfg["z_channels"])
    quant = vq_mod.VectorQuantizer(
        num_embeddings=cfg["num_embeddings"],
        embedding_dim=cfg["embedding_dim"],
        commitment_cost=cfg["commitment_cost"])
    disc = disc_mod.PatchGANDiscriminator(
        input_nc=3, ndf=cfg["disc_ndf"], n_layers=cfg["disc_n_layers"])
    return encoder, decoder, quant, disc


def export_state(encoder, decoder, quant, disc):
    # .copy() is load-bearing: .numpy() aliases torch storage, and the torch
    # side trains these modules in place AFTER the export
    gen_state = {}
    for prefix, m in (("encoder", encoder), ("decoder", decoder),
                      ("quantizer", quant)):
        for k, v in m.state_dict().items():
            gen_state[f"{prefix}.{k}"] = v.detach().numpy().copy()
    disc_state = {k: v.detach().numpy().copy()
                  for k, v in disc.state_dict().items()}
    return gen_state, disc_state


def run_torch(cfg, images, steps, indices, eval_points, models):
    """The reference two-optimizer loop (train_vqgan.py:240-296) with
    perceptual off. Returns {step: (eval_mse, train_loss)}."""
    import torch

    encoder, decoder, quant, disc = models
    gen_params = (list(encoder.parameters()) + list(decoder.parameters())
                  + list(quant.parameters()))
    opt_g = torch.optim.Adam(gen_params, lr=cfg["lr"], betas=(0.5, 0.9))
    opt_d = torch.optim.Adam(disc.parameters(), lr=cfg["disc_lr"],
                             betas=(0.5, 0.9))
    eval_x = torch.from_numpy(
        images[:cfg["eval_n"]].transpose(0, 3, 1, 2)).float()

    def reconstruct():
        with torch.no_grad():
            encoder.eval(), decoder.eval(), quant.eval()
            z = encoder(eval_x)
            zq, _, _ = quant(z)
            return decoder(zq)

    records = {}
    for step in range(steps):
        encoder.train(), decoder.train(), quant.train()
        x = torch.from_numpy(
            images[indices[step]].transpose(0, 3, 1, 2)).float()

        disc.eval()  # g pass reads frozen BN stats (see module docstring)
        z = encoder(x)
        zq, loss_dict, _ = quant(z)
        recon = decoder(zq)
        rec_loss = torch.abs(x - recon).mean()
        total = rec_loss + loss_dict["vq_loss"]
        if step >= cfg["disc_start"]:
            g_loss = -disc(recon).mean()  # hinge-G, discriminator.py:219
            total = total + cfg["disc_weight"] * g_loss
        opt_g.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(gen_params, 1.0)
        opt_g.step()

        if step >= cfg["disc_start"]:
            disc.train()
            logits_real = disc(x)
            logits_fake = disc(recon.detach())
            d_loss = 0.5 * (
                torch.relu(1.0 - logits_real).mean()
                + torch.relu(1.0 + logits_fake).mean())
            opt_d.zero_grad()
            d_loss.backward()
            torch.nn.utils.clip_grad_norm_(disc.parameters(), 1.0)
            opt_d.step()

        if (step + 1) in eval_points:
            rec = reconstruct().numpy().transpose(0, 2, 3, 1)
            mse = float(np.mean((rec - images[:cfg["eval_n"]]) ** 2))
            records[step + 1] = {"mse": mse, "psnr": psnr(mse),
                                 "train_loss": float(total.detach())}
    return records


# ------------------------------------------------------------------- jax --

def run_jax(cfg, images, steps, indices, eval_points, gen_state, disc_state):
    """Our split G/D production step, initialized from the torch weights."""
    import jax
    import jax.numpy as jnp

    from vqgan_tpu.checkpoint.torch_import import (
        load_torch_patchgan,
        load_torch_vqvae,
    )
    from vqgan_tpu.models import VQVAE
    from vqgan_tpu.models.discriminator import PatchGANDiscriminator
    from vqgan_tpu.training import (
        VQGANTrainState,
        make_gan_optimizers,
        make_vqgan_split_steps,
    )

    vqvae = VQVAE(ch=cfg["ch"], ch_mult=cfg["ch_mult"],
                  num_res_blocks=cfg["num_res_blocks"],
                  attn_resolutions=cfg["attn_resolutions"],
                  # reference Encoder hardcodes curr_res=256 for attention
                  # placement (encoder_decoder.py:114) regardless of input
                  resolution=256, z_channels=cfg["z_channels"],
                  num_embeddings=cfg["num_embeddings"],
                  embedding_dim=cfg["embedding_dim"],
                  commitment_cost=cfg["commitment_cost"],
                  loss_convention="reference")
    disc = PatchGANDiscriminator(ndf=cfg["disc_ndf"],
                                 n_layers=cfg["disc_n_layers"], norm="batch")

    vq_params = load_torch_vqvae(gen_state)
    disc_all = load_torch_patchgan(disc_state, n_layers=cfg["disc_n_layers"])
    disc_params = {"params": disc_all["params"]}
    disc_stats = {"batch_stats": disc_all["batch_stats"]}

    def vqvae_apply(params, x):
        return vqvae.apply(params, x)

    def disc_apply(params, stats, x, train):
        if stats and train:
            logits, upd = disc.apply({**params, **stats}, x, train=True,
                                     mutable=["batch_stats"])
            return logits, {"batch_stats": upd["batch_stats"]}
        return disc.apply({**params, **stats}, x, train=False), stats

    opt_g, opt_d = make_gan_optimizers(
        learning_rate=cfg["lr"], disc_learning_rate=cfg["disc_lr"],
        betas=(0.5, 0.9), max_grad_norm=1.0)
    g_step, d_step = make_vqgan_split_steps(
        vqvae_apply, disc_apply, opt_g, opt_d,
        disc_start=cfg["disc_start"], disc_weight=cfg["disc_weight"],
        perceptual_weight=0.0, perceptual_fn=None, donate=False)

    state = VQGANTrainState(
        step=jnp.asarray(0), vqvae_params=vq_params,
        disc_params=disc_params, disc_stats=disc_stats,
        opt_g=opt_g.init(vq_params), opt_d=opt_d.init(disc_params))

    eval_x = jnp.asarray(images[:cfg["eval_n"]])

    @jax.jit
    def reconstruct(params):
        rec, _, _ = vqvae.apply(params, eval_x)
        return rec

    records = {}
    for step in range(steps):
        x = jnp.asarray(images[indices[step]])
        state, recon, log = g_step(state, x)
        if step >= cfg["disc_start"]:
            state, _ = d_step(state, x, recon)
        if (step + 1) in eval_points:
            rec = np.asarray(reconstruct(state.vqvae_params))
            mse = float(np.mean((rec - images[:cfg["eval_n"]]) ** 2))
            records[step + 1] = {"mse": mse, "psnr": psnr(mse),
                                 "train_loss": float(log["loss_total"])}
    return records


# ------------------------------------------------------------------ main --

def pin_cpu_fp32():
    """Run the JAX side on CPU with true-fp32 matmuls: the comparison is
    framework-vs-framework numerics, not hardware (TPU fp32 matmuls default
    to bf16-grade precision, which muddies the trajectory comparison)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge

        xla_bridge._clear_backends()
    except Exception:
        pass
    jax.config.update("jax_default_matmul_precision", "highest")


def run_parity(steps=300, size=48, batch=8, n_images=64, eval_every=25,
               lr=1e-3, disc_lr=None, disc_weight=0.1, disc_start=None,
               verbose=True):
    """disc_start=None → steps//2; disc_lr=None → lr. Note on LR: GAN
    dynamics at lr≳1e-3 are chaotic at this scale — fp-noise-level
    differences between frameworks get amplified into divergent fates
    (observed: torch collapse vs jax stable from identical init), which says
    nothing about parity. Use disc_start=steps (pure recon+VQ, tightly
    deterministic) for the main parity metric, and for the GAN-phase
    comparison pick a config where BOTH sides are stable: conservative G lr,
    a lower D lr, and a small disc_weight (the reference's own stability
    levers — train_vqgan.py lr 4.5e-5, disc_weight 0.1, disc_start 10000)."""
    cfg = dict(
        ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
        z_channels=32, num_embeddings=64, embedding_dim=32,
        commitment_cost=0.25, disc_ndf=16, disc_n_layers=2,
        disc_start=steps // 2 if disc_start is None else disc_start,
        disc_weight=disc_weight, lr=lr,
        disc_lr=lr if disc_lr is None else disc_lr, size=size,
        eval_n=min(8, n_images),
    )
    images = make_synthetic_images(n_images, size)
    indices = batch_indices(steps, n_images, batch)
    eval_points = set(range(eval_every, steps + 1, eval_every)) | {steps}

    models = build_torch_models(cfg)
    gen_state, disc_state = export_state(*models)

    t_rec = run_torch(cfg, images, steps, indices, eval_points, models)
    j_rec = run_jax(cfg, images, steps, indices, eval_points,
                    gen_state, disc_state)

    rows = []
    for s in sorted(t_rec):
        row = {"step": s,
               "torch_mse": t_rec[s]["mse"], "jax_mse": j_rec[s]["mse"],
               "torch_psnr": t_rec[s]["psnr"], "jax_psnr": j_rec[s]["psnr"]}
        rows.append(row)
        if verbose:
            print(json.dumps(row))
    final = rows[-1]
    verdict = {
        "final_psnr_torch": round(final["torch_psnr"], 3),
        "final_psnr_jax": round(final["jax_psnr"], 3),
        "final_psnr_gap_db": round(
            abs(final["jax_psnr"] - final["torch_psnr"]), 3),
        "max_psnr_gap_db": round(
            max(abs(r["jax_psnr"] - r["torch_psnr"]) for r in rows), 3),
        "config": {k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in cfg.items()},
        "steps": steps,
    }
    # Adversarial-phase tracking statistics: single eval points are noisy
    # in a GAN (both sides show transient dips that recover), so the
    # trajectory comparison after disc_start is summarized by median/mean
    # gap alongside the worst point.
    post = [r for r in rows if r["step"] > cfg["disc_start"]]
    if post:
        gaps = sorted(abs(r["jax_psnr"] - r["torch_psnr"]) for r in post)
        verdict["post_disc_start"] = {
            "eval_points": len(post),
            "median_gap_db": round(gaps[len(gaps) // 2], 3),
            "mean_gap_db": round(sum(gaps) / len(gaps), 3),
            "max_gap_db": round(gaps[-1], 3),
            "min_psnr_torch": round(min(r["torch_psnr"] for r in post), 3),
            "min_psnr_jax": round(min(r["jax_psnr"] for r in post), 3),
        }
    return rows, verdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval_every", type=int, default=25)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--disc_lr", type=float, default=None,
                    help="discriminator LR (default: same as --lr)")
    ap.add_argument("--disc_weight", type=float, default=0.1)
    ap.add_argument("--disc_start", type=int, default=None,
                    help="step at which the discriminator starts (default "
                         "steps//2; pass --disc_start <steps> to disable)")
    ap.add_argument("--out", default=str(REPO / "results" /
                                         "quality_parity.json"))
    ap.add_argument("--tpu", action="store_true",
                    help="leave JAX on the default (TPU) backend instead of "
                         "the CPU fp32 parity configuration")
    args = ap.parse_args()

    if not args.tpu:
        pin_cpu_fp32()
    rows, verdict = run_parity(steps=args.steps, size=args.size,
                               batch=args.batch, eval_every=args.eval_every,
                               lr=args.lr, disc_lr=args.disc_lr,
                               disc_weight=args.disc_weight,
                               disc_start=args.disc_start)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({"rows": rows, "verdict": verdict}, indent=1))
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
