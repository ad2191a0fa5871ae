#!/usr/bin/env python
"""KL-VAE (stage-1) training CLI.

The reference consumes a pretrained `kl_vae_best.pt` (train_latent_cfg.py:66)
and provides the loss surface at vae/kl_vae.py:361-390 (MSE or pluggable
perceptual + 1e-6·KL); this trainer closes the loop so the whole two-stage
pipeline can be trained inside this framework. Optional LPIPS perceptual term
and the same milestone/latest checkpointing as the other trainers.
"""

import argparse
import dataclasses

from _common import REPO  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--split", required=True)
    ap.add_argument("--results_folder", default="./results/kl_vae")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--latent_channels", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=4.5e-6)
    ap.add_argument("--lr_schedule", choices=["constant", "cosine"],
                    default="constant",
                    help="cosine: linear warmup (5%% of steps) then cosine "
                         "decay to lr/20 — crosses the reference's >30 dB "
                         "'very good' tier faster on short budgets")
    ap.add_argument("--train_steps", type=int, default=50000)
    ap.add_argument("--kl_weight", type=float, default=1e-6)
    ap.add_argument("--perceptual_weight", type=float, default=0.0,
                    help="LPIPS weight (needs --lpips_weights for calibrated"
                         " loss)")
    ap.add_argument("--lpips_weights", default=None)
    ap.add_argument("--save_every", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vqgan_tpu.checkpoint import CheckpointManager
    from vqgan_tpu.data import BatchLoader, ImageFolderDataset, load_split
    from vqgan_tpu.models import KLVAE, kl_vae_loss
    from vqgan_tpu.models.autoencoder import AutoencoderConfig
    from vqgan_tpu.parallel import make_mesh_for_batch, replicate, shard_batch

    model = KLVAE(config=AutoencoderConfig(
        resolution=args.image_size, z_channels=args.latent_channels))
    x0 = jnp.zeros((2, args.image_size, args.image_size, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "gaussian": jax.random.PRNGKey(args.seed + 1)}, x0)

    perceptual_fn = None
    if args.perceptual_weight > 0:
        from vqgan_tpu.models.lpips import LPIPS, load_torch_lpips_weights
        import numpy as np

        lpips = LPIPS()
        if args.lpips_weights:
            data = dict(np.load(args.lpips_weights))
            vgg = {k[4:]: v for k, v in data.items() if k.startswith("vgg.")}
            lin = {k[4:]: v for k, v in data.items() if k.startswith("lin.")}
            lp = load_torch_lpips_weights(vgg, lin)
        else:
            lp = lpips.init(jax.random.PRNGKey(0), x0, x0)
            print("warning: LPIPS running with random weights")
        w = args.perceptual_weight

        def perceptual_fn(recon, inputs):
            p = jnp.mean(lpips.apply(lp, recon * 2 - 1, inputs * 2 - 1))
            l1 = jnp.mean(jnp.abs(recon - inputs))
            return {"total": l1 + w * p, "perceptual": p}

    if args.lr_schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=args.lr / 10, peak_value=args.lr,
            warmup_steps=max(1, args.train_steps // 20),
            decay_steps=args.train_steps, end_value=args.lr / 20)
    else:
        lr = args.lr
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, images, key):
        def loss_fn(p):
            recon, posterior = model.apply(p, images, rng=key)
            parts = kl_vae_loss(recon, images, posterior,
                                kl_weight=args.kl_weight,
                                perceptual_fn=perceptual_fn)
            return parts["loss"], parts

        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, parts

    mesh = make_mesh_for_batch(args.batch_size)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)

    split = load_split(args.split)
    ds = ImageFolderDataset(args.data_path, split, "train",
                            image_size=args.image_size)
    loader = BatchLoader(ds, args.batch_size, repeat=True, seed=args.seed)
    ckpt = CheckpointManager(args.results_folder, prefix="kl_vae")

    key = jax.random.PRNGKey(args.seed + 2)
    it = iter(loader)
    for step in range(args.train_steps):
        images, _ = next(it)
        key, k = jax.random.split(key)
        params, opt_state, parts = train_step(
            params, opt_state, shard_batch(jnp.asarray(images), mesh), k)
        if (step + 1) % 50 == 0:
            host = {kk: float(v) for kk, v in jax.device_get(parts).items()}
            print(f"step {step + 1}: loss={host['loss']:.5f} "
                  f"rec={host['rec_loss']:.5f} kl={host['kl_loss']:.1f}")
        if (step + 1) % args.save_every == 0:
            ckpt.save((step + 1) // args.save_every,
                      jax.device_get(params), config=vars(args))
    print("done")


if __name__ == "__main__":
    main()
