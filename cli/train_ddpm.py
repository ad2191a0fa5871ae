#!/usr/bin/env python
"""Unconditional DDPM training CLI (the vendored-library core usage).

Behavior target: the reference Trainer invocation pattern
(/root/reference/denoising_diffusion_pytorch/denoising_diffusion_pytorch.py:
879-1106 + README-style usage): image folder in, U-Net + GaussianDiffusion,
EMA, periodic sample grids, optional in-training FID with best/latest-only
checkpoint retention.
"""

import argparse

from _common import REPO  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", required=True)
    ap.add_argument("--results_folder", default="./results/ddpm")
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--dim_mults", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--sampling_timesteps", type=int, default=250)
    ap.add_argument("--objective", default="pred_v",
                    choices=["pred_noise", "pred_x0", "pred_v"])
    ap.add_argument("--beta_schedule", default="sigmoid",
                    choices=["linear", "cosine", "sigmoid"])
    ap.add_argument("--train_batch_size", type=int, default=16)
    ap.add_argument("--train_lr", type=float, default=8e-5)
    ap.add_argument("--train_num_steps", type=int, default=100000)
    ap.add_argument("--ema_decay", type=float, default=0.995)
    ap.add_argument("--save_and_sample_every", type=int, default=1000)
    ap.add_argument("--num_samples", type=int, default=25)
    ap.add_argument("--self_condition", action="store_true")
    ap.add_argument("--immiscible", action="store_true")
    ap.add_argument("--offset_noise_strength", type=float, default=0.0)
    ap.add_argument("--calculate_fid", action="store_true")
    ap.add_argument("--num_fid_samples", type=int, default=50000)
    ap.add_argument("--save_best_and_latest_only", action="store_true")
    ap.add_argument("--inception_weights", default=None,
                    help=".npz from cli/export_torch_weights.py inception")
    ap.add_argument("--resume", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqgan_tpu.diffusion import GaussianDiffusion
    from vqgan_tpu.models import Unet
    from vqgan_tpu.training.ddpm_trainer import FolderDataset, Trainer

    model = Unet(dim=args.dim, dim_mults=tuple(args.dim_mults), channels=3,
                 self_condition=args.self_condition, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, args.image_size, args.image_size, 3))
    params = model.init(jax.random.PRNGKey(args.seed), x0,
                        jnp.zeros((2,), jnp.int32))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"U-Net parameters: {n_params / 1e6:.1f}M")

    def model_apply(p, x, t, x_self_cond=None, return_features=False):
        return model.apply(p, x, t, x_self_cond,
                           return_features=return_features)

    diffusion = GaussianDiffusion(
        model_apply, image_size=args.image_size, channels=3,
        timesteps=args.timesteps, sampling_timesteps=args.sampling_timesteps,
        objective=args.objective, beta_schedule=args.beta_schedule,
        ddim_sampling_eta=0.0, immiscible=args.immiscible,
        offset_noise_strength=args.offset_noise_strength,
        self_condition=args.self_condition,
        auto_normalize=True)

    fid_eval = None
    if args.calculate_fid:
        import numpy as np

        from vqgan_tpu.data import BatchLoader
        from vqgan_tpu.eval.fid import FIDEvaluation, make_inception_feature_fn

        variables = None
        if args.inception_weights:
            from vqgan_tpu.models.inception import load_torch_inception_weights

            variables = load_torch_inception_weights(
                dict(np.load(args.inception_weights)))
        else:
            print("warning: FID uses a random-init Inception "
                  "(pass --inception_weights for calibrated scores)")
        feature_fn = make_inception_feature_fn(variables)
        fid_eval = FIDEvaluation(
            feature_fn, batch_size=args.train_batch_size,
            num_fid_samples=args.num_fid_samples,
            stats_path=f"{args.results_folder}/dataset_stats.npz")
        ds = FolderDataset(args.folder, args.image_size)
        loader = BatchLoader(ds, args.train_batch_size, shuffle=False,
                             drop_last=False)
        fid_eval.load_or_precalc_real_stats(
            img for img, _ in iter(loader))

    trainer = Trainer(
        diffusion, params, args.folder,
        train_batch_size=args.train_batch_size, train_lr=args.train_lr,
        train_num_steps=args.train_num_steps, ema_decay=args.ema_decay,
        save_and_sample_every=args.save_and_sample_every,
        num_samples=args.num_samples, results_folder=args.results_folder,
        calculate_fid=args.calculate_fid, fid_evaluator=fid_eval,
        num_fid_samples=args.num_fid_samples,
        save_best_and_latest_only=args.save_best_and_latest_only,
        seed=args.seed)
    if args.resume is not None:
        step = trainer.load(None if args.resume < 0 else args.resume)
        print(f"resumed from step {step}")
    trainer.train()


if __name__ == "__main__":
    main()
