#!/usr/bin/env python
"""Stage-2 latent-diffusion training CLI.

Behavior target: /root/reference/train_latent_cfg.py:805-826 — frozen VAE,
cached latents, CFG U-Net training with resume; `--baseline` selects the
all-optimizations-off ablation config (config_baseline.py).
"""

import argparse

from _common import REPO, load_vae  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae_path", default=None)
    ap.add_argument("--data_path", default=None)
    ap.add_argument("--split", default=None)
    ap.add_argument("--results_folder", default=None)
    ap.add_argument("--latents_cache_folder", default=None)
    ap.add_argument("--train_num_steps", type=int, default=None)
    ap.add_argument("--train_batch_size", type=int, default=None)
    ap.add_argument("--resume", type=int, default=None)
    ap.add_argument("--model_type", choices=("unet", "dit"), default=None,
                    help="denoiser backbone: the reference CFG U-Net "
                         "(default) or the DiT transformer (models/dit.py)")
    ap.add_argument("--baseline", action="store_true",
                    help="ablation baseline config (all optimizations off)")
    ap.add_argument("--param_sharding", default="replicated",
                    choices=["replicated", "zero1", "fsdp", "tp", "fsdp_tp"],
                    help="parameter layout over the device mesh: replicated"
                         " (reference-style DP), fsdp (ZeRO-3 over 'data'),"
                         " tp (attention kernels over 'model'), fsdp_tp (2D)")
    ap.add_argument("--step_mode", default="auto",
                    choices=["auto", "step", "scan"],
                    help="step dispatch: 'scan' runs scan_block full steps "
                         "per compiled program (amortizes the host's per-"
                         "program dispatch floor); 'auto' picks scan for "
                         "runs long enough to amortize its block-program "
                         "compile and per-step dispatch otherwise")
    ap.add_argument("--scan_block", type=int, default=8)
    args = ap.parse_args()

    from vqgan_tpu.configs import BaselineLDMConfig, LDMConfig

    cls = BaselineLDMConfig if args.baseline else LDMConfig
    overrides = {k: v for k, v in vars(args).items()
                 if v is not None and k in cls.__dataclass_fields__}
    config = cls(**overrides)
    config.print_config_summary()
    if args.baseline:
        config.print_ablation_table()

    vae_params = None
    if args.vae_path:
        _, vae_params = load_vae(
            args.vae_path, config.latent_channels, config.image_size)

    from vqgan_tpu.training.ldm_trainer import LatentDiffusionTrainer

    step_mode = args.step_mode
    if step_mode == "auto":
        # same policy as cli/train_vqgan.py::resolve_step_mode — block
        # dispatch wins once its one-off block-program compile amortizes
        # over the run (the reference default is 100k steps,
        # train_latent_cfg.py:380); short/debug runs stay per-step
        step_mode = "scan" if config.train_num_steps >= 1000 else "step"
        print(f"step_mode auto -> {step_mode} "
              f"({config.train_num_steps} steps)")
    trainer = LatentDiffusionTrainer(
        config, split_path=args.split, vae_params=vae_params,
        param_sharding=args.param_sharding, step_mode=step_mode,
        scan_block=args.scan_block)
    if args.resume is not None:
        milestone = None if args.resume < 0 else args.resume
        step = trainer.load(milestone)
        print(f"resumed from step {step}")
    trainer.train(num_steps=args.train_num_steps)


if __name__ == "__main__":
    main()
