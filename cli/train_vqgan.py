#!/usr/bin/env python
"""Stage-1 VQ-GAN training CLI.

Behavior target: /root/reference/vqgan_ldm_baseline/train_vqgan.py:415-436 —
config-driven training with resume, periodic reconstruction grids and
checkpoints.
"""

import argparse

from _common import REPO  # noqa: E402


def resolve_step_mode(mode: str, train_steps: int) -> str:
    """'auto' picks the block-dispatched scan loop for runs long enough to
    amortize its one-off block-program compile (the reference-scale default
    is 30k steps, train_vqgan.py:418) and the per-step split programs for
    short/debug runs."""
    if mode != "auto":
        return mode
    return "scan" if train_steps >= 1000 else "split"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", default=None)
    ap.add_argument("--split", default=None,
                    help="data_split.json (created with create_data_split.py)")
    ap.add_argument("--results_folder", default=None)
    ap.add_argument("--train_steps", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--image_size", type=int, default=None)
    ap.add_argument("--num_embeddings", type=int, default=None)
    ap.add_argument("--disc_start", type=int, default=None)
    ap.add_argument("--save_every", type=int, default=None,
                    dest="save_and_sample_every",
                    help="checkpoint + recon-grid cadence in steps")
    ap.add_argument("--resume", type=int, default=None,
                    help="milestone to resume from (-1 = latest)")
    ap.add_argument("--revive_dead_codes_every", type=int, default=None,
                    help="re-anchor codes unused for this many steps to "
                         "random encoder outputs (0/unset = off)")
    ap.add_argument("--revive_usage_threshold", type=int, default=None)
    ap.add_argument("--lpips_weights", default=None,
                    help=".npz with exported VGG16+lpips weights")
    ap.add_argument("--step_mode", default="auto",
                    choices=["auto", "split", "fused", "scan"],
                    help="step dispatch: 'scan' runs scan_block full steps "
                         "per compiled program (amortizes the host's "
                         "per-program dispatch floor, +~23%% measured "
                         "throughput); 'auto' picks scan for runs long "
                         "enough to amortize its block-program compile and "
                         "per-step 'split' otherwise")
    ap.add_argument("--scan_block", type=int, default=8)
    ap.add_argument("--fast_compile", action="store_true",
                    help="dial XLA's exec-time-optimization effort down: "
                         "minutes-scale compiles instead of the fused scan "
                         "body's one-off hour-scale compile on this "
                         "environment's remote compiler, at ~2.15x slower "
                         "steady-state steps (BASELINE.md). The compile "
                         "cache persists full-effort programs across runs, "
                         "so full effort (default) is the production "
                         "choice")
    args = ap.parse_args()

    from vqgan_tpu.configs import VQGANConfig

    overrides = {k: v for k, v in vars(args).items()
                 if v is not None and k in VQGANConfig.__dataclass_fields__}
    config = VQGANConfig(**overrides)
    config.print_config_summary()

    lpips_params = None
    if args.lpips_weights:
        import numpy as np

        from vqgan_tpu.models.lpips import load_torch_lpips_weights

        data = dict(np.load(args.lpips_weights))
        vgg = {k[4:]: v for k, v in data.items() if k.startswith("vgg.")}
        lin = {k[4:]: v for k, v in data.items() if k.startswith("lin.")}
        lpips_params = load_torch_lpips_weights(vgg, lin)

    from vqgan_tpu.training.vqgan_trainer import VQGANTrainer

    step_mode = resolve_step_mode(args.step_mode, config.train_steps)
    if step_mode != args.step_mode:
        print(f"step_mode auto -> {step_mode} "
              f"({config.train_steps} steps)")
    trainer = VQGANTrainer(config, split_path=args.split,
                           lpips_params=lpips_params,
                           step_mode=step_mode, scan_block=args.scan_block,
                           fast_compile=args.fast_compile or None)
    if args.resume is not None:
        milestone = None if args.resume < 0 else args.resume
        step = trainer.load(milestone)
        print(f"resumed from step {step}")
    trainer.train(num_steps=args.train_steps)


if __name__ == "__main__":
    main()
