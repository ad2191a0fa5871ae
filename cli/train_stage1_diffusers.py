#!/usr/bin/env python
"""Alternative stage-2 trainer with the Diffusers-path feature set.

Behavior target: /root/reference/train_stage1_diffusers.py — the same latent
class-conditional diffusion task trained with that script's toggles mapped
to their TPU-native equivalents:

  torch/Diffusers feature (reference)      → here
  ----------------------------------------------------------------------
  bf16 mixed precision (:303-309)          → compute_dtype=bfloat16 (default)
  xformers attention (:617-632)            → fused Pallas flash attention
  gradient checkpointing (:634-635)        → jax.checkpoint on the U-Net
  DDPMScheduler squaredcos + v_pred (:554) → cosine betas + pred_v
  Min-SNR via compute_snr (:799-811)       → min_snr_loss_weight
  warmup LR scheduler (:678-683)           → optax linear warmup
  EMA (:685-694)                           → fused in-step EMA
  accelerate save_state/load_state         → CheckpointManager milestones
    with "latest" auto-discovery (:723-746, 836-841)
  DDIM-100 visual sampling (:452-468)      → sampling_timesteps=100
  ClassEmbedding replacing text encoder    → CFGUnet class conditioning

CLI argument names mirror parse_args (:111-401) where they exist.
"""

import argparse

from _common import REPO, load_vae  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained_vae_path", required=False, default=None)
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--split", default=None)
    ap.add_argument("--output_dir", default="./results_stage1")
    ap.add_argument("--latents_cache_folder", default="./latents_cache")
    ap.add_argument("--num_classes", type=int, default=31)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--train_batch_size", type=int, default=24)
    ap.add_argument("--max_train_steps", type=int, default=5000)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--lr_warmup_steps", type=int, default=500)
    ap.add_argument("--gradient_accumulation_steps", type=int, default=1)
    ap.add_argument("--gradient_checkpointing", action="store_true")
    ap.add_argument("--mixed_precision", choices=["no", "bf16"],
                    default="bf16")
    ap.add_argument("--use_ema", action=argparse.BooleanOptionalAction,
                    default=True, help="--no-use_ema disables EMA")
    ap.add_argument("--ema_decay", type=float, default=0.9999)
    ap.add_argument("--snr_gamma", type=float, default=5.0)
    ap.add_argument("--prediction_type", default="v_prediction",
                    choices=["v_prediction", "epsilon"])
    ap.add_argument("--num_inference_steps", type=int, default=100)
    ap.add_argument("--checkpointing_steps", type=int, default=500)
    ap.add_argument("--resume_from_checkpoint", default=None,
                    help="'latest' or a milestone number")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dim_mults", default="1,2,4,4",
                    help="csv per-level width multipliers (the reference's "
                         "csv block_out_channels, :380-381)")
    ap.add_argument("--attention_head_dim", default="64",
                    help="attention head dim; csv per level accepted like "
                         "the reference (:381), uniform values required")
    ap.add_argument("--model_dim", type=int, default=96)
    args = ap.parse_args()

    # csv parsing + validation with the reference's error semantics
    # (train_stage1_diffusers.py:380-396): per-level lengths must agree,
    # level channels must divide by the head dim, and head dims must be a
    # multiple of 8 (xformers' rule there; the TPU lane-alignment rule for
    # the Pallas flash-attention kernel here).
    try:
        dim_mults = tuple(int(x) for x in str(args.dim_mults).split(","))
        head_dims = tuple(
            int(x) for x in str(args.attention_head_dim).split(","))
    except ValueError:
        ap.error("--dim_mults / --attention_head_dim must be csv integers")
    if len(head_dims) not in (1, len(dim_mults)):
        ap.error(
            f"attention_head_dim length ({len(head_dims)}) must be 1 or "
            f"equal dim_mults length ({len(dim_mults)})")
    if len(set(head_dims)) > 1:
        ap.error("per-level head dims must be uniform in this build "
                 f"(got {head_dims})")
    head_dim = head_dims[0]
    channels = tuple(args.model_dim * m for m in dim_mults)
    for i, ch in enumerate(channels):
        if ch % head_dim != 0:
            ap.error(f"Layer {i}: {ch} channels not divisible by "
                     f"head_dim={head_dim}")
    if head_dim % 8 != 0:
        ap.error(f"head_dim={head_dim} must be a multiple of 8 "
                 "(TPU lane alignment; the reference enforces the same "
                 "multiple-of-8 rule for xformers)")

    from vqgan_tpu.configs import LDMConfig
    from vqgan_tpu.training.ldm_trainer import LatentDiffusionTrainer

    objective = "pred_v" if args.prediction_type == "v_prediction" else \
        "pred_noise"

    config = LDMConfig(
        data_path=args.data_dir or "",
        results_folder=args.output_dir,
        latents_cache_folder=args.latents_cache_folder,
        num_users=args.num_classes,
        image_size=args.resolution,
        latent_size=args.resolution // 8,
        dim=args.model_dim,
        dim_mults=dim_mults,
        attn_dim_head=head_dim,
        train_batch_size=args.train_batch_size,
        train_num_steps=args.max_train_steps,
        train_lr=args.learning_rate,
        use_lr_warmup=args.lr_warmup_steps > 0,
        warmup_steps=args.lr_warmup_steps,
        gradient_accumulate_every=args.gradient_accumulation_steps,
        use_ema=args.use_ema,
        ema_decay=args.ema_decay,
        min_snr_loss_weight=args.snr_gamma > 0,
        min_snr_gamma=args.snr_gamma or 5.0,
        objective=objective,
        beta_schedule="cosine",
        sampling_timesteps=args.num_inference_steps,
        save_and_sample_every=args.checkpointing_steps,
        compute_dtype="bfloat16" if args.mixed_precision == "bf16" else
        "float32",
        seed=args.seed,
    )
    config.print_config_summary()
    if args.gradient_checkpointing:
        print("gradient checkpointing: ON (jax.checkpoint remat)")

    vae_params = None
    if args.pretrained_vae_path:
        _, vae_params = load_vae(args.pretrained_vae_path,
                                 config.latent_channels, config.image_size)

    trainer = LatentDiffusionTrainer(
        config, split_path=args.split, vae_params=vae_params)
    if args.gradient_checkpointing:
        # rebuild the diffusion wrapper with remat
        from vqgan_tpu.training.ldm_trainer import build_cfg_unet_diffusion
        from vqgan_tpu.training.ldm_step import make_ldm_train_step

        trainer.model, trainer.diffusion = build_cfg_unet_diffusion(
            config, gradient_checkpointing=True)
        trainer.train_step = make_ldm_train_step(
            trainer.diffusion, trainer.optimizer,
            cond_drop_prob=config.cond_drop_prob,
            ema_decay=config.ema_decay,
            ema_update_every=config.ema_update_every)

    if args.resume_from_checkpoint:
        milestone = (None if args.resume_from_checkpoint == "latest"
                     else int(args.resume_from_checkpoint))
        step = trainer.load(milestone)
        print(f"resumed from step {step}")

    trainer.train()


if __name__ == "__main__":
    main()
