"""Stage-2 latent-diffusion trainer.

Behavior target: /root/reference/train_latent_cfg.py:347-799
(LatentDiffusionTrainer) — frozen KL-VAE, LatentDataset over the cached
latents, CFG U-Net + GaussianDiffusion (T=1000, DDIM 150, pred_v, cosine,
Min-SNR γ=5, auto_normalize=False), Adam + weight decay, EMA, loss-health
watchdog, periodic sample+checkpoint with `sample-{m}.png` grids and
milestone+latest checkpoints, resume via `load(milestone)`.

TPU-native: one jitted train step (training/ldm_step.py) with fused EMA;
sampling is a compiled `lax.scan` DDIM program reused across milestones.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import CheckpointManager
from ..configs import LDMConfig
from ..data import BatchLoader, LatentCache, LatentDataset, load_split
from ..diffusion import GaussianDiffusion
from ..models import CFGUnet, KLVAE
from ..models.autoencoder import AutoencoderConfig
from ..parallel import make_mesh_for_batch, replicate, shard_batch
from .ldm_step import (
    LDMTrainState,
    make_ldm_optimizer,
    make_ldm_scan_step,
    make_ldm_train_step,
)
from .watchdog import TrainingWatchdog, check_sample_range

__all__ = ["LatentDiffusionTrainer", "build_cfg_unet_diffusion"]


def build_cfg_unet_diffusion(cfg: LDMConfig, dtype=None,
                             gradient_checkpointing: bool = False):
    """Construct the denoiser + GaussianDiffusion pair from a config
    (cfg.model_type: "unet" = reference CFGUnet, "dit" = models/dit.py —
    both share the same call contract, so everything downstream is common).

    gradient_checkpointing wraps the whole U-Net apply in `jax.checkpoint`
    (rematerialization) — the TPU analog of the Diffusers path's
    enable_gradient_checkpointing (reference train_stage1_diffusers.py:
    634-635, "saves 30-40% mem").
    """
    dtype = dtype or (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32)
    model_type = getattr(cfg, "model_type", "unet")
    if model_type == "dit":
        from ..models import DiT

        model = DiT(
            dim=cfg.dim * 4, depth=cfg.dit_depth, heads=cfg.attn_heads,
            dim_head=cfg.attn_dim_head, patch_size=cfg.dit_patch_size,
            image_size=cfg.latent_size, channels=cfg.latent_channels,
            num_classes=cfg.num_users, cond_drop_prob=cfg.cond_drop_prob,
            dtype=dtype,
        )
    else:
        assert model_type == "unet", model_type
        model = CFGUnet(
            dim=cfg.dim, num_classes=cfg.num_users,
            cond_drop_prob=cfg.cond_drop_prob, dim_mults=tuple(cfg.dim_mults),
            channels=cfg.latent_channels, attn_dim_head=cfg.attn_dim_head,
            attn_heads=cfg.attn_heads, dtype=dtype,
        )

    def model_apply(p, x, t, classes, cond_drop_mask=None,
                    cond_drop_prob=None, rng=None, return_features=False):
        rngs = {"cond_drop": rng} if rng is not None else None

        def apply_fn(p, x, t, classes, cond_drop_mask):
            return model.apply(p, x, t, classes,
                               cond_drop_mask=cond_drop_mask,
                               cond_drop_prob=cond_drop_prob, rngs=rngs,
                               return_features=return_features)

        if gradient_checkpointing and not return_features:
            apply_fn = jax.checkpoint(apply_fn)
        return apply_fn(p, x, t, classes, cond_drop_mask)

    diffusion = GaussianDiffusion(
        model_apply, image_size=cfg.latent_size,
        channels=cfg.latent_channels, timesteps=cfg.timesteps,
        sampling_timesteps=cfg.sampling_timesteps, objective=cfg.objective,
        beta_schedule=cfg.beta_schedule,
        min_snr_loss_weight=cfg.min_snr_loss_weight,
        min_snr_gamma=cfg.min_snr_gamma, auto_normalize=cfg.auto_normalize,
    )
    return model, diffusion


class LatentDiffusionTrainer:
    def __init__(
        self,
        config: LDMConfig,
        split_path: Optional[str] = None,
        vae_params=None,
        vae_model: Optional[KLVAE] = None,
        use_mesh: bool = True,
        param_sharding: str = "replicated",
        fsdp_min_size: Optional[int] = None,
        step_mode: str = "step",
        scan_block: int = 8,
    ):
        assert param_sharding in ("replicated", "zero1", "fsdp", "tp",
                                  "fsdp_tp"), param_sharding
        assert step_mode in ("step", "scan"), step_mode
        self.param_sharding = param_sharding
        self.fsdp_min_size = fsdp_min_size
        self.config = cfg = config
        self.model, self.diffusion = build_cfg_unet_diffusion(cfg)

        key = jax.random.PRNGKey(cfg.seed)
        x0 = jnp.zeros(
            (2, cfg.latent_size, cfg.latent_size, cfg.latent_channels))
        params = self.model.init(
            {"params": key}, x0, jnp.zeros((2,), jnp.int32),
            jnp.zeros((2,), jnp.int32),
            cond_drop_mask=jnp.zeros((2,), bool))
        n_params = sum(x.size for x in jax.tree.leaves(params))
        print(f"CFG U-Net parameters: {n_params / 1e6:.1f}M")

        self.optimizer = make_ldm_optimizer(
            learning_rate=cfg.train_lr, weight_decay=cfg.weight_decay,
            betas=cfg.adam_betas,
            max_grad_norm=cfg.max_grad_norm or None,
            warmup_steps=cfg.warmup_steps if cfg.use_lr_warmup else 0,
            gradient_accumulate_every=cfg.gradient_accumulate_every,
        )
        step_kwargs = dict(
            cond_drop_prob=cfg.cond_drop_prob,
            contrastive_weight=(cfg.contrastive_weight
                                if cfg.use_contrastive_loss else 0.0),
            contrastive_start_step=cfg.contrastive_start_step,
            contrastive_temperature=cfg.contrastive_temperature,
            ema_decay=cfg.ema_decay, ema_update_every=cfg.ema_update_every,
        )
        self.step_mode = step_mode
        self.scan_block = int(scan_block)
        self.train_step = make_ldm_train_step(
            self.diffusion, self.optimizer, **step_kwargs)
        if step_mode == "scan":
            # one program dispatches `scan_block` full steps over a
            # [block, B, ...] superbatch (same dispatch-floor amortization
            # as the stage-1 trainer's scan mode); the per-step program
            # above stays built for boundary segments around host events
            self.scan_step = make_ldm_scan_step(
                self.diffusion, self.optimizer, **step_kwargs)
        self.state = LDMTrainState(
            step=jnp.asarray(0), params=params,
            opt_state=self.optimizer.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
        )

        self.mesh = (make_mesh_for_batch(
            cfg.train_batch_size,
            model=2 if "tp" in param_sharding and
            len(jax.devices()) % 2 == 0 else 1)
            if use_mesh else None)
        if self.mesh is not None:
            self.state = self._place(self.state)
            if param_sharding == "zero1":
                # without the pin, GSPMD propagates the moment shardings
                # onto the updated params (zero1 would drift into zero3)
                from ..parallel.fsdp import pin_state_shardings

                self.train_step = pin_state_shardings(
                    self.train_step, self.state)
                if step_mode == "scan":
                    self.scan_step = pin_state_shardings(
                        self.scan_step, self.state)

        # frozen VAE decoder for visualization (optional)
        self.vae = None
        self.vae_params = vae_params
        if vae_params is not None:
            self.vae = vae_model or KLVAE(config=AutoencoderConfig(
                resolution=cfg.image_size, z_channels=cfg.latent_channels))

        # data
        self.loader = None
        if split_path is not None:
            split = load_split(split_path)
            cache = LatentCache(cfg.latents_cache_folder)
            encode_fn = None
            if self.vae is not None:
                encode_fn = jax.jit(lambda img: self.vae.apply(
                    self.vae_params, img, method=KLVAE.encode_images_mean))
            dataset = LatentDataset(
                cfg.data_path, split, cache, image_size=cfg.image_size,
                encode_fn=encode_fn,
                images_per_user=cfg.images_per_user_train, seed=cfg.seed)
            self.loader = BatchLoader(
                dataset, cfg.train_batch_size, shuffle=True, seed=cfg.seed,
                repeat=True)

        self.ckpt = CheckpointManager(cfg.results_folder, prefix="model")
        self.watchdog = TrainingWatchdog()
        self._rng = jax.random.PRNGKey(cfg.seed + 1)

        from ..utils.metrics_log import MetricsLogger

        self.metrics = MetricsLogger(cfg.results_folder, run_name="ldm")

    # ------------------------------------------------------------------

    def _put(self, x):
        return shard_batch(x, self.mesh) if self.mesh is not None else x

    def _put_super(self, x):
        """Explicit [block, B, ...] placement: batch axis (1) sharded over
        'data', block axis replicated — stacking `block` batch-sharded
        arrays must not rely on implicit GSPMD propagation for the new
        leading axis (same rationale as VQGANTrainer._put_super)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(self.mesh, P(None, "data")))

    def dispatch_block(self, state, latents, classes, rng):
        """Dispatch `block` full training steps as ONE compiled program
        (step_mode="scan"); `latents` is [block, B, ...], `classes`
        [block, B]. Returns (state, stacked_logs)."""
        return self.scan_step(state, latents, classes, rng)

    def _make_batch_iter(self):
        cfg = self.config
        ds = self.loader.dataset
        if hasattr(ds, "fully_cached") and ds.fully_cached():
            # C++ fan-out reader over the populated latent cache
            it = ds.native_batch_loader(
                cfg.train_batch_size, shuffle=True, seed=cfg.seed,
                repeat=True)
            print("using native latent batch loader")
        else:
            it = iter(self.loader)
        return it

    def train(self, num_steps: Optional[int] = None, log_every: int = 50):
        if self.step_mode == "scan":
            return self._train_scan(num_steps, log_every)
        cfg = self.config
        num_steps = num_steps or cfg.train_num_steps
        assert self.loader is not None, "no dataset configured"
        it = self._make_batch_iter()

        t0 = time.time()
        start = int(jax.device_get(self.state.step))
        pending = None  # (step, device scalar) — one-step-delayed NaN check
        from ..data.prefetch import device_prefetch

        pre = device_prefetch(
            it, lambda b: (self._put(jnp.asarray(b[0])),
                           self._put(jnp.asarray(b[1]))), depth=2)
        for step in range(start, num_steps):
            _, (latents_dev, labels_dev) = next(pre)
            self.state, log = self.train_step(
                self.state, latents_dev, labels_dev, self._rng)

            # Per-step health check (reference train_latent_cfg.py:653-671
            # checks EVERY step). Pipelined: fetch the PREVIOUS step's loss
            # after dispatching the current one, so the device queue never
            # drains — divergence still aborts within nan_strikes+1 steps.
            if pending is not None:
                s_prev, loss_prev = pending
                for w in self.watchdog.check(s_prev, float(loss_prev)):
                    print(f"  [watchdog] {w}")
            pending = (step + 1, log["loss"])

            if (step + 1) % log_every == 0:
                host = {k: float(v) for k, v in jax.device_get(log).items()}
                ips = log_every * cfg.train_batch_size / (time.time() - t0)
                t0 = time.time()
                self.metrics.log(step + 1, host)
                msg = (f"step {step + 1}/{num_steps} "
                       f"loss={host['loss']:.4f}")
                if "contrastive_loss" in host:
                    msg += f" contrastive={host['contrastive_loss']:.4f}"
                print(msg + f" ({ips:.1f} latents/s)")

            if (step + 1) % cfg.save_and_sample_every == 0:
                self.save_and_sample(
                    (step + 1) // cfg.save_and_sample_every)
        if pending is not None:
            for w in self.watchdog.check(pending[0], float(pending[1])):
                print(f"  [watchdog] {w}")
        # Off-cadence endings still leave a loadable checkpoint (the
        # reference keeps model-latest.pt, train_latent_cfg.py:773-776).
        if num_steps > start and num_steps % cfg.save_and_sample_every != 0:
            self.save_and_sample(num_steps // cfg.save_and_sample_every + 1)

    def _train_scan(self, num_steps: Optional[int], log_every: int):
        """Block-dispatched stage-2 loop (step_mode="scan"): full
        `scan_block`-sized blocks run as ONE compiled program; the segment
        leading up to any host event (log / save+sample cadence, end of
        training) finishes per-step, so event timing matches the per-step
        loop exactly. Watchdog coverage stays per-step via the stacked
        block losses, pipelined one dispatch behind; the first non-finite
        loss drains the just-dispatched block immediately, so the 3-strike
        divergence abort fires within ~block steps of the first NaN (same
        contract as VQGANTrainer._train_scan)."""
        cfg = self.config
        num_steps = num_steps or cfg.train_num_steps
        assert self.loader is not None, "no dataset configured"
        block = max(1, self.scan_block)
        from ..data.prefetch import device_prefetch

        pre = device_prefetch(
            self._make_batch_iter(),
            lambda b: (self._put(jnp.asarray(b[0])),
                       self._put(jnp.asarray(b[1]))), depth=2)

        t0 = time.time()
        start = int(jax.device_get(self.state.step))
        t_logged = start
        pending = None  # (end_step, stacked per-step losses)

        def next_event(s: int) -> int:
            cadences = (log_every, cfg.save_and_sample_every)
            return min([num_steps] + [(s // c + 1) * c for c in cadences])

        step = start
        while step < num_steps:
            boundary = next_event(step)
            if boundary - step >= block:
                lats, labs = [], []
                for _ in range(block):
                    _, (lat, lab) = next(pre)
                    lats.append(lat)
                    labs.append(lab)
                self.state, logs = self.dispatch_block(
                    self.state, self._put_super(jnp.stack(lats)),
                    self._put_super(jnp.stack(labs)), self._rng)
                n_done = block
            else:
                _, (lat, lab) = next(pre)
                self.state, log1 = self.train_step(
                    self.state, lat, lab, self._rng)
                logs = jax.tree.map(lambda x: jnp.asarray(x)[None], log1)
                n_done = 1
            step += n_done

            cur = (step, logs["loss"])
            if pending is not None and self._drain_scan_losses(pending):
                self._drain_scan_losses(cur)
                cur = None
            pending = cur

            if step % log_every == 0:
                last = jax.tree.map(lambda x: x[-1], logs)
                host = {k: float(v) for k, v in
                        jax.device_get(last).items()}
                ips = (step - t_logged) * cfg.train_batch_size / (
                    time.time() - t0)
                t0, t_logged = time.time(), step
                self.metrics.log(step, host)
                msg = f"step {step}/{num_steps} loss={host['loss']:.4f}"
                if "contrastive_loss" in host:
                    msg += f" contrastive={host['contrastive_loss']:.4f}"
                print(msg + f" ({ips:.1f} latents/s)")

            if step % cfg.save_and_sample_every == 0:
                self.save_and_sample(step // cfg.save_and_sample_every)

        if pending is not None:
            self._drain_scan_losses(pending)
        if num_steps > start and num_steps % cfg.save_and_sample_every != 0:
            self.save_and_sample(num_steps // cfg.save_and_sample_every + 1)

    def _drain_scan_losses(self, pending) -> bool:
        """Fetch one dispatch's stacked per-step losses and run the
        watchdog over each (raises TrainingDiverged on the 3rd non-finite
        strike); returns True if any loss in the block was non-finite."""
        end_step, losses = pending
        arr = np.asarray(jax.device_get(losses)).reshape(-1)
        for i, lv in enumerate(arr):
            for w in self.watchdog.check(end_step - len(arr) + 1 + i,
                                         float(lv)):
                print(f"  [watchdog] {w}")
        return not bool(np.isfinite(arr).all())

    # ------------------------------------------------------------------

    def sample(self, num_samples: Optional[int] = None, use_ema=None,
               key=None):
        cfg = self.config
        n = num_samples or cfg.num_samples
        use_ema = cfg.use_ema if use_ema is None else use_ema
        params = self.state.ema_params if use_ema else self.state.params
        classes = jnp.arange(n, dtype=jnp.int32) % cfg.num_users
        key = key if key is not None else jax.random.PRNGKey(0)
        latents = self.diffusion.sample(
            params, key, classes=classes, cond_scale=cfg.cond_scale,
            rescaled_phi=cfg.rescaled_phi)
        return latents, classes

    def save_and_sample(self, milestone: int):
        cfg = self.config
        try:
            # sampling is only worth the DDIM scan when a VAE can decode the
            # latents into a viewable grid
            if self.vae is not None:
                latents, _ = self.sample()
                images = self.vae.apply(
                    self.vae_params, latents, method=KLVAE.decode_latents)
                images = np.asarray(images)
                warn = check_sample_range(images)
                if warn:
                    print(f"  [watchdog] {warn}")
                self._save_grid(images, milestone)
        except Exception as e:
            print(f"warning: sampling failed at milestone {milestone}: {e}")
        try:
            self.ckpt.save(milestone, jax.device_get(self.state),
                           config=dataclasses.asdict(cfg))
        except Exception as e:
            print(f"warning: checkpoint save failed at {milestone}: {e}")

    def _save_grid(self, images: np.ndarray, milestone: int, ncol: int = 4):
        from PIL import Image

        n = len(images)
        ncol = min(ncol, n)
        nrow = -(-n // ncol)
        h, w, c = images.shape[1:]
        grid = np.zeros((nrow * h, ncol * w, c), np.float32)
        for i, img in enumerate(images):
            r, col = divmod(i, ncol)
            grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = img
        out = Path(self.config.results_folder)
        out.mkdir(parents=True, exist_ok=True)
        Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(
            out / f"sample-{milestone}.png")

    def _place(self, state):
        """Place the train state on the mesh per the param_sharding policy:
        'replicated' (reference-style DP), 'fsdp' (ZeRO-3 over 'data'),
        'tp' (attention kernels over 'model'), or 'fsdp_tp' (2D). The same
        rule covers init and checkpoint-restore so resumed runs keep their
        layout."""
        if self.param_sharding == "replicated":
            return replicate(state, self.mesh)
        from ..parallel import place_state
        from ..parallel.fsdp import _DEFAULT_MIN_SIZE

        return place_state(state, self.mesh, self.param_sharding,
                           min_size=self.fsdp_min_size or _DEFAULT_MIN_SIZE)

    def load(self, milestone: Optional[int] = None):
        target = jax.device_get(self.state)
        restored = self.ckpt.restore(milestone, target=target)
        self.state = (self._place(restored)
                      if self.mesh is not None else restored)
        return int(jax.device_get(self.state.step))
