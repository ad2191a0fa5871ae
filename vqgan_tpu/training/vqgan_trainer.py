"""Stage-1 VQ-GAN trainer: orchestration around the fused two-optimizer step.

Behavior target: /root/reference/vqgan_ldm_baseline/train_vqgan.py:101-409 —
data from data_split.json, VQVAE + PatchGAN + LPIPS losses, 30k-step loop
with codebook-usage monitoring, reconstruction grids + full checkpoints every
1000 steps, resume from latest.

TPU-native: the G and D updates are two jitted programs dispatched
back-to-back (training/vqgan_step.py `make_vqgan_split_steps`; one fused
program available via step_mode="fused"); the host loop only feeds prefetched
batches and logs. Device-parallel via the ('data','model') mesh — batch
sharded, state replicated.
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
from ..configs import VQGANConfig
from ..data import ImageFolderDataset, load_split
from ..models import VQVAE
from ..models.discriminator import PatchGANDiscriminator
from ..models.lpips import LPIPS, perceptual_loss_fn
from ..parallel import make_mesh_for_batch, replicate, shard_batch
from .vqgan_step import (
    VQGANTrainState,
    make_gan_optimizers,
    make_vqgan_scan_steps,
    make_vqgan_split_steps,
    make_vqgan_train_step,
    reset_codebook_moments,
)
from .watchdog import TrainingWatchdog

__all__ = ["VQGANTrainer"]


class VQGANTrainer:
    def __init__(
        self,
        config: VQGANConfig,
        split_path: Optional[str] = None,
        lpips_params=None,
        use_mesh: bool = True,
        step_mode: str = "split",
        fast_compile: Optional[bool] = None,
        scan_block: int = 8,
    ):
        assert step_mode in ("split", "fused", "scan"), step_mode
        if fast_compile is None:
            # Full exec-optimization effort for every mode: the fast/full
            # gap on the stage-1 training graph is ~2.15x (BASELINE.md:
            # 103.5 vs 222.6 img/s), so dialing the effort down is never a
            # steady-state win. The fused scan body's full-effort compile is
            # hour-scale through this environment's remote TPU compiler
            # (minutes on a normal TPU host), but it is paid once — the
            # compilation cache persists it across runs.
            fast_compile = False
        self.config = config
        cfg = config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        self.vqvae = VQVAE(
            ch=cfg.ch, ch_mult=cfg.ch_mult, num_res_blocks=cfg.num_res_blocks,
            attn_resolutions=cfg.attn_resolutions, dropout=cfg.dropout,
            resolution=cfg.image_size, z_channels=cfg.z_channels,
            num_embeddings=cfg.num_embeddings, embedding_dim=cfg.embedding_dim,
            commitment_cost=cfg.commitment_cost,
            out_channels=cfg.out_channels, dtype=dtype,
        )
        self.disc = PatchGANDiscriminator(
            ndf=cfg.disc_ndf, n_layers=cfg.disc_n_layers, norm=cfg.disc_norm,
            dtype=dtype,
        )
        self.lpips = LPIPS(dtype=dtype)

        key = jax.random.PRNGKey(cfg.seed)
        k_vq, k_d, k_l = jax.random.split(key, 3)
        x0 = jnp.zeros((2, cfg.image_size, cfg.image_size, cfg.in_channels))
        vq_params = self.vqvae.init(k_vq, x0)
        disc_vars = self.disc.init(k_d, x0)
        disc_params = {"params": disc_vars["params"]}
        disc_stats = (
            {"batch_stats": disc_vars["batch_stats"]}
            if "batch_stats" in disc_vars else {}
        )
        if lpips_params is None:
            lpips_params = self.lpips.init(k_l, x0, x0)
        self.lpips_params = lpips_params

        def vqvae_apply(params, images):
            return self.vqvae.apply(params, images)

        disc = self.disc

        def disc_apply(params, stats, images, train):
            if stats and train:
                logits, upd = disc.apply({**params, **stats}, images,
                                         train=True, mutable=["batch_stats"])
                return logits, {"batch_stats": upd["batch_stats"]}
            logits = disc.apply({**params, **stats}, images, train=False)
            return logits, stats

        self.opt_g, self.opt_d = make_gan_optimizers(
            learning_rate=cfg.learning_rate,
            disc_learning_rate=cfg.disc_learning_rate,
            betas=cfg.adam_betas, weight_decay=cfg.weight_decay,
            max_grad_norm=cfg.max_grad_norm or None,
            gradient_accumulate_every=cfg.gradient_accumulate_every,
        )
        step_kwargs = dict(
            disc_start=cfg.disc_start, disc_weight=cfg.disc_weight,
            perceptual_weight=cfg.perceptual_weight,
            disc_loss_type=cfg.disc_loss_type,
            perceptual_fn=perceptual_loss_fn(lpips_params, self.lpips),
            use_adaptive_weight=cfg.use_adaptive_weight,
            fast_compile=fast_compile,
        )
        # "split" (default): two back-to-back programs — the production
        # path. Compiles minutes-not-hours on this environment's remote TPU
        # compiler and skips D compute entirely before disc_start (the
        # reference also dispatches no D work before then,
        # train_vqgan.py:274). "fused": one program, masked D update.
        self.step_mode = step_mode
        self.scan_block = int(scan_block)
        if step_mode == "fused":
            self.train_step = make_vqgan_train_step(
                vqvae_apply, disc_apply, self.opt_g, self.opt_d,
                **step_kwargs)
        else:
            self.g_step, self.d_step = make_vqgan_split_steps(
                vqvae_apply, disc_apply, self.opt_g, self.opt_d,
                **step_kwargs)
        if step_mode == "scan":
            # "scan": one program dispatches `scan_block` full steps over a
            # [block, B, ...] superbatch, amortizing the 1-core host's
            # multi-ms per-program dispatch floor (training_roofline.json:
            # 49.4% → 63.1% MFU device-only). The split steps above stay
            # built: boundary blocks straddling the end of training and
            # save/sample cadences fall back to per-step dispatch.
            self.scan_gd, self.scan_g = make_vqgan_scan_steps(
                vqvae_apply, disc_apply, self.opt_g, self.opt_d,
                **step_kwargs)

        self.state = VQGANTrainState(
            step=jnp.asarray(0), vqvae_params=vq_params,
            disc_params=disc_params, disc_stats=disc_stats,
            opt_g=self.opt_g.init(vq_params),
            opt_d=self.opt_d.init(disc_params),
        )

        self.mesh = (make_mesh_for_batch(cfg.batch_size)
                     if use_mesh else None)
        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)

        # data
        self.loader = None
        if split_path is not None:
            split = load_split(split_path)
            dataset = ImageFolderDataset(
                cfg.data_path, split, "train", image_size=cfg.image_size)
            from ..data.native_image import make_batch_loader

            self.loader = make_batch_loader(
                dataset, cfg.batch_size, shuffle=True, seed=cfg.seed,
                native=getattr(cfg, "native_input", "auto"))

        self.ckpt = CheckpointManager(cfg.results_folder, prefix="vqgan")
        self.watchdog = TrainingWatchdog()

        # optional dead-code revival (ops.vq.revive_dead_codes): accumulate
        # per-step usage counts; every `revive_dead_codes_every` steps,
        # re-anchor codes unused in the window to random pre-quant encoder
        # outputs from the current batch and zero their Adam moments.
        self._revive_every = int(
            getattr(cfg, "revive_dead_codes_every", 0) or 0)
        self._usage_accum = jnp.zeros((cfg.num_embeddings,), jnp.int32)
        if self._revive_every:
            from ..ops.vq import revive_dead_codes

            threshold = int(getattr(cfg, "revive_usage_threshold", 1))
            vqvae = self.vqvae

            def _revive(state, images, usage, rng):
                z = vqvae.apply(state.vqvae_params, images,
                                method=VQVAE.encode_pre_quant)
                cb = state.vqvae_params["params"]["quantizer"]["embedding"]
                new_cb, n, dead = revive_dead_codes(
                    cb, usage, z.reshape(-1, z.shape[-1]), rng, threshold)
                p = dict(state.vqvae_params)
                inner = dict(p["params"])
                quant = dict(inner["quantizer"])
                quant["embedding"] = new_cb
                inner["quantizer"] = quant
                p["params"] = inner
                return state.replace(
                    vqvae_params=p,
                    opt_g=reset_codebook_moments(state.opt_g, dead)), n

            self._revive_step = jax.jit(_revive)

        from ..utils.metrics_log import MetricsLogger

        self.metrics = MetricsLogger(cfg.results_folder, run_name="vqgan")

    # ------------------------------------------------------------------

    def _put(self, batch):
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return batch

    def _put_super(self, superbatch):
        """Explicit [block, B, ...] placement: batch axis (1) sharded over
        'data', block axis replicated. Stacking `block` batch-sharded arrays
        must not rely on implicit GSPMD propagation for the new leading
        axis — a silently replicated superbatch would cost block× the HBM
        and transfer (tests/test_scan_step.py pins the resulting spec)."""
        if self.mesh is None:
            return superbatch
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            superbatch, NamedSharding(self.mesh, P(None, "data")))

    def dispatch_step(self, state, images, step: int):
        """Dispatch one full training step (G update, plus D update when
        `step >= disc_start`). This is the exact code path `bench.py` times —
        bench and product are the same programs."""
        if self.step_mode == "fused":
            return self.train_step(state, images)
        state, recon, log = self.g_step(state, images)
        if step >= self.config.disc_start:
            state, d_log = self.d_step(state, images, recon)
            log = {**log, **d_log}
        return state, log

    def dispatch_block(self, state, superbatch, step: int):
        """Dispatch `block` full training steps as ONE compiled program
        (step_mode="scan"); `superbatch` is [block, B, H, W, C] and `step`
        is the host-side step index of the block's first element. Returns
        (state, stacked_logs) with a leading [block] axis on every log.
        Step-for-step identical math to `dispatch_step` alternation
        (tests/test_scan_step.py)."""
        block = superbatch.shape[0]
        if step + block <= self.config.disc_start:
            return self.scan_g(state, superbatch)
        return self.scan_gd(state, superbatch)

    def train(self, num_steps: Optional[int] = None, log_every: int = 50):
        if self.step_mode == "scan":
            return self._train_scan(num_steps, log_every)
        cfg = self.config
        num_steps = num_steps or cfg.train_steps
        assert self.loader is not None, "no dataset configured"
        it = iter(self.loader)

        t0 = time.time()
        start = int(jax.device_get(self.state.step))
        pending = None  # (step, device scalar) — one-step-delayed NaN check
        from ..data.prefetch import device_prefetch

        pre = device_prefetch(
            it, lambda b: self._put(jnp.asarray(b[0])), depth=2)
        for step in range(start, num_steps):
            (images, _), images_dev = next(pre)
            self.state, log = self.dispatch_step(
                self.state, images_dev, step)

            if self._revive_every:
                self._usage_accum = self._usage_accum + log["usage_counts"]
                if (step + 1) % self._revive_every == 0:
                    self.state, n_revived = self._revive_step(
                        self.state, images_dev,
                        self._usage_accum,
                        jax.random.fold_in(
                            jax.random.PRNGKey(cfg.seed ^ 0x5EED), step))
                    self._usage_accum = jnp.zeros_like(self._usage_accum)
                    print(f"  [revive] step {step + 1}: re-anchored "
                          f"{int(n_revived)} dead codes")

            # Per-step health check, pipelined one step behind (see
            # ldm_trainer.train): the reference checks every step
            # (train_latent_cfg.py:653); fetching the previous step's scalar
            # after dispatching the current one keeps the device busy.
            if pending is not None:
                s_prev, loss_prev = pending
                for w in self.watchdog.check(s_prev, float(loss_prev)):
                    print(f"  [watchdog] {w}")
            pending = (step + 1, log["loss_total"])

            if (step + 1) % log_every == 0:
                log_host = {k: float(v) for k, v in
                            jax.device_get(log).items()
                            if np.ndim(v) == 0}  # usage_counts is [K]
                ips = log_every * cfg.batch_size / (time.time() - t0)
                t0 = time.time()
                self.metrics.log(step + 1, {**log_host, "images_per_sec": ips})
                print(
                    f"step {step + 1}/{num_steps} "
                    f"g={log_host.get('total_loss', 0):.4f} "
                    f"d={log_host.get('d_loss', 0):.4f} "
                    f"vq={log_host.get('vq_loss', 0):.4f} "
                    f"usage={log_host.get('codebook_usage_ratio', 0):.2f} "
                    f"({ips:.1f} img/s)")

            if (step + 1) % cfg.save_and_sample_every == 0:
                self.save_and_sample((step + 1) // cfg.save_and_sample_every,
                                     images)
        if pending is not None:
            for w in self.watchdog.check(pending[0], float(pending[1])):
                print(f"  [watchdog] {w}")
        # Short runs (num_steps < save cadence) or off-cadence endings must
        # still leave a loadable checkpoint — the reference keeps
        # vqgan_latest.pt for this (train_vqgan.py:383-387).
        if num_steps > start and num_steps % cfg.save_and_sample_every != 0:
            self.save_and_sample(
                num_steps // cfg.save_and_sample_every + 1, images)

    def _train_scan(self, num_steps: Optional[int], log_every: int):
        """Block-dispatched training loop (step_mode="scan").

        Full `scan_block`-sized blocks run as ONE compiled program
        (`dispatch_block`); the segment leading up to any host event —
        log cadence, revive cadence, save/sample cadence, end of training —
        finishes per-step via `dispatch_step`, so event timing matches the
        per-step loop exactly and only the two block shapes ([block] and
        per-step) ever compile. Watchdog checks stay pipelined one dispatch
        behind and cover every step's loss via the stacked block logs:
        detection lags up to 2·block steps in the healthy steady state
        (vs ~2 steps in the per-step loop), but the first non-finite loss
        drops the pipelining — the just-dispatched block is drained
        immediately — so the 3-strike TrainingDiverged abort fires within
        ~block steps of the first NaN.
        """
        cfg = self.config
        num_steps = num_steps or cfg.train_steps
        assert self.loader is not None, "no dataset configured"
        block = max(1, self.scan_block)
        it = iter(self.loader)
        from ..data.prefetch import device_prefetch

        pre = device_prefetch(
            it, lambda b: self._put(jnp.asarray(b[0])), depth=2)

        t0 = time.time()
        start = int(jax.device_get(self.state.step))
        t_logged = start
        pending = None  # (end_step, stacked per-step losses) — pipelined

        def next_event(s: int) -> int:
            cadences = [log_every, cfg.save_and_sample_every]
            if self._revive_every:
                cadences.append(self._revive_every)
            return min([num_steps] + [(s // c + 1) * c for c in cadences])

        step = start
        images = None  # last host batch, for save_and_sample grids
        while step < num_steps:
            boundary = next_event(step)
            if boundary - step >= block:
                devs = []
                for _ in range(block):
                    (images, _), img_dev = next(pre)
                    devs.append(img_dev)
                images_dev = devs[-1]
                self.state, logs = self.dispatch_block(
                    self.state, self._put_super(jnp.stack(devs)), step)
                n_done = block
            else:
                (images, _), images_dev = next(pre)
                self.state, log1 = self.dispatch_step(
                    self.state, images_dev, step)
                logs = jax.tree.map(lambda x: jnp.asarray(x)[None], log1)
                n_done = 1
            step += n_done

            if self._revive_every:
                self._usage_accum = (
                    self._usage_accum + logs["usage_counts"].sum(axis=0))
                if step % self._revive_every == 0:
                    self.state, n_revived = self._revive_step(
                        self.state, images_dev, self._usage_accum,
                        jax.random.fold_in(
                            jax.random.PRNGKey(cfg.seed ^ 0x5EED), step - 1))
                    self._usage_accum = jnp.zeros_like(self._usage_accum)
                    print(f"  [revive] step {step}: re-anchored "
                          f"{int(n_revived)} dead codes")

            # per-step health coverage, fetched one dispatch behind; a
            # non-finite loss in the drained block drops the pipelining and
            # drains the just-dispatched block too (one forced sync), so
            # divergence aborts at most ~block steps after the first NaN
            cur = (step, logs["loss_total"])
            if pending is not None and self._drain_scan_losses(pending):
                self._drain_scan_losses(cur)
                cur = None
            pending = cur

            if step % log_every == 0:
                last = jax.tree.map(lambda x: x[-1], logs)
                log_host = {k: float(v) for k, v in
                            jax.device_get(last).items()
                            if np.ndim(v) == 0}
                ips = (step - t_logged) * cfg.batch_size / (time.time() - t0)
                t0, t_logged = time.time(), step
                self.metrics.log(step, {**log_host, "images_per_sec": ips})
                print(
                    f"step {step}/{num_steps} "
                    f"g={log_host.get('total_loss', 0):.4f} "
                    f"d={log_host.get('d_loss', 0):.4f} "
                    f"vq={log_host.get('vq_loss', 0):.4f} "
                    f"usage={log_host.get('codebook_usage_ratio', 0):.2f} "
                    f"({ips:.1f} img/s)")

            if step % cfg.save_and_sample_every == 0:
                self.save_and_sample(
                    step // cfg.save_and_sample_every, images)

        if pending is not None:
            self._drain_scan_losses(pending)
        if num_steps > start and num_steps % cfg.save_and_sample_every != 0:
            self.save_and_sample(
                num_steps // cfg.save_and_sample_every + 1, images)

    def _drain_scan_losses(self, pending) -> bool:
        """Fetch one dispatch's stacked per-step losses and run the watchdog
        over each (raises TrainingDiverged on the 3rd non-finite strike);
        returns True if any loss in the block was non-finite."""
        end_step, losses = pending
        arr = np.asarray(jax.device_get(losses)).reshape(-1)
        for i, lv in enumerate(arr):
            for w in self.watchdog.check(end_step - len(arr) + 1 + i,
                                         float(lv)):
                print(f"  [watchdog] {w}")
        return not bool(np.isfinite(arr).all())

    # ------------------------------------------------------------------

    def reconstruct(self, images: np.ndarray) -> np.ndarray:
        recon, _, _ = self.vqvae.apply(
            self._host_params(), jnp.asarray(images))
        return np.asarray(recon)

    def _host_params(self):
        return jax.device_get(self.state.vqvae_params)

    def save_and_sample(self, milestone: int, images=None):
        cfg = self.config
        try:
            if images is not None:
                n = min(cfg.num_samples, len(images))
                recon = self.reconstruct(images[:n])
                self._save_grid(images[:n], recon, milestone)
        except Exception as e:  # never kill training on a failed sample
            print(f"warning: sampling failed at milestone {milestone}: {e}")
        try:
            self.ckpt.save(
                milestone, jax.device_get(self.state),
                config=dataclasses.asdict(cfg))
        except Exception as e:
            print(f"warning: checkpoint save failed at {milestone}: {e}")

    def _save_grid(self, images, recon, milestone):
        from PIL import Image

        rows = []
        for img, rec in zip(np.asarray(images), np.asarray(recon)):
            rows.append(np.concatenate([img, rec], axis=1))
        grid = (np.clip(np.concatenate(rows, axis=0), 0, 1) * 255).astype(
            np.uint8)
        out = Path(cfg_dir := self.config.results_folder)
        out.mkdir(parents=True, exist_ok=True)
        Image.fromarray(grid).save(out / f"reconstruction-{milestone}.png")

    def load(self, milestone: Optional[int] = None):
        target = jax.device_get(self.state)
        restored = self.ckpt.restore(milestone, target=target)
        self.state = (
            replicate(restored, self.mesh) if self.mesh is not None
            else restored)
        return int(jax.device_get(self.state.step))
