"""Unconditional DDPM trainer (the vendored-library Trainer equivalent).

Behavior target: /root/reference/denoising_diffusion_pytorch/
denoising_diffusion_pytorch.py:845-1106 — image-folder Dataset, EMA,
periodic sample grids, optional FID during training with best/latest-only
checkpoint retention (`save_best_and_latest_only`, :1008-1041), milestone
save/load with version tagging.
"""

from __future__ import annotations

import dataclasses
import math
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import CheckpointManager
from ..data.splits import IMAGE_EXTENSIONS
from ..parallel import make_mesh_for_batch, replicate, shard_batch
from .ldm_step import LDMTrainState, make_ldm_optimizer
from .ema import ema_update

__all__ = ["FolderDataset", "Trainer"]


class FolderDataset:
    """Flat/recursive image folder at a fixed size (reference ddpm.py:845-875)."""

    def __init__(self, folder: str | Path, image_size: int):
        from ..data.datasets import load_image

        self.image_size = image_size
        self._load = load_image
        self.paths = sorted(
            p for p in Path(folder).rglob("*")
            if p.suffix.lower() in IMAGE_EXTENSIONS)
        assert self.paths, f"no images under {folder}"

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        return self._load(self.paths[i], self.image_size), 0

    @property
    def items(self):
        """[(path, label)] view — unlocks the native C++ input pipeline
        (data.native_image.make_batch_loader)."""
        return [(p, 0) for p in self.paths]


class Trainer:
    """Train an unconditional GaussianDiffusion (or any diffusion object with
    `.loss(params, key, images)` and `.sample(params, key, batch_size=n)`)."""

    def __init__(
        self,
        diffusion,
        params,
        folder: Optional[str] = None,
        *,
        train_batch_size: int = 16,
        train_lr: float = 8e-5,
        train_num_steps: int = 100_000,
        adam_betas=(0.9, 0.99),
        max_grad_norm: float = 1.0,
        ema_decay: float = 0.995,
        ema_update_every: int = 10,
        save_and_sample_every: int = 1000,
        num_samples: int = 25,
        results_folder: str = "./results",
        calculate_fid: bool = False,
        fid_evaluator=None,  # eval.fid.FIDEvaluation, stats precomputed
        num_fid_samples: int = 50000,
        save_best_and_latest_only: bool = False,
        use_mesh: bool = True,
        seed: int = 0,
        dataset=None,  # any indexable dataset (e.g. Dataset1D) instead of a folder
    ):
        assert math.sqrt(num_samples) == int(math.sqrt(num_samples)), \
            "num_samples must be a square"
        self.diffusion = diffusion
        self.batch_size = train_batch_size
        self.train_num_steps = train_num_steps
        self.save_and_sample_every = save_and_sample_every
        self.num_samples = num_samples
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.calculate_fid = calculate_fid
        self.fid_evaluator = fid_evaluator
        self.save_best_and_latest_only = save_best_and_latest_only
        self.best_fid = float("inf")
        self.seed = seed

        self.tx = make_ldm_optimizer(
            learning_rate=train_lr, weight_decay=0.0, betas=adam_betas,
            max_grad_norm=max_grad_norm)
        self.ema_decay = ema_decay
        self.ema_update_every = ema_update_every

        tx, ema_decay_, ema_every_ = self.tx, ema_decay, ema_update_every
        diffusion_ = diffusion

        def train_step(state: LDMTrainState, images, rng):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(p):
                return diffusion_.loss(p, rng, images)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(
                lambda p, u: p + u, state.params, updates)
            new_ema = ema_update(
                state.ema_params, new_params, state.step, decay=ema_decay_,
                update_every=ema_every_, update_after_step=100)
            return state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt,
                ema_params=new_ema), loss

        self.train_step = jax.jit(train_step)

        self.state = LDMTrainState(
            step=jnp.asarray(0), params=params,
            opt_state=self.tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params))
        self.mesh = (make_mesh_for_batch(train_batch_size)
                     if use_mesh else None)
        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)

        self.loader = None
        if dataset is None and folder is not None:
            dataset = FolderDataset(folder, diffusion.image_size)
        if dataset is not None:
            from ..data.native_image import make_batch_loader

            # native C++ decode pipeline when the dataset is a plain image
            # folder and the library builds; Python BatchLoader otherwise
            # (e.g. Dataset1D)
            self.loader = make_batch_loader(dataset, train_batch_size,
                                            shuffle=True, seed=seed)

        self.ckpt = CheckpointManager(self.results_folder, prefix="model")

    # ------------------------------------------------------------------

    def train(self, log_every: int = 100):
        assert self.loader is not None
        it = iter(self.loader)
        rng = jax.random.PRNGKey(self.seed)
        t0 = time.time()
        start = int(jax.device_get(self.state.step))
        for step in range(start, self.train_num_steps):
            images, _ = next(it)
            images = jnp.asarray(images)
            if self.mesh is not None:
                images = shard_batch(images, self.mesh)
            self.state, loss = self.train_step(self.state, images, rng)
            if (step + 1) % log_every == 0:
                ips = log_every * self.batch_size / (time.time() - t0)
                t0 = time.time()
                print(f"step {step + 1}: loss={float(loss):.4f} "
                      f"({ips:.1f} img/s)")
            if (step + 1) % self.save_and_sample_every == 0:
                self.save_and_sample((step + 1) // self.save_and_sample_every)

    def sample_grid(self, milestone: int):
        from PIL import Image

        n = self.num_samples
        out = self.diffusion.sample(
            self.state.ema_params, jax.random.PRNGKey(milestone),
            batch_size=n)
        imgs = np.asarray(out)
        side = int(math.sqrt(n))
        h, w, c = imgs.shape[1:]
        grid = imgs.reshape(side, side, h, w, c).transpose(
            0, 2, 1, 3, 4).reshape(side * h, side * w, c)
        Image.fromarray(
            (np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(
            self.results_folder / f"sample-{milestone}.png")
        return out

    def save_and_sample(self, milestone: int):
        try:
            self.sample_grid(milestone)
        except Exception as e:
            print(f"warning: sampling failed: {e}")

        fid = None
        if self.calculate_fid and self.fid_evaluator is not None:
            def sampler(k, n):
                return self.diffusion.sample(
                    self.state.ema_params, k, batch_size=n)
            fid = self.fid_evaluator.fid_score(sampler, jax.random.PRNGKey(0))
            print(f"milestone {milestone}: FID {fid:.2f}")

        state_host = jax.device_get(self.state)
        if self.save_best_and_latest_only:
            # keep only "best" (FID-gated) and "latest"
            if fid is not None and fid < self.best_fid:
                self.best_fid = fid
                self.ckpt.save(0, state_host, config={"tag": "best",
                                                      "fid": fid})
            self.ckpt.save(1, state_host, config={"tag": "latest"})
        else:
            self.ckpt.save(milestone, state_host)

    def load(self, milestone: Optional[int] = None):
        target = jax.device_get(self.state)
        restored = self.ckpt.restore(milestone, target=target)
        self.state = (replicate(restored, self.mesh)
                      if self.mesh is not None else restored)
        return int(jax.device_get(self.state.step))
