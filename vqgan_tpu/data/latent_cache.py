"""Latent cache: bulk VAE-encoded latents stored per item.

Behavior target: the reference's per-item torch cache
`user_{label:02d}_{stem}.pt` (/root/reference/train_latent_cfg.py:317-341,
preprocess_latents.py:211-237). We keep the exact naming scheme with `.npy`
payloads ([H, W, C] float32 NHWC latents) plus a conversion path for
existing torch caches.

The lazy VAE-encode-on-miss path of the reference doesn't fit a jitted input
pipeline (SURVEY.md §7.3); bulk preprocessing is the cache filler, and
`LatentDataset` falls back to on-miss host encoding only outside jit.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from .splits import train_images_for_user

__all__ = ["cache_filename", "LatentCache", "LatentDataset"]


def cache_filename(label: int, image_name: str) -> str:
    """`user_{label:02d}_{stem}.npy` — reference naming with .npy payload."""
    stem = Path(image_name).stem
    return f"user_{label:02d}_{stem}.npy"


class LatentCache:
    def __init__(self, folder: str | Path):
        self.folder = Path(folder)
        self.folder.mkdir(parents=True, exist_ok=True)

    def path(self, label: int, image_name: str) -> Path:
        return self.folder / cache_filename(label, image_name)

    def has(self, label: int, image_name: str) -> bool:
        return self.path(label, image_name).exists()

    def save(self, label: int, image_name: str, latent: np.ndarray):
        np.save(self.path(label, image_name), np.asarray(latent, np.float32))

    def load(self, label: int, image_name: str) -> np.ndarray:
        p = self.path(label, image_name)
        if p.exists():
            return np.load(p)
        # tolerate a torch-format cache from the reference pipeline
        pt = p.with_suffix(".pt")
        if pt.exists():
            return self._load_torch(pt)
        raise FileNotFoundError(p)

    @staticmethod
    def _load_torch(path: Path) -> np.ndarray:
        import torch  # cpu wheel, only for interop

        t = torch.load(path, map_location="cpu", weights_only=True)
        arr = np.asarray(t.detach().numpy(), np.float32)
        if arr.ndim == 3 and arr.shape[0] in (1, 3, 4):  # CHW → HWC
            arr = arr.transpose(1, 2, 0)
        return arr


class LatentDataset:
    """Cached latents + labels for stage-2 training.

    Selection preference per user mirrors the reference LatentDataset
    (train_latent_cfg.py:260-303): gen_train_images (GMM split) →
    train_images → seeded per-user random sampling.

    encode_fn(image_array [1,H,W,3]) -> latent [1,h,w,c] enables the on-miss
    host fallback; omit it to require a fully-populated cache.
    """

    def __init__(
        self,
        data_path: str | Path,
        split: Dict,
        cache: LatentCache,
        image_size: int = 256,
        encode_fn: Optional[Callable] = None,
        images_per_user: Optional[int] = None,
        seed: int = 42,
    ):
        self.data_path = Path(data_path)
        self.cache = cache
        self.image_size = image_size
        self.encode_fn = encode_fn
        self.items: List[Tuple[str, str, int]] = []  # (user, name, label)

        rng = np.random.default_rng(seed)
        for user, info in split["users"].items():
            label = int(user.split("_")[1]) - 1
            names = train_images_for_user(split, user)
            if images_per_user is not None and len(names) > images_per_user:
                # per-user seeded random sampling fallback (reference
                # :279-303 derives a per-user seed)
                user_rng = np.random.default_rng(seed + label)
                names = list(
                    user_rng.choice(names, images_per_user, replace=False))
            for name in names:
                self.items.append((user, name, label))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        user, name, label = self.items[i]
        try:
            latent = self.cache.load(label, name)
        except FileNotFoundError:
            if self.encode_fn is None:
                raise
            from .datasets import load_image

            img = load_image(
                self.data_path / user / name, self.image_size)[None]
            latent = np.asarray(self.encode_fn(img))[0]
            self.cache.save(label, name, latent)
        return latent, label

    def fully_cached(self) -> bool:
        return all(self.cache.has(label, name)
                   for _, name, label in self.items)

    def native_batch_loader(self, batch_size: int, shuffle: bool = True,
                            seed: int = 0, repeat: bool = False,
                            n_threads: int = 8):
        """Fast-path batch iterator over a fully-populated cache using the
        C++ batch assembler (vqgan_tpu/data/native_loader.py) — one
        multi-threaded pread fan-out per batch instead of a Python per-item
        loop. Requires every item cached as .npy."""
        from .native_loader import NativeLatentBatcher

        paths = [self.cache.path(label, name)
                 for _, name, label in self.items]
        labels = np.asarray([label for _, _, label in self.items], np.int32)
        batcher = NativeLatentBatcher(paths, n_threads=n_threads)
        rng = np.random.default_rng(seed)
        n = len(paths)

        def iterator():
            while True:
                order = rng.permutation(n) if shuffle else np.arange(n)
                end = n - (n % batch_size)
                for s in range(0, end, batch_size):
                    idx = order[s : s + batch_size]
                    yield batcher.gather(idx.tolist()), labels[idx]
                if not repeat:
                    return

        return iterator()
