"""Host-side data pipeline: image folders → NHWC float32 batches.

Replaces the reference's torch Dataset/DataLoader stack (SURVEY.md §2.4)
with a numpy/PIL pipeline + a double-buffered prefetcher that overlaps JPEG
decode with TPU steps and feeds `jax.device_put`-ready arrays.

Behavior targets:
- MicroDopplerDataset (load_dataset.py:14-90): split-file-driven, optional
  ImageNet normalization for the classifier path.
- ImageDataset (train_vqgan.py:39-95): all split train images, [0,1] range.
- SyntheticDataset (classifier_experiment_example.py:323-358): scans
  `ID_X/*.{png,jpg}` folders of generated images.
- Transform parity: Resize(image_size) + CenterCrop(image_size) + ToTensor
  (train_latent_cfg.py:308-312) — implemented with PIL.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .splits import IMAGE_EXTENSIONS, train_images_for_user

__all__ = [
    "load_image",
    "ImageFolderDataset",
    "SyntheticDataset",
    "BatchLoader",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def pad_to_batch(imgs: np.ndarray, batch_size: int) -> np.ndarray:
    """Zero-pad a partial batch up to the compiled batch size (keeps jitted
    encoders at one static shape; callers slice the real rows back out)."""
    pad = batch_size - len(imgs)
    if pad <= 0:
        return imgs
    return np.concatenate(
        [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])


def load_image(
    path: str | Path, image_size: int, imagenet_norm: bool = False
) -> np.ndarray:
    """Resize(shorter side) + CenterCrop + [0,1] float32 NHWC — PIL
    equivalent of the reference's torchvision transform."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize(
        (max(image_size, round(w * scale)), max(image_size, round(h * scale))),
        Image.BILINEAR,
    )
    w, h = img.size
    left = (w - image_size) // 2
    top = (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(img, np.float32) / 255.0
    if imagenet_norm:
        arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr


class ImageFolderDataset:
    """Split-driven dataset over ID_x user folders.

    subset: "train" | "test" | "gen_train" | "class_train" — which split list
    to read per user (gen/class fall back to train when absent).
    """

    def __init__(
        self,
        data_path: str | Path,
        split: Dict,
        subset: str = "train",
        image_size: int = 256,
        imagenet_norm: bool = False,
    ):
        self.data_path = Path(data_path)
        self.image_size = image_size
        self.imagenet_norm = imagenet_norm
        self.items: List[Tuple[Path, int]] = []  # (path, label 0-based)

        for user, info in split["users"].items():
            label = int(user.split("_")[1]) - 1
            if subset == "train":
                names = train_images_for_user(split, user)
            elif subset == "test":
                names = info["test_images"]
            elif subset == "gen_train":
                names = info.get("gen_train_images",
                                 info.get("train_images", []))
            elif subset == "class_train":
                names = info.get("class_train_images",
                                 info.get("train_images", []))
            else:
                raise ValueError(f"unknown subset {subset!r}")
            for name in names:
                self.items.append((self.data_path / user / name, label))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        path, label = self.items[i]
        return load_image(path, self.image_size, self.imagenet_norm), label

    def get_batch(self, idxs) -> Tuple[np.ndarray, np.ndarray]:
        """Whole-batch fast path: the native C++ JPEG decoder (threaded
        decode+resize+crop into one contiguous buffer) when available and
        applicable, else per-item PIL. BatchLoader prefers this over
        __getitem__ loops."""
        paths = [self.items[int(i)][0] for i in idxs]
        labels = np.asarray([self.items[int(i)][1] for i in idxs], np.int32)
        if not self.imagenet_norm and all(
                str(p).lower().endswith((".jpg", ".jpeg")) for p in paths):
            from .native_image import decode_jpeg_batch

            batch = decode_jpeg_batch(paths, self.image_size)
            if batch is not None:
                return batch, labels
        imgs = [load_image(p, self.image_size, self.imagenet_norm)
                for p in paths]
        return np.stack(imgs), labels


class SyntheticDataset:
    """Scans generated-image folders `ID_X/*.{png,jpg,jpeg}`
    (reference classifier_experiment_example.py:323-358)."""

    def __init__(
        self,
        synthetic_folder: str | Path,
        image_size: int = 256,
        imagenet_norm: bool = False,
        user_filter: Optional[Sequence[int]] = None,
    ):
        self.image_size = image_size
        self.imagenet_norm = imagenet_norm
        self.items: List[Tuple[Path, int]] = []
        root = Path(synthetic_folder)
        for d in sorted(root.glob("ID_*")):
            if not d.is_dir():
                continue
            label = int(d.name.split("_")[1]) - 1
            if user_filter is not None and label not in user_filter:
                continue
            for p in sorted(d.iterdir()):
                if p.suffix.lower() in IMAGE_EXTENSIONS:
                    self.items.append((p, label))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i: int):
        path, label = self.items[i]
        return load_image(path, self.image_size, self.imagenet_norm), label


class BatchLoader:
    """Shuffling, prefetching batch iterator over any indexable dataset.

    Decodes on a background thread (double-buffered) so the accelerator never
    waits on JPEG decode — the TPU-side answer to DataLoader workers (the
    reference runs num_workers=0 and decodes synchronously).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        repeat: bool = False,
    ):
        if batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        if drop_last and len(dataset) < batch_size:
            raise ValueError(
                f"dataset has {len(dataset)} items < batch_size "
                f"{batch_size} with drop_last=True — no batch can ever be "
                f"produced")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.repeat = repeat

    def _epoch_order(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        return order

    def _make_batch(self, idxs):
        get_batch = getattr(self.dataset, "get_batch", None)
        if get_batch is not None:
            return get_batch(idxs)
        imgs, labels = zip(*(self.dataset[int(i)] for i in idxs))
        return np.stack(imgs), np.asarray(labels, np.int32)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item):
            """put() that observes stop while the queue is full."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                while True:
                    order = self._epoch_order()
                    n = len(order)
                    end = n - (n % self.batch_size) if self.drop_last else n
                    for s in range(0, end, self.batch_size):
                        if not put(self._make_batch(
                                order[s : s + self.batch_size])):
                            return
                    if not self.repeat:
                        break
                put(None)
            except BaseException as ex:  # pragma: no cover - re-raised below
                # a dataset error must reach the consumer, not silently kill
                # the worker (q.get() would then block forever)
                put(ex)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
