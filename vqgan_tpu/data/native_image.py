"""ctypes bindings for the native JPEG batch decoder (native/image_decoder.cpp).

Compiled on first use with g++ against the system libjpeg (cached next to
the latent batch loader's .so; rebuilt when the content hash of the .cpp or
compile command changes — see _native_build.py) and falls back to the PIL
path when no compiler or libjpeg is available — callers never need to care.

`decode_jpeg_batch(paths, image_size)` returns a contiguous
[n, S, S, 3] float32 [0,1] NHWC batch: libjpeg decode → PIL-equivalent
triangle resample of the shorter side → center crop, fanned over a thread
pool. Semantics mirror datasets.load_image (the reference's torchvision
Resize+CenterCrop+ToTensor, train_vqgan.py:318-326); parity is asserted in
tests/test_native_image.py.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from vqgan_tpu.data._native_build import build_native_lib

__all__ = ["load_decoder_lib", "decode_jpeg_batch", "NativePipeline",
           "NativeBatchLoader", "make_batch_loader"]

_SRC = Path(__file__).parent.parent.parent / "native" / "image_decoder.cpp"
_LIB_DIR = Path(__file__).parent / "_native"
_lib_cache: Optional[ctypes.CDLL] = None
_lib_failed = False


def load_decoder_lib() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load the decoder library; None on failure."""
    global _lib_cache, _lib_failed
    if _lib_cache is not None or _lib_failed:
        return _lib_cache
    try:
        so = build_native_lib(
            _SRC, _LIB_DIR / "image_decoder.so",
            ["-funroll-loops", "-ljpeg", "-lpthread"])
        lib = ctypes.CDLL(str(so))
        lib.decode_jpeg_batch.restype = ctypes.c_int
        lib.decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.image_decoder_abi_version.restype = ctypes.c_int
        assert lib.image_decoder_abi_version() == 3
        lib.pipeline_create.restype = ctypes.c_void_p
        lib.pipeline_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int,
        ]
        lib.pipeline_next.restype = ctypes.c_long
        lib.pipeline_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int)]
        lib.pipeline_destroy.restype = None
        lib.pipeline_destroy.argtypes = [ctypes.c_void_p]
        _lib_cache = lib
    except Exception as e:  # no compiler / no libjpeg → PIL fallback
        print(f"native image decoder unavailable ({e}); using PIL fallback")
        _lib_failed = True
    return _lib_cache


def decode_jpeg_batch(paths: Sequence[str | Path], image_size: int,
                      n_threads: int = 8) -> Optional[np.ndarray]:
    """[n, S, S, 3] float32 [0,1] batch, or None if the native path is
    unavailable or any file fails to decode (caller falls back to PIL)."""
    lib = load_decoder_lib()
    if lib is None or not paths:
        return None
    n = len(paths)
    out = np.empty((n, image_size, image_size, 3), np.float32)
    arr = (ctypes.c_char_p * n)(
        *[str(p).encode() for p in paths])
    rc = lib.decode_jpeg_batch(
        arr, n, image_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if rc != 0:
        return None
    return out


class NativePipeline:
    """Asynchronous C++ image pipeline: worker threads decode whole batches
    ahead of training into a ring of `depth` slots (GIL-free), deterministic
    batch order, per-epoch seeded reshuffle, drop-last semantics — the
    native counterpart of data/prefetch.py's host stage.

    Usage:
        pipe = NativePipeline(paths, image_size=128, batch=8)
        if pipe.available:
            batch = pipe.next()   # [batch, S, S, 3] float32 [0,1]
        pipe.close()

    Falls back gracefully: `available` is False when the native library
    cannot be built (callers keep their PIL path).
    """

    def __init__(self, paths: Sequence[str | Path], image_size: int,
                 batch: int, n_threads: int = 2, depth: int = 3,
                 seed: int = 0, shuffle: bool = True):
        self._lib = load_decoder_lib()
        self._handle = None
        self.image_size, self.batch = image_size, batch
        self.batches_per_epoch = len(paths) // batch if batch else 0
        if self._lib is None or len(paths) < batch:
            return
        self._paths = [str(p).encode() for p in paths]  # keep alive
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = self._lib.pipeline_create(
            arr, len(self._paths), image_size, batch, n_threads, depth,
            seed, int(shuffle))

    @property
    def available(self) -> bool:
        return self._handle is not None

    def next(self, return_indices: bool = False):
        """Blocking: the next [batch, S, S, 3] float32 [0,1] batch; with
        return_indices, also the [batch] int32 dataset indices it holds
        (the key to labels/metadata under shuffling)."""
        assert self._handle is not None
        out = np.empty((self.batch, self.image_size, self.image_size, 3),
                       np.float32)
        idx = np.empty((self.batch,), np.int32)
        seq = self._lib.pipeline_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if seq < 0:
            raise RuntimeError(f"native pipeline decode failed (code {seq})")
        self._seq = int(seq)
        return (out, idx) if return_indices else out

    def close(self) -> None:
        if self._handle is not None:
            self._lib.pipeline_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeBatchLoader:
    """Drop-in BatchLoader replacement backed by NativePipeline: yields
    (images, labels) endlessly with decode running GIL-free in C++ worker
    threads. Works for any dataset exposing `.items` [(path, label)] with
    plain [0,1] float semantics (e.g. ImageFolderDataset without ImageNet
    normalization). Use make_batch_loader for the availability-checked
    construction."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, n_threads: int = 2, depth: int = 3):
        paths = [p for p, _ in dataset.items]
        self._labels = np.asarray([l for _, l in dataset.items], np.int32)
        self.batch_size = batch_size
        self._pipe = NativePipeline(
            paths, dataset.image_size, batch_size, n_threads=n_threads,
            depth=depth, seed=seed, shuffle=shuffle)

    @property
    def available(self) -> bool:
        return self._pipe.available

    def __iter__(self):
        while True:
            imgs, idxs = self._pipe.next(return_indices=True)
            yield imgs, self._labels[idxs]

    def close(self) -> None:
        self._pipe.close()


# The async ring wins only when its decode workers get cores of their own:
# on a 1-core host the ring's bookkeeping costs ~4 ms/batch and it LOSES to
# the sync native get_batch path (109.6 vs 117.4 batches/s — round-3
# microbench, BASELINE.md input-pipeline section; cli/bench_input_pipeline.py
# to re-measure). The ring runs n_threads=2 decode workers plus the training
# thread, so "auto" requires at least 3 cores before picking it; below that
# it returns the Python BatchLoader, whose get_batch still uses the native
# threaded decoder synchronously (datasets.py::ImageFolderDataset.get_batch).
_ASYNC_MIN_CORES = 3


def make_batch_loader(dataset, batch_size: int, shuffle: bool = True,
                      seed: int = 0, native: str | bool = "auto", **kw):
    """BatchLoader factory: the async native C++ ring when it applies
    (repeat-style training iteration, plain-float all-JPEG dataset with
    .items, compiler/libjpeg present, enough cores for the decode workers
    to overlap training — see _ASYNC_MIN_CORES), else the Python
    BatchLoader (itself native-decode-accelerated per batch).

    native: True (require the async ring, raise if unavailable; skips the
    core-count check), False (never), "auto" (measured dispatch)."""
    import os

    from .datasets import BatchLoader

    plain = (hasattr(dataset, "items") and hasattr(dataset, "image_size")
             and not getattr(dataset, "imagenet_norm", False))
    if plain:
        # libjpeg-only decoder: PNG/BMP datasets keep the PIL path
        plain = all(str(p).lower().endswith((".jpg", ".jpeg"))
                    for p, _ in dataset.items)
    enough_cores = (native is True
                    or (os.cpu_count() or 1) >= _ASYNC_MIN_CORES)
    if native and plain and enough_cores and len(dataset.items) >= batch_size:
        loader = NativeBatchLoader(dataset, batch_size, shuffle=shuffle,
                                   seed=seed)
        if loader.available:
            return loader
        if native is True:
            raise RuntimeError("native input pipeline requested but the "
                               "C++ decoder is unavailable")
    elif native is True:
        raise RuntimeError(f"native input pipeline requires a plain-float "
                           f"all-JPEG .items dataset with >= batch_size "
                           f"items; got {type(dataset).__name__}")
    return BatchLoader(dataset, batch_size, shuffle=shuffle, seed=seed,
                       repeat=True, **kw)
