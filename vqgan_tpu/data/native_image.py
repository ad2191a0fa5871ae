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

__all__ = ["load_decoder_lib", "decode_jpeg_batch"]

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
        assert lib.image_decoder_abi_version() == 1
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
