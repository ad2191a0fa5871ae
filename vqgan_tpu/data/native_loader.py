"""ctypes bindings for the native C++ batch assembler (native/batch_loader.cpp).

Builds the shared library on first use with g++ (cached next to the source;
rebuilt when the content hash of the .cpp or compile command changes — see
_native_build.py) and falls back to a pure-numpy path when no compiler is
available — callers never need to care.

`NativeLatentBatcher` serves fixed-shape latent batches from the .npy cache:
npy headers are parsed ONCE at construction; every batch after that is a
single C call fanning pread() workers into one contiguous buffer.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from vqgan_tpu.data._native_build import build_native_lib

__all__ = ["load_native_lib", "NativeLatentBatcher"]

_SRC = Path(__file__).parent.parent.parent / "native" / "batch_loader.cpp"
_LIB_DIR = Path(__file__).parent / "_native"
_lib_cache: Optional[ctypes.CDLL] = None
_lib_failed = False


def load_native_lib() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load the loader library; None on failure."""
    global _lib_cache, _lib_failed
    if _lib_cache is not None or _lib_failed:
        return _lib_cache
    try:
        so = build_native_lib(
            _SRC, _LIB_DIR / "batch_loader.so", ["-lpthread"])
        lib = ctypes.CDLL(str(so))
        lib.batch_read.restype = ctypes.c_int
        lib.batch_read.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.batch_loader_abi_version.restype = ctypes.c_int
        assert lib.batch_loader_abi_version() == 1
        _lib_cache = lib
    except Exception as e:  # no compiler / load failure → numpy fallback
        print(f"native batch loader unavailable ({e}); using numpy fallback")
        _lib_failed = True
    return _lib_cache


def _npy_payload_info(path: Path) -> Tuple[int, Tuple[int, ...], np.dtype]:
    """(payload byte offset, shape, dtype) of a .npy file, header parsed via
    numpy's own format reader."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        if version == (1, 0):
            shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
        else:
            shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
        assert not fortran, "fortran-order npy not supported"
        return f.tell(), shape, dtype


class NativeLatentBatcher:
    """Assemble [B, ...] batches from equal-shape .npy files by index.

    gather(indices) -> np.ndarray of shape (len(indices), *item_shape).
    """

    def __init__(self, paths: Sequence[str | Path], n_threads: int = 8):
        self.paths: List[bytes] = []
        self.offsets: List[int] = []
        self.item_shape: Optional[Tuple[int, ...]] = None
        self.dtype: Optional[np.dtype] = None

        for p in paths:
            off, shape, dtype = _npy_payload_info(Path(p))
            if self.item_shape is None:
                self.item_shape, self.dtype = shape, dtype
            else:
                assert shape == self.item_shape, (
                    f"inconsistent item shapes: {shape} vs {self.item_shape}")
                assert dtype == self.dtype
            self.paths.append(str(p).encode())
            self.offsets.append(off)

        self.item_bytes = int(
            np.prod(self.item_shape) * self.dtype.itemsize)
        self.n_threads = n_threads
        self._lib = load_native_lib()

    def __len__(self):
        return len(self.paths)

    def gather(self, indices: Sequence[int]) -> np.ndarray:
        n = len(indices)
        out = np.empty((n,) + self.item_shape, self.dtype)
        if self._lib is None:
            for row, i in enumerate(indices):
                out[row] = np.load(self.paths[i].decode())
            return out

        c_paths = (ctypes.c_char_p * n)(
            *[self.paths[i] for i in indices])
        c_offsets = (ctypes.c_int64 * n)(
            *[self.offsets[i] for i in indices])
        rc = self._lib.batch_read(
            c_paths, c_offsets, self.item_bytes, n,
            out.ctypes.data_as(ctypes.c_char_p), self.n_threads)
        if rc != 0:
            raise OSError(-rc, f"native batch_read failed (errno {-rc})")
        return out
