import time

import numpy as np
import pytest

from vqgan_tpu.data.native_loader import (
    NativeLatentBatcher,
    load_native_lib,
)


@pytest.fixture(scope="module")
def npy_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("latents")
    rng = np.random.default_rng(0)
    arrays, paths = [], []
    for i in range(64):
        a = rng.normal(size=(8, 8, 4)).astype(np.float32)
        p = d / f"user_{i % 3:02d}_f{i:03d}.npy"
        np.save(p, a)
        arrays.append(a)
        paths.append(p)
    return paths, arrays


def test_native_lib_compiles():
    lib = load_native_lib()
    assert lib is not None, "g++ should be available in this image"


def test_gather_matches_numpy(npy_files):
    paths, arrays = npy_files
    batcher = NativeLatentBatcher(paths, n_threads=4)
    assert batcher._lib is not None
    idx = [5, 0, 63, 17]
    out = batcher.gather(idx)
    assert out.shape == (4, 8, 8, 4)
    for row, i in enumerate(idx):
        np.testing.assert_array_equal(out[row], arrays[i])


def test_gather_full_dataset_shuffled(npy_files):
    paths, arrays = npy_files
    batcher = NativeLatentBatcher(paths)
    rng = np.random.default_rng(1)
    order = rng.permutation(len(paths))
    out = batcher.gather(order.tolist())
    for row, i in enumerate(order):
        np.testing.assert_array_equal(out[row], arrays[i])


def test_missing_file_raises(npy_files, tmp_path):
    paths, _ = npy_files
    batcher = NativeLatentBatcher(paths[:4])
    import os

    # sabotage a path after header parse
    batcher.paths[2] = str(tmp_path / "missing.npy").encode()
    with pytest.raises(OSError):
        batcher.gather([0, 1, 2, 3])


def test_native_faster_or_equal_smoke(npy_files):
    paths, _ = npy_files
    batcher = NativeLatentBatcher(paths, n_threads=8)
    idx = list(range(64))
    # warm the page cache
    batcher.gather(idx)
    t0 = time.perf_counter()
    for _ in range(20):
        batcher.gather(idx)
    native_t = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(20):
        np.stack([np.load(p) for p in paths])
    numpy_t = time.perf_counter() - t0
    print(f"native {native_t:.4f}s vs numpy {numpy_t:.4f}s")
    # don't assert strict speedup on tiny files; just sanity-bound it
    assert native_t < numpy_t * 3
