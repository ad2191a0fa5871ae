"""Native JPEG batch decoder vs the PIL reference path (load_image).

The C++ decoder must reproduce load_image's Resize(shorter side, triangle
filter) + CenterCrop + [0,1] float32 semantics within JPEG/uint8
quantization noise, on square, landscape, portrait, and grayscale inputs.
"""

from pathlib import Path

import numpy as np
import pytest

from vqgan_tpu.data.datasets import BatchLoader, load_image
from vqgan_tpu.data.native_image import decode_jpeg_batch, load_decoder_lib

pytestmark = pytest.mark.skipif(
    load_decoder_lib() is None, reason="native decoder unavailable")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(3)
    specs = [("square", (64, 64), "RGB"), ("landscape", (96, 48), "RGB"),
             ("portrait", (40, 80), "RGB"), ("gray", (72, 56), "L"),
             ("exact", (32, 32), "RGB")]
    paths = []
    for name, (w, h), mode in specs:
        shape = (h, w, 3) if mode == "RGB" else (h, w)
        # smooth content so JPEG compression error stays small
        yy, xx = np.mgrid[0:h, 0:w]
        base = (128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0))
        if mode == "RGB":
            arr = np.stack([base, base[::-1], base.T[:w].T], -1)
        else:
            arr = base
        arr = np.clip(arr + rng.normal(0, 3, shape), 0, 255).astype(np.uint8)
        p = d / f"{name}.jpg"
        Image.fromarray(arr, mode).save(p, quality=95)
        paths.append(p)
    return paths


def test_decode_matches_pil_reference(jpegs):
    size = 32
    batch = decode_jpeg_batch(jpegs, size)
    assert batch is not None and batch.shape == (len(jpegs), size, size, 3)
    assert batch.dtype == np.float32
    assert float(batch.min()) >= 0.0 and float(batch.max()) <= 1.0
    for i, p in enumerate(jpegs):
        ref = load_image(p, size)
        # PIL quantizes to uint8 after resampling; the native path keeps
        # float precision — allow a few quantization steps, tight mean
        diff = np.abs(batch[i] - ref)
        assert diff.mean() < 4 / 255, (p, diff.mean())
        assert np.quantile(diff, 0.99) < 16 / 255, (p, np.quantile(diff, .99))


def test_decode_no_resize_is_exact(jpegs):
    """At native size (no resample) only the uint8→float conversion differs:
    both sides decode through libjpeg, so pixels must match to 1/255."""
    exact = [p for p in jpegs if p.name == "exact.jpg"]
    batch = decode_jpeg_batch(exact, 32)
    ref = load_image(exact[0], 32)
    np.testing.assert_allclose(batch[0], ref, atol=1.01 / 255)


def test_decode_missing_file_returns_none(tmp_path):
    assert decode_jpeg_batch([tmp_path / "nope.jpg"], 32) is None


def test_batch_loader_uses_get_batch(jpegs):
    class DS:
        image_size = 32
        imagenet_norm = False

        def __len__(self):
            return len(jpegs)

        def __getitem__(self, i):
            raise AssertionError("BatchLoader must use get_batch")

        def get_batch(self, idxs):
            batch = decode_jpeg_batch([jpegs[int(i)] for i in idxs], 32)
            return batch, np.zeros(len(idxs), np.int32)

    loader = BatchLoader(DS(), batch_size=2, shuffle=False)
    xb, yb = next(iter(loader))
    assert xb.shape == (2, 32, 32, 3)


def test_image_folder_get_batch_parity(jpegs, tmp_path):
    """ImageFolderDataset.get_batch (native fast path) agrees with the
    __getitem__ PIL path on the same indices."""
    from vqgan_tpu.data.datasets import ImageFolderDataset

    root = tmp_path / "gait"
    (root / "ID_1").mkdir(parents=True)
    names = []
    for i, p in enumerate(jpegs[:3]):
        dst = root / "ID_1" / f"img{i}.jpg"
        dst.write_bytes(Path(p).read_bytes())
        names.append(dst.name)
    split = {"users": {"ID_1": {"train_images": names, "test_images": []}}}
    ds = ImageFolderDataset(root, split, "train", image_size=32)
    xb, yb = ds.get_batch([0, 1, 2])
    for i in range(3):
        ref, label = ds[i]
        assert np.abs(xb[i] - ref).mean() < 4 / 255
        assert yb[i] == label


def test_pipeline_sequential_order_and_epochs(jpegs):
    """shuffle=False: batches come in path order, drop-last, and epoch 1
    repeats epoch 0's order."""
    from vqgan_tpu.data.native_image import NativePipeline

    size, batch = 16, 2
    n_batches = len(jpegs) // batch  # 5 paths -> 2 batches, 1 dropped
    with NativePipeline(jpegs, size, batch, n_threads=2, depth=2,
                        shuffle=False) as pipe:
        assert pipe.available
        epoch0 = [pipe.next() for _ in range(n_batches)]
        epoch1 = [pipe.next() for _ in range(n_batches)]
    for b in range(n_batches):
        want = decode_jpeg_batch(jpegs[b * batch:(b + 1) * batch], size)
        np.testing.assert_array_equal(epoch0[b], want)
        np.testing.assert_array_equal(epoch1[b], epoch0[b])


def test_pipeline_shuffle_deterministic(jpegs):
    """Same seed → same batch stream; epochs reshuffle."""
    from vqgan_tpu.data.native_image import NativePipeline

    size, batch = 16, 2
    n = len(jpegs) // batch

    def stream():
        with NativePipeline(jpegs, size, batch, n_threads=2, depth=3,
                            seed=7, shuffle=True) as p:
            return [p.next() for _ in range(2 * n)]

    a, b = stream(), stream()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # reshuffled epochs: at least one batch differs between epoch 0 and 1
    assert any(not np.array_equal(a[i], a[i + n]) for i in range(n))


def test_pipeline_decode_error_raises(jpegs, tmp_path):
    from vqgan_tpu.data.native_image import NativePipeline

    bad = tmp_path / "corrupt.jpg"
    bad.write_bytes(b"not a jpeg at all")
    with NativePipeline([jpegs[0], bad], 16, 2, shuffle=False) as pipe:
        assert pipe.available
        with pytest.raises(RuntimeError, match="decode failed"):
            pipe.next()


def test_native_batch_loader_labels_track_shuffled_images(tmp_path):
    """NativeBatchLoader pairs each decoded image with ITS label under
    shuffling (images encode their label as a uniform gray level)."""
    from PIL import Image

    from vqgan_tpu.data.native_image import NativeBatchLoader

    paths = []
    for label in range(6):
        arr = np.full((40, 40, 3), label * 40, np.uint8)
        p = tmp_path / f"u{label}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append((p, label))

    class DS:
        items = paths
        image_size = 32
        imagenet_norm = False

    loader = NativeBatchLoader(DS(), batch_size=2, shuffle=True, seed=5)
    assert loader.available
    it = iter(loader)
    seen = []
    for _ in range(6):  # two epochs
        imgs, labels = next(it)
        for img, lab in zip(imgs, labels):
            assert int(round(float(img.mean()) * 255 / 40)) == int(lab)
        seen.extend(int(l) for l in labels)
    loader.close()
    assert sorted(seen[:6]) == list(range(6))  # epoch 0 covers the dataset


def test_make_batch_loader_fallbacks(tmp_path, jpegs, monkeypatch):
    import os

    from vqgan_tpu.data.datasets import BatchLoader
    from vqgan_tpu.data.native_image import (NativeBatchLoader,
                                             make_batch_loader)

    class Plain:
        items = [(p, 0) for p in jpegs]
        image_size = 16
        imagenet_norm = False

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return np.zeros((16, 16, 3), np.float32), 0

    # auto is core-count-aware (measured: the ring loses on 1 core,
    # BASELINE.md input-pipeline section)
    monkeypatch.setattr(os, "cpu_count", lambda: 8)
    assert isinstance(make_batch_loader(Plain(), 2), NativeBatchLoader)
    monkeypatch.setattr(os, "cpu_count", lambda: 1)
    assert isinstance(make_batch_loader(Plain(), 2), BatchLoader)
    # native=True requires the ring regardless of core count
    assert isinstance(make_batch_loader(Plain(), 2, native=True),
                      NativeBatchLoader)
    monkeypatch.undo()
    # native=False -> Python loader
    assert isinstance(make_batch_loader(Plain(), 2, native=False),
                      BatchLoader)

    # imagenet-normalized dataset -> Python loader (auto) / error (True)
    class Norm(Plain):
        imagenet_norm = True

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return np.zeros((16, 16, 3), np.float32), 0

    assert isinstance(make_batch_loader(Norm(), 2), BatchLoader)
    with pytest.raises(RuntimeError, match="plain-float"):
        make_batch_loader(Norm(), 2, native=True)


def test_folder_dataset_uses_native_loader(jpegs):
    from vqgan_tpu.data.native_image import (NativeBatchLoader,
                                             make_batch_loader)
    from vqgan_tpu.training.ddpm_trainer import FolderDataset

    ds = FolderDataset(Path(jpegs[0]).parent, image_size=16)
    loader = make_batch_loader(ds, 2, seed=1, native=True)
    assert isinstance(loader, NativeBatchLoader)
    imgs, labels = next(iter(loader))
    assert imgs.shape == (2, 16, 16, 3) and (labels == 0).all()
