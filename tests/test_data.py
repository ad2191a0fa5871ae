import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.data import (
    BatchLoader,
    ImageFolderDataset,
    LatentCache,
    LatentDataset,
    SyntheticDataset,
    cache_filename,
    create_data_split,
    gmm_fit,
    gmm_predict,
    largest_remainder_quotas,
    load_image,
    pca_fit,
    silhouette_score,
    davies_bouldin_score,
    calinski_harabasz_score,
    standardize,
    stratified_sample_from_clusters,
    uniform_indices,
    verify_split,
)


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    """3 users x 12 images of 48x32 px."""
    from PIL import Image

    root = tmp_path_factory.mktemp("gait")
    rng = np.random.default_rng(0)
    for u in range(1, 4):
        d = root / f"ID_{u}"
        d.mkdir()
        for i in range(12):
            arr = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"frame_{i:03d}.jpg")
    return root


def test_uniform_indices():
    idx = uniform_indices(100, 10)
    assert len(idx) == 10
    assert idx[0] == 0 and idx[-1] == 99
    # dedup + top-up when n_pick close to n_total
    idx2 = uniform_indices(12, 10)
    assert len(idx2) == 10 and len(set(idx2.tolist())) == 10
    idx3 = uniform_indices(5, 10)
    assert len(idx3) == 5


def test_create_and_verify_split(fake_dataset):
    split = create_data_split(fake_dataset, num_users=3,
                              images_per_user_train=8)
    assert len(split["users"]) == 3
    problems = verify_split(split)
    assert problems == []
    info = split["users"]["ID_1"]
    assert len(info["train_images"]) == 8
    assert len(info["test_images"]) == 4
    # corrupt and detect
    split["users"]["ID_1"]["test_images"][0] = info["train_images"][0]
    assert any("overlap" in p for p in verify_split(split))


def test_load_image_resize_crop(fake_dataset):
    img = load_image(fake_dataset / "ID_1" / "frame_000.jpg", 16)
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_image_folder_dataset_and_loader(fake_dataset):
    split = create_data_split(fake_dataset, num_users=3,
                              images_per_user_train=8)
    ds = ImageFolderDataset(fake_dataset, split, "train", image_size=16)
    assert len(ds) == 24
    img, label = ds[0]
    assert img.shape == (16, 16, 3) and 0 <= label < 3

    loader = BatchLoader(ds, batch_size=6, seed=1)
    batches = list(loader)
    assert len(batches) == 4
    xb, yb = batches[0]
    assert xb.shape == (6, 16, 16, 3) and yb.shape == (6,)
    assert yb.dtype == np.int32


def test_batch_loader_propagates_worker_exception():
    """A dataset error in the producer thread must surface in the consumer
    (a dead worker used to leave q.get() blocking forever)."""

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise FileNotFoundError(f"missing item {i}")

    loader = BatchLoader(Broken(), batch_size=4, seed=0)
    with pytest.raises(FileNotFoundError, match="missing item"):
        list(loader)


def test_synthetic_dataset(fake_dataset):
    ds = SyntheticDataset(fake_dataset, image_size=16)
    assert len(ds) == 36
    ds_f = SyntheticDataset(fake_dataset, image_size=16, user_filter=[0])
    assert len(ds_f) == 12


def test_latent_cache_roundtrip(tmp_path):
    cache = LatentCache(tmp_path)
    latent = np.random.default_rng(0).normal(size=(8, 8, 4)).astype(np.float32)
    cache.save(3, "frame_001.jpg", latent)
    assert cache.has(3, "frame_001.jpg")
    assert cache_filename(3, "frame_001.jpg") == "user_03_frame_001.npy"
    out = cache.load(3, "frame_001.jpg")
    np.testing.assert_array_equal(out, latent)


def test_latent_cache_torch_interop(tmp_path):
    import torch

    cache = LatentCache(tmp_path)
    t = torch.arange(4 * 4 * 4, dtype=torch.float32).reshape(4, 4, 4)
    torch.save(t, tmp_path / "user_00_x.pt")
    out = cache.load(0, "x.jpg")
    assert out.shape == (4, 4, 4)


def test_latent_dataset_on_miss_encode(fake_dataset, tmp_path):
    split = create_data_split(fake_dataset, num_users=3,
                              images_per_user_train=4)
    cache = LatentCache(tmp_path)
    calls = []

    def encode_fn(img):
        calls.append(img.shape)
        return np.zeros((1, 4, 4, 2), np.float32)

    ds = LatentDataset(fake_dataset, split, cache, image_size=16,
                       encode_fn=encode_fn)
    assert len(ds) == 12
    latent, label = ds[0]
    assert latent.shape == (4, 4, 2)
    assert len(calls) == 1
    # second access is a cache hit
    ds[0]
    assert len(calls) == 1


# ---------------------------------------------------------------- GMM

def test_standardize_and_pca():
    x = jax.random.normal(jax.random.PRNGKey(0), (50, 10)) * jnp.arange(1, 11)
    xs, mean, std = standardize(x)
    np.testing.assert_allclose(np.asarray(jnp.mean(xs, 0)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.std(xs, 0)), 1, atol=1e-4)
    comps, k, ratio = pca_fit(xs, var_ratio=0.95)
    assert 1 <= k <= 10
    assert comps.shape == (10, k)
    # projections are decorrelated
    proj = jnp.dot(xs - jnp.mean(xs, 0), comps)
    cov = np.asarray(jnp.cov(proj.T))
    off_diag = cov - np.diag(np.diag(cov))
    assert np.abs(off_diag).max() < 0.2


def test_gmm_recovers_separated_clusters():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    c1 = jax.random.normal(k1, (40, 2)) * 0.3 + jnp.array([5.0, 0.0])
    c2 = jax.random.normal(k2, (40, 2)) * 0.3 + jnp.array([-5.0, 0.0])
    c3 = jax.random.normal(k3, (40, 2)) * 0.3 + jnp.array([0.0, 5.0])
    x = jnp.concatenate([c1, c2, c3])
    params, ll = gmm_fit(jax.random.PRNGKey(1), x, k=3, n_init=5, max_iter=50)
    labels = np.asarray(gmm_predict(params, x))
    # each true cluster maps to exactly one predicted label
    for seg in (labels[:40], labels[40:80], labels[80:]):
        assert len(np.unique(seg)) == 1
    assert len(np.unique(labels)) == 3
    assert jnp.isfinite(ll)


def test_cluster_metrics_sanity():
    rng = np.random.default_rng(0)
    tight = np.concatenate([
        rng.normal(0, 0.1, (20, 2)) + [5, 0],
        rng.normal(0, 0.1, (20, 2)) + [-5, 0],
    ])
    labels = np.array([0] * 20 + [1] * 20)
    rand_labels = rng.integers(0, 2, 40)
    assert silhouette_score(tight, labels) > 0.8
    assert silhouette_score(tight, rand_labels) < 0.5
    assert davies_bouldin_score(tight, labels) < \
        davies_bouldin_score(tight, rand_labels)
    assert calinski_harabasz_score(tight, labels) > \
        calinski_harabasz_score(tight, rand_labels)


def test_largest_remainder_quotas():
    q = largest_remainder_quotas(np.array([50, 30, 20]), 10)
    np.testing.assert_array_equal(q, [5, 3, 2])
    # capacity capping
    q2 = largest_remainder_quotas(np.array([2, 100]), 10)
    assert q2[0] <= 2 and q2.sum() == 10
    # rounding goes to largest remainder
    q3 = largest_remainder_quotas(np.array([1, 1, 1]), 2)
    assert q3.sum() == 2


def test_stratified_sample_disjoint_and_sized():
    labels = np.array([0] * 50 + [1] * 60 + [2] * 40)
    gen, cls, rest = stratified_sample_from_clusters(
        labels, n_gen=30, n_class=20, seed=0)
    assert len(gen) == 30 and len(cls) == 20
    assert len(gen) + len(cls) + len(rest) == 150
    assert len(np.intersect1d(gen, cls)) == 0
    # proportionality: cluster 1 (60/150) gets ~12 of 30 gen picks
    gen_labels = labels[gen]
    assert abs((gen_labels == 1).sum() - 12) <= 1
