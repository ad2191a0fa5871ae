import numpy as np
import pytest

from vqgan_tpu.eval.tsne import (
    embed_user_features,
    select_extreme_users,
    tsne,
)


def test_tsne_separates_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.3, (30, 10)) + 5
    b = rng.normal(0, 0.3, (30, 10)) - 5
    x = np.concatenate([a, b])
    emb = tsne(x, perplexity=10, n_iter=300, seed=0)
    assert emb.shape == (60, 2)
    # centroid distance in the embedding far exceeds within-cluster spread
    ca, cb = emb[:30].mean(0), emb[30:].mean(0)
    spread = max(emb[:30].std(), emb[30:].std())
    assert np.linalg.norm(ca - cb) > 2 * spread


def test_select_extreme_users():
    accs = {i: i / 10 for i in range(10)}
    top, bottom = select_extreme_users(accs, k=3)
    assert top == [9, 8, 7]
    assert set(bottom) == {0, 1, 2}


def test_embed_user_features_filters():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(40, 8))
    labels = np.repeat(np.arange(4), 10)
    emb, lab = embed_user_features(feats, labels, users=[1, 3],
                                   perplexity=5)
    assert emb.shape == (20, 2)
    assert set(lab.tolist()) == {1, 3}


def test_plots_write_files(tmp_path):
    from vqgan_tpu.eval.plots import plot_cluster_validation, plot_tsne

    ks = [2, 3, 4]
    metrics = {k: [1.0, 0.8, 0.9] for k in
               ("bic", "aic", "silhouette", "davies_bouldin",
                "calinski_harabasz")}
    out = plot_cluster_validation(
        "ID_1", ks, metrics, {3: [10, 12, 8]},
        {"bic_elbow": 3, "aic_elbow": 3}, tmp_path / "val.png")
    assert out is not None and out.exists()

    emb = np.random.default_rng(0).normal(size=(20, 2))
    labels = np.repeat([0, 1], 10)
    out2 = plot_tsne(emb, labels, tmp_path / "tsne.png", highlight=[1])
    assert out2 is not None and out2.exists()
