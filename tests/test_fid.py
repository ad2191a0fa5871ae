import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.eval.fid import FIDEvaluation, FIDStats, frechet_distance


def test_frechet_distance_identical_zero():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=8)
    a = rng.normal(size=(32, 8))
    cov = np.cov(a.T)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_frechet_distance_known_value():
    # isotropic gaussians: FID = ||mu1-mu2||^2 + d*(s1 + s2 - 2*sqrt(s1*s2))
    d = 4
    mu1, mu2 = np.zeros(d), np.full(d, 2.0)
    c1, c2 = np.eye(d) * 1.0, np.eye(d) * 4.0
    expected = 4.0 * d + d * (1 + 4 - 2 * 2.0)
    np.testing.assert_allclose(
        frechet_distance(mu1, c1, mu2, c2), expected, rtol=1e-6)


def test_fid_stats_streaming_matches_batch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(100, 6))
    acc = FIDStats(6)
    for s in range(0, 100, 32):
        acc.update(x[s:s + 32])
    mu, cov = acc.finalize()
    np.testing.assert_allclose(mu, x.mean(0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x.T), rtol=1e-8)


def test_fid_pipeline_separates_distributions(tmp_path):
    # toy "feature" extractor: mean/std projections — FID(real-like) should
    # be much smaller than FID(shifted)
    def feature_fn(x):
        flat = x.reshape(x.shape[0], -1)
        return jnp.concatenate(
            [flat[:, :4], flat[:, :4] * 2.0], axis=1)

    fid = FIDEvaluation(feature_fn, batch_size=64, num_fid_samples=256,
                        stats_path=str(tmp_path / "stats.npz"), dim=8)
    key = jax.random.PRNGKey(0)
    real = [np.asarray(jax.random.uniform(jax.random.fold_in(key, i),
                                          (64, 4, 4, 1)))
            for i in range(4)]
    fid.load_or_precalc_real_stats(iter(real))
    assert (tmp_path / "stats.npz").exists()

    def sampler_like(k, n):
        return jax.random.uniform(k, (n, 4, 4, 1))

    def sampler_shifted(k, n):
        return jax.random.uniform(k, (n, 4, 4, 1)) * 0.5 + 0.5

    score_like = fid.fid_score(sampler_like, jax.random.PRNGKey(1))
    score_shift = fid.fid_score(sampler_shifted, jax.random.PRNGKey(2))
    # same distribution → small sampling-noise FID; shifted → 10x+ larger
    assert score_like < 0.2
    assert score_shift > 5 * score_like

    # cached stats reload path
    fid2 = FIDEvaluation(feature_fn, batch_size=64, num_fid_samples=128,
                         stats_path=str(tmp_path / "stats.npz"), dim=8)
    fid2.load_or_precalc_real_stats(iter([]))
    assert fid2._real is not None


def test_inception_features_shape():
    from vqgan_tpu.models.inception import InceptionV3Features

    # resize_input=False with a 75px input: the smallest valid InceptionV3
    # size — 16x cheaper to compile/run than the 299px production resize
    # (the 299 path is covered by test_backbone_parity's torch comparison)
    model = InceptionV3Features(resize_input=False)
    x = jnp.zeros((2, 75, 75, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (2, 2048)
    assert bool(jnp.isfinite(feats).all())
