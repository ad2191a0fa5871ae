"""FID evaluation: Inception features on TPU, Fréchet distance on host.

Behavior target: /root/reference/denoising_diffusion_pytorch/
fid_evaluation.py:22-109 — caches real-dataset statistics to
`dataset_stats.npz`, generates `num_fid_samples` fake batches through the
sampler, computes pool-2048 mean/cov and the Fréchet distance.

TPU-native: feature extraction is a jitted batched forward; mean/cov
accumulate as running sums on device (one pass, no feature matrix in host
memory); the 2048×2048 sqrtm runs on the host via scipy with a symmetric-
eigendecomposition fallback.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FIDStats", "FIDEvaluation", "frechet_distance"]


class FIDStats:
    """Streaming mean/covariance accumulator for feature batches."""

    def __init__(self, dim: int = 2048):
        self.n = 0
        self.sum = np.zeros((dim,), np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray):
        feats = np.asarray(feats, np.float64)
        self.n += feats.shape[0]
        self.sum += feats.sum(axis=0)
        self.outer += feats.T @ feats

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        mu = self.sum / self.n
        cov = (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    """Matrix square root; scipy when available, symmetric-eig fallback."""
    try:
        from scipy import linalg

        out, _ = linalg.sqrtm(a, disp=False)
        return out.real
    except ImportError:
        sym = (a + a.T) / 2
        vals, vecs = np.linalg.eigh(sym)
        vals = np.clip(vals, 0, None)
        return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """FID = ‖μ1−μ2‖² + tr(Σ1 + Σ2 − 2(Σ1Σ2)^½)."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1, cov2 = np.asarray(cov1, np.float64), np.asarray(cov2, np.float64)
    diff = mu1 - mu2

    covmean = _sqrtm_psd(cov1 @ cov2)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = _sqrtm_psd((cov1 + offset) @ (cov2 + offset))
    return float(
        diff @ diff + np.trace(cov1) + np.trace(cov2)
        - 2 * np.trace(covmean))


def make_inception_feature_fn(variables=None, dtype=None, seed: int = 0):
    """Jitted pool-2048 InceptionV3 feature extractor. Pass imported
    torchvision weights (models.inception.load_torch_inception_weights) for
    calibrated FID; None uses random init (pipeline-valid only)."""
    import jax.numpy as jnp

    from ..models.inception import InceptionV3Features

    model = InceptionV3Features(dtype=dtype or jnp.float32)
    if variables is None:
        model_vars = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
    else:
        model_vars = variables
    return jax.jit(lambda x: model.apply(model_vars, x))


class FIDEvaluation:
    """feature_fn(images [B,H,W,3] in [0,1]) -> [B, D] (jitted Inception by
    default); sampler_fn(key, batch_size) -> images in [0,1]."""

    def __init__(
        self,
        feature_fn: Callable,
        batch_size: int = 64,
        num_fid_samples: int = 50000,
        stats_path: Optional[str] = None,
        dim: int = 2048,
    ):
        self.feature_fn = feature_fn
        self.batch_size = batch_size
        self.num_fid_samples = num_fid_samples
        self.stats_path = Path(stats_path) if stats_path else None
        self.dim = dim
        self._real: Optional[Tuple[np.ndarray, np.ndarray]] = None

    # ----------------------------------------------------------------

    def load_or_precalc_real_stats(self, real_batches: Iterator[np.ndarray]):
        """Compute (or load cached) real-data statistics
        (reference fid_evaluation.py:60-89, dataset_stats.npz)."""
        if self.stats_path is not None and self.stats_path.exists():
            data = np.load(self.stats_path)
            self._real = (data["mu"], data["sigma"])
            return self._real

        acc = FIDStats(self.dim)
        for batch in real_batches:
            acc.update(np.asarray(self.feature_fn(jnp.asarray(batch))))
        self._real = acc.finalize()
        if self.stats_path is not None:
            self.stats_path.parent.mkdir(parents=True, exist_ok=True)
            np.savez(self.stats_path, mu=self._real[0], sigma=self._real[1])
        return self._real

    def fid_score(self, sampler_fn: Callable, key) -> float:
        """Generate num_fid_samples through sampler_fn and score vs the real
        stats (reference fid_evaluation.py:91-109)."""
        assert self._real is not None, "call load_or_precalc_real_stats first"
        acc = FIDStats(self.dim)
        remaining = self.num_fid_samples
        while remaining > 0:
            n = min(self.batch_size, remaining)
            key, k = jax.random.split(key)
            fake = sampler_fn(k, n)
            acc.update(np.asarray(self.feature_fn(jnp.asarray(fake))))
            remaining -= n
        mu_f, cov_f = acc.finalize()
        mu_r, cov_r = self._real
        return frechet_distance(mu_r, cov_r, mu_f, cov_f)
