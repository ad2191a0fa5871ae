"""Gaussian-mixture clustering + PCA on TPU, and stratified quota sampling.

TPU-native replacement for the reference's sklearn pipeline
(/root/reference/preprocess_latents_with_gmm.py:55-57,146-154 — StandardScaler
→ PCA(0.95) → GaussianMixture(full, n_init=10, diag fallback)) and the
largest-remainder cluster quota allocation (:160-233).

Design: EM is pure jnp — E-step log-responsibilities via Cholesky solves,
M-step closed form — compiled once and vmapped over `n_init` random restarts
(all restarts run in parallel on the chip; sklearn loops them serially).
Covariance regularization (reg_covar) plays the role of sklearn's jitter; if
a Cholesky goes non-finite the implementation falls back to diagonal
covariance, mirroring the reference's try/except (:146-154).

Cluster-quality metrics (silhouette, Davies-Bouldin, Calinski-Harabasz,
BIC/AIC) back `validate_cluster_number` (reference validate_cluster_number.py:
97-139) without sklearn.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "standardize",
    "pca_fit",
    "GMMParams",
    "gmm_fit",
    "gmm_predict",
    "gmm_bic",
    "gmm_aic",
    "silhouette_score",
    "davies_bouldin_score",
    "calinski_harabasz_score",
    "largest_remainder_quotas",
    "stratified_sample_from_clusters",
]


# ---------------------------------------------------------------------------
# preprocessing
# ---------------------------------------------------------------------------


def standardize(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Zero-mean unit-variance per feature (StandardScaler)."""
    mean = jnp.mean(x, axis=0)
    std = jnp.maximum(jnp.std(x, axis=0), 1e-8)
    return (x - mean) / std, mean, std


def pca_fit(x: jax.Array, var_ratio: float = 0.95,
            max_components: Optional[int] = None):
    """PCA by SVD on-device. Returns (components [D, k], n_components,
    explained_variance_ratio). Chooses the smallest k reaching var_ratio."""
    xc = x - jnp.mean(x, axis=0)
    # economy SVD: for N << D this runs on the N×N gram matrix
    _, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    var = s**2
    ratio = var / jnp.sum(var)
    cum = jnp.cumsum(ratio)
    k = int(jnp.searchsorted(cum, var_ratio) + 1)
    if max_components is not None:
        k = min(k, max_components)
    return vt[:k].T, k, ratio


def pca_transform(x: jax.Array, components: jax.Array, mean: jax.Array):
    return jnp.dot(x - mean, components)


# ---------------------------------------------------------------------------
# GMM via EM
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GMMParams:
    weights: jax.Array  # [K]
    means: jax.Array  # [K, D]
    covs: jax.Array  # [K, D, D] (diagonal stored as full matrices)


def _log_gaussian_full(x, means, covs, reg):
    """log N(x | mu_k, Sigma_k) for all k via Cholesky. x: [N, D]."""
    k, d = means.shape
    eye = jnp.eye(d) * reg

    def per_comp(mu, cov):
        chol = jnp.linalg.cholesky(cov + eye)
        diff = x - mu  # [N, D]
        sol = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True)
        maha = jnp.sum(sol**2, axis=0)  # [N]
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (d * jnp.log(2 * jnp.pi) + logdet + maha)

    return jax.vmap(per_comp)(means, covs).T  # [N, K]


def _em_step(x, params: GMMParams, reg, diag_only):
    log_prob = _log_gaussian_full(x, params.means, params.covs, reg)
    log_weighted = log_prob + jnp.log(
        jnp.maximum(params.weights, 1e-12))[None, :]
    log_norm = jax.nn.logsumexp(log_weighted, axis=1, keepdims=True)
    resp = jnp.exp(log_weighted - log_norm)  # [N, K]

    nk = jnp.sum(resp, axis=0) + 1e-10
    means = jnp.dot(resp.T, x) / nk[:, None]

    def cov_k(r, mu):
        diff = x - mu
        cov = jnp.einsum("n,ni,nj->ij", r, diff, diff) / jnp.sum(r + 1e-10)
        if diag_only:
            cov = jnp.diag(jnp.diagonal(cov))
        return cov

    covs = jax.vmap(cov_k, in_axes=(1, 0))(resp, means)
    weights = nk / x.shape[0]
    ll = jnp.mean(log_norm)
    return GMMParams(weights, means, covs), ll


def _init_params(key, x, k):
    """kmeans++-lite init: random distinct points as means, global cov."""
    n, d = x.shape
    idx = jax.random.choice(key, n, (k,), replace=False)
    means = x[idx]
    global_cov = jnp.cov(x.T).reshape(d, d) + jnp.eye(d) * 1e-3
    covs = jnp.tile(global_cov[None], (k, 1, 1))
    weights = jnp.full((k,), 1.0 / k)
    return GMMParams(weights, means, covs)


@partial(jax.jit, static_argnames=("k", "n_init", "max_iter", "diag_only"))
def _gmm_fit_impl(key, x, k, n_init, max_iter, reg, diag_only):
    keys = jax.random.split(key, n_init)

    def one_run(kk):
        params0 = _init_params(kk, x, k)

        def body(carry, _):
            params, _ = carry
            params, ll = _em_step(x, params, reg, diag_only)
            return (params, ll), None

        (params, ll), _ = jax.lax.scan(
            body, (params0, -jnp.inf), None, length=max_iter)
        return params, ll

    all_params, all_ll = jax.vmap(one_run)(keys)
    best = jnp.argmax(all_ll)
    pick = lambda t: t[best]
    return GMMParams(
        pick(all_params.weights), pick(all_params.means),
        pick(all_params.covs)), all_ll[best]


def gmm_fit(
    key: jax.Array,
    x: jax.Array,
    k: int,
    n_init: int = 10,
    max_iter: int = 100,
    reg_covar: float = 1e-6,
    covariance_type: str = "full",
) -> Tuple[GMMParams, jax.Array]:
    """Fit, with automatic diag fallback when full-covariance EM degenerates
    (mirrors the reference's try/except at :146-154)."""
    diag_only = covariance_type == "diag"
    params, ll = _gmm_fit_impl(key, x, k, n_init, max_iter,
                               jnp.float32(reg_covar), diag_only)
    if not diag_only and not bool(jnp.isfinite(ll)):
        params, ll = _gmm_fit_impl(key, x, k, n_init, max_iter,
                                   jnp.float32(1e-3), True)
    return params, ll


def gmm_predict(params: GMMParams, x: jax.Array) -> jax.Array:
    log_prob = _log_gaussian_full(x, params.means, params.covs, 1e-6)
    log_weighted = log_prob + jnp.log(
        jnp.maximum(params.weights, 1e-12))[None, :]
    return jnp.argmax(log_weighted, axis=1)


def _n_parameters(k: int, d: int, covariance_type: str = "full") -> int:
    cov_params = k * d * (d + 1) // 2 if covariance_type == "full" else k * d
    return int(cov_params + k * d + k - 1)


def gmm_bic(params: GMMParams, x, mean_ll, covariance_type="full"):
    n, d = x.shape
    k = params.weights.shape[0]
    return float(
        -2 * mean_ll * n + _n_parameters(k, d, covariance_type) * np.log(n))


def gmm_aic(params: GMMParams, x, mean_ll, covariance_type="full"):
    n, d = x.shape
    k = params.weights.shape[0]
    return float(-2 * mean_ll * n + 2 * _n_parameters(k, d, covariance_type))


# ---------------------------------------------------------------------------
# cluster-quality metrics (numpy, small data)
# ---------------------------------------------------------------------------


def silhouette_score(x: np.ndarray, labels: np.ndarray) -> float:
    x = np.asarray(x, np.float64)
    labels = np.asarray(labels)
    n = len(x)
    uniq = np.unique(labels)
    if len(uniq) < 2:
        return 0.0
    d = np.sqrt(((x[:, None] - x[None]) ** 2).sum(-1))
    sil = np.zeros(n)
    for i in range(n):
        same = labels == labels[i]
        same[i] = False
        a = d[i, same].mean() if same.any() else 0.0
        b = np.inf
        for c in uniq:
            if c == labels[i]:
                continue
            b = min(b, d[i, labels == c].mean())
        sil[i] = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
    return float(sil.mean())


def davies_bouldin_score(x: np.ndarray, labels: np.ndarray) -> float:
    x = np.asarray(x, np.float64)
    uniq = np.unique(labels)
    k = len(uniq)
    if k < 2:
        return 0.0
    centroids = np.stack([x[labels == c].mean(0) for c in uniq])
    scatter = np.array(
        [np.linalg.norm(x[labels == c] - centroids[i], axis=1).mean()
         for i, c in enumerate(uniq)])
    db = 0.0
    for i in range(k):
        ratios = [
            (scatter[i] + scatter[j]) /
            max(np.linalg.norm(centroids[i] - centroids[j]), 1e-12)
            for j in range(k) if j != i
        ]
        db += max(ratios)
    return float(db / k)


def calinski_harabasz_score(x: np.ndarray, labels: np.ndarray) -> float:
    x = np.asarray(x, np.float64)
    uniq = np.unique(labels)
    k = len(uniq)
    n = len(x)
    if k < 2:
        return 0.0
    overall = x.mean(0)
    bss = wss = 0.0
    for c in uniq:
        xc = x[labels == c]
        centroid = xc.mean(0)
        bss += len(xc) * ((centroid - overall) ** 2).sum()
        wss += ((xc - centroid) ** 2).sum()
    return float((bss / max(k - 1, 1)) / max(wss / max(n - k, 1), 1e-12))


# ---------------------------------------------------------------------------
# stratified quota sampling
# ---------------------------------------------------------------------------


def largest_remainder_quotas(counts: np.ndarray, total: int) -> np.ndarray:
    """Allocate `total` picks across clusters proportional to `counts` by the
    largest-remainder method, capped at cluster sizes (reference :160-190)."""
    counts = np.asarray(counts, np.float64)
    n = counts.sum()
    if n == 0:
        return np.zeros_like(counts, dtype=int)
    exact = counts / n * total
    floor = np.floor(exact).astype(int)
    floor = np.minimum(floor, counts.astype(int))
    remainder = exact - floor
    left = total - floor.sum()
    # hand out remaining picks to largest remainders with available capacity
    order = np.argsort(-remainder)
    quotas = floor.copy()
    for idx in order:
        if left <= 0:
            break
        if quotas[idx] < counts[idx]:
            quotas[idx] += 1
            left -= 1
    # if still short (tiny clusters), fill anywhere with capacity
    while left > 0:
        space = np.where(quotas < counts)[0]
        if len(space) == 0:
            break
        quotas[space[0]] += 1
        left -= 1
    return quotas


def stratified_sample_from_clusters(
    labels: np.ndarray,
    n_gen: int = 30,
    n_class: int = 20,
    seed: int = 42,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-cluster proportional picks → (gen_train_idx, class_train_idx,
    rest_idx), pairwise disjoint (reference :193-245 incl. the asserts)."""
    rng = np.random.default_rng(seed)
    labels = np.asarray(labels)
    uniq = np.unique(labels)
    counts = np.array([(labels == c).sum() for c in uniq])

    gen_quota = largest_remainder_quotas(counts, n_gen)
    gen_idx, remaining_per_cluster = [], []
    for c, q in zip(uniq, gen_quota):
        members = np.where(labels == c)[0]
        # uniform (evenly spaced) picks within the cluster
        if q > 0:
            pick_pos = np.unique(
                np.linspace(0, len(members) - 1, q).astype(int))
            while len(pick_pos) < q:
                pool = np.setdiff1d(np.arange(len(members)), pick_pos)
                pick_pos = np.sort(np.append(pick_pos, pool[0]))
            picked = members[pick_pos]
        else:
            picked = np.array([], int)
        gen_idx.append(picked)
        remaining_per_cluster.append(np.setdiff1d(members, picked))
    gen_idx = np.concatenate(gen_idx) if gen_idx else np.array([], int)

    rem_counts = np.array([len(r) for r in remaining_per_cluster])
    class_quota = largest_remainder_quotas(rem_counts, n_class)
    class_idx = []
    for rem, q in zip(remaining_per_cluster, class_quota):
        if q > 0:
            picked = rng.choice(rem, size=min(q, len(rem)), replace=False)
        else:
            picked = np.array([], int)
        class_idx.append(picked)
    class_idx = np.concatenate(class_idx) if class_idx else np.array([], int)

    rest = np.setdiff1d(np.arange(len(labels)),
                        np.concatenate([gen_idx, class_idx]))

    assert len(np.intersect1d(gen_idx, class_idx)) == 0
    assert len(np.intersect1d(gen_idx, rest)) == 0
    assert len(np.intersect1d(class_idx, rest)) == 0
    return np.sort(gen_idx), np.sort(class_idx), rest
