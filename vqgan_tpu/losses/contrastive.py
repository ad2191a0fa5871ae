"""Contrastive losses: supervised contrastive (SupCon, Khosla et al. 2020)
and InfoNCE.

Behavior target: /root/reference/losses.py:19-234 — label-mask construction,
anchor modes 'one'/'all', numerically-stabilized logits, self-exclusion, and
the positive-pair-count guard. Implemented from the published formulation in
pure jnp (static shapes, jit-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["supcon_loss", "infonce_loss"]


def supcon_loss(
    features: jax.Array,
    labels: jax.Array | None = None,
    mask: jax.Array | None = None,
    *,
    temperature: float = 0.07,
    contrast_mode: str = "all",
    base_temperature: float = 0.07,
) -> jax.Array:
    """SupCon loss.

    features: [B, n_views, D], L2-normalized per view.
    labels: [B] int — same-label pairs are positives. If neither labels nor
    mask is given, degenerates to SimCLR (views of the same sample are the
    only positives).
    """
    if features.ndim != 3:
        raise ValueError("features must be [batch, n_views, dim]")
    b, n_views, _ = features.shape

    if labels is not None and mask is not None:
        raise ValueError("pass either labels or mask, not both")
    if mask is None:
        if labels is None:
            mask = jnp.eye(b, dtype=jnp.float32)
        else:
            labels = labels.reshape(-1, 1)
            mask = (labels == labels.T).astype(jnp.float32)

    # stack VIEW-major (all of view 0, then view 1, ...): index v*B + i —
    # the ordering the tiled label mask below assumes (matches the
    # reference's torch.cat(torch.unbind(features, dim=1)))
    contrast_features = jnp.swapaxes(features, 0, 1).reshape(b * n_views, -1)
    if contrast_mode == "one":
        anchor_features = features[:, 0]
        anchor_count = 1
    elif contrast_mode == "all":
        anchor_features = contrast_features
        anchor_count = n_views
    else:
        raise ValueError(f"unknown contrast_mode {contrast_mode!r}")

    logits = (
        jnp.dot(anchor_features, contrast_features.T,
                preferred_element_type=jnp.float32) / temperature
    )
    # numerical stability: subtract per-row max
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=1, keepdims=True))

    # tile label mask over views, drop self-comparisons
    mask = jnp.tile(mask, (anchor_count, n_views))
    n_anchor = anchor_count * b
    self_mask = 1.0 - jnp.eye(b * n_views, dtype=jnp.float32)[:n_anchor]
    mask = mask * self_mask

    # masked log-sum-exp over non-self entries; robust to underflow (a plain
    # exp-sum can hit exactly 0 in fp32 → log → -inf → 0·inf = nan)
    log_denom = jax.nn.logsumexp(
        jnp.where(self_mask > 0, logits, -jnp.inf), axis=1, keepdims=True)
    log_prob = logits - log_denom

    pos_count = jnp.sum(mask, axis=1)
    # guard: anchors with no positive pair contribute 0 (reference
    # losses.py:168-170 masks them out of the mean)
    mean_log_prob_pos = jnp.sum(
        jnp.where(mask > 0, log_prob, 0.0), axis=1
    ) / jnp.maximum(pos_count, 1.0)
    has_pos = (pos_count > 0).astype(jnp.float32)

    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.sum(loss * has_pos) / jnp.maximum(jnp.sum(has_pos), 1.0)


def infonce_loss(
    queries: jax.Array,
    keys: jax.Array,
    *,
    temperature: float = 0.07,
) -> jax.Array:
    """InfoNCE with in-batch negatives: positives are the aligned (i, i)
    pairs (reference losses.py:179-234)."""
    q = queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
    k = keys / jnp.maximum(
        jnp.linalg.norm(keys, axis=-1, keepdims=True), 1e-12)
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(q.shape[0])
    return jnp.mean(
        -jax.nn.log_softmax(logits, axis=-1)[labels, labels]
    )
