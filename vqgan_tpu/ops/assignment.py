"""On-device linear assignment (Bertsekas auction) for immiscible diffusion.

The reference computes the noise↔sample matching with scipy's Hungarian
solver (/root/reference/denoising_diffusion_pytorch/
denoising_diffusion_pytorch.py:769-781). Our default keeps that exactness
through a `pure_callback` (diffusion/gaussian.py) — but a host callback
forces a device→host sync inside the training step, which stalls pipelined
execution and is awkward under multi-host jit. This module provides the
TPU-native alternative: an ε-auction solved entirely in-graph with
`lax.while_loop` (no callbacks, no host sync), returning a true
permutation whose cost is within b·ε of optimal — immaterial for
immiscible matching, which is itself a heuristic.

Algorithm (Gauss-Seidel auction, Bertsekas 1988): unassigned person i bids
for its best object j at price p_j + (best − second-best) + ε; the object
switches owner and its price rises, eventually pricing every person into a
distinct object. ε = range/(2b) bounds suboptimality by range/2 total. A
bounded iteration cap plus a greedy in-graph fix-up guarantees a valid
permutation even at the cap (never hit in practice at these sizes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["auction_assignment"]


def auction_assignment(dist: jax.Array, eps: float | None = None,
                       max_iters: int | None = None) -> jax.Array:
    """cols[i] = object assigned to row i, minimizing ~sum dist[i, cols[i]].

    dist: [b, b] cost matrix. Returns [b] int32, a permutation of 0..b-1.
    Runs entirely on device (jit/scan/shard_map-safe)."""
    b = dist.shape[0]
    assert dist.shape == (b, b), dist.shape
    value = -dist.astype(jnp.float32)  # auction maximizes
    vrange = jnp.maximum(jnp.max(value) - jnp.min(value), 1e-12)
    eps_ = (vrange / (2.0 * b)) if eps is None else jnp.float32(eps)
    # ε-auction terminates within ~b * (range/ε + 1) bids; pad generously
    cap = max_iters if max_iters is not None else int(4 * b * (2 * b + 1))

    neg_inf = jnp.float32(-jnp.inf)

    def cond(state):
        it, assign, _, _ = state
        return jnp.logical_and(it < cap, jnp.any(assign < 0))

    def body(state):
        it, assign, owner, prices = state
        i = jnp.argmax(assign < 0)  # first unassigned person
        net = value[i] - prices
        j1 = jnp.argmax(net)
        v1 = net[j1]
        v2 = jnp.max(net.at[j1].set(neg_inf))
        # handle b == 1: v2 = -inf → bid with just ε
        incr = jnp.where(jnp.isfinite(v2), v1 - v2, 0.0) + eps_
        prev = owner[j1]
        assign = assign.at[i].set(j1)
        # evict the previous owner (prev == -1 → out-of-range index b,
        # dropped)
        assign = assign.at[jnp.where(prev >= 0, prev, b)].set(
            -1, mode="drop")
        owner = owner.at[j1].set(i)
        prices = prices.at[j1].set(prices[j1] + incr)
        return it + 1, assign, owner, prices

    init = (jnp.int32(0),
            jnp.full((b,), -1, jnp.int32),
            jnp.full((b,), -1, jnp.int32),
            jnp.zeros((b,), jnp.float32))
    _, assign, owner, _ = lax.while_loop(cond, body, init)

    # Greedy fix-up if the cap was hit (valid permutation guarantee): give
    # each still-unassigned person its best still-unowned object.
    def fix(i, carry):
        assign, owned = carry
        need = assign[i] < 0
        masked = jnp.where(owned, neg_inf, value[i])
        j = jnp.argmax(masked)
        assign = assign.at[i].set(jnp.where(need, j, assign[i]))
        owned = owned.at[j].set(jnp.where(need, True, owned[j]))
        return assign, owned

    owned = jnp.zeros((b,), bool).at[jnp.where(
        assign >= 0, assign, b)].set(True, mode="drop")
    assign, _ = lax.fori_loop(0, b, fix, (assign, owned))
    return assign.astype(jnp.int32)
