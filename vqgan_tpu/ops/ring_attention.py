"""Sequence-parallel (ring) attention over a mesh axis.

Scales attention to sequences that do not fit one chip: Q, K, V are sharded
over the sequence dimension across the mesh's `axis`; each device computes
its Q-shard's attention against every KV-shard by passing the K/V blocks
around the ring with `lax.ppermute` while merging partial results with the
online-softmax rule (the blockwise/ring-attention construction — the same
math as the flash kernel's KV loop, lifted one level up to ICI).

Per ring step, a device holds its Q block [B, Sq/n, H, D] and the visiting
KV block [B, Skv/n, H, D]; the partial attention (out, lse) merges into the
running accumulator exactly:

    lse   = logaddexp(lse_acc, lse_blk)
    out   = out_acc * e^(lse_acc - lse) + out_blk * e^(lse_blk - lse)

Full (non-causal) attention is permutation-invariant over KV blocks, so the
ring order never matters and no masking is needed — this covers every
attention in this framework (spatial self-attention, cross-attention).

The whole ring (n steps, compute + ppermute) is one `lax.scan` inside one
`shard_map` — a single XLA program whose collectives ride ICI, overlapping
block compute with the neighbor transfer. Differentiable by construction
(jnp ops + ppermute transpose), so it serves training too; equality with the
single-device `sdpa_reference` (forward and gradients) is asserted in
tests/test_ring_attention.py.

Per-block compute uses the einsum path: ring blocks are Skv/n long, which on
real configs lands under the ~1k-token threshold where ops.attention's
size-aware dispatch prefers einsum over the Pallas kernel anyway (and XLA
fuses the merge arithmetic into it).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level API
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..parallel.pp import _SM_UNCHECKED

__all__ = ["ring_attention", "attention_with_lse"]


def attention_with_lse(q, k, v, scale: Optional[float] = None):
    """Softmax attention returning (out [B,S,H,D], lse [B,H,S]) in fp32
    accumulation — the mergeable form of one attention block."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1)  # [B,H,Q]
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                     preferred_element_type=jnp.float32)
    out = out / jnp.swapaxes(l, 1, 2)[..., None]
    lse = m[..., 0] + jnp.log(l)
    return out.astype(q.dtype), lse


def _merge(out_a, lse_a, out_b, lse_b):
    lse = jnp.logaddexp(lse_a, lse_b)
    wa = jnp.swapaxes(jnp.exp(lse_a - lse), 1, 2)[..., None]  # [B,Q,H,1]
    wb = jnp.swapaxes(jnp.exp(lse_b - lse), 1, 2)[..., None]
    return out_a * wa + out_b * wb, lse


def ring_attention(q, k, v, mesh: Mesh, axis: str = "seq",
                   scale: Optional[float] = None):
    """Attention with Q, K, V sequence-sharded over mesh `axis`.

    q: [B, Sq, H, D], k/v: [B, Skv, H, D] — global shapes; Sq and Skv must
    each divide by the axis size. Returns [B, Sq, H, D] with the same
    sequence sharding as q. Exactly equals `sdpa_reference(q, k, v)`.
    """
    n = mesh.shape[axis]
    d = q.shape[-1]
    scale_ = scale if scale is not None else 1.0 / math.sqrt(d)
    assert q.shape[1] % n == 0 and k.shape[1] % n == 0, (
        f"sequence lengths {q.shape[1]}/{k.shape[1]} must divide over "
        f"{n} '{axis}' shards")
    spec = P(None, axis, None, None)

    def per_device(q_i, k_i, v_i):
        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(carry, _):
            o_acc, l_acc, k_blk, v_blk = carry
            o_blk, l_blk = attention_with_lse(q_i, k_blk, v_blk, scale_)
            o_acc, l_acc = _merge(o_acc, l_acc, o_blk, l_blk)
            if n > 1:
                k_blk = lax.ppermute(k_blk, axis, perm)
                v_blk = lax.ppermute(v_blk, axis, perm)
            return (o_acc, l_acc, k_blk, v_blk), None

        b, sq, h, _ = q_i.shape
        o0 = jnp.zeros(q_i.shape, jnp.float32)
        l0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
        (o, _, _, _), _ = lax.scan(step, (o0, l0, k_i, v_i), None, length=n)
        return o.astype(q_i.dtype)

    return shard_map(
        per_device, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec, **_SM_UNCHECKED,
    )(q, k, v)
