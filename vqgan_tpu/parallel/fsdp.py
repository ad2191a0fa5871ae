"""Fully-sharded data parallelism (ZeRO-3 style) over the 'data' mesh axis.

The reference replicates every parameter on every GPU and all-reduces grads
(HF Accelerate DDP, SURVEY.md §2.8) — per-device memory is O(model size)
regardless of fleet size. This module shards each parameter (and therefore
its Adam moments and EMA copy, which inherit placement from `tx.init` /
`tree.map(copy)`) across the 'data' axis instead, so per-device param+state
memory falls ~linearly with the data-parallel degree:

- storage: each large param gets ONE axis sharded over 'data' (the largest
  axis that divides, preferring the trailing/feature dims where flax puts
  output features);
- compute: XLA/GSPMD all-gathers a param just before use in the forward,
  reduce-scatters its gradient in the backward, and applies the optimizer
  update shard-locally — the scaling-book FSDP recipe, derived entirely
  from the placement of the inputs; no hand-written collectives;
- composition: orthogonal to tensor parallelism (tp.py shards attention
  kernels over 'model'); a param can be TP-sharded on one axis and
  FSDP-sharded on another via `compose_fsdp_with_tp`.

Small params (biases, norm scales, time-embedding tables) stay replicated —
gathering them costs more latency than their memory is worth; the
`min_size` threshold controls the cutoff.

Usage:
    mesh = make_mesh(data=8)
    params = apply_fsdp_sharding(params, mesh)  # batch sharded as usual
    state = LDMTrainState(params=params, opt_state=tx.init(params), ...)
    state, log = jit_step(state, batch, ...)    # XLA inserts the collectives
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "fsdp_spec_for",
    "apply_fsdp_sharding",
    "compose_fsdp_with_tp",
    "pin_state_shardings",
]


def pin_state_shardings(step_fn, placed_state):
    """Wrap a `(state, *args) -> (new_state, aux)` step so the updated
    state keeps the input placement. Needed for the 'zero1' layout: without
    the constraint GSPMD propagates the sharded Adam-moment layout onto the
    updated params (drifting zero1 into zero3 after one step); with it the
    params stay replicated and only the optimizer state lives sharded."""
    import jax as _jax

    shardings = _jax.tree.map(lambda l: l.sharding, placed_state)

    @_jax.jit
    def wrapped(state, *args):
        new_state, aux = step_fn(state, *args)
        new_state = _jax.tree.map(
            _jax.lax.with_sharding_constraint, new_state, shardings)
        return new_state, aux

    return wrapped

_DEFAULT_MIN_SIZE = 2 ** 14  # 16k elements ≈ 64 KiB fp32


def fsdp_spec_for(leaf, mesh: Mesh, axis: str = "data",
                  min_size: int = _DEFAULT_MIN_SIZE,
                  taken: Optional[tuple] = None) -> P:
    """PartitionSpec sharding ONE axis of `leaf` over the mesh `axis`.

    Picks the largest dimension divisible by the axis size, preferring later
    (feature) dims on ties — conv kernels [kh, kw, cin, cout] shard over
    cout, dense kernels [cin, cout] over cout. Dims listed in `taken`
    (already claimed, e.g. by TP) are skipped. Returns P() (replicated) for
    small or indivisible leaves.
    """
    n = mesh.shape[axis]
    if leaf.ndim == 0 or leaf.size < min_size or n == 1:
        return P()
    taken = taken or ()
    best = None
    for d in range(leaf.ndim):
        if d in taken:
            continue
        if leaf.shape[d] % n == 0:
            if best is None or leaf.shape[d] >= leaf.shape[best]:
                best = d  # >= prefers the later dim on ties
    if best is None:
        return P()
    return P(*[axis if i == best else None for i in range(leaf.ndim)])


def apply_fsdp_sharding(params: Any, mesh: Mesh, axis: str = "data",
                        min_size: int = _DEFAULT_MIN_SIZE) -> Any:
    """Place params with one axis sharded over `axis` (ZeRO-3 storage)."""

    def place(leaf):
        spec = fsdp_spec_for(leaf, mesh, axis, min_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def sharding_spec_for(path, leaf, mesh: Mesh, mode: str,
                      min_size: int = _DEFAULT_MIN_SIZE) -> P:
    """Unified spec rule for a state leaf under a parameter-sharding policy.

    mode: 'replicated' | 'fsdp' | 'tp' | 'fsdp_tp'. Path-based TP rules
    apply equally to optimizer moments and EMA copies because optax/EMA
    trees mirror the param tree (the kernel names appear in their paths).
    """
    from .tp import tp_spec_for_path

    spec = tp_spec_for_path(path, leaf) if "tp" in mode else P()
    if "fsdp" not in mode:
        return spec
    taken = tuple(i for i, s in enumerate(spec) if s is not None)
    fs = fsdp_spec_for(leaf, mesh, "data", min_size, taken=taken)
    merged = [
        tp if tp is not None else f
        for tp, f in zip(
            tuple(spec) + (None,) * (leaf.ndim - len(spec)),
            tuple(fs) + (None,) * (leaf.ndim - len(fs)),
        )
    ]
    return P(*merged)


def compose_fsdp_with_tp(params: Any, mesh: Mesh,
                         min_size: int = _DEFAULT_MIN_SIZE) -> Any:
    """TP shardings on attention kernels (over 'model') PLUS FSDP sharding
    of a remaining axis (over 'data') — 2D parameter sharding."""

    def place(path, leaf):
        spec = sharding_spec_for(path, leaf, mesh, "fsdp_tp", min_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def place_state(state: Any, mesh: Mesh, mode: str,
                min_size: int = _DEFAULT_MIN_SIZE) -> Any:
    """Place a whole train state (params + optimizer moments + EMA +
    scalars) under a parameter-sharding policy. Scalars and small leaves
    replicate; everything else follows `sharding_spec_for`.

    mode additionally accepts 'zero1': params stay REPLICATED (no
    all-gather in the forward, unlike ZeRO-3) while the Adam moments and
    the EMA copy shard over 'data' — the ZeRO-1 optimizer-state partition,
    cutting state memory ~2/3 at zero forward-path communication cost.

    Multi-process: every process must hold the same host values (seeded
    init / restored checkpoint); each contributes its addressable shards
    through make_array_from_callback, so the same call works on a mesh
    spanning several hosts."""
    import numpy as np

    multiproc = jax.process_count() > 1

    def place(path, leaf):
        import jax.numpy as jnp

        leaf = jnp.asarray(leaf) if not hasattr(leaf, "ndim") else leaf
        leaf_mode = mode
        if mode == "zero1":
            names = [str(getattr(p, "name", getattr(p, "key", "")))
                     for p in path]
            in_opt = any(n in ("opt_state", "ema_params") for n in names)
            leaf_mode = "fsdp" if in_opt else "replicated"
        spec = sharding_spec_for(path, leaf, mesh, leaf_mode, min_size)
        sharding = NamedSharding(mesh, spec)
        if not multiproc:
            return jax.device_put(leaf, sharding)
        x = np.asarray(leaf)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map_with_path(place, state)
