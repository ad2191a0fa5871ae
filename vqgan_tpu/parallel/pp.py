"""Pipeline parallelism (GPipe-style) over a 'stage' mesh axis.

The reference has no model parallelism at all (single-GPU, SURVEY.md §2.8);
DP/TP/FSDP here cover its scaling story and beyond. This module adds the
fourth classic axis — pipeline parallelism — as a substrate for DEEP UNIFORM
stacks (DiT-scale transformer denoisers, stacked MP-transformer blocks),
where a depth-L stack of identical blocks is split into S contiguous stages,
one stage per device along the mesh's 'stage' axis, and microbatches stream
through the classic GPipe schedule.

TPU-native design (the scaling-book pipelining recipe):
- params are STACKED on a leading depth axis ([L, ...] per leaf) and sharded
  over 'stage' — each device holds its L/S blocks; inside the stage the
  blocks run as one `lax.scan` (one compiled block body, MXU-friendly).
- the schedule is a single `lax.scan` over M + S - 1 ticks; activations hop
  stage→stage with `lax.ppermute` over ICI. No host involvement: the whole
  pipeline (all ticks, all collectives) is ONE XLA program.
- bubble fraction is the textbook (S-1)/(M+S-1) — pick M ≥ 4·S to amortize.
- composes with data parallelism: run under a ('data','stage') mesh; the
  batch dim shards over 'data', each data-replica pipelines over 'stage'.
- fully differentiable: `jax.grad` through the scan + ppermute gives exact
  gradients (ppermute transposes to the reverse permutation), so the same
  function serves training; see tests/test_pipeline.py for the
  grad-equality proof against the sequential stack.

Usage:
    mesh = make_pipeline_mesh(stages=4)            # or make_mesh + 'stage'
    stacked = stack_params([p0, p1, ..., p7])      # L=8 blocks
    stacked = shard_stacked_params(stacked, mesh)  # [L,...] over 'stage'
    y = pipeline_apply(block_fn, stacked, x, mesh, num_microbatches=8)

`block_fn(params_i, h) -> h` must be shape-preserving (uniform stack).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level API
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

import inspect

# the manual-psum opt-out was renamed check_rep -> check_vma in jax 0.8
_SM_UNCHECKED = {
    ("check_vma" if "check_vma" in inspect.signature(shard_map).parameters
     else "check_rep"): False}

__all__ = [
    "make_pipeline_mesh",
    "stack_params",
    "shard_stacked_params",
    "pipeline_apply",
]


def make_pipeline_mesh(stages: int, data: int = 1,
                       devices: Optional[Sequence] = None) -> Mesh:
    """('data','stage') mesh: batch shards over 'data', the block stack over
    'stage'."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * stages
    assert len(devices) >= need, (
        f"need {need} devices for data={data} x stages={stages}, "
        f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, stages)
    return Mesh(arr, ("data", "stage"))


def stack_params(param_trees: Sequence[Any]) -> Any:
    """Stack L per-block param trees into one tree of [L, ...] leaves."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_trees)


def shard_stacked_params(stacked: Any, mesh: Mesh, axis: str = "stage") -> Any:
    """Place stacked params with the depth axis sharded over `axis`."""

    def place(leaf):
        spec = P(axis, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, stacked)


def pipeline_apply(
    block_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    x: Any,
    mesh: Mesh,
    *,
    num_microbatches: int,
    axis: str = "stage",
    data_axis: Optional[str] = "data",
) -> Any:
    """Run the depth-L uniform stack over x with an S-stage GPipe pipeline.

    x: a [B, ...] array or a pytree of them (every leaf batch-leading; e.g.
    `(tokens, cond)` so per-example conditioning rides the pipeline with the
    activations). `block_fn(params_i, x) -> x` must preserve the tree
    structure and shapes (uniform stack). The batch dim shards over
    `data_axis` when that axis is in the mesh and larger than 1; the result
    has x's structure and sharding. Equals `scan(block_fn)` over all L
    blocks exactly (same math, same order) — tests/test_pipeline.py.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    depth_leaf = jax.tree.leaves(stacked_params)[0]
    L = depth_leaf.shape[0]
    assert L % S == 0, f"depth {L} must divide over {S} stages"
    dp = (mesh.shape[data_axis]
          if data_axis is not None and data_axis in mesh.shape else 1)
    data_axis = data_axis if dp > 1 else None
    B = jax.tree.leaves(x)[0].shape[0]
    assert B % (M * dp) == 0, (
        f"batch {B} must divide into {M} microbatches x {dp} data shards")

    param_spec = jax.tree.map(
        lambda l: P(axis, *([None] * (l.ndim - 1))), stacked_params)
    x_spec = jax.tree.map(
        lambda l: P(data_axis, *([None] * (l.ndim - 1))), x)

    def per_device(params_local, x_local):
        # params_local leaves: [L/S, ...]; x_local leaves: [B/dp, ...]
        idx = lax.axis_index(axis)
        mb = jax.tree.map(
            lambda l: l.reshape((M, l.shape[0] // M) + l.shape[1:]), x_local)

        def stage_body(h):
            return lax.scan(lambda c, p: (block_fn(p, c), None),
                            h, params_local)[0]

        fwd_perm = [(i, i + 1) for i in range(S - 1)]
        # bubble ticks feed a COPY of the first microbatch (not zeros):
        # the outputs are discarded either way, but real data keeps every
        # intermediate finite — a block whose backward multiplies cotangents
        # by data-dependent factors (e.g. an unguarded 1/norm) would
        # otherwise accumulate 0*inf = NaN into the shared parameter
        # gradients through the tick scan
        ticks = jax.tree.map(
            lambda l: jnp.concatenate(
                [l, jnp.broadcast_to(l[:1], (S - 1,) + l.shape[1:])], axis=0),
            mb)  # [M+S-1, mb, ...]

        def tick(recv, mb_t):
            # stage 0 pulls the next microbatch; later stages consume the
            # activation ppermuted from their predecessor last tick
            inp = jax.tree.map(
                lambda m, r: jnp.where(idx == 0, m, r), mb_t, recv)
            out = stage_body(inp)
            nxt = (jax.tree.map(lambda o: lax.ppermute(o, axis, fwd_perm),
                                out) if S > 1
                   else jax.tree.map(jnp.zeros_like, out))
            return nxt, out

        # initial recv carry: first microbatch again (same finiteness
        # argument as the bubble ticks — stages >0 consume it in tick 0
        # and discard the result)
        warm0 = jax.tree.map(lambda l: l[0], mb)
        _, outs = lax.scan(tick, warm0, ticks)
        # last stage's outputs for ticks [S-1, S-1+M) are the results;
        # psum over 'stage' (zeros elsewhere) replicates them to all stages
        valid = jax.tree.map(
            lambda o, xl: o[S - 1:S - 1 + M].reshape(xl.shape),
            outs, x_local)
        valid = jax.tree.map(
            lambda v: jnp.where(idx == S - 1, v, jnp.zeros_like(v)), valid)
        if S > 1:
            valid = jax.tree.map(lambda v: lax.psum(v, axis), valid)
        return valid

    return shard_map(
        per_device, mesh=mesh,
        in_specs=(param_spec, x_spec), out_specs=x_spec,
        **_SM_UNCHECKED,
    )(stacked_params, x)
