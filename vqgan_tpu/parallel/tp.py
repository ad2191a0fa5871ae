"""Tensor-parallel sharding rules over the mesh's 'model' axis.

The reference scales by data parallelism only (SURVEY.md §2.8); this module
layers Megatron-style tensor parallelism on top for the attention/MLP-heavy
parts of the U-Nets: qkv projections are sharded column-wise (heads split
across 'model'), output projections row-wise, so each attention block runs
head-parallel with one all-reduce at its output — inserted automatically by
XLA from the param shardings (no hand-written collectives).

Usage:
    mesh = make_mesh(data=4, model=2)
    params = apply_tp_sharding(params, mesh)   # batch sharding as usual
    out = jit(model.apply)(params, ...)        # XLA lowers the collectives
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_spec_for_path", "apply_tp_sharding"]

# column-parallel: output features split over 'model'
_COL_KEYS = ("to_qkv", "to_q", "to_k", "to_v")
# row-parallel: input features split over 'model' (the all-reduce point)
_ROW_KEYS = ("to_out",)


def tp_spec_for_path(path, leaf) -> P:
    names = [str(getattr(p, "key", "")) for p in path]
    joined = "/".join(names)
    is_kernel = names and names[-1] == "kernel"
    if is_kernel and leaf.ndim >= 2:
        if any(k in joined for k in _COL_KEYS):
            return P(*([None] * (leaf.ndim - 1) + ["model"]))
        if any(k in joined for k in _ROW_KEYS):
            return P(*([None] * (leaf.ndim - 2) + ["model", None]))
    return P()  # replicated


def apply_tp_sharding(params: Any, mesh: Mesh) -> Any:
    """Place params with TP shardings (everything else replicated)."""

    def place(path, leaf):
        spec = tp_spec_for_path(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
