"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's HuggingFace-Accelerate DDP
substrate (SURVEY.md §2.8): instead of NCCL all-reduce wrapped around torch
modules, we build a `jax.sharding.Mesh`, shard the batch on the 'data' axis,
replicate parameters, and let pjit/XLA insert the grad-reduction collectives
over ICI.

The mesh carries a 'model' axis from day one so tensor-parallel shardings can
be layered on without re-plumbing (unused = size 1).

Reference-concept mapping (SURVEY.md §5.8):
  accelerator.prepare(...)       → jit(in_shardings=...) + device_put
  accelerator.backward all-reduce→ implicit psum from sharded batch grads
  is_main_process                → jax.process_index() == 0
  wait_for_everyone              → blocking on collective results
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "is_main_process",
]


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on the data
    axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (
        f"mesh {data}x{model} does not cover {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def make_mesh_for_batch(batch_size: int, model: int = 1,
                        devices=None) -> Mesh:
    """Mesh whose 'data' axis is the largest device count that divides the
    global batch (a 4-sample batch can't shard over 8 devices)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices) // model
    data = 1
    for d in range(n, 0, -1):
        if batch_size % d == 0:
            data = d
            break
    return make_mesh(data=data, model=model, devices=devices[: data * model])


def data_sharding(mesh: Mesh, ndim: Optional[int] = None) -> NamedSharding:
    """Shard leading (batch) dim over 'data', replicate the rest. When
    `ndim` is given the PartitionSpec is written out to full rank — some
    call sites (e.g. `jit` in_shardings on rank-polymorphic helpers) want
    the explicit form."""
    if ndim is None:
        return NamedSharding(mesh, P("data"))
    assert ndim >= 1, "batch sharding needs at least a batch dimension"
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch with its leading axis sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params, optimizer state) over the mesh.

    Multi-process: every process must hold the same host values (true for
    seeded init / restored checkpoints); each contributes its addressable
    shards of the global array."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree.map(put, tree)


def is_main_process() -> bool:
    return jax.process_index() == 0
