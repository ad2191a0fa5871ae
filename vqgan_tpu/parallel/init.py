"""Multi-host (multi-process) distributed initialization and data plumbing.

The reference's multi-device story is HuggingFace Accelerate launching one
torch.distributed process per GPU (SURVEY.md §2.8/§5.8). The TPU-native
equivalent is JAX's multi-controller model: one Python process per host,
`jax.distributed.initialize` to form the global runtime, a Mesh spanning
every chip in the slice, and host-local data assembled into global arrays
with `jax.make_array_from_process_local_data`. Collectives then ride ICI
within the slice (DCN across slices) with no further code changes — the
jitted train steps are identical single-host and multi-host.

Mapping (reference → here):
  accelerate launch / torchrun          → initialize_distributed()
  DistributedSampler per-rank shard     → process_local_batch_size + loader
                                          seeded by process_index
  accelerator.prepare(dataloader)       → make_global_array(local_batch, mesh)
  accelerator.is_main_process           → is_main_process()  (mesh.py)
  accelerator.wait_for_everyone         → barrier()
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "process_local_batch_size",
    "make_global_array",
    "barrier",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Any] = None,
) -> int:
    """Initialize the JAX distributed runtime when running multi-process.

    - On TPU pods the arguments are auto-detected from the TPU metadata
      server, so `initialize_distributed()` with no arguments is correct.
    - On CPU/GPU test rigs pass coordinator_address/num_processes/process_id
      explicitly (or export JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
      JAX_PROCESS_ID, which jax.distributed also honors).
    - Single-process runs (no coordinator configured, no TPU pod) are a
      no-op — every code path works unchanged with process_count() == 1.

    Returns the process index. Idempotent: safe to call twice.
    """
    try:  # jax keeps the runtime singleton in the private module
        from jax._src.distributed import global_state as _gs
        already_init = _gs.coordinator_address is not None or (
            _gs.client is not None)
    except Exception:
        already_init = False
    if already_init:
        return jax.process_index()

    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not on_pod:
        return 0  # single-process

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_index()


def process_local_batch_size(global_batch_size: int) -> int:
    """The slice of the global batch this process loads from disk. The
    reference's DistributedSampler semantics: equal contiguous shards."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} must divide over {n} processes")
    return global_batch_size // n


def make_global_array(local_batch: Any, mesh: Mesh,
                      spec: P = P("data")) -> Any:
    """Assemble per-process host batches into global device arrays sharded
    over the mesh's 'data' axis.

    Single-process this is equivalent to `shard_batch` (a device_put);
    multi-process each host contributes only its local shard and the result
    is a global jax.Array addressing the whole slice.
    """

    def put(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec if x.ndim else P())
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_batch)


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (the reference's
    `accelerator.wait_for_everyone`, train_latent_cfg.py:618). Implemented
    as a tiny global psum so it works on any backend."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
