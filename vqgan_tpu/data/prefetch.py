"""Device input prefetching: overlap host→device transfer with compute.

`jax.device_put` only ENQUEUES a copy, so issuing the next batch's transfer
while the current step executes hides the H2D latency entirely — the
standard TPU input-pipeline discipline (the reference's torch loaders rely
on pin_memory/non_blocking for the same effect). The prefetcher keeps
`depth` batches resident ahead of consumption; at the trainers' batch
sizes that is a few MB of HBM.

Yields (host_item, device_item) pairs: trainers feed the device version to
the jitted step and keep the host version for host-side uses (recon grids,
revival pools) without a device→host round trip.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Iterable, Iterator, Tuple

__all__ = ["device_prefetch"]


def device_prefetch(iterator: Iterable, put: Callable[[Any], Any],
                    depth: int = 2) -> Iterator[Tuple[Any, Any]]:
    """Wrap a host batch iterator so transfers run `depth` batches ahead.

    put: host batch → device arrays (e.g. `lambda b: shard_batch(b, mesh)`
    or `jnp.asarray`); called eagerly on up to `depth` batches before the
    consumer asks for them.
    """
    assert depth >= 1
    it = iter(iterator)
    q: deque = deque()
    exhausted = False
    while True:
        while not exhausted and len(q) < depth:
            try:
                item = next(it)
            except StopIteration:
                exhausted = True
                break
            q.append((item, put(item)))
        if not q:
            return
        yield q.popleft()
