"""device_prefetch: order preservation, eager lookahead, clean exhaustion."""

import jax.numpy as jnp
import numpy as np

from vqgan_tpu.data.prefetch import device_prefetch


def test_prefetch_preserves_order_and_values():
    batches = [np.full((2, 3), i, np.float32) for i in range(5)]
    out = list(device_prefetch(batches, jnp.asarray, depth=2))
    assert len(out) == 5
    for i, (host, dev) in enumerate(out):
        assert host is batches[i]
        np.testing.assert_array_equal(np.asarray(dev), batches[i])


def test_prefetch_runs_ahead_of_consumption():
    put_calls = []

    def put(b):
        put_calls.append(b)
        return b

    gen = device_prefetch(iter(range(10)), put, depth=3)
    first = next(gen)
    assert first == (0, 0)
    # the transfer for item 0 was issued alongside items 1 and 2 — the
    # consumer received 0 while 2 more batches are already in flight
    assert put_calls == [0, 1, 2]
    assert next(gen) == (1, 1)
    assert put_calls == [0, 1, 2, 3]


def test_prefetch_short_iterator_and_depth_one():
    assert list(device_prefetch([], jnp.asarray)) == []
    out = list(device_prefetch([np.ones(2)], jnp.asarray, depth=4))
    assert len(out) == 1
    out = list(device_prefetch([1, 2, 3], lambda x: x * 10, depth=1))
    assert out == [(1, 10), (2, 20), (3, 30)]
