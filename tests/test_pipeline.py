"""Pipeline parallelism: GPipe schedule == sequential stack, exactly.

The sequential oracle is `lax.scan(block_fn)` over the full depth; the
pipeline must reproduce it (forward AND gradients) under 'stage' and
('data','stage') meshes on the 8-device CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.parallel.pp import (
    make_pipeline_mesh,
    pipeline_apply,
    shard_stacked_params,
    stack_params,
)

DIM = 16
DEPTH = 8


def block_fn(p, h):
    # residual MLP block — shape-preserving, nonlinear, both params used
    return h + jnp.tanh(h @ p["w"] + p["b"])


def make_blocks(key, depth=DEPTH, dim=DIM):
    keys = jax.random.split(key, depth)
    return stack_params([
        {"w": jax.random.normal(k, (dim, dim)) * 0.3,
         "b": jax.random.normal(jax.random.fold_in(k, 1), (dim,)) * 0.1}
        for k in keys
    ])


def sequential(stacked, x):
    return jax.lax.scan(lambda c, p: (block_fn(p, c), None), x, stacked)[0]


@pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 8), (8, 2)])
def test_pipeline_forward_matches_sequential(stages, microbatches):
    key = jax.random.PRNGKey(0)
    stacked = make_blocks(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, DIM))
    want = sequential(stacked, x)

    mesh = make_pipeline_mesh(stages=stages)
    placed = shard_stacked_params(stacked, mesh)
    got = pipeline_apply(block_fn, placed, x, mesh,
                         num_microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_grads_match_sequential():
    stacked = make_blocks(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, DIM))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (8, DIM))

    def seq_loss(params, x):
        return jnp.mean((sequential(params, x) - tgt) ** 2)

    mesh = make_pipeline_mesh(stages=4)

    def pp_loss(params, x):
        y = pipeline_apply(block_fn, params, x, mesh, num_microbatches=4)
        return jnp.mean((y - tgt) ** 2)

    want_gp, want_gx = jax.grad(seq_loss, argnums=(0, 1))(stacked, x)
    placed = shard_stacked_params(stacked, mesh)
    got_gp, got_gx = jax.jit(jax.grad(pp_loss, argnums=(0, 1)))(placed, x)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        got_gp, want_gp)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(want_gx),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_composes_with_data_parallel():
    stacked = make_blocks(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, DIM))
    want = sequential(stacked, x)

    mesh = make_pipeline_mesh(stages=4, data=2)
    placed = shard_stacked_params(stacked, mesh)
    from vqgan_tpu.parallel import shard_batch

    xs = shard_batch(x, mesh)
    got = jax.jit(
        lambda p, x: pipeline_apply(block_fn, p, x, mesh, num_microbatches=2)
    )(placed, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_pytree_carry_with_conditioning():
    # per-example conditioning rides the pipeline alongside the activations
    def blk(p, carry):
        h, c = carry
        return (h + jnp.tanh(h @ p["w"] + c @ p["wc"]), c)

    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    stacked = stack_params([
        {"w": jax.random.normal(k, (DIM, DIM)) * 0.3,
         "wc": jax.random.normal(jax.random.fold_in(k, 1), (4, DIM)) * 0.3}
        for k in keys])
    h = jax.random.normal(jax.random.PRNGKey(1), (8, DIM))
    c = jax.random.normal(jax.random.PRNGKey(2), (8, 4))

    want, _ = jax.lax.scan(lambda cr, p: (blk(p, cr), None), (h, c), stacked)[0]

    mesh = make_pipeline_mesh(stages=4)
    got, got_c = pipeline_apply(blk, shard_stacked_params(stacked, mesh),
                                (h, c), mesh, num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(c),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_rejects_bad_shapes():
    stacked = make_blocks(jax.random.PRNGKey(0), depth=6)
    mesh = make_pipeline_mesh(stages=4)
    x = jnp.zeros((8, DIM))
    with pytest.raises(AssertionError):
        pipeline_apply(block_fn, stacked, x, mesh, num_microbatches=4)
