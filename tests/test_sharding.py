"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vqgan_tpu.diffusion import GaussianDiffusion
from vqgan_tpu.models import CFGUnet
from vqgan_tpu.parallel import make_mesh, replicate, shard_batch
from vqgan_tpu.training import (
    LDMTrainState,
    make_ldm_optimizer,
    make_ldm_train_step,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        make_mesh(data=3, model=2)


def test_sharded_ldm_train_step_matches_single_device():
    """The DP train step over the 8-device mesh must be numerically identical
    to the single-device step (same global batch, same rng)."""
    model = CFGUnet(dim=8, num_classes=4, dim_mults=(1, 2), channels=4,
                    attn_heads=1, attn_dim_head=8)
    x0 = jnp.zeros((8, 8, 8, 4))
    params = model.init({"params": jax.random.PRNGKey(0)}, x0,
                        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32),
                        cond_drop_mask=jnp.zeros((8,), bool))

    def model_apply(p, x, t, classes, cond_drop_mask=None,
                    cond_drop_prob=None, rng=None, return_features=False):
        rngs = {"cond_drop": rng} if rng is not None else None
        return model.apply(p, x, t, classes, cond_drop_mask=cond_drop_mask,
                           cond_drop_prob=cond_drop_prob, rngs=rngs,
                           return_features=return_features)

    diffusion = GaussianDiffusion(
        model_apply, image_size=8, channels=4, timesteps=20,
        objective="pred_v", auto_normalize=False)
    tx = make_ldm_optimizer(learning_rate=1e-3)
    step_fn = make_ldm_train_step(diffusion, tx, donate=False)

    latents = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 4))
    classes = jnp.arange(8) % 4
    rng = jax.random.PRNGKey(42)

    def init_state():
        return LDMTrainState(
            step=jnp.asarray(0), params=jax.tree.map(jnp.copy, params),
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params))

    # single device
    s1, log1 = step_fn(init_state(), latents, classes, rng)

    # 8-device mesh: replicated state, batch sharded on 'data'
    mesh = make_mesh()
    state_r = replicate(init_state(), mesh)
    batch_s = shard_batch({"latents": latents, "classes": classes}, mesh)
    s8, log8 = step_fn(state_r, batch_s["latents"], batch_s["classes"], rng)

    np.testing.assert_allclose(
        float(log1["loss"]), float(log8["loss"]), rtol=1e-5)
    # parameters after the step agree
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5)
    # and the sharded step really ran distributed
    some_leaf = jax.tree.leaves(s8.params)[0]
    assert len(some_leaf.sharding.device_set) == 8


def test_sampling_under_mesh():
    """CFG DDIM sampling with the batch sharded across devices."""
    model = CFGUnet(dim=8, num_classes=4, dim_mults=(1, 2), channels=2,
                    attn_heads=1, attn_dim_head=8)
    x0 = jnp.zeros((8, 8, 8, 2))
    params = model.init({"params": jax.random.PRNGKey(0)}, x0,
                        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32),
                        cond_drop_mask=jnp.zeros((8,), bool))

    def model_apply(p, x, t, classes, cond_drop_mask=None, **kw):
        return model.apply(p, x, t, classes, cond_drop_mask=cond_drop_mask)

    diffusion = GaussianDiffusion(
        model_apply, image_size=8, channels=2, timesteps=20,
        sampling_timesteps=4, objective="pred_noise", auto_normalize=False)

    mesh = make_mesh()
    params_r = replicate(params, mesh)
    classes = shard_batch(jnp.arange(8) % 4, mesh)
    out = jax.jit(
        lambda p, k, c: diffusion.sample(p, k, classes=c, cond_scale=2.0)
    )(params_r, jax.random.PRNGKey(3), classes)
    assert out.shape == (8, 8, 8, 2)
    assert bool(jnp.isfinite(out).all())
