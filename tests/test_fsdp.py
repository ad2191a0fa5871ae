"""FSDP (ZeRO-3 param sharding over 'data'): the full LDM train step with
sharded params + Adam state + EMA must equal the replicated run, per-device
param memory must actually shrink, and FSDP must compose with TP."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vqgan_tpu.diffusion import GaussianDiffusion
from vqgan_tpu.models import CFGUnet
from vqgan_tpu.parallel import (
    apply_fsdp_sharding,
    compose_fsdp_with_tp,
    fsdp_spec_for,
    make_mesh,
    shard_batch,
)
from vqgan_tpu.training import (
    LDMTrainState,
    make_ldm_optimizer,
    make_ldm_train_step,
)


def _model_and_params():
    model = CFGUnet(dim=16, num_classes=4, dim_mults=(1, 2), channels=4,
                    attn_heads=2, attn_dim_head=8)
    x0 = jnp.zeros((8, 8, 8, 4))
    params = model.init({"params": jax.random.PRNGKey(0)}, x0,
                        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32),
                        cond_drop_mask=jnp.zeros((8,), bool))
    return model, params


def test_fsdp_spec_picks_divisible_axis():
    mesh = make_mesh(data=8)
    conv = jnp.zeros((3, 3, 64, 128))
    assert fsdp_spec_for(conv, mesh, min_size=1) == P(None, None, None, "data")
    dense = jnp.zeros((48, 130))  # 130 % 8 != 0 -> falls back to dim 0
    assert fsdp_spec_for(dense, mesh, min_size=1) == P("data", None)
    bias = jnp.zeros((128,))
    assert fsdp_spec_for(bias, mesh) == P()  # under min_size: replicated
    odd = jnp.zeros((33, 65))  # nothing divides -> replicated
    assert fsdp_spec_for(odd, mesh, min_size=1) == P()


def test_fsdp_shards_reduce_per_device_bytes():
    mesh = make_mesh(data=8)
    _, params = _model_and_params()
    placed = apply_fsdp_sharding(params, mesh, min_size=2 ** 10)

    total = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    dev0 = jax.devices()[0]
    per_dev = 0
    any_sharded = False
    for leaf in jax.tree.leaves(placed):
        for shard in leaf.addressable_shards:
            if shard.device == dev0:
                per_dev += shard.data.size * shard.data.dtype.itemsize
        if leaf.sharding.spec != P() and not all(
                s is None for s in leaf.sharding.spec):
            any_sharded = True
    assert any_sharded
    # large params dominate this model; expect well under half the bytes
    assert per_dev < 0.5 * total, (per_dev, total)


def test_fsdp_training_step_matches_replicated():
    """Full LDM train step (grads, Adam update, EMA) with FSDP-sharded
    params over data=8 equals the single-device replicated step, and the
    updated params keep their shardings (no silent replication)."""
    model, params = _model_and_params()

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

    def init_state(p):
        return LDMTrainState(
            step=jnp.asarray(0), params=p, opt_state=tx.init(p),
            ema_params=jax.tree.map(jnp.copy, p))

    s_ref = init_state(jax.tree.map(jnp.copy, params))
    for _ in range(2):
        s_ref, log_ref = step_fn(s_ref, latents, classes, rng)

    mesh = make_mesh(data=8)
    with mesh:
        params_fs = apply_fsdp_sharding(params, mesh, min_size=2 ** 10)
        s_fs = init_state(params_fs)
        batch = shard_batch({"latents": latents, "classes": classes}, mesh)
        for _ in range(2):
            s_fs, log_fs = step_fn(s_fs, batch["latents"], batch["classes"],
                                   rng)

    np.testing.assert_allclose(float(log_fs["loss"]), float(log_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        float(log_fs["grad_norm"]), float(log_ref["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_fs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree.leaves(s_ref.ema_params),
                    jax.tree.leaves(s_fs.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # updated params must still be distributed
    specs = [leaf.sharding.spec for leaf in jax.tree.leaves(s_fs.params)]
    assert any(any(s is not None for s in spec) for spec in specs)


def test_fsdp_composes_with_tp():
    """2D sharding: attention kernels split over 'model' (TP) AND another
    axis over 'data' (FSDP); forward matches the replicated model."""
    import jax.tree_util as jtu

    model, params = _model_and_params()
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 4))
    t = jnp.zeros((8,), jnp.int32)
    classes = jnp.arange(8) % 4
    mask = jnp.zeros((8,), bool)

    out_ref = model.apply(params, x, t, classes, cond_drop_mask=mask)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        placed = compose_fsdp_with_tp(params, mesh, min_size=2 ** 10)
        out = jax.jit(
            lambda p, x: model.apply(p, x, t, classes, cond_drop_mask=mask)
        )(placed, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=3e-5)

    # at least one kernel should be 2D-sharded (both axes named)
    two_d = [
        "/".join(str(k.key) for k in path)
        for path, leaf in jtu.tree_leaves_with_path(placed)
        if sum(s is not None for s in leaf.sharding.spec) >= 2
    ]
    assert two_d, "expected at least one (model, data) 2D-sharded kernel"


def test_zero1_shards_only_optimizer_state():
    """param_sharding='zero1': params replicated (no forward all-gather),
    Adam moments + EMA sharded over 'data'; step equals the replicated run."""
    from vqgan_tpu.parallel.fsdp import place_state

    model, params = _model_and_params()

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

    def init_state(p):
        return LDMTrainState(
            step=jnp.asarray(0), params=p, opt_state=tx.init(p),
            ema_params=jax.tree.map(jnp.copy, p))

    s_ref = init_state(jax.tree.map(jnp.copy, params))
    for _ in range(2):
        s_ref, log_ref = step_fn(s_ref, latents, classes, rng)

    from vqgan_tpu.parallel.fsdp import pin_state_shardings

    mesh = make_mesh(data=8)
    with mesh:
        s_z1 = place_state(init_state(params), mesh, "zero1",
                           min_size=2 ** 10)
        pinned = pin_state_shardings(step_fn, s_z1)
        batch = shard_batch({"latents": latents, "classes": classes}, mesh)
        for _ in range(2):
            s_z1, log_z1 = pinned(s_z1, batch["latents"], batch["classes"],
                                  rng)

    np.testing.assert_allclose(float(log_z1["loss"]), float(log_ref["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_z1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # placement contract: every param replicated, some EMA leaves sharded
    for leaf in jax.tree.leaves(s_z1.params):
        assert all(s is None for s in leaf.sharding.spec), leaf.sharding
    ema_specs = [leaf.sharding.spec
                 for leaf in jax.tree.leaves(s_z1.ema_params)]
    assert any(any(s is not None for s in spec) for spec in ema_specs)
    opt_specs = [leaf.sharding.spec
                 for leaf in jax.tree.leaves(s_z1.opt_state)
                 if hasattr(leaf, "sharding")]
    assert any(any(s is not None for s in spec) for spec in opt_specs)
