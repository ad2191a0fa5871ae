"""Tensor-parallel sharding: a (data=4, model=2) mesh forward AND full
training step must equal the replicated run, with attention kernels actually
distributed over the model axis."""

import jax
import jax.numpy as jnp
import numpy as np

from vqgan_tpu.diffusion import GaussianDiffusion
from vqgan_tpu.models import CFGUnet
from vqgan_tpu.parallel import make_mesh, replicate, shard_batch
from vqgan_tpu.parallel.tp import apply_tp_sharding, tp_spec_for_path
from vqgan_tpu.training import (
    LDMTrainState,
    make_ldm_optimizer,
    make_ldm_train_step,
)


def test_tp_specs_target_attention_kernels():
    import jax.tree_util as jtu

    model = CFGUnet(dim=16, num_classes=4, dim_mults=(1, 2), channels=4,
                    attn_heads=2, attn_dim_head=8)
    x = jnp.zeros((2, 8, 8, 4))
    params = model.init({"params": jax.random.PRNGKey(0)}, x,
                        jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
                        cond_drop_mask=jnp.zeros((2,), bool))
    specs = jtu.tree_map_with_path(tp_spec_for_path, params)
    flat = jtu.tree_leaves_with_path(specs)
    sharded = ["/".join(str(k.key) for k in p) for p, s in flat
               if s != jax.sharding.PartitionSpec()]
    assert any("to_qkv" in s for s in sharded)
    assert any("to_out" in s for s in sharded)
    assert all(("to_" in s) for s in sharded)  # nothing else touched


def test_tp_forward_matches_replicated():
    model = CFGUnet(dim=16, num_classes=4, dim_mults=(1, 2), channels=4,
                    attn_heads=2, attn_dim_head=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    t = jnp.array([1, 5, 9, 3])
    c = jnp.array([0, 1, 2, 3])
    mask = jnp.zeros((4,), bool)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t, c,
                        cond_drop_mask=mask)

    ref = model.apply(params, x, t, c, cond_drop_mask=mask)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        params_tp = apply_tp_sharding(params, mesh)
        x_s = shard_batch(x, mesh)
        out = jax.jit(
            lambda p, x, t, c, m: model.apply(p, x, t, c, cond_drop_mask=m)
        )(params_tp, x_s, t, c, mask)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # attention kernels really live on 2 model shards x 4 data replicas
    import jax.tree_util as jtu

    qkv_leaves = [
        leaf for path, leaf in jtu.tree_leaves_with_path(params_tp)
        if "to_qkv" in "/".join(str(k.key) for k in path)
    ]
    assert qkv_leaves
    for leaf in qkv_leaves:
        assert len(leaf.sharding.device_set) == 8
        assert "model" in str(leaf.sharding.spec)


def test_tp_covers_dit_blocks():
    """The path rules (to_qkv column / to_out row) hit DiT's attention by
    naming: TP-sharded DiT forward equals replicated."""
    from vqgan_tpu.models import DiT

    model = DiT(dim=32, depth=2, heads=2, dim_head=8, patch_size=2,
                image_size=8, channels=4, num_classes=4, cond_drop_prob=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    t = jnp.array([1, 5, 9, 3])
    c = jnp.array([0, 1, 2, 3])
    mask = jnp.zeros((4,), bool)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t, c,
                        cond_drop_mask=mask)
    # perturb the zero-init heads so the output is non-trivial
    params = jax.tree.map(lambda l: l + 0.03 * jnp.ones_like(l), params)
    ref = model.apply(params, x, t, c, cond_drop_mask=mask)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        params_tp = apply_tp_sharding(params, mesh)
        out = jax.jit(
            lambda p, x, t, c, m: model.apply(p, x, t, c, cond_drop_mask=m)
        )(params_tp, shard_batch(x, mesh), t, c, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    import jax.tree_util as jtu

    qkv = [leaf for path, leaf in jtu.tree_leaves_with_path(params_tp)
           if "to_qkv" in "/".join(str(k.key) for k in path)]
    assert len(qkv) == 2  # one per block
    for leaf in qkv:
        assert "model" in str(leaf.sharding.spec)


def test_tp_covers_karras_unet():
    """Karras MP attention also names its kernels to_qkv/to_out; TP must be
    exact there too — the interesting interaction is the per-forward forced
    weight normalization over a sharded kernel axis (GSPMD has to treat the
    norm as a global reduction over the 'model'-sharded dim)."""
    from vqgan_tpu.models.karras_unet import KarrasUnet

    model = KarrasUnet(image_size=16, dim=16, dim_max=32, num_classes=4,
                       channels=3, num_downsamples=1,
                       num_blocks_per_stage=1, attn_res=(8,),
                       attn_dim_head=8, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    t = jnp.ones((4,)) * 0.5
    c = jnp.array([0, 1, 2, 3])
    params = model.init(jax.random.PRNGKey(0), x, t, class_labels=c)
    ref = model.apply(params, x, t, class_labels=c)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        params_tp = apply_tp_sharding(params, mesh)
        out = jax.jit(
            lambda p, x, t, c: model.apply(p, x, t, class_labels=c)
        )(params_tp, shard_batch(x, mesh), t, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tp_training_step_matches_replicated():
    """VERDICT r1 item 10: the FULL LDM train step (grads, Adam update, EMA)
    under a (data=4, model=2) mesh with TP-sharded attention kernels must
    match the replicated single-device step, and the updated params must
    keep their TP shardings (no silent gather-to-replicated)."""
    model = CFGUnet(dim=16, num_classes=4, dim_mults=(1, 2), channels=4,
                    attn_heads=2, attn_dim_head=8)
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

    def init_state(p):
        return LDMTrainState(
            step=jnp.asarray(0), params=p, opt_state=tx.init(p),
            ema_params=jax.tree.map(jnp.copy, p))

    # replicated single-device reference, two steps
    s_ref = init_state(jax.tree.map(jnp.copy, params))
    for _ in range(2):
        s_ref, log_ref = step_fn(s_ref, latents, classes, rng)

    # DP x TP: params TP-sharded (opt state + EMA inherit via tx.init /
    # copy of the placed params), batch sharded over 'data'
    mesh = make_mesh(data=4, model=2)
    with mesh:
        params_tp = apply_tp_sharding(params, mesh)
        s_tp = init_state(params_tp)
        batch = shard_batch({"latents": latents, "classes": classes}, mesh)
        for _ in range(2):
            s_tp, log_tp = step_fn(s_tp, batch["latents"], batch["classes"],
                                   rng)

    np.testing.assert_allclose(float(log_tp["loss"]), float(log_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        float(log_tp["grad_norm"]), float(log_ref["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree.leaves(s_ref.ema_params),
                    jax.tree.leaves(s_tp.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # updated params preserved their TP placement (grads/Adam moments
    # stayed model-sharded; XLA did not fall back to replication)
    import jax.tree_util as jtu

    qkv = [leaf for path, leaf in jtu.tree_leaves_with_path(s_tp.params)
           if "to_qkv" in "/".join(str(k.key) for k in path)]
    assert qkv
    for leaf in qkv:
        assert "model" in str(leaf.sharding.spec), leaf.sharding
