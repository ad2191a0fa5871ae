"""Tensor-parallel sharding: a (data=4, model=2) mesh forward must equal the
replicated single-device forward, with attention kernels actually
distributed over the model axis."""

import jax
import jax.numpy as jnp
import numpy as np

from vqgan_tpu.models import CFGUnet
from vqgan_tpu.parallel import make_mesh, replicate, shard_batch
from vqgan_tpu.parallel.tp import apply_tp_sharding, tp_spec_for_path


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
