"""Dead-code revival: the codebook-health intervention (beyond reference).

ops.vq.revive_dead_codes re-anchors under-used codes to encoder outputs;
reset_codebook_moments zeroes the revived rows' Adam state; the trainer
accumulates usage and applies both on a cadence.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vqgan_tpu.ops.vq import revive_dead_codes
from vqgan_tpu.training.vqgan_step import reset_codebook_moments


def test_revive_replaces_only_dead_codes():
    key = jax.random.PRNGKey(0)
    codebook = jax.random.normal(key, (8, 4))
    usage = jnp.array([0, 5, 0, 2, 1, 0, 7, 3], jnp.int32)
    z = jax.random.normal(jax.random.PRNGKey(1), (16, 4)) + 10.0  # far away

    new_cb, n, dead = revive_dead_codes(codebook, usage, z,
                                        jax.random.PRNGKey(2), threshold=1)
    assert int(n) == 3
    np.testing.assert_array_equal(np.asarray(dead),
                                  np.asarray(usage) < 1)
    # alive rows untouched
    for i in (1, 3, 4, 6, 7):
        np.testing.assert_array_equal(np.asarray(new_cb[i]),
                                      np.asarray(codebook[i]))
    # dead rows are actual rows of z
    zs = np.asarray(z)
    for i in (0, 2, 5):
        row = np.asarray(new_cb[i])
        assert any(np.allclose(row, zr) for zr in zs), i


def test_revive_threshold_and_batch_shaped_pool():
    codebook = jnp.zeros((4, 2))
    usage = jnp.array([0, 1, 2, 3], jnp.int32)
    z = jnp.ones((2, 3, 2)) * 7.0  # [B, n, D] pool flattens
    new_cb, n, _ = revive_dead_codes(codebook, usage, z,
                                     jax.random.PRNGKey(0), threshold=2)
    assert int(n) == 2
    np.testing.assert_allclose(np.asarray(new_cb[:2]), 7.0)
    np.testing.assert_allclose(np.asarray(new_cb[2:]), 0.0)


def test_reset_codebook_moments_targets_only_codebook():
    import optax

    params = {"params": {
        "quantizer": {"embedding": jnp.ones((6, 4))},
        "encoder": {"conv": {"kernel": jnp.ones((3, 3, 4, 4))}},
    }}
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    _, state = tx.update(grads, state, params)

    dead = jnp.array([True, False, True, False, False, False])
    new_state = reset_codebook_moments(state, dead)

    def moments(s):
        leaves = [l for l in jax.tree.leaves(s)
                  if getattr(l, "shape", None) == (6, 4)]
        assert leaves, "codebook moments not found"
        return leaves

    for leaf in moments(new_state):
        np.testing.assert_allclose(np.asarray(leaf[jnp.asarray(dead)]), 0.0)
        assert float(jnp.abs(leaf[~jnp.asarray(dead)]).sum()) > 0
    # conv moments untouched (nonzero after one update)
    conv = [l for l in jax.tree.leaves(new_state)
            if getattr(l, "shape", None) == (3, 3, 4, 4)]
    for leaf in conv:
        assert float(jnp.abs(leaf).sum()) > 0


def test_trainer_revival_integration():
    from vqgan_tpu.configs import VQGANConfig
    from vqgan_tpu.training.vqgan_trainer import VQGANTrainer

    cfg = VQGANConfig(
        image_size=32, ch=8, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(), z_channels=8, embedding_dim=8,
        num_embeddings=12, batch_size=2, disc_start=10**6,
        compute_dtype="float32", revive_dead_codes_every=5,
        results_folder="/tmp/vqgan_revival_test")
    trainer = VQGANTrainer(cfg, use_mesh=False)

    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    state, log = trainer.dispatch_step(trainer.state, images, step=0)
    assert log["usage_counts"].shape == (12,)
    assert int(jnp.sum(log["usage_counts"])) == 2 * 16 * 16

    # force every code "dead" → revival must rewrite the whole codebook
    cb_before = state.vqvae_params["params"]["quantizer"]["embedding"]
    usage = jnp.zeros((12,), jnp.int32)
    new_state, n = trainer._revive_step(
        state, images, usage, jax.random.PRNGKey(1))
    assert int(n) == 12
    cb_after = new_state.vqvae_params["params"]["quantizer"]["embedding"]
    assert float(jnp.abs(cb_after - cb_before).max()) > 1e-6
    # revived rows must come from the pre-quant encoder pool
    from vqgan_tpu.models import VQVAE

    z = trainer.vqvae.apply(state.vqvae_params, images,
                            method=VQVAE.encode_pre_quant)
    zs = np.asarray(z.reshape(-1, 8))
    for row in np.asarray(cb_after):
        assert np.isclose(zs, row[None, :], atol=1e-5).all(-1).any()
