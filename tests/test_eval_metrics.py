import jax
import jax.numpy as jnp
import numpy as np

from vqgan_tpu.eval.metrics import mse, psnr, ssim, ssim_simplified


def test_psnr_identity_and_known_value():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    assert float(psnr(x, x).min()) > 100  # identical → huge PSNR
    # uniform noise of amplitude a → mse a²/12... use exact: mse=0.01 → 20dB
    y = jnp.clip(x + 0.1, 0, None)
    m = mse(x, y)
    p = psnr(x, y)
    np.testing.assert_allclose(
        np.asarray(p), 10 * np.log10(1.0 / np.asarray(m)), rtol=1e-5)


def test_ssim_identity_one():
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ssim_simplified(x, x)), 1.0, atol=1e-4)


def test_ssim_decreases_with_noise():
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (1, 32, 32, 1))
    small = jnp.clip(x + 0.02 * jax.random.normal(key, x.shape), 0, 1)
    big = jnp.clip(x + 0.3 * jax.random.normal(key, x.shape), 0, 1)
    assert float(ssim(x, small)[0]) > float(ssim(x, big)[0])
    assert float(ssim_simplified(x, small)[0]) > float(
        ssim_simplified(x, big)[0])


def test_checkpoint_manager_roundtrip(tmp_path):
    from vqgan_tpu.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path, prefix="model")
    state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(7)}
    mgr.save(1, state, config={"dim": 96})
    state2 = jax.tree.map(lambda x: x * 2, state)
    mgr.save(2, state2, config={"dim": 96})

    assert mgr.latest_milestone() == 2
    assert mgr.all_milestones() == [1, 2]
    restored = mgr.restore(target=state)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(4.0) * 2)
    restored1 = mgr.restore(1, target=state)
    np.testing.assert_array_equal(
        np.asarray(restored1["params"]["w"]), np.arange(4.0))
    assert mgr.load_config(2) == {"dim": 96}
    # overwrite same milestone (torch.save semantics)
    mgr.save(2, state, config={"dim": 1})
    assert mgr.load_config(2) == {"dim": 1}
