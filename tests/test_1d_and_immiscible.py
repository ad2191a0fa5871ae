import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.diffusion.gaussian import GaussianDiffusion, _immiscible_assignment
from vqgan_tpu.diffusion.gaussian_1d import Dataset1D, GaussianDiffusion1D
from vqgan_tpu.models.unet1d import Unet1D


def test_immiscible_assignment_is_permutation_and_closer():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (16, 4, 4, 2))
    noise = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 2))
    assigned = _immiscible_assignment(x, noise)
    # it's a permutation of the original noise batch
    orig = np.sort(np.asarray(noise).reshape(16, -1), axis=0)
    newd = np.sort(np.asarray(assigned).reshape(16, -1), axis=0)
    np.testing.assert_allclose(orig, newd, atol=1e-6)
    # total distance does not increase
    d_orig = float(jnp.sum((x - noise) ** 2))
    d_new = float(jnp.sum((x - assigned) ** 2))
    assert d_new <= d_orig + 1e-5


def test_immiscible_diffusion_loss_runs():
    def model_apply(params, x, t, classes=None, **kw):
        return jnp.zeros_like(x)

    gd = GaussianDiffusion(
        model_apply, image_size=8, channels=2, timesteps=20,
        objective="pred_noise", auto_normalize=False, immiscible=True)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 2))
    loss = gd.loss({}, jax.random.PRNGKey(3), imgs)
    assert jnp.isfinite(loss)


@pytest.fixture(scope="module")
def unet1d():
    model = Unet1D(dim=16, dim_mults=(1, 2), channels=2, attn_heads=2,
                   attn_dim_head=8)
    x = jnp.zeros((2, 32, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
    return model, params


def test_unet1d_shapes(unet1d):
    model, params = unet1d
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 2))
    out = model.apply(params, x, jnp.array([3, 7]))
    assert out.shape == (2, 32, 2)


def test_diffusion_1d_end_to_end(unet1d):
    model, params = unet1d

    def model_apply(p, x, t, classes=None, **kw):
        return model.apply(p, x, t)

    gd = GaussianDiffusion1D(
        model_apply, image_size=0, seq_length=32, channels=2, timesteps=20,
        sampling_timesteps=4, objective="pred_v", auto_normalize=True)
    seqs = jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 2))
    loss = gd.loss(params, jax.random.PRNGKey(3), seqs)
    assert jnp.isfinite(loss)
    out = gd.sample(params, jax.random.PRNGKey(4), batch_size=2)
    assert out.shape == (2, 32, 2)
    assert bool(jnp.isfinite(out).all())


def test_diffusion_1d_channel_first_interop(unet1d):
    model, params = unet1d

    def model_apply(p, x, t, classes=None, **kw):
        return model.apply(p, x, t)

    gd = GaussianDiffusion1D(
        model_apply, image_size=0, seq_length=32, channels=2, timesteps=20,
        sampling_timesteps=4, objective="pred_noise",
        channel_first_data=True)
    seqs_cf = jax.random.uniform(jax.random.PRNGKey(5), (4, 2, 32))
    loss = gd.loss(params, jax.random.PRNGKey(6), seqs_cf)
    assert jnp.isfinite(loss)
    out = gd.sample(params, jax.random.PRNGKey(7), batch_size=2)
    assert out.shape == (2, 2, 32)  # returned in channel-first layout


def test_dataset1d():
    data = np.random.default_rng(0).normal(size=(10, 32, 2))
    ds = Dataset1D(data)
    assert len(ds) == 10
    item, label = ds[3]
    np.testing.assert_allclose(item, data[3], rtol=1e-6)


def test_auction_assignment_matches_hungarian_quality():
    """ops/assignment.py ε-auction: valid permutation, cost within the
    theoretical b*eps (= range/2) bound of scipy's optimum — in practice
    near-exact — at several batch sizes including b=1."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    from vqgan_tpu.ops.assignment import auction_assignment

    rng = np.random.default_rng(0)
    for b in (1, 2, 7, 32):
        d = rng.random((b, b)).astype(np.float32) * 10.0
        cols = np.asarray(jax.jit(auction_assignment)(jnp.asarray(d)))
        assert sorted(cols.tolist()) == list(range(b)), cols
        cost = float(d[np.arange(b), cols].sum())
        _, opt_cols = linear_sum_assignment(d)
        opt = float(d[np.arange(b), opt_cols].sum())
        bound = (d.max() - d.min()) / 2 + 1e-4
        assert cost <= opt + bound, (b, cost, opt)
        # near-exact in practice
        assert cost <= opt * 1.05 + 1e-3, (b, cost, opt)


def test_immiscible_auction_method_in_graph():
    """method='auction' needs no host callback: the jaxpr contains no
    pure_callback, and the result quality matches the host method."""
    import numpy as np

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 4, 4, 3))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (8, 4, 4, 3))

    jaxpr = jax.make_jaxpr(
        lambda a, b: _immiscible_assignment(a, b, method="auction"))(x, noise)
    assert "callback" not in str(jaxpr), "auction method must stay on device"

    got = _immiscible_assignment(x, noise, method="auction")
    want = _immiscible_assignment(x, noise, method="host")

    def cost(n):
        return float(jnp.sum((x.reshape(8, -1) - n.reshape(8, -1)) ** 2))

    assert cost(got) <= cost(want) * 1.05 + 1e-3
