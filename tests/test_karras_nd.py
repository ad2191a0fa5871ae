import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.models.karras_unet_nd import KarrasUnet1D, KarrasUnet3D


def test_karras_unet_1d_shapes():
    model = KarrasUnet1D(
        spatial_size=(32,), dim=16, dim_max=32, channels=2,
        num_downsamples=1, num_blocks_per_stage=1, attn_res=(16,),
        attn_dim_head=8, dropout=0.0, num_classes=3)
    x = jnp.zeros((2, 32, 2))
    t = jnp.array([0.1, 0.5])
    c = jnp.array([0, 2])
    params = model.init(jax.random.PRNGKey(0), x, t, class_labels=c)
    out = model.apply(params, x, t, class_labels=c)
    assert out.shape == (2, 32, 2)
    # zero output gain at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


@pytest.mark.parametrize("factorize", [False, True])
def test_karras_unet_3d_shapes(factorize):
    model = KarrasUnet3D(
        spatial_size=(4, 16, 16), dim=8, dim_max=16, channels=2,
        num_downsamples=2, num_blocks_per_stage=1, attn_res=(8,),
        attn_dim_head=8, dropout=0.0,
        downsample_types=("image", "frame"),
        factorize_space_time_attn=factorize)
    x = jnp.zeros((1, 4, 16, 16, 2))
    t = jnp.array([0.3])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (1, 4, 16, 16, 2)
    assert bool(jnp.isfinite(out).all())


def test_karras_unet_3d_gradients_flow():
    model = KarrasUnet3D(
        spatial_size=(2, 8, 8), dim=8, dim_max=16, channels=1,
        num_downsamples=1, num_blocks_per_stage=1, attn_res=(4,),
        attn_dim_head=4, dropout=0.0, factorize_space_time_attn=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 1))
    t = jnp.array([0.5])
    params = model.init(jax.random.PRNGKey(0), x, t)

    def loss(p):
        return jnp.sum(model.apply(p, x, t) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    # the output gain starts at 0, so only the gain gets gradient initially;
    # perturb it and check the whole net trains
    params2 = jax.tree_util.tree_map_with_path(
        lambda pth, v: v + 0.5 if "output_gain" in str(pth) else v, params)
    g2 = jax.grad(lambda p: jnp.sum(model.apply(p, x, t) ** 2))(params2)
    n_nonzero = sum(
        1 for l in jax.tree.leaves(g2) if float(jnp.abs(l).max()) > 0)
    assert n_nonzero > len(jax.tree.leaves(g2)) // 2
