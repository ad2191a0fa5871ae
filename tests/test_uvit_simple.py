import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.diffusion.simple import (
    SimpleDiffusion,
    logsnr_schedule_cosine,
    logsnr_schedule_interpolated,
    logsnr_schedule_shifted,
)
from vqgan_tpu.models.uvit import UViT


def test_logsnr_cosine_monotone_and_bounded():
    t = jnp.linspace(0.0, 1.0, 100)
    v = np.asarray(logsnr_schedule_cosine(t))
    assert np.all(np.diff(v) < 0)
    assert v[0] <= 15.0 + 1e-4 and v[-1] >= -15.0 - 1e-4


def test_logsnr_shifted_offsets_by_constant():
    t = jnp.linspace(0.1, 0.9, 10)
    base = logsnr_schedule_cosine(t)
    shifted = logsnr_schedule_shifted(logsnr_schedule_cosine, 256, 64)(t)
    expected = 2 * np.log(64 / 256)
    np.testing.assert_allclose(
        np.asarray(shifted - base), expected, rtol=1e-5)


def test_logsnr_interpolated_between_bounds():
    t = jnp.linspace(0.0, 1.0, 20)
    low = logsnr_schedule_shifted(logsnr_schedule_cosine, 256, 32)(t)
    high = logsnr_schedule_shifted(logsnr_schedule_cosine, 256, 128)(t)
    interp = logsnr_schedule_interpolated(
        logsnr_schedule_cosine, 256, 32, 128)(t)
    expected = t * low + (1 - t) * high
    np.testing.assert_allclose(np.asarray(interp), np.asarray(expected),
                               rtol=1e-5)


@pytest.fixture(scope="module")
def uvit():
    model = UViT(dim=16, dim_mults=(1, 2), downsample_factor=2, channels=3,
                 vit_depth=2, vit_dropout=0.0, attn_heads=2, attn_dim_head=8)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))
    return model, params


def test_uvit_shapes(uvit):
    model, params = uvit
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    out = model.apply(params, x, jnp.array([0.1, 0.9]))
    assert out.shape == (2, 16, 16, 3)
    assert bool(jnp.isfinite(out).all())


def test_uvit_patched_variant():
    model = UViT(dim=16, dim_mults=(1, 2), channels=3, vit_depth=1,
                 vit_dropout=0.0, patch_size=2, dual_patchnorm=True,
                 attn_heads=2, attn_dim_head=8)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    out = model.apply(params, x, jnp.array([0.5]))
    assert out.shape == (1, 16, 16, 3)


def test_uvit_init_transform_hook():
    # a 2x2 space-to-depth "DWT stand-in" with its inverse
    def fwd(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h // 2, w // 2, 4 * c)

    def inv(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h, w, 2, 2, c // 4)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, c // 4)

    model = UViT(dim=16, dim_mults=(1, 2), channels=3, vit_depth=1,
                 vit_dropout=0.0, attn_heads=2, attn_dim_head=8,
                 init_img_transform=fwd, final_img_itransform=inv)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    out = model.apply(params, x, jnp.array([0.5]))
    assert out.shape == (1, 32, 32, 3)


def test_simple_diffusion_loss_and_sample(uvit):
    model, params = uvit

    def model_apply(p, x, log_snr):
        return model.apply(p, x, log_snr)

    for obj in ("v", "eps"):
        sd = SimpleDiffusion(
            model_apply, image_size=16, channels=3, pred_objective=obj,
            num_sample_steps=4, noise_d=8)
        imgs = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3))
        loss = sd.loss(params, jax.random.PRNGKey(3), imgs)
        assert jnp.isfinite(loss)
        out = sd.sample(params, jax.random.PRNGKey(4), batch_size=1)
        assert out.shape == (1, 16, 16, 3)
        assert bool(jnp.isfinite(out).all())
