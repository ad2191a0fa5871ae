import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.models.autoencoder import (
    AutoencoderConfig,
    DiagonalGaussian,
    KLVAE,
    kl_vae_loss,
)
from vqgan_tpu.models.vq_vae import VQVAE

# tiny config: 64px, ch=32, 8x downsampling → 8x8 latents, attn at 16
TINY = AutoencoderConfig(
    ch=32, ch_mult=(1, 2, 2, 4), num_res_blocks=1, attn_resolutions=(16,),
    resolution=64, z_channels=4,
)


@pytest.fixture(scope="module")
def klvae():
    model = KLVAE(config=TINY)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)}, x
    )
    return model, params


def test_klvae_shapes(klvae):
    model, params = klvae
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    recon, posterior = model.apply(
        params, x, rngs={"gaussian": jax.random.PRNGKey(3)}
    )
    assert recon.shape == (2, 64, 64, 3)
    # 8x spatial reduction (SURVEY.md §2.1: ch_mult=(1,2,2,4) → 3 downsamples)
    assert posterior.mean.shape == (2, 8, 8, 4)


def test_klvae_scale_factor_roundtrip(klvae):
    model, params = klvae
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    z = model.apply(params, x, method=KLVAE.encode_images_mean)
    # scale factor applied on encode
    post = model.apply(params, x, method=KLVAE.encode)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(post.mean * 0.18215), atol=1e-6
    )
    out = model.apply(params, z, method=KLVAE.decode_latents)
    assert out.shape == (1, 64, 64, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_diagonal_gaussian_kl_closed_form():
    # standard normal posterior → KL = 0
    mean = jnp.zeros((2, 4, 4, 2))
    logvar = jnp.zeros((2, 4, 4, 2))
    g = DiagonalGaussian(jnp.concatenate([mean, logvar], axis=-1))
    np.testing.assert_allclose(np.asarray(g.kl()), 0.0, atol=1e-6)
    # known case: mean=1, var=1 → KL = 0.5*sum(mean^2) = 0.5*32
    g2 = DiagonalGaussian(jnp.concatenate([jnp.ones_like(mean), logvar], -1))
    np.testing.assert_allclose(np.asarray(g2.kl()), 0.5 * 32, rtol=1e-5)


def test_diagonal_gaussian_logvar_clamped():
    mean = jnp.zeros((1, 2, 2, 1))
    logvar = jnp.full((1, 2, 2, 1), 100.0)
    g = DiagonalGaussian(jnp.concatenate([mean, logvar], axis=-1))
    assert float(g.logvar.max()) == 20.0


def test_kl_vae_loss_parts(klvae):
    model, params = klvae
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    recon, posterior = model.apply(
        params, x, rngs={"gaussian": jax.random.PRNGKey(6)}
    )
    parts = kl_vae_loss(recon, x, posterior, kl_weight=1e-6)
    assert set(parts) == {"loss", "rec_loss", "kl_loss", "perceptual_loss"}
    np.testing.assert_allclose(
        float(parts["loss"]),
        float(parts["rec_loss"]) + 1e-6 * float(parts["kl_loss"]),
        rtol=1e-5,
    )


@pytest.fixture(scope="module")
def vqvae():
    model = VQVAE(
        ch=32, ch_mult=(1, 2, 2, 4), num_res_blocks=1, resolution=64,
        z_channels=32, num_embeddings=16, embedding_dim=32,
    )
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_vqvae_forward(vqvae):
    model, params = vqvae
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 64, 3))
    recon, loss_dict, indices = model.apply(params, x)
    assert recon.shape == x.shape
    # sigmoid head forces [0,1]
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0
    assert indices.shape == (2, 8, 8)
    assert 0.0 < float(loss_dict["codebook_usage_ratio"]) <= 1.0
    assert float(loss_dict["vq_loss"]) > 0


def test_vqvae_index_codec_roundtrip(vqvae):
    model, params = vqvae
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 64, 64, 3))
    idx = model.apply(params, x, method=VQVAE.encode_to_indices)
    recon_from_idx = model.apply(params, idx, method=VQVAE.decode_from_indices)
    z_q, _, _ = model.apply(params, x, method=VQVAE.encode)
    recon_direct = model.apply(params, z_q, method=VQVAE.decode)
    np.testing.assert_allclose(
        np.asarray(recon_from_idx), np.asarray(recon_direct), atol=1e-5
    )


def test_vqvae_trains_end_to_end(vqvae):
    # one SGD step on recon+vq loss must decrease the loss (sanity: gradients
    # flow through STE into the encoder and into the codebook)
    model, params = vqvae
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 64, 64, 3))

    def loss_fn(p):
        recon, ld, _ = model.apply(p, x)
        return jnp.mean((recon - x) ** 2) + ld["vq_loss"]

    l0, g = jax.value_and_grad(loss_fn)(params)
    # encoder conv and codebook both receive gradient
    gflat = jax.tree_util.tree_leaves_with_path(g)
    nonzero = {
        "/".join(str(k.key) for k in path): float(jnp.abs(v).max())
        for path, v in gflat
    }
    enc_grads = [v for k, v in nonzero.items() if "encoder" in k]
    cb_grads = [v for k, v in nonzero.items() if "embedding" in k]
    assert max(enc_grads) > 0
    assert max(cb_grads) > 0
    p2 = jax.tree.map(lambda p, g: p - 0.05 * g, params, g)
    l1 = loss_fn(p2)
    assert float(l1) < float(l0)
