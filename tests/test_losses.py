import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.losses import (
    discriminator_loss,
    generator_loss,
    hinge_d_loss,
    hinge_g_loss,
    infonce_loss,
    supcon_loss,
    vanilla_d_loss,
)


def test_hinge_losses():
    real = jnp.array([2.0, 0.5])
    fake = jnp.array([-2.0, 0.5])
    # relu(1-real)=[0, .5] mean .25 ; relu(1+fake)=[0, 1.5] mean .75
    np.testing.assert_allclose(float(hinge_d_loss(real, fake)), 0.5)
    np.testing.assert_allclose(float(hinge_g_loss(fake)), 0.75)


def test_vanilla_d_loss_at_zero():
    z = jnp.zeros((4,))
    np.testing.assert_allclose(float(vanilla_d_loss(z, z)), np.log(2), rtol=1e-5)


def test_generator_loss_gating():
    x = jnp.ones((2, 8, 8, 3)) * 0.5
    r = jnp.ones((2, 8, 8, 3)) * 0.25
    fake_logits = jnp.full((2, 1, 1, 1), -3.0)
    loss_off, log_off = generator_loss(
        x, r, fake_logits, disc_active=False, disc_weight=0.1)
    loss_on, log_on = generator_loss(
        x, r, fake_logits, disc_active=True, disc_weight=0.1)
    np.testing.assert_allclose(float(loss_off), 0.25, rtol=1e-5)  # pure L1
    np.testing.assert_allclose(
        float(loss_on), 0.25 + 0.1 * 3.0, rtol=1e-5)  # + w * (-mean(fake))
    assert float(log_on["d_acc"]) if "d_acc" in log_on else True


def test_discriminator_loss_gating_and_acc():
    real = jnp.array([[2.0]])
    fake = jnp.array([[-2.0]])
    loss_on, log = discriminator_loss(
        real, fake, disc_active=True, disc_loss_type="hinge")
    np.testing.assert_allclose(float(loss_on), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(log["d_acc"]), 1.0)
    loss_off, log_off = discriminator_loss(
        real, fake, disc_active=False, disc_loss_type="hinge")
    np.testing.assert_allclose(float(loss_off), 0.0, atol=1e-6)


def test_supcon_basic_positive():
    # two samples per class, identical features within class, orthogonal
    # between classes → small loss; random features → larger loss
    f = jnp.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])
    f = f[:, None, :]
    labels = jnp.array([0, 0, 1, 1])
    tight = supcon_loss(f, labels)
    rand = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 2))
    rand = rand / jnp.linalg.norm(rand, axis=-1, keepdims=True)
    loose = supcon_loss(rand, labels)
    assert float(tight) < float(loose)
    assert jnp.isfinite(tight)


def test_supcon_multiview_and_unsupervised():
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 8))
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    labels = jnp.array([0, 1, 0, 1])
    l_sup = supcon_loss(feats, labels)
    l_unsup = supcon_loss(feats)  # SimCLR mode
    assert jnp.isfinite(l_sup) and jnp.isfinite(l_unsup)
    assert float(l_sup) > 0 and float(l_unsup) > 0


def test_supcon_singleton_class_guard():
    # a class with a single sample has no positives; loss must stay finite
    feats = jax.random.normal(jax.random.PRNGKey(2), (3, 1, 4))
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    labels = jnp.array([0, 0, 7])
    loss = supcon_loss(feats, labels)
    assert jnp.isfinite(loss)


def test_supcon_multiview_mask_alignment():
    # hand-checked case: identical features within a class across views must
    # yield a LOWER loss than when the second view's rows are shuffled across
    # classes — only true if the mask/view stacking orders agree
    base = jnp.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])
    labels = jnp.array([0, 0, 1, 1])
    aligned = jnp.stack([base, base], axis=1)  # [B, 2, D]
    shuffled = jnp.stack([base, base[::-1]], axis=1)
    assert float(supcon_loss(aligned, labels)) < float(
        supcon_loss(shuffled, labels))

    # reference-ordering cross-check in numpy (view-major stacking)
    feats = jax.random.normal(jax.random.PRNGKey(9), (3, 2, 4))
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    lab = np.array([0, 1, 0])
    f = np.asarray(feats, np.float64)
    stacked = np.concatenate([f[:, 0], f[:, 1]], axis=0)  # v*B + i
    mask = (lab[:, None] == lab[None, :]).astype(float)
    mask = np.tile(mask, (2, 2))
    logits = stacked @ stacked.T / 0.07
    logits -= logits.max(1, keepdims=True)
    self_mask = 1 - np.eye(6)
    mask *= self_mask
    denom = (np.exp(logits) * self_mask).sum(1, keepdims=True)
    log_prob = logits - np.log(denom)
    mlpp = (mask * log_prob).sum(1) / np.maximum(mask.sum(1), 1)
    expected = float(np.mean(-mlpp))
    got = float(supcon_loss(feats, jnp.asarray(lab)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_supcon_one_anchor_mode():
    feats = jax.random.normal(jax.random.PRNGKey(3), (4, 2, 8))
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    labels = jnp.array([0, 1, 0, 1])
    loss = supcon_loss(feats, labels, contrast_mode="one")
    assert jnp.isfinite(loss)


def test_infonce_perfect_alignment():
    q = jnp.eye(4, 8)
    loss_aligned = infonce_loss(q, q, temperature=0.07)
    k_shuffled = q[::-1]
    loss_shuffled = infonce_loss(q, k_shuffled, temperature=0.07)
    assert float(loss_aligned) < float(loss_shuffled)


def test_supcon_matches_torch_reference():
    """Same inputs -> same loss as the installed reference SupConLoss
    (/root/reference/losses.py:73, the round-1 view-ordering bug regression
    pin), across labeled, multiview, and unsupervised modes."""
    import importlib.util

    import numpy as np
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_supcon", "/root/reference/losses.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(0)
    for n_views, labels in ((2, [0, 1, 0, 2]), (3, [1, 1, 0, 0]),
                            (2, None)):
        f = rng.normal(size=(4, n_views, 8)).astype(np.float32)
        f = f / np.linalg.norm(f, axis=-1, keepdims=True)
        want = ref.SupConLoss(temperature=0.1)(
            torch.from_numpy(f),
            None if labels is None else torch.tensor(labels))
        got = supcon_loss(jnp.asarray(f),
                          None if labels is None else jnp.asarray(labels),
                          temperature=0.1, base_temperature=0.07)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5,
                                   err_msg=f"views={n_views}")
