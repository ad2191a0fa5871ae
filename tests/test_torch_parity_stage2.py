"""Stage-2 numerical parity against the installed torch reference: same
weights, same inputs → same outputs.

Covers the flagship path end-to-end (VERDICT round-1 item 2):
- CFG U-Net forward (cond, null, return_features)
  [/root/reference/denoising_diffusion_pytorch/classifier_free_guidance.py:467]
- forward_with_cond_scale / CFG combination [:435-465]
- GaussianDiffusion.p_losses with fixed noise/t [:878-911]
- one DDIM step [:807-840]
- PatchGAN logits [/root/reference/vqgan_ldm_baseline/models/discriminator.py:17]
- EDM preconditioned forward + schedule + loss weight
  [/root/reference/denoising_diffusion_pytorch/elucidated_diffusion.py:89-140]

Weight export goes through vqgan_tpu.checkpoint.torch_import, so these tests
pin both the import shims and the architectural equivalence.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not mounted")

# tiny flagship-shaped config: 2 resolutions, 8x8 latents, 4 channels
DIM, MULTS, CH, NCLS, HEADS, DHEAD = 16, (1, 2), 4, 5, 2, 8
SIZE, T_STEPS = 8, 20


def _load_reference_module(relpath, name):
    spec = importlib.util.spec_from_file_location(name, REFERENCE / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _nchw(x):
    import torch

    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture(scope="module")
def ref_cfg_mod():
    return _load_reference_module(
        "denoising_diffusion_pytorch/classifier_free_guidance.py", "ref_cfg")


@pytest.fixture(scope="module")
def unet_pair(ref_cfg_mod):
    """(torch Unet, our CFGUnet, imported flax params) at identical weights."""
    import torch

    from vqgan_tpu.checkpoint.torch_import import load_torch_cfg_unet
    from vqgan_tpu.models import CFGUnet

    torch.manual_seed(7)
    tnet = ref_cfg_mod.Unet(
        dim=DIM, num_classes=NCLS, cond_drop_prob=0.0, dim_mults=MULTS,
        channels=CH, attn_dim_head=DHEAD, attn_heads=HEADS)
    tnet.eval()

    jnet = CFGUnet(
        dim=DIM, num_classes=NCLS, cond_drop_prob=0.0, dim_mults=MULTS,
        channels=CH, attn_dim_head=DHEAD, attn_heads=HEADS)
    params = load_torch_cfg_unet(tnet.state_dict())
    return tnet, jnet, params


def _inputs(seed=0, batch=2):
    rs = np.random.RandomState(seed)
    x = rs.randn(batch, SIZE, SIZE, CH).astype(np.float32)
    t = np.array([3, 15], np.int64)[:batch]
    classes = np.array([1, 4], np.int64)[:batch]
    return x, t, classes


def test_cfg_unet_forward_parity(unet_pair):
    import torch

    tnet, jnet, params = unet_pair
    x, t, classes = _inputs()
    with torch.no_grad():
        out_t = _nhwc(tnet(_nchw(x), torch.from_numpy(t),
                           torch.from_numpy(classes)))
    out_j = np.asarray(jnet.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(classes),
        cond_drop_mask=jnp.zeros((2,), bool)))
    np.testing.assert_allclose(out_j, out_t, atol=1e-4)


def test_cfg_unet_null_conditioning_parity(unet_pair):
    """cond_drop_prob=1.0 routes every sample through the learned null
    embedding (reference :497-505) — deterministic despite the RNG."""
    import torch

    tnet, jnet, params = unet_pair
    x, t, classes = _inputs(seed=1)
    with torch.no_grad():
        out_t = _nhwc(tnet(_nchw(x), torch.from_numpy(t),
                           torch.from_numpy(classes), cond_drop_prob=1.0))
    out_j = np.asarray(jnet.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(classes),
        cond_drop_mask=jnp.ones((2,), bool)))
    np.testing.assert_allclose(out_j, out_t, atol=3e-4)


def test_cfg_unet_return_features_parity(unet_pair):
    """Bottleneck contrastive feature tap (reference :533-537)."""
    import torch

    tnet, jnet, params = unet_pair
    x, t, classes = _inputs(seed=2)
    with torch.no_grad():
        out_t, feat_t = tnet(_nchw(x), torch.from_numpy(t),
                             torch.from_numpy(classes), return_features=True)
    out_j, feat_j = jnet.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(classes),
        cond_drop_mask=jnp.zeros((2,), bool), return_features=True)
    np.testing.assert_allclose(np.asarray(out_j), _nhwc(out_t), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(feat_j), feat_t.detach().numpy(), atol=1e-4)


@pytest.mark.parametrize("cond_scale,rescaled_phi",
                         [(3.0, 0.0), (3.0, 0.7), (6.0, 0.7)])
def test_forward_with_cond_scale_parity(unet_pair, cond_scale, rescaled_phi):
    """Reference forward_with_cond_scale (:435-465) vs our batched double
    forward + core.guidance.apply_cfg."""
    import torch

    from vqgan_tpu.core.guidance import apply_cfg

    tnet, jnet, params = unet_pair
    x, t, classes = _inputs(seed=3)
    with torch.no_grad():
        out = tnet.forward_with_cond_scale(
            _nchw(x), torch.from_numpy(t), torch.from_numpy(classes),
            cond_scale=cond_scale, rescaled_phi=rescaled_phi)
    out_t = _nhwc(out[0] if isinstance(out, tuple) else out)

    logits = jnet.apply(params, jnp.asarray(x), jnp.asarray(t),
                        jnp.asarray(classes),
                        cond_drop_mask=jnp.zeros((2,), bool))
    null = jnet.apply(params, jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(classes),
                      cond_drop_mask=jnp.ones((2,), bool))
    out_j = np.asarray(apply_cfg(logits, null, cond_scale, rescaled_phi))
    np.testing.assert_allclose(out_j, out_t, atol=3e-4)


def _make_diffusions(ref_cfg_mod, unet_pair, objective="pred_v"):
    from vqgan_tpu.diffusion import GaussianDiffusion

    tnet, jnet, params = unet_pair
    tdiff = ref_cfg_mod.GaussianDiffusion(
        tnet, image_size=SIZE, timesteps=T_STEPS, sampling_timesteps=5,
        objective=objective, beta_schedule="cosine", ddim_sampling_eta=0.0,
        min_snr_loss_weight=True, min_snr_gamma=5, auto_normalize=False)
    tdiff.eval()

    def model_apply(p, x, t, classes, cond_drop_mask=None,
                    cond_drop_prob=None, rng=None, return_features=False):
        return jnet.apply(p, x, t, classes, cond_drop_mask=cond_drop_mask,
                          cond_drop_prob=cond_drop_prob,
                          rngs={"cond_drop": rng} if rng is not None else None,
                          return_features=return_features)

    jdiff = GaussianDiffusion(
        model_apply, image_size=SIZE, channels=CH, timesteps=T_STEPS,
        sampling_timesteps=5, objective=objective, beta_schedule="cosine",
        ddim_sampling_eta=0.0, min_snr_loss_weight=True, min_snr_gamma=5.0,
        auto_normalize=False)
    return tdiff, jdiff, params


@pytest.mark.parametrize("objective", ["pred_v", "pred_noise", "pred_x0"])
def test_p_losses_parity(ref_cfg_mod, unet_pair, objective):
    """Fixed (x_start, t, noise): identical training loss (reference
    :878-911, including Min-SNR weighting)."""
    import torch

    tdiff, jdiff, params = _make_diffusions(ref_cfg_mod, unet_pair, objective)
    x, t, classes = _inputs(seed=4)
    noise = np.random.RandomState(5).randn(*x.shape).astype(np.float32)

    with torch.no_grad():
        loss_t = tdiff.p_losses(
            _nchw(x), torch.from_numpy(t), classes=torch.from_numpy(classes),
            noise=_nchw(noise)).item()

    loss_j = float(jdiff.p_losses(
        params, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(classes), noise=jnp.asarray(noise), cond_drop_prob=0.0))
    np.testing.assert_allclose(loss_j, loss_t, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("cond_scale", [1.0, 3.0])
def test_ddim_step_parity(ref_cfg_mod, unet_pair, cond_scale):
    """One deterministic (η=0) DDIM update at (time, time_next) = (15, 9):
    model_predictions + the update rule of reference :819-837."""
    import torch

    from vqgan_tpu.core import diffusion_math as dm

    tdiff, jdiff, params = _make_diffusions(ref_cfg_mod, unet_pair)
    x, _, classes = _inputs(seed=6)
    time, time_next = 15, 9

    with torch.no_grad():
        tb = torch.full((2,), time, dtype=torch.long)
        pred_noise_t, x_start_t = tdiff.model_predictions(
            _nchw(x), tb, torch.from_numpy(classes), cond_scale=cond_scale,
            rescaled_phi=0.0, clip_x_start=True)
        alpha = tdiff.alphas_cumprod[time]
        alpha_next = tdiff.alphas_cumprod[time_next]
        c = (1 - alpha_next).sqrt()  # η=0 ⇒ σ=0 (reference :830-831)
        img_t = _nhwc(x_start_t * alpha_next.sqrt() + c * pred_noise_t)

    tb_j = jnp.full((2,), time, jnp.int32)
    pred_noise_j, x_start_j = jdiff.model_predictions(
        params, jnp.asarray(x), tb_j, jnp.asarray(classes),
        cond_scale=cond_scale, rescaled_phi=0.0, clip_x_start=True)
    img_j = dm.ddim_step(
        jdiff.schedule, jnp.asarray(x), x_start_j, pred_noise_j,
        jnp.asarray(time), jnp.asarray(time_next),
        jnp.zeros_like(x_start_j), 0.0)
    np.testing.assert_allclose(np.asarray(img_j), img_t, atol=3e-4)

    # final step (time_next < 0) returns x_start (reference :823-825)
    img_final = dm.ddim_step(
        jdiff.schedule, jnp.asarray(x), x_start_j, pred_noise_j,
        jnp.asarray(0), jnp.asarray(-1), jnp.zeros_like(x_start_j), 0.0)
    np.testing.assert_allclose(np.asarray(img_final), np.asarray(x_start_j),
                               atol=1e-6)


@pytest.mark.parametrize("cond_scale,eta", [(1.0, 0.0), (3.0, 0.0),
                                            (3.0, 1.0)])
def test_ddim_full_chain_parity(ref_cfg_mod, unet_pair, cond_scale, eta):
    """The ENTIRE production DDIM chain (reference :807-846), not one step:
    identical weights + identical initial/per-step noise → same final
    sample. η=1.0 is the reference's default stochastic-DDIM mode; noise is
    injected on both sides (torch.randn/randn_like patched; our sampler's
    init_noise/step_noise overrides)."""
    import torch

    tnet, jnet, params = unet_pair
    n_steps, batch = 5, 2
    tdiff = ref_cfg_mod.GaussianDiffusion(
        tnet, image_size=SIZE, timesteps=T_STEPS,
        sampling_timesteps=n_steps, objective="pred_v",
        beta_schedule="cosine", ddim_sampling_eta=eta,
        min_snr_loss_weight=True, min_snr_gamma=5, auto_normalize=False)
    tdiff.eval()

    def model_apply(p, x, t, classes, cond_drop_mask=None,
                    cond_drop_prob=None, rng=None, return_features=False):
        return jnet.apply(p, x, t, classes, cond_drop_mask=cond_drop_mask,
                          cond_drop_prob=cond_drop_prob,
                          rngs={"cond_drop": rng} if rng is not None else None,
                          return_features=return_features)

    from vqgan_tpu.diffusion import GaussianDiffusion

    jdiff = GaussianDiffusion(
        model_apply, image_size=SIZE, channels=CH, timesteps=T_STEPS,
        sampling_timesteps=n_steps, objective="pred_v",
        beta_schedule="cosine", ddim_sampling_eta=eta,
        min_snr_loss_weight=True, min_snr_gamma=5.0, auto_normalize=False)

    rs = np.random.RandomState(42)
    init = rs.randn(batch, SIZE, SIZE, CH).astype(np.float32)
    steps_noise = rs.randn(n_steps, batch, SIZE, SIZE, CH).astype(np.float32)
    classes = np.array([1, 4], np.int64)

    # drive the reference with the SAME noise: its ddim_sample draws
    # torch.randn once (init) then torch.randn_like per step
    queue = [_nchw(steps_noise[i]) for i in range(n_steps)]

    def fake_randn(*a, **k):
        return _nchw(init)

    def fake_randn_like(x, **k):
        return queue.pop(0)

    with torch.no_grad(), \
            pytest.MonkeyPatch.context() as mp:
        mp.setattr(torch, "randn", fake_randn)
        mp.setattr(torch, "randn_like", fake_randn_like)
        img_t = tdiff.ddim_sample(
            torch.from_numpy(classes), (batch, CH, SIZE, SIZE),
            cond_scale=cond_scale, rescaled_phi=0.7)
    img_t = _nhwc(img_t)

    img_j = np.asarray(jdiff.ddim_sample(
        params, jax.random.PRNGKey(0), (batch, SIZE, SIZE, CH),
        jnp.asarray(classes), cond_scale=cond_scale, rescaled_phi=0.7,
        init_noise=init, step_noise=steps_noise))
    np.testing.assert_allclose(img_j, img_t, atol=2e-3)


def test_patchgan_logits_parity():
    """Same weights (incl. BN running stats) → same patch logits, eval and
    train mode (reference discriminator.py:17-97)."""
    import torch

    from vqgan_tpu.checkpoint.torch_import import load_torch_patchgan
    from vqgan_tpu.models.discriminator import PatchGANDiscriminator

    disc_mod = _load_reference_module(
        "vqgan_ldm_baseline/models/discriminator.py", "ref_disc")
    torch.manual_seed(11)
    tdisc = disc_mod.PatchGANDiscriminator(input_nc=3, ndf=16, n_layers=3)
    # non-trivial running stats so eval-mode BN is actually exercised
    with torch.no_grad():
        for m in tdisc.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    tdisc.eval()

    jdisc = PatchGANDiscriminator(ndf=16, n_layers=3, norm="batch")
    variables = load_torch_patchgan(tdisc.state_dict(), n_layers=3)

    x = np.random.RandomState(8).rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        logits_t = _nhwc(tdisc(_nchw(x)))
    logits_j = np.asarray(jdisc.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(logits_j, logits_t, atol=2e-4)

    # train mode: batch statistics path
    tdisc.train()
    with torch.no_grad():
        logits_tt = _nhwc(tdisc(_nchw(x)))
    logits_jt, mutated = jdisc.apply(variables, jnp.asarray(x), train=True,
                                     mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(logits_jt), logits_tt, atol=2e-4)

    # running-stat UPDATE parity: one train step must move the running mean
    # by the same fraction on both sides (torch momentum 0.1 counts the
    # new-batch share; flax counts the kept share, so ours must be 0.9 —
    # the default 0.99 adapts 10x slower, a real GAN-dynamics difference)
    t_bn = next(m for m in tdisc.modules()
                if isinstance(m, torch.nn.BatchNorm2d))
    t_mean = t_bn.running_mean.detach().numpy()  # unique channel count
    import jax

    j_mean = next(
        np.asarray(leaf) for path, leaf in
        jax.tree_util.tree_flatten_with_path(mutated["batch_stats"])[0]
        if path[-1].key == "mean" and np.shape(leaf) == t_mean.shape)
    np.testing.assert_allclose(j_mean, t_mean, atol=2e-4)


def test_edm_preconditioned_forward_parity():
    """EDM Table-1 preconditioners + eq.(7) forward + ρ-schedule + loss
    weight, with an identical tiny net on both sides (reference
    elucidated_diffusion.py:89-140, 241-277)."""
    import torch

    from vqgan_tpu.diffusion import ElucidatedDiffusion

    ed_mod = _load_reference_module(
        "denoising_diffusion_pytorch/elucidated_diffusion.py", "ref_edm")

    class TinyNet(torch.nn.Module):
        random_or_learned_sinusoidal_cond = True
        self_condition = False
        channels = CH

        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(CH, CH, 3, padding=1)
            self.temb = torch.nn.Linear(1, CH)

        def forward(self, x, t, self_cond=None):
            return self.conv(x) + self.temb(t[:, None])[:, :, None, None]

    torch.manual_seed(3)
    tnet = TinyNet()
    tdiff = ed_mod.ElucidatedDiffusion(
        tnet, image_size=SIZE, channels=CH, num_sample_steps=8)

    conv_w = tnet.conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    conv_b = tnet.conv.bias.detach().numpy()
    lin_w = tnet.temb.weight.detach().numpy().T
    lin_b = tnet.temb.bias.detach().numpy()

    def net_apply(params, x, t, self_cond=None):
        del params
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(conv_w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(conv_b)
        temb = t[:, None] @ jnp.asarray(lin_w) + jnp.asarray(lin_b)
        return y + temb[:, None, None, :]

    jdiff = ElucidatedDiffusion(
        net_apply, image_size=SIZE, channels=CH, num_sample_steps=8)

    x = np.random.RandomState(9).randn(2, SIZE, SIZE, CH).astype(np.float32)
    for sigma in (0.02, 0.5, 7.0, 80.0):
        sig = np.full((2,), sigma, np.float32)
        with torch.no_grad():
            out_t = _nhwc(tdiff.preconditioned_network_forward(
                _nchw(x), torch.from_numpy(sig), clamp=False))
        out_j = np.asarray(jdiff.preconditioned_forward(
            None, jnp.asarray(x), jnp.asarray(sig)))
        np.testing.assert_allclose(out_j, out_t, atol=1e-4,
                                   err_msg=f"sigma={sigma}")

    np.testing.assert_allclose(
        np.asarray(jdiff.sample_schedule()),
        tdiff.sample_schedule().numpy(), rtol=1e-6)
    sig = jnp.asarray([0.1, 1.0, 10.0])
    np.testing.assert_allclose(
        np.asarray(jdiff.loss_weight(sig)),
        tdiff.loss_weight(torch.tensor([0.1, 1.0, 10.0])).numpy(), rtol=1e-5)


def test_p_losses_gradient_parity_via_sgd_step(ref_cfg_mod, unet_pair):
    """THE missing fidelity link beyond loss parity: ∂p_losses/∂θ must match
    torch autograd. One SGD step makes the update linear in the gradient
    (w' = w − lr·g), so comparing the updated weight trees — re-imported
    through the same shim — compares every gradient entry without a manual
    name mapping. (An Adam first step would normalize magnitudes away.)"""
    import copy

    import torch

    from vqgan_tpu.checkpoint.torch_import import load_torch_cfg_unet

    tdiff, jdiff, params = _make_diffusions(ref_cfg_mod, unet_pair)
    tnet = copy.deepcopy(tdiff.model)  # do not mutate the shared fixture
    tdiff = ref_cfg_mod.GaussianDiffusion(
        tnet, image_size=SIZE, timesteps=T_STEPS, sampling_timesteps=5,
        objective="pred_v", beta_schedule="cosine", ddim_sampling_eta=0.0,
        min_snr_loss_weight=True, min_snr_gamma=5, auto_normalize=False)
    tdiff.eval()  # no dropout layers active; matches the fixture's setup
    x, t, classes = _inputs(seed=8)
    noise = np.random.RandomState(9).randn(*x.shape).astype(np.float32)
    lr = 1e-2

    opt = torch.optim.SGD(tnet.parameters(), lr=lr)
    loss_t = tdiff.p_losses(
        _nchw(x), torch.from_numpy(t), classes=torch.from_numpy(classes),
        noise=_nchw(noise))
    opt.zero_grad()
    loss_t.backward()
    opt.step()
    params_t_after = load_torch_cfg_unet(tnet.state_dict())

    def loss_fn(p):
        return jdiff.p_losses(
            p, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
            jnp.asarray(classes), noise=jnp.asarray(noise),
            cond_drop_prob=0.0)

    grads = jax.grad(loss_fn)(params)
    params_j_after = jax.tree.map(lambda w, g: w - lr * g, params, grads)

    flat_t = jax.tree_util.tree_leaves_with_path(params_t_after)
    flat_j = dict(jax.tree_util.tree_leaves_with_path(params_j_after))
    assert len(flat_t) == len(flat_j)
    checked = 0
    for path, leaf_t in flat_t:
        leaf_j = np.asarray(flat_j[path])
        np.testing.assert_allclose(
            leaf_j, np.asarray(leaf_t), atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
        checked += 1
    assert checked > 50  # the full tree, not a token sample


def test_adam_training_trajectory_parity(ref_cfg_mod, unet_pair):
    """Three full Adam steps with identical (data, t, noise) per step: the
    weight trajectories must track — proves torch.optim.Adam ≡ the optax
    chain for this model beyond a single gradient."""
    import copy

    import torch

    from vqgan_tpu.checkpoint.torch_import import load_torch_cfg_unet

    tdiff0, jdiff, params = _make_diffusions(ref_cfg_mod, unet_pair)
    tnet = copy.deepcopy(tdiff0.model)
    tdiff = ref_cfg_mod.GaussianDiffusion(
        tnet, image_size=SIZE, timesteps=T_STEPS, sampling_timesteps=5,
        objective="pred_v", beta_schedule="cosine", ddim_sampling_eta=0.0,
        min_snr_loss_weight=True, min_snr_gamma=5, auto_normalize=False)
    tdiff.eval()
    lr, betas, eps = 1e-3, (0.9, 0.99), 1e-8

    import optax

    opt_t = torch.optim.Adam(tnet.parameters(), lr=lr, betas=betas, eps=eps)
    tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    opt_state = tx.init(params)

    losses_t, losses_j = [], []
    for step in range(3):
        x, t, classes = _inputs(seed=20 + step)
        noise = np.random.RandomState(30 + step).randn(*x.shape)
        noise = noise.astype(np.float32)

        loss = tdiff.p_losses(
            _nchw(x), torch.from_numpy(t), classes=torch.from_numpy(classes),
            noise=_nchw(noise))
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        losses_t.append(loss.item())

        def loss_fn(p, x=x, t=t, classes=classes, noise=noise):
            return jdiff.p_losses(
                p, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
                jnp.asarray(classes), noise=jnp.asarray(noise),
                cond_drop_prob=0.0)

        loss_j, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses_j.append(float(loss_j))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-4, atol=1e-5)
    # Weight tolerance: Adam's early steps normalize each update to ≈ ±lr
    # (m̂/√v̂ ≈ sign(g) while moments warm up), so an fp32-noise-level
    # gradient difference near g≈0 can flip a coordinate's update by 2·lr.
    # A few lr of atol checks the trajectory without chasing that noise;
    # exact gradient equality is covered by the SGD-step test above.
    params_t_after = load_torch_cfg_unet(tnet.state_dict())
    flat_j = dict(jax.tree_util.tree_leaves_with_path(params))
    for path, leaf_t in jax.tree_util.tree_leaves_with_path(params_t_after):
        np.testing.assert_allclose(
            np.asarray(flat_j[path]), np.asarray(leaf_t), atol=4e-3,
            err_msg=jax.tree_util.keystr(path))
