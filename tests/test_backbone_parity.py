"""Random-weight parity for the metric backbones (VERDICT r1 item 7).

The calibrated LPIPS/FID metrics need pretrained VGG16 / InceptionV3
weights, which this zero-egress environment cannot download. What we CAN
prove is that the architectures and the torch→flax import shims are
byte-correct, so that dropping real weight files in later "just works":

  torch module (random weights) → state_dict → load_torch_*_weights →
  flax forward  ==  torch forward     (fp32, same inputs)

torchvision / the lpips wheel / pytorch-fid are not installed here, so the
torch side is built inline below, faithful to the upstream definitions:
 - VGG16 features: torchvision.models.vgg.make_layers(cfg "D"), i.e. the
   exact nn.Sequential indexing that produces `features.{i}.weight` keys.
 - LPIPS: the lpips wheel's forward math (scaling layer -> VGG taps ->
   unit-normalize -> squared diff -> 1x1 lin conv -> spatial average -> sum)
   as used by the reference at
   /root/reference/vqgan_ldm_baseline/models/losses.py:53,127-139.
 - InceptionV3: torchvision Inception blocks with the pytorch-fid patches
   (avg pools count_include_pad=False in A/C/E_1; max-pool branch in E_2),
   as consumed by /root/reference/denoising_diffusion_pytorch/fid_evaluation.py:45.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from vqgan_tpu.models.inception import (  # noqa: E402
    InceptionV3Features,
    load_torch_inception_weights,
)
from vqgan_tpu.models.lpips import (  # noqa: E402
    LPIPS,
    VGG16Features,
    load_torch_lpips_weights,
)

# ---------------------------------------------------------------- VGG16 ---

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512]


def make_torch_vgg16_features() -> tnn.Sequential:
    """torchvision.models.vgg.make_layers(cfgs['D'][:...]) — conv+ReLU per
    entry, MaxPool2d(2,2) at 'M', giving `features.{i}.*` state-dict keys."""
    layers, in_ch = [], 3
    for v in _VGG16_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers += [tnn.Conv2d(in_ch, v, kernel_size=3, padding=1),
                       tnn.ReLU(inplace=False)]
            in_ch = v
    return tnn.Sequential(*layers)


_TAPS_AFTER_SEQ = [3, 8, 15, 22, 29]  # ReLU positions of relu1_2..relu5_3
_LPIPS_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_LPIPS_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def torch_vgg_taps(vgg: tnn.Sequential, x: torch.Tensor):
    taps = []
    for i, layer in enumerate(vgg):
        x = layer(x)
        if i in _TAPS_AFTER_SEQ:
            taps.append(x)
    return taps


def torch_lpips(vgg, lin_weights, x, y):
    """The lpips wheel's forward: ScalingLayer, VGG taps, unit-normalize,
    (dx)^2, 1x1 'lin' conv, spatial mean, sum over the 5 layers."""
    norm_in = lambda t: (t - _LPIPS_SHIFT) / _LPIPS_SCALE
    fx = torch_vgg_taps(vgg, norm_in(x))
    fy = torch_vgg_taps(vgg, norm_in(y))
    total = 0.0
    for fxi, fyi, w in zip(fx, fy, lin_weights):
        # lpips.normalize_tensor puts eps OUTSIDE the sqrt; the flax module
        # uses rsqrt(·+eps) — identical to fp32 precision for real features
        unit = lambda f: f / (torch.sqrt(
            torch.sum(f ** 2, dim=1, keepdim=True)) + 1e-10)
        diff = (unit(fxi) - unit(fyi)) ** 2
        weighted = F.conv2d(diff, w)  # [B,1,H,W]
        total = total + weighted.mean(dim=(2, 3)).squeeze(1)
    return total


class TestVGGLPIPSParity:
    @pytest.fixture(scope="class")
    def torch_vgg(self):
        torch.manual_seed(0)
        return make_torch_vgg16_features().eval()

    def test_vgg16_tap_parity(self, torch_vgg):
        """Same random torch weights → identical 5 tap activations."""
        rng = np.random.RandomState(1)
        x = rng.randn(2, 64, 64, 3).astype(np.float32)

        with torch.no_grad():
            t_taps = torch_vgg_taps(
                torch_vgg, torch.from_numpy(x.transpose(0, 3, 1, 2)))

        # the bare Sequential's keys are "0.weight"; torchvision nests it
        # under the `features` attribute — reproduce that prefix
        vgg_state = {f"features.{k}": v.numpy()
                     for k, v in torch_vgg.state_dict().items()}
        lin_state = {f"lin{i}.model.1.weight":
                     np.ones((1, c, 1, 1), np.float32)
                     for i, c in enumerate([64, 128, 256, 512, 512])}
        variables = load_torch_lpips_weights(vgg_state, lin_state)

        j_taps = VGG16Features().apply(
            {"params": variables["params"]["vgg"]}, jnp.asarray(x))
        assert len(j_taps) == len(t_taps) == 5
        for jt, tt in zip(j_taps, t_taps):
            tt = tt.numpy().transpose(0, 2, 3, 1)
            assert jt.shape == tt.shape
            scale = np.abs(tt).max() + 1e-6
            np.testing.assert_allclose(np.asarray(jt) / scale, tt / scale,
                                       atol=2e-5)

    def test_lpips_distance_parity(self, torch_vgg):
        """Full LPIPS distance matches the wheel's forward math, including
        the scaling layer and the imported lin weights."""
        rng = np.random.RandomState(2)
        x = np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32)
        y = np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32)

        lin_np = [np.abs(rng.randn(1, c, 1, 1)).astype(np.float32)
                  for c in [64, 128, 256, 512, 512]]
        with torch.no_grad():
            t_dist = torch_lpips(
                torch_vgg, [torch.from_numpy(w) for w in lin_np],
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()

        # the bare Sequential's keys are "0.weight"; torchvision nests it
        # under the `features` attribute — reproduce that prefix
        vgg_state = {f"features.{k}": v.numpy()
                     for k, v in torch_vgg.state_dict().items()}
        lin_state = {f"lin{i}.model.1.weight": w
                     for i, w in enumerate(lin_np)}
        variables = load_torch_lpips_weights(vgg_state, lin_state)
        j_dist = np.asarray(LPIPS().apply(variables, jnp.asarray(x),
                                          jnp.asarray(y)))
        np.testing.assert_allclose(j_dist, t_dist, rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------- InceptionV3 ---


class TBasicConv2d(tnn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avgp(x):  # pytorch-fid patch: count_include_pad=False
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TInceptionA(tnn.Module):
    def __init__(self, i, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(i, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(i, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(i, pool_features, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([
            self.branch1x1(x), self.branch5x5_2(self.branch5x5_1(x)),
            b3, self.branch_pool(_avgp(x))], 1)


class TInceptionB(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = TBasicConv2d(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), bd,
                          F.max_pool2d(x, 3, stride=2)], 1)


class TInceptionC(tnn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(i, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(i, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = TBasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avgp(x))], 1)


class TInceptionD(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(i, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(i, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class TInceptionE(tnn.Module):
    def __init__(self, i, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = TBasicConv2d(i, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(i, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = TBasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "max":  # FIDInceptionE_2
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:  # FIDInceptionE_1
            bp = _avgp(x)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TInceptionV3(tnn.Module):
    """The pytorch-fid-patched torchvision InceptionV3 trunk (no fc/aux),
    producing `Mixed_*.branch*.conv/bn.*` state-dict keys."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"]:
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))  # adaptive avg pool → [B, 2048]


@pytest.mark.slow
def test_inception_pool2048_parity():
    """Same random weights + BN stats → identical pool-2048 FID features.

    Input 151×151 (a valid InceptionV3 size — 2x cheaper than 299) fed with
    resize/normalize disabled on both sides, so the test isolates the
    trunk + import shim from resampling-library differences.
    """
    torch.manual_seed(3)
    tmodel = TInceptionV3().eval()
    # randomize BN running stats so the import of mean/var is exercised
    g = torch.Generator().manual_seed(4)
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5

    rng = np.random.RandomState(5)
    x = rng.rand(2, 151, 151, 3).astype(np.float32) * 2.0 - 1.0

    with torch.no_grad():
        t_feat = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = load_torch_inception_weights(state)
    model = InceptionV3Features(resize_input=False, normalize_input=False)
    j_feat = np.asarray(model.apply(variables, jnp.asarray(x)))

    assert j_feat.shape == t_feat.shape == (2, 2048)
    scale = np.abs(t_feat).max() + 1e-6
    np.testing.assert_allclose(j_feat / scale, t_feat / scale, atol=5e-4)
