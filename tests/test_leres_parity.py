"""Random-weight torch parity for the LeReS depth port.

Hand-builds RelDepthModel's graph (ResNeXt101-32x8d encoder + FTB/FFM/AO
decoder — /root/reference/src/controlnet_aux/leres/leres/) in raw torch
with the checkpoint's state-dict naming, randomizes weights and BN
running stats, and asserts convert_leres + leres_apply match.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pcdms_tpu.pose.detectors import leres as lr  # noqa: E402

pytestmark = pytest.mark.slow

TOL = dict(atol=1e-3, rtol=1e-3)


class Bottleneck(nn.Module):
    def __init__(self, cin, width, cout, stride, downsample):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=32,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        sc = self.downsample(x) if self.downsample is not None else x
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return F.relu(h + sc)


class ResNeXt(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cin = 64
        for li, (depth, planes) in enumerate(
                zip((3, 4, 23, 3), (64, 128, 256, 512)), 1):
            width = planes * 8 * 32 // 64
            cout = planes * 4
            blocks = [Bottleneck(cin if i == 0 else cout, width, cout,
                                 2 if (i == 0 and li > 1) else 1, i == 0)
                      for i in range(depth)]
            setattr(self, f"layer{li}", nn.Sequential(*blocks))
            cin = cout

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.max_pool2d(h, 3, 2, 1)
        feats = []
        for li in range(1, 5):
            h = getattr(self, f"layer{li}")(h)
            feats.append(h)
        return feats


class FTB(nn.Module):
    def __init__(self, cin, mid):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, mid, 3, 1, 1)
        self.conv_branch = nn.Sequential(
            nn.ReLU(), nn.Conv2d(mid, mid, 3, 1, 1), nn.BatchNorm2d(mid),
            nn.ReLU(), nn.Conv2d(mid, mid, 3, 1, 1))

    def forward(self, x):
        x = self.conv1(x)
        return F.relu(x + self.conv_branch(x))


class FFM(nn.Module):
    def __init__(self, cin, mid):
        super().__init__()
        self.ftb1 = FTB(cin, mid)
        self.ftb2 = FTB(mid, mid)

    def forward(self, low, high):
        h = self.ftb2(self.ftb1(low) + high)
        return F.interpolate(h, scale_factor=2, mode="bilinear",
                             align_corners=True)


class Decoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = FTB(2048, 512)
        self.conv1 = nn.Conv2d(512, 256, 3, 1, 1)
        self.ffm2 = FFM(1024, 256)
        self.ffm1 = FFM(512, 256)
        self.ffm0 = FFM(256, 256)
        self.outconv = nn.Module()
        self.outconv.adapt_conv = nn.Sequential(
            nn.Conv2d(256, 128, 3, 1, 1), nn.BatchNorm2d(128), nn.ReLU(),
            nn.Conv2d(128, 1, 3, 1, 1))

    def forward(self, feats):
        x = self.conv1(self.conv(feats[3]))
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        x = self.ffm2(feats[2], x)
        x = self.ffm1(feats[1], x)
        x = self.ffm0(feats[0], x)
        x = self.outconv.adapt_conv(x)
        return F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=True)


class RelDepthModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.depth_model = nn.Module()
        self.depth_model.encoder_modules = ResNeXt()
        self.depth_model.decoder_modules = Decoder()

    def forward(self, x):
        return self.depth_model.decoder_modules(
            self.depth_model.encoder_modules(x))


def test_leres_parity():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    tm = RelDepthModel().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.3, m.running_mean.shape)
                    .astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, m.running_var.shape)
                    .astype(np.float32)))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = lr.convert_leres(sd)

    bgr = rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32)
    xn = (bgr / 255.0 - lr._MEAN) / lr._STD
    with torch.no_grad():
        want = tm(torch.from_numpy(
            np.transpose(xn, (0, 3, 1, 2)).copy())).numpy()[:, 0]
    got = np.asarray(lr.leres_apply(params, jnp.asarray(bgr)))
    assert got.shape == want.shape == (1, 64, 96)
    np.testing.assert_allclose(got, want, **TOL)


def test_leres_detector_smoke():
    import jax
    det = lr.LeresDetector(lr.leres_init(jax.random.PRNGKey(0)))
    img = (np.random.default_rng(1).uniform(0, 255, (80, 64, 3))
           .astype(np.uint8))
    out = det(img, detect_resolution=64, image_resolution=64)
    assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3
    with pytest.raises(NotImplementedError):
        det(img, boost=True, detect_resolution=64)
