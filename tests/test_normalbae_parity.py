"""Random-weight torch parity for the NormalBae port.

Hand-builds NNET (tf_efficientnet_b5_ap encoder + BN decoder —
/root/reference/src/controlnet_aux/normalbae/nets/) in raw torch with the
checkpoint naming (geffnet conv_pw/conv_dw/conv_pwl/se layout under
encoder.original_model.*), randomizes weights and BN stats, and asserts
convert_nnet + nnet_apply reproduce the torch test-mode forward.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pcdms_tpu.pose.detectors import normalbae as nb  # noqa: E402

pytestmark = pytest.mark.slow

TOL = dict(atol=1e-3, rtol=1e-3)
BN_EPS = 1e-3


def _pad_same(x, k, s):
    ph = max(0, (-(-x.shape[2] // s) - 1) * s + k - x.shape[2])
    pw = max(0, (-(-x.shape[3] // s) - 1) * s + k - x.shape[3])
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class ConvSame(nn.Conv2d):
    def __init__(self, cin, cout, k, s=1, groups=1):
        super().__init__(cin, cout, k, s, 0, groups=groups, bias=False)

    def forward(self, x):
        return F.conv2d(_pad_same(x, self.kernel_size[0], self.stride[0]),
                        self.weight, None, self.stride, 0, 1, self.groups)


class SE(nn.Module):
    def __init__(self, mid, reduced):
        super().__init__()
        self.conv_reduce = nn.Conv2d(mid, reduced, 1)
        self.conv_expand = nn.Conv2d(reduced, mid, 1)

    def forward(self, x):
        g = x.mean((2, 3), keepdim=True)
        g = torch.sigmoid(self.conv_expand(F.silu(self.conv_reduce(g))))
        return x * g


class DSBlock(nn.Module):
    def __init__(self, cin, cout, k, s):
        super().__init__()
        self.residual = s == 1 and cin == cout
        self.conv_dw = ConvSame(cin, cin, k, s, groups=cin)
        self.bn1 = nn.BatchNorm2d(cin, eps=BN_EPS)
        self.se = SE(cin, max(1, cin // 4))
        self.conv_pw = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout, eps=BN_EPS)

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_dw(x)))
        h = self.se(h)
        h = self.bn2(self.conv_pw(h))
        return x + h if self.residual else h


class IRBlock(nn.Module):
    def __init__(self, cin, cout, k, s, e):
        super().__init__()
        mid = cin * e
        self.residual = s == 1 and cin == cout
        self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=BN_EPS)
        self.conv_dw = ConvSame(mid, mid, k, s, groups=mid)
        self.bn2 = nn.BatchNorm2d(mid, eps=BN_EPS)
        self.se = SE(mid, max(1, cin // 4))
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout, eps=BN_EPS)

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = F.silu(self.bn2(self.conv_dw(h)))
        h = self.se(h)
        h = self.bn3(self.conv_pwl(h))
        return x + h if self.residual else h


class EffNetB5(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_stem = ConvSame(3, 48, 3, 2)
        self.bn1 = nn.BatchNorm2d(48, eps=BN_EPS)
        stages = []
        cin = 48
        for (k, s, e, cout, reps) in nb._STAGES:
            blocks = []
            for bi in range(reps):
                stride = s if bi == 0 else 1
                cls = DSBlock if e == 1 else IRBlock
                args = (cin, cout, k, stride) if e == 1 else (
                    cin, cout, k, stride, e)
                blocks.append(cls(*args))
                cin = cout
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)
        self.conv_head = nn.Conv2d(512, 2048, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(2048, eps=BN_EPS)

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_stem(x)))
        skips = []
        for si, stage in enumerate(self.blocks):
            h = stage(h)
            if si in (0, 1, 2, 4):
                skips.append(h)
        # decoder consumes the raw conv_head output (features[11]),
        # before bn2/act2
        skips.append(self.conv_head(h))
        return skips


class UpSampleBN(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(cin, cout, 3, 1, 1), nn.BatchNorm2d(cout, eps=BN_EPS),
            nn.LeakyReLU(),
            nn.Conv2d(cout, cout, 3, 1, 1), nn.BatchNorm2d(cout,
                                                           eps=BN_EPS),
            nn.LeakyReLU())

    def forward(self, x, skip):
        up = F.interpolate(x, size=skip.shape[2:], mode="bilinear",
                           align_corners=True)
        return self._net(torch.cat([up, skip], 1))


def _norm_normalize(n):
    x, y, z, kappa = torch.split(n, 1, dim=1)
    norm = torch.sqrt(x ** 2 + y ** 2 + z ** 2) + 1e-10
    kappa = F.elu(kappa) + 1.0 + 0.01
    return torch.cat([x / norm, y / norm, z / norm, kappa], 1)


class Decoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv2 = nn.Conv2d(2048, 2048, 1)
        self.up1 = UpSampleBN(2048 + 176, 1024)
        self.up2 = UpSampleBN(1024 + 64, 512)
        self.up3 = UpSampleBN(512 + 40, 256)
        self.up4 = UpSampleBN(256 + 24, 128)
        self.out_conv_res8 = nn.Conv2d(512, 4, 3, 1, 1)

        def mlp(cin):
            return nn.Sequential(nn.Conv1d(cin, 128, 1), nn.ReLU(),
                                 nn.Conv1d(128, 128, 1), nn.ReLU(),
                                 nn.Conv1d(128, 128, 1), nn.ReLU(),
                                 nn.Conv1d(128, 4, 1))

        self.out_conv_res4 = mlp(512 + 4)
        self.out_conv_res2 = mlp(256 + 4)
        self.out_conv_res1 = mlp(128 + 4)

    def forward(self, feats):
        b0, b1, b2, b4, head = feats
        x_d0 = self.conv2(head)
        x_d1 = self.up1(x_d0, b4)
        x_d2 = self.up2(x_d1, b2)
        x_d3 = self.up3(x_d2, b1)
        x_d4 = self.up4(x_d3, b0)
        out8 = _norm_normalize(self.out_conv_res8(x_d2))

        def refine(x_d, prev, head_mlp):
            feat = F.interpolate(x_d, scale_factor=2, mode="bilinear",
                                 align_corners=True)
            init = F.interpolate(prev, scale_factor=2, mode="bilinear",
                                 align_corners=True)
            fm = torch.cat([feat, init], 1)
            B, C, H, W = fm.shape
            out = head_mlp(fm.view(B, C, -1))
            return _norm_normalize(out).view(B, 4, H, W)

        out4 = refine(x_d2, out8, self.out_conv_res4)
        out2 = refine(x_d3, out4, self.out_conv_res2)
        out1 = refine(x_d4, out2, self.out_conv_res1)
        return out1


class NNET(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.original_model = EffNetB5()
        self.decoder = Decoder()

    def forward(self, x):
        return self.decoder(self.encoder.original_model(x))


def test_nnet_parity():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    tm = NNET().eval()
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
    params = nb.convert_nnet(sd)

    img = rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32)
    xn = (img / 255.0 - nb._MEAN) / nb._STD
    with torch.no_grad():
        want = tm(torch.from_numpy(
            np.transpose(xn, (0, 3, 1, 2)).copy())).numpy()
    got = np.asarray(nb.nnet_apply(params, jnp.asarray(xn)))
    want = np.transpose(want, (0, 2, 3, 1))
    assert got.shape == want.shape == (1, 64, 96, 4)
    np.testing.assert_allclose(got, want, **TOL)


def test_normalbae_detector_smoke():
    import jax
    det = nb.NormalBaeDetector(nb.nnet_init(jax.random.PRNGKey(0)))
    img = (np.random.default_rng(1).uniform(0, 255, (80, 64, 3))
           .astype(np.uint8))
    out = det(img, detect_resolution=64, image_resolution=64)
    assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3
