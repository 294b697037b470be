"""Random-weight torch parity for the JAX-native DWPose model pair.

Hand-builds mmdet-named YOLOX-l and mmpose-named RTMPose-l torch mirrors
(yolox_l_8xb8-300e_coco.py:4-44, dwpose-l_384x288.py:48-95 describe the
graphs; module/state-dict naming follows mmdet/mmpose conventions that
convert_yolox/convert_rtmpose expect), randomizes weights AND BatchNorm
running stats (so the BN folding in the converters is actually
exercised), and asserts the JAX apply matches the torch eval forward.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pcdms_tpu.pose.detectors import rtmpose as rp  # noqa: E402
from pcdms_tpu.pose.detectors import yolox as yx  # noqa: E402

pytestmark = pytest.mark.slow

TOL = dict(atol=5e-4, rtol=5e-4)


def _randomize_bn(model, rng):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.3, m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, m.running_var.shape)
                .astype(np.float32)))


class ConvModule(nn.Module):
    def __init__(self, cin, cout, k, s=1, eps=1e-3, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=False,
                              groups=groups)
        self.bn = nn.BatchNorm2d(cout, eps=eps)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class DarknetBottleneck(nn.Module):
    def __init__(self, c, eps):
        super().__init__()
        self.conv1 = ConvModule(c, c, 1, eps=eps)
        self.conv2 = ConvModule(c, c, 3, eps=eps)


class CSPLayer(nn.Module):
    def __init__(self, cin, cout, n, add, eps=1e-3):
        super().__init__()
        mid = cout // 2
        self.add = add
        self.main_conv = ConvModule(cin, mid, 1, eps=eps)
        self.short_conv = ConvModule(cin, mid, 1, eps=eps)
        self.final_conv = ConvModule(2 * mid, cout, 1, eps=eps)
        self.blocks = nn.ModuleList(
            [DarknetBottleneck(mid, eps) for _ in range(n)])

    def forward(self, x):
        main, short = self.main_conv(x), self.short_conv(x)
        h = main
        for b in self.blocks:
            y = b.conv2(b.conv1(h))
            h = h + y if self.add else y
        return self.final_conv(torch.cat([h, short], 1))


class SPP(nn.Module):
    def __init__(self, c, eps=1e-3):
        super().__init__()
        self.conv1 = ConvModule(c, c // 2, 1, eps=eps)
        self.conv2 = ConvModule(c * 2, c, 1, eps=eps)

    def forward(self, x):
        h = self.conv1(x)
        pools = [h] + [F.max_pool2d(h, k, 1, k // 2) for k in (5, 9, 13)]
        return self.conv2(torch.cat(pools, 1))


def test_yolox_parity():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    EPS = 1e-3

    class Focus(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = ConvModule(12, 64, 3, 1, eps=EPS)

        def forward(self, x):
            return self.conv(torch.cat(
                [x[..., ::2, ::2], x[..., 1::2, ::2],
                 x[..., ::2, 1::2], x[..., 1::2, 1::2]], 1))

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = Focus()
            self.stage1 = nn.Sequential(ConvModule(64, 128, 3, 2, EPS),
                                        CSPLayer(128, 128, 3, True, EPS))
            self.stage2 = nn.Sequential(ConvModule(128, 256, 3, 2, EPS),
                                        CSPLayer(256, 256, 9, True, EPS))
            self.stage3 = nn.Sequential(ConvModule(256, 512, 3, 2, EPS),
                                        CSPLayer(512, 512, 9, True, EPS))
            self.stage4 = nn.Sequential(ConvModule(512, 1024, 3, 2, EPS),
                                        SPP(1024, EPS),
                                        CSPLayer(1024, 1024, 3, False, EPS))

        def forward(self, x):
            h = self.stem(x)
            h = self.stage1(h)
            c3 = self.stage2(h)
            c4 = self.stage3(c3)
            c5 = self.stage4(c4)
            return c3, c4, c5

    class Neck(nn.Module):
        def __init__(self):
            super().__init__()
            self.reduce_layers = nn.ModuleList(
                [ConvModule(1024, 512, 1, eps=EPS),
                 ConvModule(512, 256, 1, eps=EPS)])
            self.top_down_blocks = nn.ModuleList(
                [CSPLayer(1024, 512, 3, False, EPS),
                 CSPLayer(512, 256, 3, False, EPS)])
            self.downsamples = nn.ModuleList(
                [ConvModule(256, 256, 3, 2, EPS),
                 ConvModule(512, 512, 3, 2, EPS)])
            self.bottom_up_blocks = nn.ModuleList(
                [CSPLayer(512, 512, 3, False, EPS),
                 CSPLayer(1024, 1024, 3, False, EPS)])
            self.out_convs = nn.ModuleList(
                [ConvModule(256, 256, 1, eps=EPS),
                 ConvModule(512, 256, 1, eps=EPS),
                 ConvModule(1024, 256, 1, eps=EPS)])

        def forward(self, feats):
            c3, c4, c5 = feats
            r0 = self.reduce_layers[0](c5)
            td0 = self.top_down_blocks[0](torch.cat(
                [F.interpolate(r0, scale_factor=2, mode="nearest"), c4], 1))
            r1 = self.reduce_layers[1](td0)
            td1 = self.top_down_blocks[1](torch.cat(
                [F.interpolate(r1, scale_factor=2, mode="nearest"), c3], 1))
            bu0 = self.bottom_up_blocks[0](torch.cat(
                [self.downsamples[0](td1), r1], 1))
            bu1 = self.bottom_up_blocks[1](torch.cat(
                [self.downsamples[1](bu0), r0], 1))
            return [self.out_convs[0](td1), self.out_convs[1](bu0),
                    self.out_convs[2](bu1)]

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.multi_level_cls_convs = nn.ModuleList(
                [nn.Sequential(ConvModule(256, 256, 3, eps=EPS),
                               ConvModule(256, 256, 3, eps=EPS))
                 for _ in range(3)])
            self.multi_level_reg_convs = nn.ModuleList(
                [nn.Sequential(ConvModule(256, 256, 3, eps=EPS),
                               ConvModule(256, 256, 3, eps=EPS))
                 for _ in range(3)])
            self.multi_level_conv_cls = nn.ModuleList(
                [nn.Conv2d(256, 80, 1) for _ in range(3)])
            self.multi_level_conv_reg = nn.ModuleList(
                [nn.Conv2d(256, 4, 1) for _ in range(3)])
            self.multi_level_conv_obj = nn.ModuleList(
                [nn.Conv2d(256, 1, 1) for _ in range(3)])

        def forward(self, feats):
            outs = []
            for lvl, x in enumerate(feats):
                cf = self.multi_level_cls_convs[lvl](x)
                rf = self.multi_level_reg_convs[lvl](x)
                cls = torch.sigmoid(self.multi_level_conv_cls[lvl](cf))
                reg = self.multi_level_conv_reg[lvl](rf)
                obj = torch.sigmoid(self.multi_level_conv_obj[lvl](rf))
                packed = torch.cat([reg, obj, cls], 1)
                outs.append(packed.flatten(2).transpose(1, 2))
            return torch.cat(outs, 1)

    class YOLOX(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.neck = Neck()
            self.bbox_head = Head()

        def forward(self, x):
            return self.bbox_head(self.neck(self.backbone(x)))

    tm = YOLOX().eval()
    with torch.no_grad():
        _randomize_bn(tm, rng)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = yx.convert_yolox(sd)

    x = rng.uniform(0, 255, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    got = np.asarray(yx.yolox_apply(params, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 16 * 16 + 8 * 8 + 4 * 4, 85)
    np.testing.assert_allclose(got, want, **TOL)


# ---------------------------------------------------------------------------
# RTMPose-l
# ---------------------------------------------------------------------------

class _ScaleNorm(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.scale = dim ** -0.5
        self.eps = eps
        self.g = nn.Parameter(torch.ones(1))

    def forward(self, x):
        norm = torch.norm(x, dim=-1, keepdim=True) * self.scale
        return x / norm.clamp(min=self.eps) * self.g


class _Scale(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return x * self.scale


class _GAU(nn.Module):
    """mmpose RTMCCBlock, self-attn mode, no rel bias / pos enc."""

    def __init__(self, dim=256, e=512, s=128):
        super().__init__()
        self.e, self.s = e, s
        self.ln = _ScaleNorm(dim)
        self.uv = nn.Linear(dim, 2 * e + s, bias=False)
        self.gamma = nn.Parameter(torch.rand(2, s))
        self.beta = nn.Parameter(torch.rand(2, s))
        self.o = nn.Linear(e, dim, bias=False)
        self.res_scale = _Scale(dim)
        self.sqrt_s = math.sqrt(s)

    def forward(self, x):
        h = self.ln(x)
        uv = F.silu(self.uv(h))
        u, v, base = torch.split(uv, [self.e, self.e, self.s], dim=-1)
        base = (base.unsqueeze(2) * self.gamma[None, None]
                + self.beta[None, None])
        q, k = torch.unbind(base, dim=2)
        qk = torch.bmm(q, k.transpose(1, 2))
        kernel = torch.square(F.relu(qk / self.sqrt_s))
        out = self.o(u * torch.bmm(kernel, v))
        return self.res_scale(x) + out


def test_rtmpose_parity():
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    EPS = 1e-5

    class ChannelAttention(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.fc = nn.Conv2d(c, c, 1)

        def forward(self, x):
            g = F.hardsigmoid(self.fc(x.mean((2, 3), keepdim=True)))
            return x * g

    class CSPNeXtBlock(nn.Module):
        def __init__(self, c, add):
            super().__init__()
            hidden = c // 2
            self.add = add
            self.conv1 = ConvModule(c, hidden, 3, eps=EPS)
            self.conv2 = nn.Module()
            self.conv2.depthwise_conv = ConvModule(hidden, hidden, 5,
                                                   eps=EPS, groups=hidden)
            self.conv2.pointwise_conv = ConvModule(hidden, c, 1, eps=EPS)

        def forward(self, x):
            h = self.conv1(x)
            h = self.conv2.pointwise_conv(self.conv2.depthwise_conv(h))
            return x + h if self.add else h

    class CSPNeXtLayer(nn.Module):
        def __init__(self, cin, cout, n, add):
            super().__init__()
            mid = cout // 2
            self.main_conv = ConvModule(cin, mid, 1, eps=EPS)
            self.short_conv = ConvModule(cin, mid, 1, eps=EPS)
            self.final_conv = ConvModule(2 * mid, cout, 1, eps=EPS)
            self.attention = ChannelAttention(2 * mid)
            self.blocks = nn.ModuleList(
                [CSPNeXtBlock(mid, add) for _ in range(n)])

        def forward(self, x):
            main, short = self.main_conv(x), self.short_conv(x)
            h = main
            for b in self.blocks:
                h = b(h)
            return self.final_conv(self.attention(
                torch.cat([h, short], 1)))

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(ConvModule(3, 32, 3, 2, EPS),
                                      ConvModule(32, 32, 3, 1, EPS),
                                      ConvModule(32, 64, 3, 1, EPS))
            self.stage1 = nn.Sequential(ConvModule(64, 128, 3, 2, EPS),
                                        CSPNeXtLayer(128, 128, 3, True))
            self.stage2 = nn.Sequential(ConvModule(128, 256, 3, 2, EPS),
                                        CSPNeXtLayer(256, 256, 6, True))
            self.stage3 = nn.Sequential(ConvModule(256, 512, 3, 2, EPS),
                                        CSPNeXtLayer(512, 512, 6, True))
            self.stage4 = nn.Sequential(ConvModule(512, 1024, 3, 2, EPS),
                                        SPP(1024, EPS),
                                        CSPNeXtLayer(1024, 1024, 3, False))

        def forward(self, x):
            return self.stage4(self.stage3(self.stage2(self.stage1(
                self.stem(x)))))

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.final_layer = nn.Conv2d(1024, 133, 7, padding=3)
            self.mlp = nn.Sequential(_ScaleNorm(108),
                                     nn.Linear(108, 256, bias=False))
            self.gau = _GAU()
            self.cls_x = nn.Linear(256, 576, bias=False)
            self.cls_y = nn.Linear(256, 768, bias=False)

        def forward(self, feat):
            h = self.final_layer(feat).flatten(2)
            h = self.gau(self.mlp(h))
            return self.cls_x(h), self.cls_y(h)

    class RTMPose(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.head = Head()

        def forward(self, x):
            return self.head(self.backbone(x))

    tm = RTMPose().eval()
    with torch.no_grad():
        _randomize_bn(tm, rng)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = rp.convert_rtmpose(sd)

    x = rng.uniform(0, 255, (1, 384, 288, 3)).astype(np.float32)
    xn = (x - rp._MEAN) / rp._STD
    with torch.no_grad():
        wx, wy = tm(torch.from_numpy(np.transpose(xn, (0, 3, 1, 2)).copy()))
    gx, gy = rp.rtmpose_apply(params, jnp.asarray(x))
    assert gx.shape == (1, 133, 576) and gy.shape == (1, 133, 768)
    np.testing.assert_allclose(np.asarray(gx), wx.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(gy), wy.numpy(), **TOL)


def test_yolox_decode_roundtrip():
    """JAX net raw output feeds the existing decode_yolox protocol."""
    from pcdms_tpu.pose.dwpose import decode_yolox
    rng = np.random.default_rng(2)
    n = 16 * 16 + 8 * 8 + 4 * 4
    preds = rng.normal(0, 0.1, (1, n, 85)).astype(np.float32)
    preds[:, :, 4:] = rng.uniform(0, 1, (1, n, 81))
    boxes, scores = decode_yolox(preds, ratio=1.0, input_size=128)
    assert boxes.shape[1] == 4 if len(boxes) else True
    assert len(boxes) == len(scores)


def test_dwpose_jax_end_to_end_random_weights():
    """DWposeJAX pieces with random weights: jitted YOLOX forward +
    decode/NMS at a small letterbox size, then the full __call__ with a
    pinned detection (a 640px YOLOX-l CPU forward per box is too slow for
    unit tests) exercising crop, RTMPose forward, SimCC decode,
    COCO->OpenPose remap, and the renderer."""
    from pcdms_tpu.pose.dwpose import DWposeJAX
    det = DWposeJAX(yx.yolox_init(jax.random.PRNGKey(0)),
                    rp.rtmpose_init(jax.random.PRNGKey(1)), det_size=128)
    img = (np.random.default_rng(3).uniform(0, 255, (96, 64, 3))
           .astype(np.uint8))
    boxes, scores = det.detect_persons(img)
    assert len(boxes) == len(scores)

    det.detect_persons = lambda image_rgb: (
        np.array([[8.0, 8.0, 56.0, 88.0]]), np.array([0.9]))
    render, kpts, kscores = det(img)
    assert render.shape == (96, 64, 3) and render.dtype == np.uint8
    assert kpts.shape == (1, 18, 2) and kscores.shape == (1, 18)
