"""Random-weight torch parity for the aux NN detectors.

Same strategy the FID-Inception/LPIPS ports use: torch is installed (CPU)
but the pretrained checkpoints are not, so each test hand-builds the
published torch architecture (HED's DoubleConvBlock stack, the lineart
ResNet generator, the pix2pix UnetSkipConnectionBlock recursion, PiDiNet's
pixel-difference convs — /root/reference/src/controlnet_aux/{hed,lineart,
lineart_anime,pidi}), random-initializes it, converts its state_dict
through pcdms_tpu.pose.detectors.convert_*, and asserts the JAX apply
matches the torch forward. This pins both the architecture math and the
state-dict key map the converters rely on.
"""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow

TOL = dict(atol=2e-4, rtol=2e-4)


def _sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# HED
# ---------------------------------------------------------------------------

class _TorchDoubleConvBlock(nn.Module):
    def __init__(self, cin, cout, n):
        super().__init__()
        self.convs = nn.Sequential()
        self.convs.append(nn.Conv2d(cin, cout, 3, 1, 1))
        for _ in range(1, n):
            self.convs.append(nn.Conv2d(cout, cout, 3, 1, 1))
        self.projection = nn.Conv2d(cout, 1, 1)

    def forward(self, x, down_sampling=False):
        h = F.max_pool2d(x, 2, 2) if down_sampling else x
        for c in self.convs:
            h = F.relu(c(h))
        return h, self.projection(h)


class _TorchHED(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm = nn.Parameter(torch.randn(1, 3, 1, 1))
        self.block1 = _TorchDoubleConvBlock(3, 64, 2)
        self.block2 = _TorchDoubleConvBlock(64, 128, 2)
        self.block3 = _TorchDoubleConvBlock(128, 256, 3)
        self.block4 = _TorchDoubleConvBlock(256, 512, 3)
        self.block5 = _TorchDoubleConvBlock(512, 512, 3)

    def forward(self, x):
        h = x - self.norm
        outs = []
        for i, blk in enumerate([self.block1, self.block2, self.block3,
                                 self.block4, self.block5]):
            h, p = blk(h, down_sampling=i > 0)
            outs.append(p)
        return outs


def test_hed_parity():
    from pcdms_tpu.pose.detectors import convert_hed, hed_apply

    torch.manual_seed(0)
    net = _TorchHED().eval()
    params = convert_hed(_sd_numpy(net))

    x = np.random.default_rng(0).uniform(0, 255, (1, 64, 96, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        expected = [p.numpy()[0, 0] for p in
                    net(torch.from_numpy(x.transpose(0, 3, 1, 2)))]
    got = [np.asarray(p[0, :, :, 0]) for p in hed_apply(params,
                                                        jnp.asarray(x))]
    assert len(got) == 5
    for g, e in zip(got, expected):
        np.testing.assert_allclose(g, e, **TOL)


# ---------------------------------------------------------------------------
# LineArt (ResNet generator)
# ---------------------------------------------------------------------------

def _torch_lineart_generator():
    norm = nn.InstanceNorm2d

    class ResidualBlock(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.conv_block = nn.Sequential(
                nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3), norm(ch),
                nn.ReLU(True),
                nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3), norm(ch))

        def forward(self, x):
            return x + self.conv_block(x)

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            self.model0 = nn.Sequential(nn.ReflectionPad2d(3),
                                        nn.Conv2d(3, 64, 7), norm(64),
                                        nn.ReLU(True))
            self.model1 = nn.Sequential(
                nn.Conv2d(64, 128, 3, 2, 1), norm(128), nn.ReLU(True),
                nn.Conv2d(128, 256, 3, 2, 1), norm(256), nn.ReLU(True))
            self.model2 = nn.Sequential(*[ResidualBlock(256)
                                          for _ in range(3)])
            self.model3 = nn.Sequential(
                nn.ConvTranspose2d(256, 128, 3, 2, 1, output_padding=1),
                norm(128), nn.ReLU(True),
                nn.ConvTranspose2d(128, 64, 3, 2, 1, output_padding=1),
                norm(64), nn.ReLU(True))
            self.model4 = nn.Sequential(nn.ReflectionPad2d(3),
                                        nn.Conv2d(64, 1, 7), nn.Sigmoid())

        def forward(self, x):
            return self.model4(self.model3(self.model2(
                self.model1(self.model0(x)))))

    return Generator()


def test_lineart_parity():
    from pcdms_tpu.pose.detectors import convert_lineart, lineart_apply

    torch.manual_seed(1)
    net = _torch_lineart_generator().eval()
    params = convert_lineart(_sd_numpy(net))

    x = np.random.default_rng(1).uniform(0, 1, (1, 64, 96, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        expected = net(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy()[0, 0]
    got = np.asarray(lineart_apply(params, jnp.asarray(x))[0, :, :, 0])
    np.testing.assert_allclose(got, expected, **TOL)


# ---------------------------------------------------------------------------
# LineArt-Anime (pix2pix UNet generator)
# ---------------------------------------------------------------------------

def _torch_unet_generator():
    norm = functools.partial(nn.InstanceNorm2d, affine=False,
                             track_running_stats=False)

    class Block(nn.Module):
        def __init__(self, outer, inner, input_nc=None, submodule=None,
                     outermost=False, innermost=False):
            super().__init__()
            self.outermost = outermost
            input_nc = input_nc if input_nc is not None else outer
            downconv = nn.Conv2d(input_nc, inner, 4, 2, 1, bias=True)
            if outermost:
                upconv = nn.ConvTranspose2d(inner * 2, outer, 4, 2, 1)
                model = [downconv, submodule, nn.ReLU(True), upconv,
                         nn.Tanh()]
            elif innermost:
                upconv = nn.ConvTranspose2d(inner, outer, 4, 2, 1,
                                            bias=True)
                model = [nn.LeakyReLU(0.2, True), downconv, nn.ReLU(True),
                         upconv, norm(outer)]
            else:
                upconv = nn.ConvTranspose2d(inner * 2, outer, 4, 2, 1,
                                            bias=True)
                model = [nn.LeakyReLU(0.2, True), downconv, norm(inner),
                         submodule, nn.ReLU(True), upconv, norm(outer)]
            self.model = nn.Sequential(*model)

        def forward(self, x):
            if self.outermost:
                return self.model(x)
            return torch.cat([x, self.model(x)], 1)

    class UnetGenerator(nn.Module):
        def __init__(self, input_nc=3, output_nc=1, num_downs=8, ngf=64):
            super().__init__()
            blk = Block(ngf * 8, ngf * 8, innermost=True)
            for _ in range(num_downs - 5):
                blk = Block(ngf * 8, ngf * 8, submodule=blk)
            blk = Block(ngf * 4, ngf * 8, submodule=blk)
            blk = Block(ngf * 2, ngf * 4, submodule=blk)
            blk = Block(ngf, ngf * 2, submodule=blk)
            self.model = Block(output_nc, ngf, input_nc=input_nc,
                               submodule=blk, outermost=True)

        def forward(self, x):
            return self.model(x)

    return UnetGenerator()


def test_lineart_anime_parity():
    from pcdms_tpu.pose.detectors import (
        convert_lineart_anime, lineart_anime_apply,
    )

    torch.manual_seed(2)
    net = _torch_unet_generator().eval()
    params = convert_lineart_anime(_sd_numpy(net))

    x = np.random.default_rng(2).uniform(-1, 1, (1, 256, 256, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        expected = net(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy()[0, 0]
    got = np.asarray(lineart_anime_apply(params,
                                         jnp.asarray(x))[0, :, :, 0])
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=5e-4)


# ---------------------------------------------------------------------------
# PiDiNet (functional torch oracle with the published pdc algebra)
# ---------------------------------------------------------------------------

def _pdc_torch(op, x, w, bias=None, stride=1, padding=1, groups=1):
    """The published pixel-difference conv ops (pidi/model.py:299-345)."""
    if op == "cv":
        return F.conv2d(x, w, bias, stride, padding, 1, groups)
    if op == "cd":
        wc = w.sum(dim=[2, 3], keepdim=True)
        yc = F.conv2d(x, wc, stride=stride, padding=0, groups=groups)
        y = F.conv2d(x, w, bias, stride, padding, 1, groups)
        return y - yc
    if op == "ad":
        shape = w.shape
        wf = w.view(shape[0], shape[1], -1)
        wconv = (wf - wf[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]]).view(shape)
        return F.conv2d(x, wconv, bias, stride, padding, 1, groups)
    if op == "rd":
        shape = w.shape
        buf = torch.zeros(shape[0], shape[1], 25)
        wf = w.view(shape[0], shape[1], -1)
        buf[:, :, [0, 2, 4, 10, 14, 20, 22, 24]] = wf[:, :, 1:]
        buf[:, :, [6, 7, 8, 11, 13, 16, 17, 18]] = -wf[:, :, 1:]
        buf = buf.view(shape[0], shape[1], 5, 5)
        return F.conv2d(x, buf, bias, stride, 2, 1, groups)
    raise ValueError(op)


class _TorchPiDiNet:
    """Functional oracle over a name->tensor dict matching the torch
    module's state_dict layout (pidi/model.py:496-641, carv4/dil/sa)."""

    PDCS = ["cd", "ad", "rd", "cv"] * 4
    PLANES = [60, 120, 240, 240]

    def __init__(self, seed):
        g = torch.Generator().manual_seed(seed)

        def r(*shape):
            return torch.randn(*shape, generator=g) * 0.1

        sd = {"init_block.weight": r(60, 3, 3, 3)}
        layer, in_ch = 1, 60
        for s, ch in enumerate(self.PLANES):
            for b in range(3 if s == 0 else 4):
                name = f"block{s + 1}_{b + 1}"
                stride2 = s > 0 and b == 0
                cin = in_ch if stride2 else ch
                sd[f"{name}.conv1.weight"] = r(cin, 1, 3, 3)
                sd[f"{name}.conv2.weight"] = r(ch, cin, 1, 1)
                if stride2:
                    sd[f"{name}.shortcut.weight"] = r(ch, cin, 1, 1)
                    sd[f"{name}.shortcut.bias"] = r(ch)
                layer += 1
            sd[f"dilations.{s}.conv1.weight"] = r(24, ch, 1, 1)
            sd[f"dilations.{s}.conv1.bias"] = r(24)
            for i in (1, 2, 3, 4):
                sd[f"dilations.{s}.conv2_{i}.weight"] = r(24, 24, 3, 3)
            sd[f"attentions.{s}.conv1.weight"] = r(4, 24, 1, 1)
            sd[f"attentions.{s}.conv1.bias"] = r(4)
            sd[f"attentions.{s}.conv2.weight"] = r(1, 4, 3, 3)
            sd[f"conv_reduces.{s}.conv.weight"] = r(1, 24, 1, 1)
            sd[f"conv_reduces.{s}.conv.bias"] = r(1)
            in_ch = ch
        sd["classifier.weight"] = r(1, 4, 1, 1)
        sd["classifier.bias"] = r(1)
        self.sd = sd

    def forward(self, x):
        sd = self.sd
        H, W = x.shape[2:]
        f = _pdc_torch(self.PDCS[0], x, sd["init_block.weight"])
        layer, logits = 1, []
        for s in range(4):
            for b in range(3 if s == 0 else 4):
                name = f"block{s + 1}_{b + 1}"
                stride2 = s > 0 and b == 0
                if stride2:
                    f = F.max_pool2d(f, 2, 2)
                y = _pdc_torch(self.PDCS[layer], f,
                               sd[f"{name}.conv1.weight"],
                               groups=f.shape[1])
                y = F.conv2d(F.relu(y), sd[f"{name}.conv2.weight"])
                if stride2:
                    f = F.conv2d(f, sd[f"{name}.shortcut.weight"],
                                 sd[f"{name}.shortcut.bias"])
                f = y + f
                layer += 1
            y = F.conv2d(F.relu(f), sd[f"dilations.{s}.conv1.weight"],
                         sd[f"dilations.{s}.conv1.bias"])
            y = sum(F.conv2d(y, sd[f"dilations.{s}.conv2_{i}.weight"],
                             padding=d, dilation=d)
                    for i, d in zip((1, 2, 3, 4), (5, 7, 9, 11)))
            gate = F.conv2d(F.relu(y), sd[f"attentions.{s}.conv1.weight"],
                            sd[f"attentions.{s}.conv1.bias"])
            gate = torch.sigmoid(
                F.conv2d(gate, sd[f"attentions.{s}.conv2.weight"],
                         padding=1))
            y = y * gate
            e = F.conv2d(y, sd[f"conv_reduces.{s}.conv.weight"],
                         sd[f"conv_reduces.{s}.conv.bias"])
            logits.append(F.interpolate(e, (H, W), mode="bilinear",
                                        align_corners=False))
        fused = F.conv2d(torch.cat(logits, 1), sd["classifier.weight"],
                         sd["classifier.bias"])
        return torch.sigmoid(fused)


def test_pidinet_parity():
    from pcdms_tpu.pose.detectors import convert_pidinet, pidinet_apply

    oracle = _TorchPiDiNet(seed=3)
    params = convert_pidinet({k: v.numpy() for k, v in oracle.sd.items()})

    x = np.random.default_rng(3).uniform(0, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        expected = oracle.forward(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()[0, 0]
    got = np.asarray(pidinet_apply(params, jnp.asarray(x))[0, :, :, 0])
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=5e-4)


# ---------------------------------------------------------------------------
# MLSD (MobileNetV2 trunk + FPN decoder, BN folded at convert time)
# ---------------------------------------------------------------------------

def _torch_mlsd():
    class ConvBNReLU(nn.Sequential):
        def __init__(self, cin, cout, k=3, stride=1, groups=1):
            self.stride = stride
            padding = 0 if stride == 2 else (k - 1) // 2
            super().__init__(
                nn.Conv2d(cin, cout, k, stride, padding, groups=groups,
                          bias=False),
                nn.BatchNorm2d(cout), nn.ReLU6(inplace=True))

        def forward(self, x):
            if self.stride == 2:
                x = F.pad(x, (0, 1, 0, 1), "constant", 0)
            for m in self:
                x = m(x)
            return x

    class InvertedResidual(nn.Module):
        def __init__(self, inp, oup, stride, t):
            super().__init__()
            hidden = int(round(inp * t))
            self.use_res = stride == 1 and inp == oup
            layers = []
            if t != 1:
                layers.append(ConvBNReLU(inp, hidden, k=1))
            layers += [ConvBNReLU(hidden, hidden, stride=stride,
                                  groups=hidden),
                       nn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
                       nn.BatchNorm2d(oup)]
            self.conv = nn.Sequential(*layers)

        def forward(self, x):
            return x + self.conv(x) if self.use_res else self.conv(x)

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()
            cfg = [(1, 16, 1), (6, 24, 2), (6, 24, 1), (6, 32, 2),
                   (6, 32, 1), (6, 32, 1), (6, 64, 2), (6, 64, 1),
                   (6, 64, 1), (6, 64, 1), (6, 96, 1), (6, 96, 1),
                   (6, 96, 1)]
            feats = [ConvBNReLU(4, 32, stride=2)]
            cin = 32
            for t, c_, s in cfg:
                feats.append(InvertedResidual(cin, c_, s, t))
                cin = c_
            self.features = nn.Sequential(*feats)

        def forward(self, x):
            sel, out = (1, 3, 6, 10, 13), []
            for i, f in enumerate(self.features):
                x = f(x)
                if i in sel:
                    out.append(x)
            return out

    def cbnr(cin, cout, k, **kw):
        return nn.Sequential(nn.Conv2d(cin, cout, k, **kw),
                             nn.BatchNorm2d(cout), nn.ReLU(True))

    class BlockA(nn.Module):
        def __init__(self, c1_in, c2_in, upscale=True):
            super().__init__()
            self.conv1 = cbnr(c2_in, 64, 1)
            self.conv2 = cbnr(c1_in, 64, 1)
            self.upscale = upscale

        def forward(self, a, b):
            b = self.conv1(b)
            a = self.conv2(a)
            if self.upscale:
                b = F.interpolate(b, scale_factor=2.0, mode="bilinear",
                                  align_corners=True)
            return torch.cat((a, b), 1)

    class BlockB(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = cbnr(128, 128, 3, padding=1)
            self.conv2 = cbnr(128, 64, 3, padding=1)

        def forward(self, x):
            return self.conv2(self.conv1(x) + x)

    class BlockC(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = cbnr(64, 64, 3, padding=5, dilation=5)
            self.conv2 = cbnr(64, 64, 3, padding=1)
            self.conv3 = nn.Conv2d(64, 16, 1)

        def forward(self, x):
            return self.conv3(self.conv2(self.conv1(x)))

    class MLSD(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.block15 = BlockA(64, 96, upscale=False)
            self.block16 = BlockB()
            self.block17 = BlockA(32, 64)
            self.block18 = BlockB()
            self.block19 = BlockA(24, 64)
            self.block20 = BlockB()
            self.block21 = BlockA(16, 64)
            self.block22 = BlockB()
            self.block23 = BlockC()

        def forward(self, x):
            c1, c2, c3, c4, c5 = self.backbone(x)
            x = self.block16(self.block15(c4, c5))
            x = self.block18(self.block17(c3, x))
            x = self.block20(self.block19(c2, x))
            x = self.block22(self.block21(c1, x))
            return self.block23(x)[:, 7:]

    return MLSD()


def test_mlsd_parity():
    from pcdms_tpu.pose.detectors import convert_mlsd, mlsd_apply

    torch.manual_seed(4)
    net = _torch_mlsd()
    # randomize BN running stats so the eval-mode fold is actually tested
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    net.eval()
    params = convert_mlsd(_sd_numpy(net))

    x = np.random.default_rng(4).uniform(-1, 1, (1, 64, 64, 4)) \
        .astype(np.float32)
    with torch.no_grad():
        expected = net(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy()[0].transpose(1, 2, 0)
    got = np.asarray(mlsd_apply(params, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=5e-4)


def test_mlsd_decode_lines():
    from pcdms_tpu.pose.detectors import decode_lines

    tp = np.zeros((32, 32, 5), np.float32)
    tp[:, :, 0] = -10.0                      # low heat everywhere
    tp[10, 12, 0] = 8.0                      # one strong center
    tp[10, 12, 1:5] = [-3.0, -1.0, 4.0, 2.0]
    tp[20, 20, 0] = 7.0                      # strong but too short
    tp[20, 20, 1:5] = [0.01, 0.0, -0.01, 0.0]
    lines = decode_lines(tp, score_thr=0.1, dist_thr=0.5)
    assert lines.shape == (1, 4)
    np.testing.assert_allclose(lines[0], [12 - 3, 10 - 1, 12 + 4, 10 + 2])


# ---------------------------------------------------------------------------
# facade routing
# ---------------------------------------------------------------------------

def test_processor_gates_without_weights():
    from pcdms_tpu.pose.processors import Processor

    for pid in ("hed", "lineart_realistic", "softedge_pidinet"):
        with pytest.raises(NotImplementedError, match="implemented"):
            Processor(pid)
    # still a clear gate for the heavyweight un-ported detectors
    with pytest.raises(NotImplementedError):
        Processor("midas")
