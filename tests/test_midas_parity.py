"""Random-weight torch parity for the MiDaS DPT-hybrid port.

Hand-builds the isl-org/MiDaS DPTDepthModel graph in raw torch with the
released checkpoint's state-dict naming (timm vit_base_resnet50_384
hybrid backbone under pretrained.model.*, DPT neck under pretrained.act_*
/ scratch.*), randomizes all weights, and asserts
pcdms_tpu.pose.detectors.midas.convert_dpt_hybrid + dpt_hybrid_apply
reproduce the torch eval forward — including the weight-standardized
SAME-pad convs, GroupNorm+ReLU ResNetV2 stages, readout projections, and
align-corners fusion upsampling.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pcdms_tpu.pose.detectors import midas as md  # noqa: E402

pytestmark = pytest.mark.slow

TOL = dict(atol=1e-3, rtol=1e-3)


def _same_pad(x, k, s):
    ph = max(0, (-(-x.shape[2] // s) - 1) * s + k - x.shape[2])
    pw = max(0, (-(-x.shape[3] // s) - 1) * s + k - x.shape[3])
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class StdConv2dSame(nn.Conv2d):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__(cin, cout, k, stride, 0, bias=False)

    def forward(self, x):
        w = self.weight
        var, mean = torch.var_mean(w, dim=[1, 2, 3], keepdim=True,
                                   unbiased=False)
        w = (w - mean) / torch.sqrt(var + 1e-8)
        x = _same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, None, self.stride)


class GNAct(nn.GroupNorm):
    def __init__(self, c, act=True):
        super().__init__(32, c)
        self.act = act

    def forward(self, x):
        y = super().forward(x)
        return F.relu(y) if self.act else y


class Bottleneck(nn.Module):
    def __init__(self, cin, mid, cout, stride, downsample):
        super().__init__()
        self.conv1 = StdConv2dSame(cin, mid, 1)
        self.norm1 = GNAct(mid)
        self.conv2 = StdConv2dSame(mid, mid, 3, stride)
        self.norm2 = GNAct(mid)
        self.conv3 = StdConv2dSame(mid, cout, 1)
        self.norm3 = GNAct(cout, act=False)
        if downsample:
            self.downsample = nn.Module()
            self.downsample.conv = StdConv2dSame(cin, cout, 1, stride)
            self.downsample.norm = GNAct(cout, act=False)
        else:
            self.downsample = None

    def forward(self, x):
        sc = (self.downsample.norm(self.downsample.conv(x))
              if self.downsample is not None else x)
        h = self.norm1(self.conv1(x))
        h = self.norm2(self.conv2(h))
        h = self.norm3(self.conv3(h))
        return F.relu(h + sc)


class Stage(nn.Module):
    def __init__(self, cin, mid, cout, depth, stride):
        super().__init__()
        self.blocks = nn.Sequential(*[
            Bottleneck(cin if i == 0 else cout, mid, cout,
                       stride if i == 0 else 1, i == 0)
            for i in range(depth)])

    def forward(self, x):
        return self.blocks(x)


class ViTBlock(nn.Module):
    def __init__(self, dim=768, heads=12):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        b, t, c = x.shape
        hd = c // self.heads
        qkv = self.attn.qkv(self.norm1(x)).reshape(
            b, t, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        a = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(hd), -1)
        o = (a @ v).transpose(1, 2).reshape(b, t, c)
        x = x + self.attn.proj(o)
        h = self.norm2(x)
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(h)))
        return x + h


class RCU(nn.Module):
    def __init__(self, c=256):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, 1, 1)
        self.conv2 = nn.Conv2d(c, c, 3, 1, 1)

    def forward(self, x):
        h = self.conv2(F.relu(self.conv1(F.relu(x))))
        return h + x


class Fusion(nn.Module):
    def __init__(self, c=256):
        super().__init__()
        self.resConfUnit1 = RCU(c)
        self.resConfUnit2 = RCU(c)
        self.out_conv = nn.Conv2d(c, c, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


class ProjectReadout(nn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * dim, dim), nn.GELU())

    def forward(self, tok):
        cls = tok[:, :1].expand_as(tok[:, 1:])
        return self.project(torch.cat([tok[:, 1:], cls], -1))


class TorchDPTHybrid(nn.Module):
    def __init__(self):
        super().__init__()
        backbone = nn.Module()
        backbone.stem = nn.Module()
        backbone.stem.conv = StdConv2dSame(3, 64, 7, 2)
        backbone.stem.norm = GNAct(64)
        backbone.stages = nn.ModuleList([
            Stage(64, 64, 256, 3, 1),
            Stage(256, 128, 512, 4, 2),
            Stage(512, 256, 1024, 9, 2)])
        model = nn.Module()
        model.patch_embed = nn.Module()
        model.patch_embed.backbone = backbone
        model.patch_embed.proj = nn.Conv2d(1024, 768, 1)
        model.cls_token = nn.Parameter(torch.zeros(1, 1, 768))
        model.pos_embed = nn.Parameter(torch.randn(1, 577, 768) * 0.02)
        model.blocks = nn.ModuleList([ViTBlock() for _ in range(12)])
        self.pretrained = nn.Module()
        self.pretrained.model = model
        self.pretrained.act_postprocess3 = nn.Sequential(
            ProjectReadout(), nn.Identity(), nn.Identity(),
            nn.Conv2d(768, 768, 1))
        self.pretrained.act_postprocess4 = nn.Sequential(
            ProjectReadout(), nn.Identity(), nn.Identity(),
            nn.Conv2d(768, 768, 1), nn.Conv2d(768, 768, 3, 2, 1))
        self.scratch = nn.Module()
        for i, c in enumerate((256, 512, 768, 768), 1):
            setattr(self.scratch, f"layer{i}_rn",
                    nn.Conv2d(c, 256, 3, 1, 1, bias=False))
        for i in range(1, 5):
            setattr(self.scratch, f"refinenet{i}", Fusion())
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(256, 128, 3, 1, 1), nn.Identity(),
            nn.Conv2d(128, 32, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(32, 1, 1), nn.ReLU(), nn.Identity())

    def forward(self, x):
        b, _, h, w = x.shape
        gs_h, gs_w = h // 16, w // 16
        bb = self.pretrained.model.patch_embed.backbone
        f = F.max_pool2d(_same_pad(bb.stem.norm(bb.stem.conv(x)), 3, 2),
                         3, 2)
        layer1 = bb.stages[0](f)
        layer2 = bb.stages[1](layer1)
        feat = bb.stages[2](layer2)
        tok = self.pretrained.model.patch_embed.proj(feat).flatten(
            2).transpose(1, 2)
        cls = self.pretrained.model.cls_token.expand(b, -1, -1)
        tok = torch.cat([cls, tok], 1)
        pe = self.pretrained.model.pos_embed
        if gs_h * gs_w + 1 != pe.shape[1]:
            pt, pg = pe[:, :1], pe[0, 1:]
            gs = int(math.sqrt(pg.shape[0]))
            pg = pg.reshape(1, gs, gs, -1).permute(0, 3, 1, 2)
            pg = F.interpolate(pg, (gs_h, gs_w), mode="bilinear")
            pg = pg.permute(0, 2, 3, 1).reshape(1, gs_h * gs_w, -1)
            pe = torch.cat([pt, pg], 1)
        tok = tok + pe
        h3 = h4 = None
        for i, blk in enumerate(self.pretrained.model.blocks):
            tok = blk(tok)
            if i == 8:
                h3 = tok
            if i == 11:
                h4 = tok

        def unflat(t):
            return t.transpose(1, 2).reshape(b, -1, gs_h, gs_w)

        layer3 = self.pretrained.act_postprocess3[3](
            unflat(self.pretrained.act_postprocess3[0](h3)))
        layer4 = self.pretrained.act_postprocess4[4](
            self.pretrained.act_postprocess4[3](
                unflat(self.pretrained.act_postprocess4[0](h4))))
        rn = [getattr(self.scratch, f"layer{i}_rn")(lyr)
              for i, lyr in enumerate((layer1, layer2, layer3, layer4), 1)]
        path = self.scratch.refinenet4(rn[3])
        path = self.scratch.refinenet3(path, rn[2])
        path = self.scratch.refinenet2(path, rn[1])
        path = self.scratch.refinenet1(path, rn[0])
        out = self.scratch.output_conv[0](path)
        out = F.interpolate(out, scale_factor=2, mode="bilinear",
                            align_corners=True)
        out = F.relu(self.scratch.output_conv[2](out))
        out = F.relu(self.scratch.output_conv[4](out))
        return out[:, 0]


def test_dpt_hybrid_parity():
    torch.manual_seed(0)
    tm = TorchDPTHybrid().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = md.convert_dpt_hybrid(sd)

    rng = np.random.default_rng(0)
    # 128x192: exercises pos-embed grid resize (8x12 vs stored 24x24)
    # and asymmetric SAME padding in the stem
    x = rng.uniform(-1, 1, (1, 128, 192, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    got = np.asarray(md.dpt_hybrid_apply(params, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 128, 192)
    np.testing.assert_allclose(got, want, **TOL)


def test_up2_align_corners_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    got = np.asarray(md.up2_align_corners(jnp.asarray(x)))
    want = F.interpolate(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()),
        scale_factor=2, mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_midas_detector_smoke():
    import jax
    det = md.MidasDetector(md.dpt_hybrid_init(jax.random.PRNGKey(0)))
    img = (np.random.default_rng(2).uniform(0, 255, (80, 64, 3))
           .astype(np.uint8))
    out = det(img, detect_resolution=64, image_resolution=64)
    assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3
    d, n = det(img, detect_resolution=64, image_resolution=64,
               depth_and_normal=True)
    assert d.shape == n.shape and n.dtype == np.uint8
