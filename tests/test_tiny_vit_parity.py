"""Random-weight torch parity for the MobileSAM TinyViT encoder.

Hand-builds the tiny_vit_sam.py graph in raw torch with checkpoint
naming (Conv2d_BN .c/.bn pairs, per-head packed qkv, |Δ|-offset
attention biases, the stride-1 merge into the 320-d stage), randomizes
weights AND BN stats, and asserts convert_tiny_vit + tiny_vit_apply
reproduce the torch eval forward at a reduced 256px input (same graph,
4x fewer tokens).
"""

import itertools
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pcdms_tpu.pose.detectors import tiny_vit as tv  # noqa: E402

pytestmark = pytest.mark.slow

TOL = dict(atol=1e-3, rtol=1e-3)


class Conv2d_BN(nn.Module):
    def __init__(self, a, b, ks=1, stride=1, pad=0, groups=1):
        super().__init__()
        self.c = nn.Conv2d(a, b, ks, stride, pad, groups=groups,
                           bias=False)
        self.bn = nn.BatchNorm2d(b)

    def forward(self, x):
        return self.bn(self.c(x))


class MBConv(nn.Module):
    def __init__(self, c, expand=4):
        super().__init__()
        h = c * expand
        self.conv1 = Conv2d_BN(c, h, 1)
        self.conv2 = Conv2d_BN(h, h, 3, 1, 1, groups=h)
        self.conv3 = Conv2d_BN(h, c, 1)

    def forward(self, x):
        s = x
        x = F.gelu(self.conv1(x))
        x = F.gelu(self.conv2(x))
        x = self.conv3(x)
        return F.gelu(x + s)


class PatchMerging(nn.Module):
    def __init__(self, dim, out_dim):
        super().__init__()
        stride = 1 if out_dim in (320, 448, 576) else 2
        self.conv1 = Conv2d_BN(dim, out_dim, 1)
        self.conv2 = Conv2d_BN(out_dim, out_dim, 3, stride, 1,
                               groups=out_dim)
        self.conv3 = Conv2d_BN(out_dim, out_dim, 1)

    def forward(self, x):
        x = F.gelu(self.conv1(x))
        x = F.gelu(self.conv2(x))
        return self.conv3(x)


class Attention(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        hd = dim // heads
        self.num_heads = heads
        self.key_dim = hd
        self.d = hd
        self.scale = hd ** -0.5
        self.norm = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        points = list(itertools.product(range(window), range(window)))
        offsets, idxs = {}, []
        for p1 in points:
            for p2 in points:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                if off not in offsets:
                    offsets[off] = len(offsets)
                idxs.append(offsets[off])
        self.attention_biases = nn.Parameter(
            torch.randn(heads, len(offsets)) * 0.02)
        self.register_buffer(
            "idxs", torch.LongTensor(idxs).view(len(points), len(points)),
            persistent=False)

    def forward(self, x):
        B, N, _ = x.shape
        x = self.norm(x)
        qkv = self.qkv(x)
        q, k, v = qkv.view(B, N, self.num_heads, -1).split(
            [self.key_dim, self.key_dim, self.d], dim=3)
        q, k, v = (z.permute(0, 2, 1, 3) for z in (q, k, v))
        attn = (q @ k.transpose(-2, -1)) * self.scale \
            + self.attention_biases[:, self.idxs]
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, -1)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(self.norm(x))))


class TinyViTBlock(nn.Module):
    def __init__(self, dim, res, heads, window):
        super().__init__()
        self.res = res
        self.window = window
        self.attn = Attention(dim, heads, window)
        self.mlp = Mlp(dim, dim * 4)
        self.local_conv = Conv2d_BN(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x):
        H = W = self.res
        B, L, C = x.shape
        res_x = x
        if H == self.window and W == self.window:
            x = self.attn(x)
        else:
            x = x.view(B, H, W, C)
            pad_b = (self.window - H % self.window) % self.window
            pad_r = (self.window - W % self.window) % self.window
            if pad_b or pad_r:
                x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
            pH, pW = H + pad_b, W + pad_r
            nH, nW = pH // self.window, pW // self.window
            x = (x.view(B, nH, self.window, nW, self.window, C)
                 .transpose(2, 3)
                 .reshape(B * nH * nW, self.window * self.window, C))
            x = self.attn(x)
            x = (x.view(B, nH, nW, self.window, self.window, C)
                 .transpose(2, 3).reshape(B, pH, pW, C))
            if pad_b or pad_r:
                x = x[:, :H, :W].contiguous()
            x = x.view(B, L, C)
        x = res_x + x
        x = x.transpose(1, 2).reshape(B, C, H, W)
        x = self.local_conv(x)
        x = x.view(B, C, L).transpose(1, 2)
        return x + self.mlp(x)


class LayerNorm2d(nn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class TorchTinyViT(nn.Module):
    def __init__(self, img_size=256):
        super().__init__()
        dims, depths = tv._EMBED_DIMS, tv._DEPTHS
        heads, windows = tv._NUM_HEADS, tv._WINDOWS
        pe = nn.Module()
        pe.seq = nn.Sequential(Conv2d_BN(3, dims[0] // 2, 3, 2, 1),
                               nn.GELU(),
                               Conv2d_BN(dims[0] // 2, dims[0], 3, 2, 1))
        self.patch_embed = pe
        res = img_size // 4
        self.layers = nn.ModuleList()
        self.resolutions = []
        for si in range(4):
            layer = nn.Module()
            if si == 0:
                layer.blocks = nn.ModuleList(
                    [MBConv(dims[0]) for _ in range(depths[0])])
            else:
                layer.blocks = nn.ModuleList(
                    [TinyViTBlock(dims[si], res, heads[si], windows[si])
                     for _ in range(depths[si])])
            self.resolutions.append(res)
            if si < 3:
                layer.downsample = PatchMerging(dims[si], dims[si + 1])
                if dims[si + 1] not in (320, 448, 576):
                    res //= 2
            self.layers.append(layer)
        self.neck = nn.Sequential(
            nn.Conv2d(dims[-1], 256, 1, bias=False), LayerNorm2d(256),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            LayerNorm2d(256))

    def forward(self, x):
        x = self.patch_embed.seq[2](F.gelu(self.patch_embed.seq[0](x)))
        for blk in self.layers[0].blocks:
            x = blk(x)
        x = self.layers[0].downsample(x)
        for si in (1, 2, 3):
            B, C, H, W = x.shape
            t = x.flatten(2).transpose(1, 2)
            for blk in self.layers[si].blocks:
                t = blk(t)
            x = t.transpose(1, 2).view(B, C, H, W)
            if si < 3:
                x = self.layers[si].downsample(x)
        return self.neck(x)


def test_tiny_vit_parity():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    tm = TorchTinyViT().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.3, m.running_mean.shape)
                    .astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, m.running_var.shape)
                    .astype(np.float32)))
    sd = {f"image_encoder.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    params = tv.convert_tiny_vit(sd)

    x = rng.uniform(-2, 2, (1, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    got = np.asarray(tv.tiny_vit_apply(params, jnp.asarray(x)))
    assert got.shape == (1, 16, 16, 256)
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                               **TOL)


def test_attention_bias_idxs_symmetry():
    idx = tv._attention_bias_idxs(7, 7)
    assert idx.shape == (49, 49)
    # |Δ| offsets are symmetric and the diagonal is the zero offset
    assert (idx == idx.T).all() and (np.diag(idx) == 0).all()


def test_vit_t_sam_predict_smoke():
    """TinyViT encoder drives the shared prompt encoder / mask decoder
    through sam_encode_image's dispatch."""
    from pcdms_tpu.pose.detectors import sam as sm
    cfg = sm.SAM_CONFIGS["vit_t"]._replace(img_size=256)
    key = jax.random.PRNGKey(0)
    params = {
        "encoder": {"tiny": tv.tiny_vit_init(key)},
        "prompt": sm.sam_init(key, sm.SamConfig(96, 1, 1, (0,), 256)
                              )["prompt"],
        "decoder": sm.sam_init(key, sm.SamConfig(96, 1, 1, (0,), 256)
                               )["decoder"],
    }
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    emb = sm.sam_encode_image(params, x, cfg)
    assert emb.shape == (1, 16, 16, 256)
    masks, iou = sm.sam_predict_points(
        params, emb, jnp.asarray([[[100.0, 120.0]]]),
        jnp.asarray([[1.0]]), input_size=256)
    assert masks.shape == (1, 3, 64, 64) and iou.shape == (1, 3)
    assert bool(jnp.isfinite(masks).all())
