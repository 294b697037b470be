"""Random-weight torch parity for the ZoeDepth port.

Hand-builds the ZoeD_M12_N graph (BEiT-L DPT core + metric-bins head —
/root/reference/src/controlnet_aux/zoe/zoedepth/) in raw torch with the
checkpoint's state-dict naming (core.core.pretrained.model.* /
core.core.scratch.* / top-level bins modules), randomizes weights, and
asserts convert_zoedepth + zoe_apply reproduce the torch forward at a
non-384 input size (exercising the relative-position-table resize and
non-square window index generation).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pcdms_tpu.pose.detectors import zoe as zz  # noqa: E402

pytestmark = pytest.mark.slow

TOL = dict(atol=2e-3, rtol=2e-3)


def _gen_rel_pos_index_torch(window_size):
    wh, ww = window_size
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = torch.stack(torch.meshgrid(
        torch.arange(wh), torch.arange(ww), indexing="ij"))
    cf = torch.flatten(coords, 1)
    rel = cf[:, :, None] - cf[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    idx = torch.zeros((n + 1, n + 1), dtype=torch.long)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, :] = num_rel - 3
    idx[:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


class BeitAttention(nn.Module):
    def __init__(self, dim=1024, heads=16, orig_window=24):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.window_size = (orig_window, orig_window)
        self.num_relative_distance = (2 * orig_window - 1) ** 2 + 3
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.randn(dim) * 0.02)
        self.v_bias = nn.Parameter(torch.randn(dim) * 0.02)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn(self.num_relative_distance, heads) * 0.02)
        self.proj = nn.Linear(dim, dim)

    def _rel_pos_bias(self, window):
        old = 2 * self.window_size[0] - 1
        nh, nw = 2 * window[0] - 1, 2 * window[1] - 1
        new_num = nh * nw + 3
        # the reference's (width, height)-labeled reshape (beit.py:44-48)
        sub = self.relative_position_bias_table[:self.num_relative_distance
                                                - 3]
        sub = sub.reshape(1, old, old, -1).permute(0, 3, 1, 2)
        sub = F.interpolate(sub, size=(nh, nw), mode="bilinear")
        sub = sub.permute(0, 2, 3, 1).reshape(new_num - 3, -1)
        table = torch.cat(
            [sub, self.relative_position_bias_table[
                self.num_relative_distance - 3:]])
        idx = _gen_rel_pos_index_torch(window)
        bias = table[idx.view(-1)].view(
            window[0] * window[1] + 1, window[0] * window[1] + 1, -1)
        return bias.permute(2, 0, 1).unsqueeze(0)

    def forward(self, x, resolution):
        B, N, C = x.shape
        qkv_bias = torch.cat(
            (self.q_bias, torch.zeros_like(self.v_bias), self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(B, N, 3, self.num_heads, -1).permute(2, 0, 3, 1,
                                                               4)
        q, k, v = qkv.unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        window = (resolution[0] // 16, resolution[1] // 16)
        attn = attn + self._rel_pos_bias(window)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, -1)
        return self.proj(x)


class BeitBlock(nn.Module):
    def __init__(self, dim=1024):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = BeitAttention(dim)
        self.gamma_1 = nn.Parameter(torch.full((dim,), 0.1))
        self.gamma_2 = nn.Parameter(torch.full((dim,), 0.1))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x, resolution):
        x = x + self.gamma_1 * self.attn(self.norm1(x), resolution)
        h = self.norm2(x)
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(h)))
        return x + self.gamma_2 * h


class ProjectReadout(nn.Module):
    def __init__(self, dim=1024):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * dim, dim), nn.GELU())

    def forward(self, tok):
        cls = tok[:, :1].expand_as(tok[:, 1:])
        return self.project(torch.cat([tok[:, 1:], cls], -1))


class RCU(nn.Module):
    def __init__(self, c=256):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, 1, 1)
        self.conv2 = nn.Conv2d(c, c, 3, 1, 1)

    def forward(self, x):
        return x + self.conv2(F.relu(self.conv1(F.relu(x))))


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


class TorchZoe(nn.Module):
    def __init__(self):
        super().__init__()
        model = nn.Module()
        model.patch_embed = nn.Module()
        model.patch_embed.proj = nn.Conv2d(3, 1024, 16, 16)
        model.cls_token = nn.Parameter(torch.zeros(1, 1, 1024))
        model.blocks = nn.ModuleList([BeitBlock() for _ in range(24)])
        pretrained = nn.Module()
        pretrained.model = model
        feats = (256, 512, 1024, 1024)
        pretrained.act_postprocess1 = nn.Sequential(
            ProjectReadout(), nn.Identity(), nn.Identity(),
            nn.Conv2d(1024, 256, 1), nn.ConvTranspose2d(256, 256, 4, 4))
        pretrained.act_postprocess2 = nn.Sequential(
            ProjectReadout(), nn.Identity(), nn.Identity(),
            nn.Conv2d(1024, 512, 1), nn.ConvTranspose2d(512, 512, 2, 2))
        pretrained.act_postprocess3 = nn.Sequential(
            ProjectReadout(), nn.Identity(), nn.Identity(),
            nn.Conv2d(1024, 1024, 1))
        pretrained.act_postprocess4 = nn.Sequential(
            ProjectReadout(), nn.Identity(), nn.Identity(),
            nn.Conv2d(1024, 1024, 1), nn.Conv2d(1024, 1024, 3, 2, 1))
        scratch = nn.Module()
        for i, c in enumerate(feats, 1):
            setattr(scratch, f"layer{i}_rn",
                    nn.Conv2d(c, 256, 3, 1, 1, bias=False))
        for i in range(1, 5):
            setattr(scratch, f"refinenet{i}", Fusion())
        scratch.output_conv = nn.Sequential(
            nn.Conv2d(256, 128, 3, 1, 1), nn.Identity(),
            nn.Conv2d(128, 32, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(32, 1, 1), nn.ReLU(), nn.Identity())
        core_core = nn.Module()
        core_core.pretrained = pretrained
        core_core.scratch = scratch
        self.core = nn.Module()
        self.core.core = core_core

        self.conv2 = nn.Conv2d(256, 256, 1)

        def mlp(cin, mid, cout):
            return nn.Sequential(nn.Conv2d(cin, mid, 1), nn.ReLU(),
                                 nn.Conv2d(mid, cout, 1))

        self.seed_bin_regressor = nn.Module()
        self.seed_bin_regressor._net = mlp(256, 256, 64)
        self.seed_projector = nn.Module()
        self.seed_projector._net = mlp(256, 128, 128)
        self.projectors = nn.ModuleList()
        self.attractors = nn.ModuleList()
        for na in (16, 8, 4, 1):
            pr = nn.Module()
            pr._net = mlp(256, 128, 128)
            self.projectors.append(pr)
            at = nn.Module()
            at._net = mlp(128, 128, na)
            self.attractors.append(at)
        self.conditional_log_binomial = nn.Module()
        self.conditional_log_binomial.mlp = nn.Sequential(
            nn.Conv2d(32 + 1 + 128, (32 + 1 + 128) // 2, 1), nn.GELU(),
            nn.Conv2d((32 + 1 + 128) // 2, 4, 1), nn.Softplus())

    # --- DPT core forward -------------------------------------------------
    def core_forward(self, x):
        b, _, h, w = x.shape
        gs = (h // 16, w // 16)
        pr = self.core.core.pretrained
        tok = pr.model.patch_embed.proj(x).flatten(2).transpose(1, 2)
        tok = torch.cat([pr.model.cls_token.expand(b, -1, -1), tok], 1)
        hooks = {}
        for i, blk in enumerate(pr.model.blocks):
            tok = blk(tok, (h, w))
            if i in (5, 11, 17, 23):
                hooks[i] = tok

        def unflat(t):
            return t.transpose(1, 2).reshape(b, -1, gs[0], gs[1])

        l1 = pr.act_postprocess1[4](pr.act_postprocess1[3](
            unflat(pr.act_postprocess1[0](hooks[5]))))
        l2 = pr.act_postprocess2[4](pr.act_postprocess2[3](
            unflat(pr.act_postprocess2[0](hooks[11]))))
        l3 = pr.act_postprocess3[3](
            unflat(pr.act_postprocess3[0](hooks[17])))
        l4 = pr.act_postprocess4[4](pr.act_postprocess4[3](
            unflat(pr.act_postprocess4[0](hooks[23]))))
        sc = self.core.core.scratch
        rn = [getattr(sc, f"layer{i}_rn")(lyr)
              for i, lyr in enumerate((l1, l2, l3, l4), 1)]
        r4 = sc.refinenet4(rn[3])
        r3 = sc.refinenet3(r4, rn[2])
        r2 = sc.refinenet2(r3, rn[1])
        r1 = sc.refinenet1(r2, rn[0])
        out = sc.output_conv[0](r1)
        out = F.interpolate(out, scale_factor=2, mode="bilinear",
                            align_corners=True)
        act = F.relu(sc.output_conv[2](out))
        rel = F.relu(sc.output_conv[4](act))[:, 0]
        return rel, act, rn[3], [r4, r3, r2, r1]

    # --- metric bins ------------------------------------------------------
    def forward(self, x):
        rel, act, l4_rn, x_blocks = self.core_forward(x)
        x_d0 = self.conv2(l4_rn)
        b_prev = F.softplus(self.seed_bin_regressor._net(x_d0))
        prev_emb = self.seed_projector._net(x_d0)
        for pr, at, feat in zip(self.projectors, self.attractors, x_blocks):
            emb = pr._net(feat)
            inp = emb + F.interpolate(prev_emb, emb.shape[-2:],
                                      mode="bilinear", align_corners=True)
            a = F.softplus(at._net(inp))
            bc = F.interpolate(b_prev, a.shape[-2:], mode="bilinear",
                               align_corners=True)
            dx = a.unsqueeze(2) - bc.unsqueeze(1)
            delta = torch.mean(dx / (1.0 + 1000.0 * dx.pow(2)), dim=1)
            b_prev = bc + delta
            prev_emb = emb
        b_centers = b_prev

        last = torch.cat([act, F.interpolate(
            rel.unsqueeze(1), act.shape[-2:], mode="bilinear",
            align_corners=True)], 1)
        emb_up = F.interpolate(prev_emb, last.shape[-2:], mode="bilinear",
                               align_corners=True)
        pt = self.conditional_log_binomial.mlp(
            torch.cat([last, emb_up], 1))
        eps = 1e-4
        p = pt[:, :2] + eps
        p = p[:, 0] / (p[:, 0] + p[:, 1])
        t = pt[:, 2:] + eps
        t = t[:, 0] / (t[:, 0] + t[:, 1])
        t = (50.0 - 0.0212) * t.unsqueeze(1) + 0.0212
        K = 64
        k_idx = torch.arange(K).view(1, -1, 1, 1).float()
        Km1 = torch.tensor([K - 1.0]).view(1, -1, 1, 1)

        def log_binom(n, k, e=1e-7):
            n = n + e
            k = k + e
            return (n * torch.log(n) - k * torch.log(k)
                    - (n - k) * torch.log(n - k + e))

        xp = torch.clamp(p.unsqueeze(1), eps, 1)
        one_minus = torch.clamp(1 - p.unsqueeze(1), eps, 1)
        y = (log_binom(Km1, k_idx) + k_idx * torch.log(xp)
             + (K - 1 - k_idx) * torch.log(one_minus))
        probs = torch.softmax(y / t, dim=1)
        bc_up = F.interpolate(b_centers, probs.shape[-2:], mode="bilinear",
                              align_corners=True)
        return torch.sum(probs * bc_up, dim=1)


def test_zoe_parity():
    torch.manual_seed(0)
    tm = TorchZoe().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = zz.convert_zoedepth(sd)

    rng = np.random.default_rng(0)
    # 96x128: non-square window (6, 8) exercises the rel-pos table resize
    x01 = rng.uniform(0, 1, (1, 96, 128, 3)).astype(np.float32)
    xn = (x01 - 0.5) / 0.5
    with torch.no_grad():
        want = tm(torch.from_numpy(
            np.transpose(xn, (0, 3, 1, 2)).copy())).numpy()
    got = np.asarray(zz.zoe_apply(params, jnp.asarray(x01)))
    assert got.shape == want.shape == (1, 96, 128)
    np.testing.assert_allclose(got, want, **TOL)


def test_rel_pos_index_matches_torch():
    for window in ((6, 8), (24, 24), (5, 5)):
        got = zz._gen_rel_pos_index(*window)
        want = _gen_rel_pos_index_torch(window).numpy()
        np.testing.assert_array_equal(got, want)


def test_zoe_detector_smoke():
    import jax
    det = zz.ZoeDetector(zz.zoe_init(jax.random.PRNGKey(0)))
    img = (np.random.default_rng(1).uniform(0, 255, (80, 64, 3))
           .astype(np.uint8))
    out = det(img, detect_resolution=64, image_resolution=64)
    assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3
