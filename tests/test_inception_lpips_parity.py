"""Numeric parity of the FID InceptionV3 and LPIPS(alex) ports vs raw
torch re-executions of the published architectures (no torchvision/lpips
packages needed — plain F.conv2d/F.batch_norm/F.*_pool2d), with shared
random weights. Pins the padding/pooling quirks FID is sensitive to:
avg-pool count_include_pad=False in the A/C/E1 blocks, the MAX branch
pool in the final E block, BN(eps=1e-3) folding, and the LPIPS
scaling/unit-normalize/lin-head math
(/root/reference/inception.py:83-138, /root/reference/metrics.py:441-506).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pcdms_tpu.eval.inception import convert_inception, inception_pool3
from pcdms_tpu.eval.lpips import convert_lpips, lpips_distance

pytestmark = pytest.mark.slow

torch.manual_seed(0)

# ---------------------------------------------------------------- units ---
# prefix -> (cin, cout, kernel(h,w), stride, pad(h,w)) for every conv+BN
UNITS = {}


def _u(prefix, cin, cout, k, s=1, p=0):
    k = (k, k) if isinstance(k, int) else k
    p = (p, p) if isinstance(p, int) else p
    UNITS[prefix] = (cin, cout, k, s, p)


_u("Conv2d_1a_3x3", 3, 32, 3, 2)
_u("Conv2d_2a_3x3", 32, 32, 3)
_u("Conv2d_2b_3x3", 32, 64, 3, 1, 1)
_u("Conv2d_3b_1x1", 64, 80, 1)
_u("Conv2d_4a_3x3", 80, 192, 3)


def _block_a(name, cin, pool):
    _u(f"{name}.branch1x1", cin, 64, 1)
    _u(f"{name}.branch5x5_1", cin, 48, 1)
    _u(f"{name}.branch5x5_2", 48, 64, 5, 1, 2)
    _u(f"{name}.branch3x3dbl_1", cin, 64, 1)
    _u(f"{name}.branch3x3dbl_2", 64, 96, 3, 1, 1)
    _u(f"{name}.branch3x3dbl_3", 96, 96, 3, 1, 1)
    _u(f"{name}.branch_pool", cin, pool, 1)


def _block_c(name, c7):
    _u(f"{name}.branch1x1", 768, 192, 1)
    _u(f"{name}.branch7x7_1", 768, c7, 1)
    _u(f"{name}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3))
    _u(f"{name}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0))
    _u(f"{name}.branch7x7dbl_1", 768, c7, 1)
    _u(f"{name}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0))
    _u(f"{name}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3))
    _u(f"{name}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0))
    _u(f"{name}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3))
    _u(f"{name}.branch_pool", 768, 192, 1)


def _block_e(name, cin):
    _u(f"{name}.branch1x1", cin, 320, 1)
    _u(f"{name}.branch3x3_1", cin, 384, 1)
    _u(f"{name}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1))
    _u(f"{name}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0))
    _u(f"{name}.branch3x3dbl_1", cin, 448, 1)
    _u(f"{name}.branch3x3dbl_2", 448, 384, 3, 1, 1)
    _u(f"{name}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1))
    _u(f"{name}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0))
    _u(f"{name}.branch_pool", cin, 192, 1)


_block_a("Mixed_5b", 192, 32)
_block_a("Mixed_5c", 256, 64)
_block_a("Mixed_5d", 288, 64)
_u("Mixed_6a.branch3x3", 288, 384, 3, 2)
_u("Mixed_6a.branch3x3dbl_1", 288, 64, 1)
_u("Mixed_6a.branch3x3dbl_2", 64, 96, 3, 1, 1)
_u("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 2)
_block_c("Mixed_6b", 128)
_block_c("Mixed_6c", 160)
_block_c("Mixed_6d", 160)
_block_c("Mixed_6e", 192)
_u("Mixed_7a.branch3x3_1", 768, 192, 1)
_u("Mixed_7a.branch3x3_2", 192, 320, 3, 2)
_u("Mixed_7a.branch7x7x3_1", 768, 192, 1)
_u("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3))
_u("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0))
_u("Mixed_7a.branch7x7x3_4", 192, 192, 3, 2)
_block_e("Mixed_7b", 1280)
_block_e("Mixed_7c", 2048)


def build_inception_sd():
    """Random full-geometry InceptionV3 torch state dict (also used by
    tests/test_metrics_cli.py to exercise the weight-file CLI path)."""
    g = torch.Generator().manual_seed(42)
    sd = {}
    for prefix, (cin, cout, k, _, _) in UNITS.items():
        fan_in = cin * k[0] * k[1]
        sd[f"{prefix}.conv.weight"] = torch.randn(
            (cout, cin) + k, generator=g) / fan_in ** 0.5
        sd[f"{prefix}.bn.weight"] = 0.5 + torch.rand(cout, generator=g)
        sd[f"{prefix}.bn.bias"] = 0.1 * torch.randn(cout, generator=g)
        sd[f"{prefix}.bn.running_mean"] = 0.1 * torch.randn(cout,
                                                            generator=g)
        sd[f"{prefix}.bn.running_var"] = 0.5 + torch.rand(cout, generator=g)
    return sd


@pytest.fixture(scope="module")
def inception_sd():
    return build_inception_sd()


def _tconv(sd, prefix, x):
    _, _, _, stride, pad = UNITS[prefix]
    x = F.conv2d(x, sd[f"{prefix}.conv.weight"], stride=stride, padding=pad)
    x = F.batch_norm(x, sd[f"{prefix}.bn.running_mean"],
                     sd[f"{prefix}.bn.running_var"],
                     sd[f"{prefix}.bn.weight"], sd[f"{prefix}.bn.bias"],
                     training=False, momentum=0.0, eps=1e-3)
    return F.relu(x)


def _avg_nip(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


def _t_block_a(sd, n, x):
    b1 = _tconv(sd, f"{n}.branch1x1", x)
    b5 = _tconv(sd, f"{n}.branch5x5_2", _tconv(sd, f"{n}.branch5x5_1", x))
    bd = _tconv(sd, f"{n}.branch3x3dbl_1", x)
    bd = _tconv(sd, f"{n}.branch3x3dbl_2", bd)
    bd = _tconv(sd, f"{n}.branch3x3dbl_3", bd)
    bp = _tconv(sd, f"{n}.branch_pool", _avg_nip(x))
    return torch.cat([b1, b5, bd, bp], 1)


def _t_block_b(sd, n, x):
    b3 = _tconv(sd, f"{n}.branch3x3", x)
    bd = _tconv(sd, f"{n}.branch3x3dbl_1", x)
    bd = _tconv(sd, f"{n}.branch3x3dbl_2", bd)
    bd = _tconv(sd, f"{n}.branch3x3dbl_3", bd)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def _t_block_c(sd, n, x):
    b1 = _tconv(sd, f"{n}.branch1x1", x)
    b7 = x
    for i in (1, 2, 3):
        b7 = _tconv(sd, f"{n}.branch7x7_{i}", b7)
    bd = x
    for i in (1, 2, 3, 4, 5):
        bd = _tconv(sd, f"{n}.branch7x7dbl_{i}", bd)
    bp = _tconv(sd, f"{n}.branch_pool", _avg_nip(x))
    return torch.cat([b1, b7, bd, bp], 1)


def _t_block_d(sd, n, x):
    b3 = _tconv(sd, f"{n}.branch3x3_2", _tconv(sd, f"{n}.branch3x3_1", x))
    b7 = x
    for i in (1, 2, 3, 4):
        b7 = _tconv(sd, f"{n}.branch7x7x3_{i}", b7)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def _t_block_e(sd, n, x, max_pool):
    b1 = _tconv(sd, f"{n}.branch1x1", x)
    b3 = _tconv(sd, f"{n}.branch3x3_1", x)
    b3 = torch.cat([_tconv(sd, f"{n}.branch3x3_2a", b3),
                    _tconv(sd, f"{n}.branch3x3_2b", b3)], 1)
    bd = _tconv(sd, f"{n}.branch3x3dbl_1", x)
    bd = _tconv(sd, f"{n}.branch3x3dbl_2", bd)
    bd = torch.cat([_tconv(sd, f"{n}.branch3x3dbl_3a", bd),
                    _tconv(sd, f"{n}.branch3x3dbl_3b", bd)], 1)
    bp = F.max_pool2d(x, 3, 1, 1) if max_pool else _avg_nip(x)
    bp = _tconv(sd, f"{n}.branch_pool", bp)
    return torch.cat([b1, b3, bd, bp], 1)


def _torch_pool3(sd, x01):
    """x01: (B, 3, 299, 299) in [0, 1] -> (B, 2048), as the published FID
    inception forward (resize omitted: input is already 299)."""
    x = 2.0 * x01 - 1.0
    for n in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"):
        x = _tconv(sd, n, x)
    x = F.max_pool2d(x, 3, 2)
    x = _tconv(sd, "Conv2d_3b_1x1", x)
    x = _tconv(sd, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _t_block_a(sd, n, x)
    x = _t_block_b(sd, "Mixed_6a", x)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _t_block_c(sd, n, x)
    x = _t_block_d(sd, "Mixed_7a", x)
    x = _t_block_e(sd, "Mixed_7b", x, max_pool=False)
    x = _t_block_e(sd, "Mixed_7c", x, max_pool=True)
    return x.mean(dim=(2, 3))


class TestInceptionParity:
    def test_full_graph_pool3(self, inception_sd):
        rng = np.random.default_rng(0)
        imgs = rng.uniform(0, 1, (2, 299, 299, 3)).astype(np.float32)

        ref = _torch_pool3(
            {k: v for k, v in inception_sd.items()},
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()

        params = convert_inception(
            {k: v.numpy() for k, v in inception_sd.items()})
        ours = np.asarray(inception_pool3(params, jnp.asarray(imgs)))

        assert ours.shape == ref.shape == (2, 2048)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------- LPIPS ---
_ALEX_CONVS = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
               (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
_FEAT_IDX = [0, 3, 6, 8, 10]


def build_lpips_sd():
    g = torch.Generator().manual_seed(7)
    sd = {}
    for (cin, cout, k, _, _), fi in zip(_ALEX_CONVS, _FEAT_IDX):
        sd[f"net.features.{fi}.weight"] = torch.randn(
            (cout, cin, k, k), generator=g) / (cin * k * k) ** 0.5
        sd[f"net.features.{fi}.bias"] = 0.1 * torch.randn(cout, generator=g)
        sd[f"lin{len([x for x in sd if 'lin' in x])}.model.1.weight"] = \
            torch.rand((1, cout, 1, 1), generator=g)
    return sd


@pytest.fixture(scope="module")
def lpips_sd():
    return build_lpips_sd()


def _torch_lpips(sd, a, b):
    """a/b: (B, 3, H, W) in [-1, 1] -> (B,) distances, as published."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        out = []
        for i, ((_, _, k, s, p), fi) in enumerate(
                zip(_ALEX_CONVS, _FEAT_IDX)):
            x = F.relu(F.conv2d(x, sd[f"net.features.{fi}.weight"],
                                sd[f"net.features.{fi}.bias"],
                                stride=s, padding=p))
            out.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return out

    fa, fb = feats(a), feats(b)
    total = 0.0
    for i in range(5):
        na = fa[i] / (fa[i].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = fb[i] / (fb[i].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        w = sd[f"lin{i}.model.1.weight"]
        total = total + F.conv2d(d, w).mean(dim=(2, 3)).squeeze(1)
    return total


class TestLPIPSParity:
    def test_distance(self, lpips_sd):
        rng = np.random.default_rng(1)
        a = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)

        ref = _torch_lpips(lpips_sd,
                           torch.from_numpy(a.transpose(0, 3, 1, 2)),
                           torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()

        params = convert_lpips({k: v.numpy() for k, v in lpips_sd.items()})
        ours = np.asarray(lpips_distance(params, jnp.asarray(a),
                                         jnp.asarray(b)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)

    def test_identical_images_zero(self, lpips_sd):
        rng = np.random.default_rng(2)
        a = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
        params = convert_lpips({k: v.numpy() for k, v in lpips_sd.items()})
        d = float(lpips_distance(params, jnp.asarray(a), jnp.asarray(a))[0])
        assert abs(d) < 1e-7
