"""Parity + protocol tests for the LeReS++ boost stack.

The pix2pix depth-merge generator (UnetGenerator(2, 1, 10, 64,
norm='none') — /root/reference/src/controlnet_aux/leres/pix2pix/models/
networks.py:444-543) is parity-tested against a torch mirror with the
checkpoint's nested-Sequential naming; the boosting protocol
(depthmap.py) runs end-to-end with a stub estimator + stub merge.
"""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pcdms_tpu.pose.detectors import leres_boost as lb  # noqa: E402

pytestmark = pytest.mark.slow


class TorchUnetBlock(nn.Module):
    def __init__(self, outer, inner, input_nc=None, submodule=None,
                 outermost=False, innermost=False):
        super().__init__()
        self.outermost = outermost
        if input_nc is None:
            input_nc = outer
        downconv = nn.Conv2d(input_nc, inner, 4, 2, 1, bias=False)
        downrelu = nn.LeakyReLU(0.2, True)
        uprelu = nn.ReLU(True)
        # norm='none' inserts Identity MODULES into the Sequential
        # (networks.py:507-530) — the key indices must match a real
        # latest_net_G.pth
        if outermost:
            upconv = nn.ConvTranspose2d(inner * 2, outer, 4, 2, 1)
            model = [downconv, submodule, uprelu, upconv, nn.Tanh()]
        elif innermost:
            upconv = nn.ConvTranspose2d(inner, outer, 4, 2, 1, bias=False)
            model = [downrelu, downconv, uprelu, upconv, nn.Identity()]
        else:
            upconv = nn.ConvTranspose2d(inner * 2, outer, 4, 2, 1,
                                        bias=False)
            model = [downrelu, downconv, nn.Identity(), submodule, uprelu,
                     upconv, nn.Identity()]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


def _torch_unet_1024():
    blk = TorchUnetBlock(512, 512, innermost=True)
    for _ in range(5):
        blk = TorchUnetBlock(512, 512, submodule=blk)
    blk = TorchUnetBlock(256, 512, submodule=blk)
    blk = TorchUnetBlock(128, 256, submodule=blk)
    blk = TorchUnetBlock(64, 128, submodule=blk)
    outer = TorchUnetBlock(1, 64, input_nc=2, submodule=blk,
                           outermost=True)
    g = nn.Module()
    g.model = outer
    return g


def test_pix2pix4depth_parity():
    torch.manual_seed(0)
    tm = _torch_unet_1024().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = lb.convert_pix2pix4depth(sd)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 1024, 1024, 2)).astype(np.float32)
    with torch.no_grad():
        want = tm.model(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    got = np.asarray(lb.pix2pix_apply(params, jnp.asarray(x)))
    assert got.shape == (1, 1024, 1024, 1)
    np.testing.assert_allclose(got[..., 0], want[:, 0], atol=2e-4,
                               rtol=2e-4)


def test_merge_depths_range():
    params = lb.pix2pix_init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    outer = rng.uniform(0, 5, (1024, 1024)).astype(np.float32)
    inner = rng.uniform(0, 5, (1024, 1024)).astype(np.float32)
    out = lb.merge_depths(params, outer, inner)
    assert out.shape == (1024, 1024)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_estimateboost_protocol_with_stubs():
    """Full boost flow with a cheap stub estimator + stub merge (the
    network path is covered by the parity test above)."""
    import cv2

    def fake_estimate(img, w, h):
        g = np.dot(img[..., :3].astype(np.float32) / 255.0,
                   [0.3, 0.4, 0.3])
        return cv2.resize(cv2.resize(g, (w, h)),
                          (img.shape[1], img.shape[0]))

    def stub_apply(_params, x):
        merged = (x[..., 0:1] + x[..., 1:2]) / 2.0
        return merged

    rng = np.random.default_rng(2)
    img = (rng.uniform(0, 255, (320, 256, 3))).astype(np.uint8)
    out = lb.estimateboost(img, fake_estimate, params=None,
                           max_res=4000, apply_fn=stub_apply)
    assert out.shape == (320, 256)
    assert np.isfinite(out).all()

    # small max_res forces the early no-local-boost exit
    out2 = lb.estimateboost(img, fake_estimate, params=None,
                            max_res=64, apply_fn=stub_apply)
    assert out2.shape == (320, 256)


def test_resizewithpool_matches_block_reduce():
    rng = np.random.default_rng(3)
    img = rng.normal(size=(96, 96))
    got = lb._resizewithpool(img, 24)     # n = 4
    want = img.reshape(24, 4, 24, 4).max(axis=(1, 3))
    np.testing.assert_allclose(got, want)
