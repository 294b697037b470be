"""Fused GN+SiLU+conv3x3 Pallas kernel vs unfused reference (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdms_tpu.nn.layers import (
    conv2d_apply, conv2d_init, group_norm_apply, group_norm_init, silu,
)
from pcdms_tpu.ops.fused_conv import (
    _pick_co_block, fits_fused_conv, gn_affine_coeffs, gn_silu_conv3x3,
)

PAD1 = [(1, 1), (1, 1)]


def reference(x, gn, conv, groups, temb=None, residual=None,
              apply_act=True):
    h = group_norm_apply(gn, x, groups, 1e-5)
    if apply_act:
        h = silu(h)
    y = conv2d_apply(conv, h, padding=PAD1)
    if temb is not None:
        y = y + temb[:, None, None, :]
    if residual is not None:
        y = y + residual
    return y


@pytest.fixture(scope="module")
def setup():
    k = jax.random.split(jax.random.PRNGKey(0), 6)
    b, h, w, cin, cout, groups = 2, 8, 16, 128, 128, 4
    x = jax.random.normal(k[0], (b, h, w, cin), jnp.float32)
    gn = group_norm_init(cin)
    gn = {"scale": 1.0 + 0.1 * jax.random.normal(k[1], (cin,)),
          "bias": 0.1 * jax.random.normal(k[2], (cin,))}
    conv = conv2d_init(k[3], cin, cout, 3)
    temb = jax.random.normal(k[4], (b, cout))
    res = jax.random.normal(k[5], (b, h, w, cout))
    return dict(x=x, gn=gn, conv=conv, temb=temb, res=res, groups=groups)


class TestGNAffineCoeffs:
    def test_matches_group_norm(self, setup):
        s = setup
        a, c = gn_affine_coeffs(s["x"], s["gn"]["scale"], s["gn"]["bias"],
                                s["groups"], 1e-5)
        got = s["x"] * a[:, None, None, :] + c[:, None, None, :]
        want = group_norm_apply(s["gn"], s["x"], s["groups"], 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)


class TestFusedKernel:
    def _run(self, s, **kw):
        return gn_silu_conv3x3(
            s["x"], s["gn"]["scale"], s["gn"]["bias"],
            s["conv"]["kernel"], s["conv"]["bias"],
            num_groups=s["groups"], interpret=True, **kw)

    def test_plain(self, setup):
        got = self._run(setup)
        want = reference(setup["x"], setup["gn"], setup["conv"],
                         setup["groups"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, rtol=1e-2)

    def test_temb(self, setup):
        got = self._run(setup, temb=setup["temb"])
        want = reference(setup["x"], setup["gn"], setup["conv"],
                         setup["groups"], temb=setup["temb"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, rtol=1e-2)

    def test_residual(self, setup):
        got = self._run(setup, residual=setup["res"])
        want = reference(setup["x"], setup["gn"], setup["conv"],
                         setup["groups"], residual=setup["res"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, rtol=1e-2)

    def test_no_activation(self, setup):
        got = self._run(setup, apply_act=False)
        want = reference(setup["x"], setup["gn"], setup["conv"],
                         setup["groups"], apply_act=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, rtol=1e-2)

    def test_bf16(self, setup):
        s = {**setup, "x": setup["x"].astype(jnp.bfloat16)}
        got = self._run(s)
        want = reference(setup["x"], setup["gn"], setup["conv"],
                         setup["groups"])
        np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                                   np.asarray(want), atol=0.15, rtol=5e-2)

    def test_xla_fallback_matches(self, setup):
        s = setup
        got = gn_silu_conv3x3(
            s["x"], s["gn"]["scale"], s["gn"]["bias"],
            s["conv"]["kernel"], s["conv"]["bias"],
            num_groups=s["groups"])         # CPU -> fallback path
        want = reference(s["x"], s["gn"], s["conv"], s["groups"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3, rtol=1e-3)


class TestBlockPicker:
    def test_level_shapes(self):
        assert _pick_co_block(320, 320) == 320
        assert _pick_co_block(640, 640) in (128, 320)
        assert _pick_co_block(1280, 1280) == 128
        assert _pick_co_block(2560, 1280) == 0       # falls back
        assert fits_fused_conv(64, 128, 320)
        assert fits_fused_conv(16, 32, 2560)
        assert not fits_fused_conv(64, 128, 960)     # 16.5MB slab


def test_pick_h_block_always_divides():
    """Halving alone can land on a non-divisor (h=14 -> 3), leaving
    h % bh rows unwritten; the picker must return divisors only."""
    from pcdms_tpu.ops.fused_conv import _pick_h_block
    for h in (14, 16, 30, 17, 64):
        for w, cin, co_b in ((128, 1280, 128), (32, 320, 320)):
            bh = _pick_h_block(h, w, cin, co_b)
            assert h % bh == 0, (h, bh)
