"""Unit tests for core layers vs torch semantics (torch CPU is available)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pcdms_tpu.nn import layers as L


def _np(x):
    # copy: jax arrays export read-only buffers, and torch.from_numpy
    # warns (once, program-wide) on non-writable input
    return np.array(x)


class TestLinear:
    def test_matches_torch(self):
        key = jax.random.PRNGKey(0)
        p = L.linear_init(key, 16, 32)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
        y = L.linear_apply(p, x)

        tl = torch.nn.Linear(16, 32)
        with torch.no_grad():
            tl.weight.copy_(torch.from_numpy(_np(p["kernel"]).T))
            tl.bias.copy_(torch.from_numpy(_np(p["bias"])))
        ty = tl(torch.from_numpy(_np(x))).detach().numpy()
        np.testing.assert_allclose(_np(y), ty, atol=1e-5)


class TestConv2d:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_torch(self, stride):
        key = jax.random.PRNGKey(0)
        p = L.conv2d_init(key, 8, 12, kernel_size=3)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8))
        y = L.conv2d_apply(p, x, stride=stride,
                           padding=[(1, 1), (1, 1)])

        tc = torch.nn.Conv2d(8, 12, 3, stride=stride, padding=1)
        with torch.no_grad():
            # HWIO -> OIHW
            tc.weight.copy_(torch.from_numpy(
                _np(p["kernel"]).transpose(3, 2, 0, 1)))
            tc.bias.copy_(torch.from_numpy(_np(p["bias"])))
        tx = torch.from_numpy(_np(x).transpose(0, 3, 1, 2))
        ty = tc(tx).detach().numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(_np(y), ty, atol=1e-4)


class TestNorms:
    def test_layer_norm_matches_torch(self):
        p = L.layer_norm_init(24)
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 24)) * 3 + 1
        y = L.layer_norm_apply(p, x)
        tn = torch.nn.LayerNorm(24)
        ty = tn(torch.from_numpy(_np(x))).detach().numpy()
        np.testing.assert_allclose(_np(y), ty, atol=1e-5)

    def test_group_norm_matches_torch(self):
        p = L.group_norm_init(32)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32)) * 2
        y = L.group_norm_apply(p, x, num_groups=8, eps=1e-5)
        tn = torch.nn.GroupNorm(8, 32, eps=1e-5)
        tx = torch.from_numpy(_np(x).transpose(0, 3, 1, 2))
        ty = tn(tx).detach().numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(_np(y), ty, atol=1e-5)

    def test_group_norm_1d_matches_torch(self):
        p = L.group_norm_init(32)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 32))
        y = L.group_norm_1d_apply(p, x, num_groups=4, eps=1e-6)
        tn = torch.nn.GroupNorm(4, 32, eps=1e-6)
        # torch GroupNorm over (B, C, L)
        tx = torch.from_numpy(_np(x).transpose(0, 2, 1))
        ty = tn(tx).detach().numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(_np(y), ty, atol=1e-5)


class TestActivations:
    def test_exact_gelu(self):
        x = jnp.linspace(-4, 4, 101)
        y = L.gelu(x)
        ty = torch.nn.functional.gelu(
            torch.from_numpy(_np(x))).numpy()
        np.testing.assert_allclose(_np(y), ty, atol=1e-6)


class TestTimesteps:
    def test_sinusoidal_matches_diffusers_formula(self):
        # diffusers Timesteps(dim, flip_sin_to_cos=True, shift=0), re-derived
        t = jnp.array([0.0, 1.0, 500.0, 999.0])
        dim = 320
        emb = L.timestep_sinusoidal_embedding(t, dim)
        half = dim // 2
        exponent = -np.log(10000.0) * np.arange(half) / half
        freqs = np.exp(exponent)
        ang = _np(t)[:, None] * freqs[None, :]
        expected = np.concatenate([np.cos(ang), np.sin(ang)], axis=-1)
        # f32 exp/mul vs f64 reference: large angles lose a few ulps
        np.testing.assert_allclose(_np(emb), expected, atol=5e-3)

    def test_t0_structure(self):
        emb = L.timestep_sinusoidal_embedding(jnp.array([0.0]), 8)
        np.testing.assert_allclose(_np(emb[0, :4]), np.ones(4), atol=1e-6)
        np.testing.assert_allclose(_np(emb[0, 4:]), np.zeros(4), atol=1e-6)


class TestUpsample:
    def test_nearest_2x_matches_torch(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 5, 3))
        y = L.nearest_upsample_2x(x)
        tx = torch.from_numpy(_np(x).transpose(0, 3, 1, 2))
        ty = torch.nn.functional.interpolate(tx, scale_factor=2.0,
                                             mode="nearest")
        ty = ty.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(_np(y), ty, atol=1e-6)

    def test_fused_upsample_conv_matches_naive(self):
        """upsample2x_conv3x3 (phase-decomposed, 16/36 MACs) must equal
        conv3x3(nearest_2x(x)) — the composition torch computes in the
        diffusers Upsample2D the UNet/VAE mirror (PAD1, SAME semantics),
        including at the zero-padded borders."""
        for i, (h, w, ci, co) in enumerate(
                [(4, 6, 8, 8), (3, 5, 4, 7), (1, 1, 2, 3)]):
            p = L.conv2d_init(jax.random.PRNGKey(i), ci, co, 3)
            x = jax.random.normal(jax.random.PRNGKey(i + 10),
                                  (2, h, w, ci))
            ref = L.conv2d_apply(p, L.nearest_upsample_2x(x),
                                 padding=[(1, 1), (1, 1)])
            got = L.upsample2x_conv3x3(p, x)
            np.testing.assert_allclose(_np(got), _np(ref),
                                       rtol=1e-5, atol=1e-5)

    def test_fused_upsample_conv_grads(self):
        """Training runs through the upsamplers — grads must match the
        naive composition's."""
        p = L.conv2d_init(jax.random.PRNGKey(0), 4, 4, 3)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3, 4))

        def loss_fused(p, x):
            return jnp.sum(L.upsample2x_conv3x3(p, x) ** 2)

        def loss_naive(p, x):
            y = L.conv2d_apply(p, L.nearest_upsample_2x(x),
                               padding=[(1, 1), (1, 1)])
            return jnp.sum(y ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1))(p, x)
        gn = jax.grad(loss_naive, argnums=(0, 1))(p, x)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            _np(a), _np(b), rtol=1e-4, atol=1e-5), gf, gn)
