"""FreeU and LCM guidance-embedding features (PCDMs_pipeline.py parity,
SURVEY.md §2.1 row 12)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.nn.layers import guidance_scale_embedding
from pcdms_tpu.nn.unet_blocks import fourier_filter
from pcdms_tpu.models.unet2d import UNetConfig, unet_apply, unet_init

CFG = UNetConfig(in_channels=9, block_out_channels=(8, 16, 16, 16),
                 layers_per_block=1, cross_attention_dim=16, head_dim=8,
                 class_embed_proj_dim=None, norm_groups=4, use_flash=False)


class TestFourierFilter:
    def test_scale_one_is_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
        y = fourier_filter(x, threshold=1, scale=1.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_scale_zero_removes_dc(self):
        x = jnp.ones((1, 8, 8, 1))   # pure DC signal
        y = fourier_filter(x, threshold=1, scale=0.0)
        np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-5)

    def test_high_freq_untouched(self):
        # checkerboard = highest frequency; low-freq box scaling leaves it
        h = 8
        grid = (np.indices((h, h)).sum(0) % 2).astype(np.float32) * 2 - 1
        x = jnp.asarray(grid)[None, :, :, None]
        y = fourier_filter(x, threshold=1, scale=0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


class TestFreeUUNet:
    def test_freeu_changes_output(self):
        params = unet_init(jax.random.PRNGKey(0), CFG)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 9))
        args = (jnp.array([100]), jnp.ones((1, 4, 16)))
        base = unet_apply(params, CFG, x, *args)
        cfg_fu = dataclasses.replace(CFG, freeu=(0.9, 0.2, 1.2, 1.4))
        out = unet_apply(params, cfg_fu, x, *args)
        assert base.shape == out.shape
        assert not np.allclose(np.asarray(base), np.asarray(out))

    def test_freeu_neutral_params_match_baseline(self):
        params = unet_init(jax.random.PRNGKey(0), CFG)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 9))
        args = (jnp.array([100]), jnp.ones((1, 4, 16)))
        base = unet_apply(params, CFG, x, *args)
        cfg_fu = dataclasses.replace(CFG, freeu=(1.0, 1.0, 1.0, 1.0))
        out = unet_apply(params, cfg_fu, x, *args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=2e-5)


class TestGuidanceEmbedding:
    def test_formula(self):
        dim = 8
        w = jnp.array([2.0])
        emb = guidance_scale_embedding(w, dim)
        half = dim // 2
        freqs = np.exp(-np.log(10000.0) * np.arange(half) / (half - 1))
        ang = 1000.0 * freqs           # (w-1)*1000 = 1000
        expected = np.concatenate([np.sin(ang), np.cos(ang)])
        np.testing.assert_allclose(np.asarray(emb[0]), expected, atol=1e-4)

    def test_lcm_unet_conditioning(self):
        cfg = dataclasses.replace(CFG, time_cond_proj_dim=8)
        params = unet_init(jax.random.PRNGKey(0), cfg)
        assert "cond_proj" in params["time_embedding"]
        x = jnp.zeros((1, 64, 64, 9))
        ctx = jnp.ones((1, 4, 16))
        w_emb = guidance_scale_embedding(jnp.array([7.5]), 8)
        out1 = unet_apply(params, cfg, x, jnp.array([10]), ctx,
                          timestep_cond=w_emb)
        out2 = unet_apply(params, cfg, x, jnp.array([10]), ctx,
                          timestep_cond=jnp.zeros_like(w_emb))
        assert not np.allclose(np.asarray(out1), np.asarray(out2))
