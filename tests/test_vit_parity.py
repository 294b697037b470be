"""Parity tests: JAX ViT encoders vs transformers (torch CPU) reference
implementations with randomly initialized weights, exercising the
torch->JAX converter end to end."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pcdms_tpu.compat.torch_convert import (
    convert_clip_vision, convert_dinov2, state_dict_to_numpy,
)
from pcdms_tpu.models.vit import ViTConfig, vit_apply


def _rand_pixels(b, size, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, size, size, 3)).astype(np.float32)


class TestCLIPVisionParity:
    @pytest.fixture(scope="class")
    def models(self):
        from transformers import CLIPVisionConfig, \
            CLIPVisionModelWithProjection
        tcfg = CLIPVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=3,
            num_attention_heads=4, image_size=28, patch_size=14,
            projection_dim=32, hidden_act="gelu")
        torch.manual_seed(0)
        tmodel = CLIPVisionModelWithProjection(tcfg).eval()
        jcfg = ViTConfig(hidden_size=64, num_layers=3, num_heads=4,
                         patch_size=14, image_size=28, mlp_ratio=2.0,
                         projection_dim=32, pre_layernorm=True,
                         patch_bias=False, use_flash=False)
        params = convert_clip_vision(
            state_dict_to_numpy(tmodel.state_dict()))
        return tmodel, jcfg, params

    def test_image_embeds_match(self, models):
        tmodel, jcfg, params = models
        x = _rand_pixels(2, 28)
        with torch.no_grad():
            tout = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        jout = vit_apply(params, jcfg, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(jout["image_embeds"]),
            tout.image_embeds.numpy(), atol=2e-4, rtol=1e-3)

    def test_hidden_states_match(self, models):
        tmodel, jcfg, params = models
        x = _rand_pixels(1, 28, seed=1)
        with torch.no_grad():
            tout = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        jout = vit_apply(params, jcfg, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(jout["last_hidden_state"]),
            tout.last_hidden_state.numpy(), atol=2e-4, rtol=1e-3)


class TestDinov2Parity:
    @pytest.fixture(scope="class")
    def models(self):
        from transformers import Dinov2Config, Dinov2Model
        tcfg = Dinov2Config(
            hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
            mlp_ratio=4, image_size=28, patch_size=14,
            use_swiglu_ffn=True, layerscale_value=1.0)
        torch.manual_seed(0)
        tmodel = Dinov2Model(tcfg).eval()
        jcfg = ViTConfig(hidden_size=48, num_layers=2, num_heads=4,
                         patch_size=14, image_size=28, mlp_ratio=4.0,
                         layer_norm_eps=1e-6, pre_layernorm=False,
                         use_layer_scale=True, use_swiglu=True,
                         patch_bias=True, use_flash=False)
        params = convert_dinov2(state_dict_to_numpy(tmodel.state_dict()))
        return tmodel, jcfg, params

    def test_last_hidden_state_matches(self, models):
        tmodel, jcfg, params = models
        x = _rand_pixels(2, 28, seed=2)
        with torch.no_grad():
            tout = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        jout = vit_apply(params, jcfg, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(jout["last_hidden_state"]),
            tout.last_hidden_state.numpy(), atol=3e-4, rtol=1e-3)

    def test_swiglu_hidden_dim_formula(self):
        cfg = ViTConfig(hidden_size=1536, mlp_ratio=4.0, use_swiglu=True)
        assert cfg.mlp_hidden == 4096   # DINOv2-giant


class TestPosEmbedInterpolation:
    def test_identity_when_same_grid(self):
        from pcdms_tpu.models.vit import interpolate_pos_embed
        pos = jnp.arange(1 * 5 * 16, dtype=jnp.float32).reshape(1, 5, 16)
        out = interpolate_pos_embed(pos, 2, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pos))

    def test_resize_shape(self):
        from pcdms_tpu.models.vit import interpolate_pos_embed
        pos = jnp.ones((1, 1 + 37 * 37, 8))
        out = interpolate_pos_embed(pos, 16, 16)
        assert out.shape == (1, 257, 8)
