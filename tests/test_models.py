"""Shape/behavior tests for the model zoo on tiny configs (golden-value
parity vs released torch checkpoints lives in compat tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdms_tpu.models.prior_transformer import (
    PriorConfig, prior_apply, prior_init, prior_normalize_embeds,
    prior_post_process_latents,
)
from pcdms_tpu.models.projections import (
    image_proj_mlp_apply, image_proj_mlp_init,
    pose_cond_embedding_apply, pose_cond_embedding_init,
)
from pcdms_tpu.models.unet2d import UNetConfig, unet_apply, unet_init
from pcdms_tpu.models.vae import VAEConfig, vae_decode, vae_encode, vae_init


TINY_UNET = UNetConfig(
    in_channels=9, out_channels=4,
    block_out_channels=(32, 64, 64, 64),
    layers_per_block=2, cross_attention_dim=48, head_dim=16,
    class_embed_proj_dim=40, use_flash=False,
)


class TestUNet:
    pytestmark = pytest.mark.slow
    def test_forward_shapes_stage2(self):
        key = jax.random.PRNGKey(0)
        params = unet_init(key, TINY_UNET)
        b, h, w = 2, 16, 32          # double-width canvas latents
        sample = jnp.zeros((b, h, w, 9))
        t = jnp.array([10, 500])
        ctx = jnp.zeros((b, 12, 48))
        cls = jnp.zeros((b, 40))
        pose = jnp.zeros((b, h, w, 32))
        out = unet_apply(params, TINY_UNET, sample, t, ctx,
                         class_labels=cls, pose_cond=pose)
        assert out.shape == (b, h, w, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_class_labels_required(self):
        params = unet_init(jax.random.PRNGKey(0), TINY_UNET)
        with pytest.raises(ValueError):
            unet_apply(params, TINY_UNET, jnp.zeros((1, 16, 16, 9)),
                       jnp.array([0]), jnp.zeros((1, 4, 48)))

    def test_stage3_variant_no_class(self):
        cfg = UNetConfig(in_channels=8, block_out_channels=(32, 64, 64, 64),
                         cross_attention_dim=48, head_dim=16,
                         class_embed_proj_dim=None, use_flash=False)
        params = unet_init(jax.random.PRNGKey(1), cfg)
        out = unet_apply(params, cfg, jnp.zeros((1, 16, 16, 8)),
                         jnp.array([3]), jnp.zeros((1, 4, 48)))
        assert out.shape == (1, 16, 16, 4)

    def test_pose_cond_changes_output(self):
        params = unet_init(jax.random.PRNGKey(0), TINY_UNET)
        sample = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 9))
        args = (jnp.array([100]), jnp.ones((1, 4, 48)), jnp.ones((1, 40)))
        out0 = unet_apply(params, TINY_UNET, sample, *args)
        pose = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 32))
        out1 = unet_apply(params, TINY_UNET, sample, *args, pose_cond=pose)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))

    def test_jit_compiles(self):
        params = unet_init(jax.random.PRNGKey(0), TINY_UNET)

        @jax.jit
        def f(p, x, t, ctx, cls):
            return unet_apply(p, TINY_UNET, x, t, ctx, class_labels=cls)

        out = f(params, jnp.zeros((1, 16, 16, 9)), jnp.array([1]),
                jnp.zeros((1, 4, 48)), jnp.zeros((1, 40)))
        assert out.shape == (1, 16, 16, 4)


class TestPrior:
    CFG = PriorConfig(num_heads=4, head_dim=8, num_layers=2,
                      embedding_dim=16, pose_hidden=12)

    def test_forward_shape(self):
        params = prior_init(jax.random.PRNGKey(0), self.CFG)
        b = 3
        out = prior_apply(params, self.CFG,
                          jnp.zeros((b, 16)), jnp.array([1, 2, 3]),
                          jnp.zeros((b, 16)), jnp.zeros((b, 36)),
                          jnp.zeros((b, 36)))
        assert out.shape == (b, 16)

    def test_cfg_doubling(self):
        params = prior_init(jax.random.PRNGKey(0), self.CFG)
        b = 2
        out = prior_apply(params, self.CFG,
                          jnp.zeros((2 * b, 16)), jnp.zeros((2 * b,)),
                          jnp.zeros((2 * b, 16)),
                          jnp.ones((b, 36)), jnp.ones((b, 36)),
                          cfg_zero_cond=True)
        assert out.shape == (2 * b, 16)

    def test_clip_stats_roundtrip(self):
        x = jnp.array([0.5, -1.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(prior_post_process_latents(prior_normalize_embeds(x))),
            np.asarray(x), atol=1e-6)

    def test_pose_conditioning_matters(self):
        params = prior_init(jax.random.PRNGKey(5), self.CFG)
        args = (jnp.ones((1, 16)), jnp.array([500]), jnp.ones((1, 16)))
        o1 = prior_apply(params, self.CFG, *args,
                         jnp.zeros((1, 36)), jnp.zeros((1, 36)))
        o2 = prior_apply(params, self.CFG, *args,
                         jnp.ones((1, 36)), jnp.zeros((1, 36)))
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestVAE:
    CFG = VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                    norm_groups=4)

    def test_encode_decode_shapes(self):
        params = vae_init(jax.random.PRNGKey(0), self.CFG)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 64, 3))
        z = vae_encode(params, x, cfg=self.CFG)       # deterministic
        assert z.shape == (1, 4, 8, 4)
        y = vae_decode(params, z, cfg=self.CFG)
        assert y.shape == (1, 32, 64, 3)

    def test_encode_stochastic_differs(self):
        params = vae_init(jax.random.PRNGKey(0), self.CFG)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        z1 = vae_encode(params, x, rng=jax.random.PRNGKey(2), cfg=self.CFG)
        z2 = vae_encode(params, x, rng=jax.random.PRNGKey(3), cfg=self.CFG)
        assert not np.allclose(np.asarray(z1), np.asarray(z2))


class TestProjections:
    def test_image_proj_shape(self):
        params = image_proj_mlp_init(jax.random.PRNGKey(0), 24, 12, 16)
        out = image_proj_mlp_apply(params, jnp.zeros((2, 7, 24)))
        assert out.shape == (2, 7, 16)

    def test_pose_embedding_downsamples_8x_and_starts_at_zero(self):
        params = pose_cond_embedding_init(jax.random.PRNGKey(0),
                                          out_channels=32,
                                          block_out_channels=(4, 8, 8, 8))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 128, 3))
        out = pose_cond_embedding_apply(params, x)
        assert out.shape == (1, 8, 16, 32)
        # zero-initialized output conv: contributes nothing before training
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
