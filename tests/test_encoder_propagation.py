"""Encoder-propagation sampling (arXiv 2312.09608) through the stage-2
pipeline: the UNet down-path + mid run only on key steps; their features
are carried in the scan and non-key steps run the decoder only.

Also pins the unet_encode/unet_decode split itself: composing the halves
must be bit-identical to the monolithic unet_apply.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdms_tpu.models.projections import (
    image_proj_mlp_init, pose_cond_embedding_init,
)
from pcdms_tpu.models.unet2d import (
    UNetConfig, unet_apply, unet_decode, unet_encode, unet_init,
    unet_time_embedding,
)
from pcdms_tpu.models.vae import VAEConfig, vae_init
from pcdms_tpu.pipelines.stage2_inpaint import stage2_generate

pytestmark = pytest.mark.slow

UNET_CFG = UNetConfig(in_channels=9, block_out_channels=(8, 16, 16, 16),
                      layers_per_block=1, cross_attention_dim=16,
                      head_dim=8, class_embed_proj_dim=16, norm_groups=4,
                      use_flash=False)
VAE_CFG = VAEConfig(block_out_channels=(4, 8, 8, 8), layers_per_block=1,
                    norm_groups=2)
B, H, W = 1, 64, 64


@pytest.fixture(scope="module")
def s2_models():
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    return {"unet": unet_init(ks[0], UNET_CFG),
            "image_proj": image_proj_mlp_init(ks[1], 24, 16, 16),
            "pose_proj": pose_cond_embedding_init(
                ks[2], out_channels=8, block_out_channels=(4, 4, 4, 4)),
            "vae": vae_init(ks[3], VAE_CFG)}


class TestEncodeDecodeSplit:
    def test_composition_matches_monolithic(self, s2_models):
        """unet_time_embedding -> unet_encode -> unet_decode must equal
        unet_apply exactly (the split is a pure refactor)."""
        k = jax.random.PRNGKey(1)
        sample = jax.random.normal(k, (2, 8, 16, 9))
        ctx = jax.random.normal(jax.random.fold_in(k, 1), (2, 5, 16))
        cls = jax.random.normal(jax.random.fold_in(k, 2), (2, 16))
        pose = jax.random.normal(jax.random.fold_in(k, 3), (2, 8, 16, 8))
        t = jnp.array([10, 500])

        whole = unet_apply(s2_models["unet"], UNET_CFG, sample, t, ctx,
                           class_labels=cls, pose_cond=pose)
        emb = unet_time_embedding(s2_models["unet"], UNET_CFG, t,
                                  class_labels=cls)
        x, skips = unet_encode(s2_models["unet"], UNET_CFG, sample, emb,
                               ctx, pose_cond=pose)
        split = unet_decode(s2_models["unet"], UNET_CFG, x, skips, emb,
                            ctx)
        np.testing.assert_array_equal(np.asarray(whole), np.asarray(split))

    def test_skips_structure_is_fixed(self, s2_models):
        k = jax.random.PRNGKey(2)
        sample = jax.random.normal(k, (1, 8, 16, 9))
        ctx = jnp.zeros((1, 5, 16))
        emb = unet_time_embedding(s2_models["unet"], UNET_CFG,
                                  jnp.array([3]),
                                  class_labels=jnp.zeros((1, 16)))
        _, skips = unet_encode(s2_models["unet"], UNET_CFG, sample, emb,
                               ctx)
        assert isinstance(skips, tuple)
        # conv_in output + per-block resnets/downsamplers
        assert all(s.ndim == 4 for s in skips)


class TestEncoderPropagationPipeline:
    def _inputs(self):
        k = jax.random.PRNGKey(9)
        return (
            jax.random.uniform(k, (B, H, 2 * W, 3), minval=-1, maxval=1),
            jax.random.uniform(k, (B, H, 2 * W, 3), minval=-1, maxval=1),
            jax.random.normal(k, (B, 5, 24)),
            jnp.ones((B, 1, 16)),
        )

    def _run(self, models, interval, scheduler="ddim", num_steps=4,
             **kw):
        canvas, pose, dino, emb = self._inputs()
        return stage2_generate(
            models, canvas, pose, dino, emb, jax.random.PRNGKey(0),
            unet_cfg=UNET_CFG, vae_cfg=VAE_CFG, num_steps=num_steps,
            guidance_scale=2.0, scheduler=scheduler,
            compute_dtype=jnp.float32,
            encoder_cache_interval=interval, **kw)

    @pytest.mark.parametrize("scheduler", ["ddim", "unipc"])
    def test_runs_and_finite(self, s2_models, scheduler):
        out = self._run(s2_models, 2, scheduler=scheduler)
        assert out.shape == (B, H, 2 * W, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_interval_one_matches_exact_path(self, s2_models):
        """interval=1 routes through the classic (non-carried) model —
        identical to not passing the flag at all."""
        a = self._run(s2_models, 1)
        canvas, pose, dino, emb = self._inputs()
        b = stage2_generate(s2_models, canvas, pose, dino, emb,
                            jax.random.PRNGKey(0), unet_cfg=UNET_CFG,
                            vae_cfg=VAE_CFG, num_steps=4,
                            guidance_scale=2.0, scheduler="ddim",
                            compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_interval_when_every_step_is_key_matches_exact(self,
                                                           s2_models):
        """A degenerate cached run whose every step is a key step must
        reproduce the exact sampler bit for bit (proves the carried
        plumbing adds no numeric drift)."""
        # interval > num_steps means only step 0 is key; instead compare
        # interval=2 over 1 step (only step 0 runs -> always key)
        a = self._run(s2_models, 2, num_steps=1)
        b = self._run(s2_models, 1, num_steps=1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_cached_differs_from_exact_but_close(self, s2_models):
        exact = self._run(s2_models, 1, num_steps=6)
        cached = self._run(s2_models, 2, num_steps=6)
        assert not np.array_equal(np.asarray(exact), np.asarray(cached))
        # the approximation stays in a sane range on the tiny stack
        assert float(np.abs(np.asarray(exact)
                            - np.asarray(cached)).mean()) < 1.0

    def test_eta_path_supports_cache(self, s2_models):
        out = self._run(s2_models, 2, scheduler="ddim", eta=0.5)
        assert np.isfinite(np.asarray(out)).all()


UNET3_CFG = UNetConfig(in_channels=8, block_out_channels=(8, 16, 16, 16),
                       layers_per_block=1, cross_attention_dim=16,
                       head_dim=8, norm_groups=4, use_flash=False)


class TestStage3EncoderPropagation:
    @pytest.fixture(scope="class")
    def s3_models(self):
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        return {"unet": unet_init(ks[0], UNET3_CFG),
                "image_proj": image_proj_mlp_init(ks[1], 24, 16, 16),
                "vae": vae_init(ks[2], VAE_CFG)}

    def _run(self, models, interval, num_steps=4):
        from pcdms_tpu.pipelines.stage3_refine import stage3_generate
        k = jax.random.PRNGKey(11)
        gen = jax.random.uniform(k, (1, 64, 64, 3), minval=-1, maxval=1)
        dino = jax.random.normal(jax.random.fold_in(k, 1), (1, 5, 24))
        return stage3_generate(models, gen, dino, jax.random.PRNGKey(0),
                               unet_cfg=UNET3_CFG, vae_cfg=VAE_CFG,
                               num_steps=num_steps, guidance_scale=2.0,
                               scheduler="unipc",
                               compute_dtype=jnp.float32,
                               encoder_cache_interval=interval)

    def test_runs_and_finite(self, s3_models):
        out = self._run(s3_models, 2)
        assert out.shape == (1, 64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_interval_one_bit_parity(self, s3_models):
        a = self._run(s3_models, 1)
        b = self._run(s3_models, 2, num_steps=1)   # single step = key only
        c = self._run(s3_models, 1, num_steps=1)
        np.testing.assert_array_equal(np.asarray(b), np.asarray(c))
        assert np.isfinite(np.asarray(a)).all()


class TestCascadeEncoderPropagation:
    def test_cascade_forwards_interval(self, s2_models):
        from pcdms_tpu.models.prior_transformer import (
            PriorConfig, prior_init,
        )
        from pcdms_tpu.pipelines.cascade import cascade_generate
        prior_cfg = PriorConfig(num_heads=2, head_dim=8, num_layers=2,
                                embedding_dim=16, pose_hidden=8)
        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        prior = prior_init(ks[0], prior_cfg)
        s3 = {"unet": unet_init(ks[1], UNET3_CFG),
              "image_proj": image_proj_mlp_init(ks[2], 24, 16, 16),
              "vae": s2_models["vae"]}
        k = jax.random.PRNGKey(6)
        out = cascade_generate(
            prior, s2_models, s3,
            jax.random.normal(k, (1, 16)),
            jnp.zeros((1, 36)), jnp.full((1, 36), 0.5),
            jax.random.uniform(k, (1, 64, 128, 3), minval=-1, maxval=1),
            jax.random.uniform(k, (1, 64, 128, 3), minval=-1, maxval=1),
            jax.random.normal(k, (1, 5, 24)),
            jax.random.PRNGKey(7), prior_cfg=prior_cfg,
            stage2_cfg=UNET_CFG, stage3_cfg=UNET3_CFG, vae_cfg=VAE_CFG,
            prior_steps=2, inpaint_steps=3, refine_steps=3,
            compute_dtype=jnp.float32, encoder_cache_interval=2)
        assert np.isfinite(np.asarray(out["refined"])).all()
        assert out["refined"].shape == (1, 64, 64, 3)
