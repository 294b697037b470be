"""End-to-end pipeline tests on tiny models (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_state():
    """Drop compiled-executable caches accumulated by the preceding ~250
    tests before this module's large pipeline compiles: with the full
    suite's state resident, the XLA CPU backend_compile segfaulted
    reproducibly (3/3 runs) while compiling the cascade's stage-3 graph,
    and never in isolation or subsets — an upstream compiler-state issue
    this fixture works around."""
    jax.clear_caches()
    yield
    jax.clear_caches()

from pcdms_tpu.models.prior_transformer import PriorConfig, prior_init
from pcdms_tpu.models.projections import (
    image_proj_mlp_init, pose_cond_embedding_init,
)
from pcdms_tpu.models.unet2d import UNetConfig, unet_init
from pcdms_tpu.models.vae import VAEConfig, vae_init
from pcdms_tpu.pipelines.cascade import cascade_generate
from pcdms_tpu.pipelines.stage1_prior import stage1_generate
from pcdms_tpu.pipelines.stage2_inpaint import (
    build_half_mask, stage2_generate,
)
from pcdms_tpu.pipelines.stage3_refine import stage3_generate

PRIOR_CFG = PriorConfig(num_heads=2, head_dim=8, num_layers=2,
                        embedding_dim=16, pose_hidden=8)
UNET2_CFG = UNetConfig(in_channels=9, block_out_channels=(8, 16, 16, 16),
                       layers_per_block=1, cross_attention_dim=16,
                       head_dim=8, class_embed_proj_dim=16, norm_groups=4,
                       use_flash=False)
UNET3_CFG = UNetConfig(in_channels=8, block_out_channels=(8, 16, 16, 16),
                       layers_per_block=1, cross_attention_dim=16,
                       head_dim=8, norm_groups=4, use_flash=False)
VAE_CFG = VAEConfig(block_out_channels=(4, 8, 8, 8), layers_per_block=1,
                    norm_groups=2)

B, H, W = 1, 64, 64


@pytest.fixture(scope="module")
def models():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    vae = vae_init(ks[1], VAE_CFG)
    return {
        "prior": prior_init(ks[0], PRIOR_CFG),
        "s2": {"unet": unet_init(ks[2], UNET2_CFG),
               "image_proj": image_proj_mlp_init(ks[3], 24, 16, 16),
               "pose_proj": pose_cond_embedding_init(
                   ks[4], out_channels=8, block_out_channels=(4, 4, 4, 4)),
               "vae": vae},
        "s3": {"unet": unet_init(ks[5], UNET3_CFG),
               "image_proj": image_proj_mlp_init(ks[6], 24, 16, 16),
               "vae": vae},
    }


class TestHalfMask:
    def test_layout(self):
        mask = build_half_mask(2, 4, 8, jnp.float32)
        assert mask.shape == (2, 4, 8, 1)
        np.testing.assert_array_equal(np.asarray(mask[:, :, :4, 0]), 1.0)
        np.testing.assert_array_equal(np.asarray(mask[:, :, 4:, 0]), 0.0)


class TestStage1Pipeline:
    def test_shapes_and_determinism(self, models):
        args = (jnp.ones((B, 16)), jnp.full((B, 36), 0.4),
                jnp.full((B, 36), 0.6))
        out1 = stage1_generate(models["prior"], *args,
                               jax.random.PRNGKey(1), prior_cfg=PRIOR_CFG,
                               num_steps=4, guidance_scale=0.0)
        out2 = stage1_generate(models["prior"], *args,
                               jax.random.PRNGKey(1), prior_cfg=PRIOR_CFG,
                               num_steps=4, guidance_scale=0.0)
        assert out1.shape == (B, 16)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    @pytest.mark.slow
    def test_seeds_batch_composition_invariance(self, models):
        """seeds= derives init + ancestral noise per row: a row's
        trajectory is independent of batch size/position and of rng."""
        k = jax.random.PRNGKey(3)
        s_embed = jax.random.normal(k, (3, 16))
        s_pose = jnp.tile(jnp.linspace(0.1, 0.9, 36), (3, 1))
        t_pose = jnp.tile(jnp.linspace(0.9, 0.1, 36), (3, 1))
        seeds = np.array([4, 5, 6], np.int32)
        full = stage1_generate(models["prior"], s_embed, s_pose, t_pose,
                               jax.random.PRNGKey(1), seeds=seeds,
                               prior_cfg=PRIOR_CFG, num_steps=4,
                               guidance_scale=0.0)
        solo = stage1_generate(models["prior"], s_embed[1:2],
                               s_pose[1:2], t_pose[1:2],
                               jax.random.PRNGKey(2),   # rng-independent
                               seeds=seeds[1:2], prior_cfg=PRIOR_CFG,
                               num_steps=4, guidance_scale=0.0)
        # identical noise streams; equal up to fp rounding (XLA tiles
        # differently per batch shape — same bound as test_serve.py's
        # stage-2 batch-invariance test)
        np.testing.assert_allclose(np.asarray(full[1]), np.asarray(solo[0]),
                                   rtol=1e-5, atol=1e-5)
        assert not np.allclose(np.asarray(full[0]), np.asarray(full[2]))

    def test_cfg_path(self, models):
        out = stage1_generate(models["prior"], jnp.ones((B, 16)),
                              jnp.full((B, 36), 0.4), jnp.full((B, 36), 0.6),
                              jax.random.PRNGKey(1), prior_cfg=PRIOR_CFG,
                              num_steps=3, guidance_scale=4.0)
        assert np.isfinite(np.asarray(out)).all()


class TestStage2Pipeline:
    def _inputs(self):
        k = jax.random.PRNGKey(9)
        return (
            jax.random.uniform(k, (B, H, 2 * W, 3), minval=-1, maxval=1),
            jax.random.uniform(k, (B, H, 2 * W, 3), minval=-1, maxval=1),
            jax.random.normal(k, (B, 5, 24)),
            jnp.ones((B, 1, 16)),
        )

    def test_output_shape_multi_sample(self, models):
        canvas, pose, dino, emb = self._inputs()
        out = stage2_generate(models["s2"], canvas, pose, dino, emb,
                              jax.random.PRNGKey(0), unet_cfg=UNET2_CFG,
                              vae_cfg=VAE_CFG, num_steps=3,
                              guidance_scale=2.0, scheduler="ddim",
                              num_samples=3, compute_dtype=jnp.float32)
        assert out.shape == (3 * B, H, 2 * W, 3)
        # different samples must differ (different init noise)
        assert not np.allclose(np.asarray(out[0]), np.asarray(out[B]))

    def test_latents_only(self, models):
        canvas, pose, dino, emb = self._inputs()
        out = stage2_generate(models["s2"], canvas, pose, dino, emb,
                              jax.random.PRNGKey(0), unet_cfg=UNET2_CFG,
                              vae_cfg=VAE_CFG, num_steps=2,
                              guidance_scale=0.0, scheduler="ddim",
                              compute_dtype=jnp.float32, decode=False)
        assert out.shape == (B, H // 8, 2 * W // 8, 4)


class TestStage2Variants:
    pytestmark = pytest.mark.slow
    """eta>0 DDIM, FreeU, and the LCM guidance-embedding variant exercised
    through the full stage-2 pipeline (not just standalone loops):
    finite, correctly shaped, and different from the default path."""

    def _base(self, models, cfg=UNET2_CFG, params=None, **kw):
        canvas = jax.random.uniform(jax.random.PRNGKey(9), (B, H, 2 * W, 3),
                                    minval=-1, maxval=1)
        dino = jax.random.normal(jax.random.PRNGKey(10), (B, 5, 24))
        kw.setdefault("num_steps", 3)
        kw.setdefault("guidance_scale", 2.0)
        kw.setdefault("scheduler", "ddim")
        kw.setdefault("compute_dtype", jnp.float32)
        return stage2_generate(params or models["s2"], canvas, canvas, dino,
                               jnp.ones((B, 1, 16)), jax.random.PRNGKey(0),
                               unet_cfg=cfg, vae_cfg=VAE_CFG, **kw)

    def test_eta_changes_output(self, models):
        base = self._base(models)
        out = self._base(models, eta=1.0)
        assert out.shape == base.shape
        assert np.isfinite(np.asarray(out)).all()
        assert not np.allclose(np.asarray(out), np.asarray(base), atol=1e-3)

    def test_freeu_changes_output(self, models):
        import dataclasses
        base = self._base(models)
        cfg = dataclasses.replace(UNET2_CFG, freeu=(0.9, 0.2, 1.2, 1.4))
        out = self._base(models, cfg=cfg)
        assert out.shape == base.shape
        assert np.isfinite(np.asarray(out)).all()
        assert not np.allclose(np.asarray(out), np.asarray(base), atol=1e-3)

    def test_lcm_guidance_embedding(self, models):
        """time_cond_proj_dim set: CFG doubling off, guidance enters via
        the embedded w (PCDMs_pipeline.py:875-877,1102-1108)."""
        import dataclasses
        cfg = dataclasses.replace(UNET2_CFG, time_cond_proj_dim=8)
        params = dict(models["s2"])
        params["unet"] = unet_init(jax.random.PRNGKey(42), cfg)
        out2 = self._base(models, cfg=cfg, params=params,
                          guidance_scale=2.0)
        out8 = self._base(models, cfg=cfg, params=params,
                          guidance_scale=8.0)
        assert out2.shape == (B, H, 2 * W, 3)
        assert np.isfinite(np.asarray(out2)).all()
        # guidance scale must flow through the embedding (CFG is off)
        assert not np.allclose(np.asarray(out2), np.asarray(out8),
                               atol=1e-3)


class TestStage3Pipeline:
    def test_output_shape(self, models):
        gen = jax.random.uniform(jax.random.PRNGKey(3), (B, H, W, 3),
                                 minval=-1, maxval=1)
        dino = jax.random.normal(jax.random.PRNGKey(4), (B, 5, 24))
        out = stage3_generate(models["s3"], gen, dino,
                              jax.random.PRNGKey(5), unet_cfg=UNET3_CFG,
                              vae_cfg=VAE_CFG, num_steps=2,
                              guidance_scale=2.0, scheduler="unipc",
                              compute_dtype=jnp.float32)
        assert out.shape == (B, H, W, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestCascade:
    pytestmark = pytest.mark.slow
    def test_full_chain(self, models):
        k = jax.random.PRNGKey(11)
        out = cascade_generate(
            models["prior"], models["s2"], models["s3"],
            jnp.ones((B, 16)), jnp.full((B, 36), 0.4),
            jnp.full((B, 36), 0.6),
            jax.random.uniform(k, (B, H, 2 * W, 3), minval=-1, maxval=1),
            jax.random.uniform(k, (B, H, 2 * W, 3), minval=-1, maxval=1),
            jax.random.normal(k, (B, 5, 24)),
            jax.random.PRNGKey(12),
            prior_cfg=PRIOR_CFG, stage2_cfg=UNET2_CFG, stage3_cfg=UNET3_CFG,
            vae_cfg=VAE_CFG, prior_steps=2, inpaint_steps=2, refine_steps=2,
            scheduler="ddim", compute_dtype=jnp.float32)
        assert out["embeds"].shape == (B, 16)
        assert out["inpainted"].shape == (B, H, 2 * W, 3)
        assert out["refined"].shape == (B, H, W, 3)
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()

    def test_seeds_batch_composition_invariance(self, models):
        """With per-request seeds, a request's full-cascade output is
        identical whether it runs alone or inside a larger batch (the
        serving layer's determinism contract, serve/stage2.py)."""
        k = jax.random.PRNGKey(13)
        n = 3
        ks = jax.random.split(k, 4)
        inputs = dict(
            s_embed=jax.random.normal(ks[0], (n, 16)),
            s_pose=jnp.tile(jnp.linspace(0.2, 0.8, 36), (n, 1)),
            t_pose=jnp.tile(jnp.linspace(0.8, 0.2, 36), (n, 1)),
            vae_image=jax.random.uniform(ks[1], (n, H, 2 * W, 3),
                                         minval=-1, maxval=1),
            st_pose=jax.random.uniform(ks[2], (n, H, 2 * W, 3),
                                       minval=-1, maxval=1),
            dino=jax.random.normal(ks[3], (n, 5, 24)),
        )
        seeds = np.array([7, 8, 9], np.int32)
        kwargs = dict(prior_cfg=PRIOR_CFG, stage2_cfg=UNET2_CFG,
                      stage3_cfg=UNET3_CFG, vae_cfg=VAE_CFG,
                      prior_steps=2, inpaint_steps=2, refine_steps=2,
                      scheduler="ddim", compute_dtype=jnp.float32)
        full = cascade_generate(
            models["prior"], models["s2"], models["s3"],
            inputs["s_embed"], inputs["s_pose"], inputs["t_pose"],
            inputs["vae_image"], inputs["st_pose"], inputs["dino"],
            jax.random.PRNGKey(12), seeds=seeds, **kwargs)
        solo = cascade_generate(
            models["prior"], models["s2"], models["s3"],
            inputs["s_embed"][1:2], inputs["s_pose"][1:2],
            inputs["t_pose"][1:2], inputs["vae_image"][1:2],
            inputs["st_pose"][1:2], inputs["dino"][1:2],
            jax.random.PRNGKey(99),     # rng must not matter with seeds
            seeds=seeds[1:2], **kwargs)
        # identical noise streams; equal up to fp rounding, amplified
        # slightly through the 3-stage chain (XLA tiles differently per
        # batch shape — same bound family as test_serve.py)
        for key, tol in (("embeds", 1e-5), ("inpainted", 1e-3),
                         ("refined", 1e-3)):
            np.testing.assert_allclose(np.asarray(full[key][1]),
                                       np.asarray(solo[key][0]),
                                       rtol=1e-4, atol=tol)
        # distinct seeds produce distinct trajectories
        assert not np.allclose(np.asarray(full["refined"][0]),
                               np.asarray(full["refined"][2]))
