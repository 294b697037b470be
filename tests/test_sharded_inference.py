"""Data-parallel sharded sampling over the virtual 8-device mesh —
the SPMD replacement for the reference's one-process-per-GPU inference
fan-out (stage1_batchtest_prior_model.py:155-177; SURVEY.md §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.models.prior_transformer import PriorConfig, prior_init
from pcdms_tpu.models.projections import (
    image_proj_mlp_init, pose_cond_embedding_init,
)
from pcdms_tpu.models.unet2d import UNetConfig, unet_init
from pcdms_tpu.models.vae import VAEConfig, vae_init
from pcdms_tpu.parallel.mesh import batch_sharding, make_mesh
from pcdms_tpu.pipelines.stage1_prior import stage1_generate
from pcdms_tpu.pipelines.stage2_inpaint import stage2_generate

PRIOR_CFG = PriorConfig(num_heads=2, head_dim=8, num_layers=2,
                        embedding_dim=16, pose_hidden=8)
UNET_CFG = UNetConfig(in_channels=9, block_out_channels=(8, 16, 16, 16),
                      layers_per_block=1, cross_attention_dim=16, head_dim=8,
                      class_embed_proj_dim=None, norm_groups=4,
                      use_flash=False)
VAE_CFG = VAEConfig(block_out_channels=(4, 8, 8, 8), layers_per_block=1,
                    norm_groups=2)


class TestShardedSampling:
    def test_stage1_sharded_matches_unsharded(self):
        mesh = make_mesh()
        params = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        b = 8
        s_embed = jax.random.normal(jax.random.PRNGKey(1), (b, 16))
        s_pose = jnp.full((b, 36), 0.3)
        t_pose = jnp.full((b, 36), 0.7)

        out_plain = stage1_generate(params, s_embed, s_pose, t_pose,
                                    jax.random.PRNGKey(2),
                                    prior_cfg=PRIOR_CFG, num_steps=3)

        shard = batch_sharding(mesh)
        out_sharded = stage1_generate(
            params, jax.device_put(s_embed, shard),
            jax.device_put(s_pose, shard), jax.device_put(t_pose, shard),
            jax.random.PRNGKey(2), prior_cfg=PRIOR_CFG, num_steps=3)
        np.testing.assert_allclose(np.asarray(out_sharded),
                                   np.asarray(out_plain), atol=1e-4)

    def test_stage2_runs_with_sharded_batch(self):
        mesh = make_mesh()
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        params = {"unet": unet_init(ks[0], UNET_CFG),
                  "image_proj": image_proj_mlp_init(ks[1], 24, 16, 16),
                  "pose_proj": pose_cond_embedding_init(
                      ks[2], out_channels=8,
                      block_out_channels=(4, 4, 4, 4)),
                  "vae": vae_init(ks[3], VAE_CFG)}
        shard = batch_sharding(mesh)
        b = 8
        canvas = jax.device_put(
            jax.random.uniform(ks[0], (b, 64, 128, 3), minval=-1, maxval=1),
            shard)
        dino = jax.device_put(jax.random.normal(ks[1], (b, 5, 24)), shard)
        out = stage2_generate(params, canvas, canvas, dino, None,
                              jax.random.PRNGKey(5), unet_cfg=UNET_CFG,
                              vae_cfg=VAE_CFG, num_steps=2,
                              guidance_scale=2.0, scheduler="ddim",
                              compute_dtype=jnp.float32)
        assert out.shape == (b, 64, 128, 3)
        assert np.isfinite(np.asarray(out)).all()
