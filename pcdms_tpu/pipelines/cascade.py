"""Full 3-stage progressive cascade: prior -> inpaint -> refine.

The reference chains the stages through files on disk
(SURVEY.md §1: .npy embeddings, then PNGs). This composite keeps all
intermediate tensors on device: one call goes from (source image, source
pose, target pose) to the refined target image. Each stage is its own jit
(shapes differ), but nothing round-trips through the host between stages.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcdms_tpu.models.prior_transformer import PriorConfig
from pcdms_tpu.models.unet2d import UNetConfig
from pcdms_tpu.models.vae import VAEConfig
from pcdms_tpu.pipelines.stage1_prior import stage1_generate
from pcdms_tpu.pipelines.stage2_inpaint import stage2_generate
from pcdms_tpu.pipelines.stage3_refine import stage3_generate


def cascade_generate(stage1_params, stage2_params, stage3_params,
                     s_embed, s_pose_coords, t_pose_coords,
                     vae_image, st_pose_image, dino_feats, rng,
                     seeds=None, s2_latents=None, s3_latents=None, *,
                     prior_cfg: PriorConfig = PriorConfig(),
                     stage2_cfg: UNetConfig,
                     stage3_cfg: UNetConfig,
                     vae_cfg: VAEConfig = VAEConfig(),
                     prior_steps: int = 20,
                     inpaint_steps: int = 20,
                     refine_steps: int = 20,
                     guidance_scale: float = 2.0,
                     scheduler: str = "unipc",
                     compute_dtype=jnp.bfloat16,
                     encoder_cache_interval: int = 1):
    """Run prior -> inpaint -> refine.

    s_embed: (B, 1024) source CLIP embedding.
    s_pose_coords / t_pose_coords: (B, 36) keypoint vectors (stage 1).
    vae_image: (B, H, 2W, 3) [source | black] canvas.
    st_pose_image: (B, H, 2W, 3) skeleton canvas (stage 2).
    dino_feats: (B, 257, 1536) source DINOv2 features (stages 2 & 3).
    seeds: optional (B,) int32 per-request seeds. When given, every
        noise draw in all three stages is derived per row from its seed
        (stage-1 ancestral noise via ``stage1_generate(seeds=...)``,
        stage-2/3 initial latents via per-row ``fold_in``, VAE encodes
        at the posterior mean) — row i's output is then a pure function
        of its own inputs + seed, independent of batch composition
        (the serving layer's determinism contract). Without seeds the
        batch-shaped ``rng`` path is unchanged.
    s2_latents / s3_latents: optional explicit initial latents
        ((B, H/8, 2W/8, 4) and (B, H/8, W/8, 4)) overriding the
        seed-derived ones — the serving layer passes host-Philox
        latents here so a seed yields the same stage-2 image under
        ``CascadeService`` as under ``Stage2Service`` (one derivation
        across services). Require ``seeds`` (for the stage-1 draws).
    Returns dict with 'embeds', 'inpainted' (full canvas), 'refined'
    (target half, refined).
    """
    r1, r2, r3 = jax.random.split(rng, 3)
    deterministic = seeds is not None
    if (s2_latents is not None or s3_latents is not None) \
            and not deterministic:
        raise ValueError("explicit s2/s3 latents require seeds= (the "
                         "stage-1 ancestral draws are seed-derived)")
    if deterministic:
        seeds = jnp.asarray(seeds, jnp.int32)

        def row_latents(stage_tag, shape):
            base = jax.random.PRNGKey(stage_tag)
            return jax.vmap(lambda s: jax.random.normal(
                jax.random.fold_in(base, s), shape, jnp.float32))(seeds)

        bb, hh, ww2, _ = vae_image.shape
        if s2_latents is None:
            s2_latents = row_latents(2, (hh // 8, ww2 // 8, 4))
        if s3_latents is None:
            s3_latents = row_latents(3, (hh // 8, ww2 // 16, 4))

    embeds = stage1_generate(
        stage1_params, s_embed, s_pose_coords, t_pose_coords, r1,
        seeds=seeds, prior_cfg=prior_cfg, num_steps=prior_steps,
        guidance_scale=0.0)

    inpainted = stage2_generate(
        stage2_params, vae_image, st_pose_image, dino_feats,
        embeds[:, None, :], r2, latents=s2_latents, unet_cfg=stage2_cfg,
        vae_cfg=vae_cfg, num_steps=inpaint_steps,
        guidance_scale=guidance_scale,
        scheduler=scheduler, compute_dtype=compute_dtype,
        encoder_cache_interval=encoder_cache_interval,
        deterministic_vae=deterministic)

    # right half of the canvas = generated target
    half = inpainted.shape[2] // 2
    target = inpainted[:, :, half:, :]

    refined = stage3_generate(
        stage3_params, target, dino_feats, r3, latents=s3_latents,
        unet_cfg=stage3_cfg, vae_cfg=vae_cfg, num_steps=refine_steps,
        guidance_scale=guidance_scale, scheduler=scheduler,
        compute_dtype=compute_dtype,
        encoder_cache_interval=encoder_cache_interval,
        deterministic_vae=deterministic)

    return {"embeds": embeds, "inpainted": inpainted, "refined": refined}
