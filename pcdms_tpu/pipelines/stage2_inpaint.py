"""Stage-2 pose-conditioned inpainting pipeline — the flagship workload.

Mirrors ``Stage2_InpaintDiffusionPipeline.__call__``
(/root/reference/src/pipelines/stage2_inpaint_pipeline.py:391-532) and its
``Simple_``/demo variant, re-designed as ONE jitted program: on-device VAE
encode of the [source | black] canvas, half-mask construction, ControlNet
pose encoding, DINOv2-feature projection, CFG-batched UNet denoising under a
single ``lax.scan`` (DDIM or UniPC), and VAE decode — no host round-trips
between steps.

Conditioning layout (matches the reference exactly):
  * UNet input: concat([noisy_latents, mask, masked_latents], channels) = 9ch
  * mask: [ones | zeros] at latent scale — source half = 1
  * cross-attention tokens: [proj(DINOv2 257x1536 -> 1024), target CLIP embed]
    = 258 tokens; CFG negative = zeros
  * class_labels (full variant): target CLIP embedding (stage-1 output)
  * pose: skeleton render -> 320ch map added to conv_in output; NOT dropped
    for CFG (duplicated for both halves)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pcdms_tpu.diffusion.guidance import apply_cfg
from pcdms_tpu.diffusion.schedules import sd21_schedule
from pcdms_tpu.models.projections import (
    image_proj_mlp_apply, pose_cond_embedding_apply,
)
from pcdms_tpu.models.unet2d import (
    UNetConfig, unet_apply,
)
from pcdms_tpu.models.vae import VAEConfig, vae_decode, vae_encode
from pcdms_tpu.pipelines.sampling import SAMPLERS
from pcdms_tpu.utils.tree import cast_pytree


def build_half_mask(batch: int, latent_h: int, latent_w: int, dtype):
    """[ones | zeros] latent mask — source (left) half = 1
    (stage2_train_inpaint_model.py:337-339)."""
    half = latent_w // 2
    mask = jnp.concatenate([
        jnp.ones((batch, latent_h, half, 1), dtype),
        jnp.zeros((batch, latent_h, latent_w - half, 1), dtype),
    ], axis=2)
    return mask


@functools.partial(
    jax.jit,
    static_argnames=("unet_cfg", "vae_cfg", "num_steps",
                     "guidance_scale", "guidance_rescale",
                     "scheduler", "num_samples", "compute_dtype",
                     "decode", "unroll", "eta",
                     "encoder_cache_interval", "deterministic_vae",
                     "lcm_origin_steps"),
)
def stage2_generate(params, vae_image, st_pose, dino_features,
                    pred_t_embed, rng, latents=None, *,
                    unet_cfg: UNetConfig,
                    vae_cfg: VAEConfig = VAEConfig(),
                    num_steps: int = 20,
                    guidance_scale: float = 2.0,
                    guidance_rescale: float = 0.0,
                    scheduler: str = "unipc",
                    num_samples: int = 1,
                    compute_dtype=jnp.bfloat16,
                    decode: bool = True,
                    unroll: int = 1,
                    eta: float = 0.0,
                    encoder_cache_interval: int = 1,
                    deterministic_vae: bool = False,
                    lcm_origin_steps: int = 50):
    """Generate target-pose images.

    params: {"unet", "image_proj", "pose_proj", "vae"} param pytrees.
    vae_image: (B, H, 2W, 3) [source | black] canvas in [-1, 1].
    st_pose: (B, H, 2W, 3) [source pose | target pose] skeleton render.
    dino_features: (B, 257, 1536) DINOv2 last_hidden_state of the source.
    pred_t_embed: (B, 1, 1024) stage-1 predicted target CLIP embedding, or
        None for the simplified/demo variant (no class embedding).
    num_samples: samples per input pair (reference best-of-4 protocol).

    Returns (B*num_samples, H, 2W, 3) images in [-1, 1] (or latents if
    decode=False), grouped sample-major: output[i*B + b] is sample i of
    input b.

    encoder_cache_interval > 1 enables encoder-propagation sampling
    (arXiv 2312.09608 "Faster Diffusion"): the UNet down-path + mid
    block run only on key steps (every interval-th step, always step 0)
    and their features are carried through the scan; non-key steps run
    the decoder only with a fresh time embedding. ~0.45x the UNet cost
    on non-key steps at the price of an approximation — default 1 keeps
    the reference-exact sampler.
    """
    schedule = sd21_schedule()
    cparams = cast_pytree(params, compute_dtype)
    # LCM-distilled variant: guidance is embedded via timestep_cond and
    # classifier-free doubling is disabled (PCDMs_pipeline.py:875-877,
    # 1102-1108)
    lcm_mode = unet_cfg.time_cond_proj_dim is not None
    use_cfg = guidance_scale > 1.0 and not lcm_mode

    b, img_h, img_w, _ = vae_image.shape
    lh, lw = img_h // 8, img_w // 8

    rng_latents, rng_vae = jax.random.split(rng)

    # --- conditions (computed once, outside the scan) ---
    proj_f = image_proj_mlp_apply(cparams["image_proj"],
                                  dino_features.astype(compute_dtype))
    if pred_t_embed is not None:
        embed = pred_t_embed.astype(compute_dtype)
        feature_f = jnp.concatenate([proj_f, embed], axis=1)   # (B, 258, D)
        class_labels = embed[:, 0, :]
    else:
        feature_f = proj_f
        class_labels = None

    pose_cond = pose_cond_embedding_apply(cparams["pose_proj"],
                                          st_pose.astype(compute_dtype))

    # deterministic_vae=True encodes the canvas at the posterior mean
    # instead of sampling it — with explicit `latents` and eta=0 this
    # makes the output a pure function of per-request inputs, which the
    # serving layer needs for batch-composition-invariant results
    # (serve/stage2.py); default False keeps the reference's .sample()
    masked_latents = vae_encode(cparams["vae"],
                                vae_image.astype(compute_dtype),
                                rng=None if deterministic_vae else rng_vae,
                                cfg=vae_cfg).astype(jnp.float32)
    mask = build_half_mask(b, lh, lw, jnp.float32)

    # --- replicate for num_samples (sample-major) ---
    def tile(x):
        return None if x is None else jnp.concatenate([x] * num_samples, 0)

    feature_f = tile(feature_f)
    class_labels = tile(class_labels)
    pose_cond = tile(pose_cond)
    masked_latents = tile(masked_latents)
    mask = tile(mask)
    n = b * num_samples

    # --- CFG doubling: zero image features, duplicated pose/mask/latents ---
    if use_cfg:
        feature_f = jnp.concatenate(
            [jnp.zeros_like(feature_f), feature_f], axis=0)
        if class_labels is not None:
            class_labels = jnp.concatenate(
                [jnp.zeros_like(class_labels), class_labels], axis=0)
        pose_cond = jnp.concatenate([pose_cond] * 2, axis=0)
        mask_d = jnp.concatenate([mask] * 2, axis=0)
        masked_d = jnp.concatenate([masked_latents] * 2, axis=0)
    else:
        mask_d, masked_d = mask, masked_latents

    mask_d = mask_d.astype(compute_dtype)
    masked_d = masked_d.astype(compute_dtype)

    timestep_cond = None
    if lcm_mode:
        from pcdms_tpu.nn.layers import guidance_scale_embedding
        timestep_cond = guidance_scale_embedding(
            jnp.full((n,), guidance_scale, jnp.float32),
            unet_cfg.time_cond_proj_dim).astype(compute_dtype)

    zp = n if use_cfg else 0

    def make_inp(x, t):
        lat = jnp.concatenate([x] * 2, 0) if use_cfg else x
        inp = jnp.concatenate(
            [lat.astype(compute_dtype), mask_d, masked_d], axis=-1)
        return inp, jnp.broadcast_to(t, (inp.shape[0],))

    def model_eps(x, t):
        inp, tt = make_inp(x, t)
        eps = unet_apply(cparams["unet"], unet_cfg, inp, tt, feature_f,
                         class_labels=class_labels, pose_cond=pose_cond,
                         timestep_cond=timestep_cond, zero_ctx_prefix=zp)
        eps = eps.astype(jnp.float32)
        if use_cfg:
            eps = apply_cfg(eps, guidance_scale, guidance_rescale)
        return eps

    model_carry = None
    if encoder_cache_interval > 1:
        from pcdms_tpu.pipelines.sampling import encoder_prop_model_eps
        model_eps, model_carry = encoder_prop_model_eps(   # noqa: F811
            cparams["unet"], unet_cfg, make_inp, feature_f,
            interval=encoder_cache_interval, latent_shape=(n, lh, lw, 4),
            zero_ctx_prefix=zp, use_cfg=use_cfg,
            guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale,
            compute_dtype=compute_dtype, class_labels=class_labels,
            pose_cond=pose_cond, timestep_cond=timestep_cond)

    if latents is not None:
        # explicit initial noise (reference pipelines' `latents` argument;
        # needed for pixel-parity tests where torch Generator noise is
        # injected rather than matched by seed — SURVEY.md §7.3)
        x_init = latents.astype(jnp.float32)
    else:
        x_init = jax.random.normal(rng_latents, (n, lh, lw, 4), jnp.float32)
    if scheduler == "lcm":
        # latent-consistency sampling on the TRAINED skipped-boundary
        # grid with the trained c_skip/c_out parameterization —
        # DDIM/UniPC timesteps would query the w-conditioning off the
        # distillation grid (train/lcm_distill.py)
        if not lcm_mode:
            raise ValueError("scheduler='lcm' needs a w-conditioned "
                             "student (UNetConfig.time_cond_proj_dim)")
        if encoder_cache_interval > 1:
            raise ValueError("encoder_cache_interval and scheduler='lcm' "
                             "don't compose (few-step sampling)")
        from pcdms_tpu.pipelines.sampling import lcm_sample_loop
        latents = lcm_sample_loop(schedule, model_eps, x_init, num_steps,
                                  jax.random.fold_in(rng, 11),
                                  origin_steps=lcm_origin_steps)
    elif scheduler == "ddim" and eta > 0.0:
        from pcdms_tpu.pipelines.sampling import ddim_sample_loop
        # fold_in: rng was already split above (re-splitting would alias
        # rng_eta with rng_vae)
        rng_eta = jax.random.fold_in(rng, 7)
        latents = ddim_sample_loop(schedule, model_eps, x_init, num_steps,
                                   unroll, eta=eta, rng=rng_eta,
                                   model_carry=model_carry)
    else:
        latents = SAMPLERS[scheduler](schedule, model_eps, x_init,
                                      num_steps, unroll,
                                      model_carry=model_carry)

    if not decode:
        return latents
    images = vae_decode(cparams["vae"], latents.astype(compute_dtype),
                        cfg=vae_cfg)
    return images.astype(jnp.float32)
