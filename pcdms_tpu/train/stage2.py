"""Stage-2 inpainting UNet training loss.

Matches /root/reference/stage2_train_inpaint_model.py:324-390:
  * VAE-encode the GT [source|target] canvas and the [source|black] masked
    canvas (stochastic, frozen VAE)
  * latent half-mask [ones | zeros]
  * 9-channel input concat [noisy, mask, masked_latents]
  * UNet(class_labels=target CLIP embed, cross-attn tokens =
    [proj(DINOv2 features), target CLIP embed], pose map added at conv_in)
  * epsilon (or v) MSE with noise offset

Trainable params: {"unet", "image_proj", "pose_proj"}; frozen: {"vae"}
(passed separately so the optimizer/gradient never touch it). Frozen
encoders (DINOv2 / CLIP) run in the data/encode pass, with condition
dropout applied to their *inputs* (zero image) upstream, matching the
reference's drop-rate-0.1 semantics (stage2_dataset.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcdms_tpu.diffusion.ddpm import (
    ddpm_add_noise, ddpm_velocity, offset_noise, sample_timesteps,
)
from pcdms_tpu.diffusion.schedules import sd21_schedule
from pcdms_tpu.models.projections import (
    image_proj_mlp_apply, pose_cond_embedding_apply,
)
from pcdms_tpu.models.unet2d import UNetConfig, unet_apply
from pcdms_tpu.models.vae import VAEConfig, vae_encode
from pcdms_tpu.pipelines.stage2_inpaint import build_half_mask
from pcdms_tpu.utils.tree import cast_pytree


def stage2_loss_fn(unet_cfg: UNetConfig, vae_params,
                   vae_cfg: VAEConfig = VAEConfig(),
                   noise_offset: float = 0.1,
                   prediction_type: str = "epsilon",
                   compute_dtype=jnp.bfloat16):
    schedule = sd21_schedule(prediction_type)

    def loss_fn(params, batch, rng):
        """batch: st_image (B,H,2W,3) GT canvas, masked_image (B,H,2W,3),
        pose_image (B,H,2W,3), dino_features (B,257,1536),
        clip_embed (B,1,1024). Images in [-1,1]."""
        rng_v1, rng_v2, rng_noise, rng_off, rng_t = jax.random.split(rng, 5)

        vae = cast_pytree(jax.lax.stop_gradient(vae_params), compute_dtype)
        latents = vae_encode(vae, batch["st_image"].astype(compute_dtype),
                             rng=rng_v1, cfg=vae_cfg).astype(jnp.float32)
        masked = vae_encode(vae, batch["masked_image"].astype(compute_dtype),
                            rng=rng_v2, cfg=vae_cfg).astype(jnp.float32)

        b, lh, lw, _ = latents.shape
        mask = build_half_mask(b, lh, lw, jnp.float32)

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        noise = offset_noise(rng_off, noise, noise_offset)
        t = sample_timesteps(rng_t, b, schedule.num_train_timesteps)
        noisy = ddpm_add_noise(schedule, latents, noise, t)

        unet_in = jnp.concatenate([noisy, mask, masked],
                                  axis=-1).astype(compute_dtype)

        proj_f = image_proj_mlp_apply(
            params["image_proj"],
            batch["dino_features"].astype(compute_dtype))
        clip_embed = batch["clip_embed"].astype(compute_dtype)
        ctx = jnp.concatenate([proj_f, clip_embed], axis=1)
        pose_cond = pose_cond_embedding_apply(
            params["pose_proj"], batch["pose_image"].astype(compute_dtype))

        pred = unet_apply(params["unet"], unet_cfg, unet_in, t, ctx,
                          class_labels=clip_embed[:, 0, :],
                          pose_cond=pose_cond)

        if prediction_type == "epsilon":
            target = noise
        elif prediction_type == "v_prediction":
            target = ddpm_velocity(schedule, latents, noise, t)
        else:
            raise ValueError(prediction_type)

        loss = jnp.mean(jnp.square(pred.astype(jnp.float32) - target))
        return loss, {}

    return loss_fn
