"""Stage-3 refinement UNet training loss.

Matches /root/reference/stage3_train_refined_model.py:303-360: 8-channel
input concat [noisy GT latents, stage-2 generated latents], cross-attention
over projected DINOv2 source features only, epsilon MSE with noise offset.
Trainable: {"unet", "image_proj"}; frozen: {"vae"}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcdms_tpu.diffusion.ddpm import (
    ddpm_add_noise, ddpm_velocity, offset_noise, sample_timesteps,
)
from pcdms_tpu.diffusion.schedules import sd21_schedule
from pcdms_tpu.models.projections import image_proj_mlp_apply
from pcdms_tpu.models.unet2d import UNetConfig, unet_apply
from pcdms_tpu.models.vae import VAEConfig, vae_encode
from pcdms_tpu.utils.tree import cast_pytree


def stage3_loss_fn(unet_cfg: UNetConfig, vae_params,
                   vae_cfg: VAEConfig = VAEConfig(),
                   noise_offset: float = 0.1,
                   prediction_type: str = "epsilon",
                   compute_dtype=jnp.bfloat16):
    schedule = sd21_schedule(prediction_type)

    def loss_fn(params, batch, rng):
        """batch: target_image (B,H,W,3) GT, gen_image (B,H,W,3) stage-2
        output, dino_features (B,257,1536)."""
        rng_v1, rng_v2, rng_noise, rng_off, rng_t = jax.random.split(rng, 5)

        vae = cast_pytree(jax.lax.stop_gradient(vae_params), compute_dtype)
        latents = vae_encode(
            vae, batch["target_image"].astype(compute_dtype),
            rng=rng_v1, cfg=vae_cfg).astype(jnp.float32)
        gen_latents = vae_encode(
            vae, batch["gen_image"].astype(compute_dtype),
            rng=rng_v2, cfg=vae_cfg).astype(jnp.float32)

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        noise = offset_noise(rng_off, noise, noise_offset)
        t = sample_timesteps(rng_t, latents.shape[0],
                             schedule.num_train_timesteps)
        noisy = ddpm_add_noise(schedule, latents, noise, t)

        unet_in = jnp.concatenate([noisy, gen_latents],
                                  axis=-1).astype(compute_dtype)
        ctx = image_proj_mlp_apply(
            params["image_proj"],
            batch["dino_features"].astype(compute_dtype))

        pred = unet_apply(params["unet"], unet_cfg, unet_in, t, ctx)

        if prediction_type == "epsilon":
            target = noise
        elif prediction_type == "v_prediction":
            target = ddpm_velocity(schedule, latents, noise, t)
        else:
            raise ValueError(prediction_type)

        loss = jnp.mean(jnp.square(pred.astype(jnp.float32) - target))
        return loss, {}

    return loss_fn
