"""Stage-1 prior training loss.

Matches /root/reference/stage1_train_prior_model.py:257-319:
  * DDPM squaredcos_cap_v2, prediction_type='sample'
  * GT target embedding normalized by CLIP stats before q-sampling
  * noise offset on the embedding noise
  * MSE between the predicted and clean (normalized) embedding

TPU-first deviation: the frozen CLIP encoders run *outside* the train step
(precomputed or in a separate jitted encode pass) — the reference re-encodes
both images under no_grad every step. Condition dropout happens in the data
layer on the raw inputs (zero image -> zero-image embedding, zero pose
coords), preserving the reference's CFG-training semantics
(stage1_dataset.py:87-97; SURVEY.md §7.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pcdms_tpu.diffusion.ddpm import (
    ddpm_add_noise, offset_noise, sample_timesteps,
)
from pcdms_tpu.diffusion.schedules import prior_schedule
from pcdms_tpu.models.prior_transformer import (
    PriorConfig, prior_apply, prior_normalize_embeds,
)


def stage1_loss_fn(prior_cfg: PriorConfig = PriorConfig(),
                   noise_offset: float = 0.1,
                   compute_dtype=jnp.float32):
    schedule = prior_schedule()

    def loss_fn(params, batch, rng):
        """batch: s_embed (B,1024), t_embed (B,1024), s_pose (B,36),
        t_pose (B,36). Embeddings are raw CLIP outputs (un-normalized)."""
        rng_noise, rng_offset, rng_t = jax.random.split(rng, 3)
        x0 = prior_normalize_embeds(batch["t_embed"].astype(jnp.float32))
        b = x0.shape[0]

        noise = jax.random.normal(rng_noise, x0.shape, jnp.float32)
        noise = offset_noise(rng_offset, noise, noise_offset)
        t = sample_timesteps(rng_t, b, schedule.num_train_timesteps)
        x_t = ddpm_add_noise(schedule, x0, noise, t)

        pred = prior_apply(params, prior_cfg, x_t.astype(compute_dtype), t,
                           batch["s_embed"].astype(compute_dtype),
                           batch["s_pose"].astype(compute_dtype),
                           batch["t_pose"].astype(compute_dtype))
        loss = jnp.mean(
            jnp.square(pred.astype(jnp.float32) - x0))
        return loss, {}

    return loss_fn
