"""Frozen-encoder passes for training.

The reference re-encodes conditioning images with frozen CLIP/DINOv2 every
step under no_grad (stage1_train_prior_model.py:263-270,
stage2_train_inpaint_model.py:341-346). Here the encoders are separate
jitted forward functions so they run once per batch on device (and can be
precomputed/cached per epoch). Condition dropout has already zeroed the
*pixel* inputs in the data layer, so the CFG null condition is exactly the
zero-image embedding, as in the reference (SURVEY.md §7.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pcdms_tpu.models.vit import ViTConfig, vit_apply
from pcdms_tpu.utils.tree import cast_pytree


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def clip_image_embed(params, pixels, *, cfg: ViTConfig,
                     compute_dtype=jnp.bfloat16):
    """pixels: (B, 224, 224, 3) CLIP-preprocessed -> (B, proj_dim)."""
    out = vit_apply(cast_pytree(params, compute_dtype), cfg,
                    pixels.astype(compute_dtype))
    return out["image_embeds"].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def dino_features(params, pixels, *, cfg: ViTConfig,
                  compute_dtype=jnp.bfloat16):
    """pixels: (B, 224, 224, 3) -> (B, 257, hidden) last_hidden_state."""
    out = vit_apply(cast_pytree(params, compute_dtype), cfg,
                    pixels.astype(compute_dtype))
    return out["last_hidden_state"].astype(jnp.float32)
