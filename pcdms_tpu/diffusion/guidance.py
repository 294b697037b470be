"""Classifier-free guidance utilities.

CFG batching convention follows the reference pipelines: the model is
called on a doubled batch ``[uncond; cond]`` and the two halves are mixed
(/root/reference/src/pipelines/stage2_inpaint_pipeline.py:510-516).
``rescale_noise_cfg`` implements the guidance-rescale trick from
"Common Diffusion Noise Schedules and Sample Steps are Flawed"
(/root/reference/src/pipelines/stage2_inpaint_pipeline.py:52-66).
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_cfg(model_out_doubled, guidance_scale: float,
              guidance_rescale: float = 0.0):
    """model_out_doubled: (2B, ...) with [uncond; cond] halves."""
    uncond, cond = jnp.split(model_out_doubled, 2, axis=0)
    out = uncond + guidance_scale * (cond - uncond)
    if guidance_rescale > 0.0:
        out = rescale_noise_cfg(out, cond, guidance_rescale)
    return out


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale: float):
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / jnp.maximum(std_cfg, 1e-12))
    return (guidance_rescale * rescaled
            + (1.0 - guidance_rescale) * noise_cfg)
