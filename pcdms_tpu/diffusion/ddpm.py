"""DDPM forward process utilities (training-side q-sampling).

Equivalent to diffusers ``DDPMScheduler.add_noise`` / ``get_velocity`` as
used by all three reference trainers
(/root/reference/stage1_train_prior_model.py:287;
 /root/reference/stage2_train_inpaint_model.py:362,378)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcdms_tpu.diffusion.schedules import NoiseSchedule


def _gather(coeffs, t, ndim):
    c = jnp.asarray(coeffs)[t]
    return c.reshape(c.shape + (1,) * (ndim - 1))


def ddpm_add_noise(schedule: NoiseSchedule, x0, noise, t):
    """q(x_t | x_0): sqrt(ac_t) x0 + sqrt(1 - ac_t) noise. t: (B,) ints."""
    a = _gather(schedule.sqrt_alphas_cumprod, t, x0.ndim).astype(x0.dtype)
    s = _gather(schedule.sqrt_one_minus_alphas_cumprod, t,
                x0.ndim).astype(x0.dtype)
    return a * x0 + s * noise


def ddpm_velocity(schedule: NoiseSchedule, x0, noise, t):
    """v-prediction target: sqrt(ac_t) eps - sqrt(1 - ac_t) x0."""
    a = _gather(schedule.sqrt_alphas_cumprod, t, x0.ndim).astype(x0.dtype)
    s = _gather(schedule.sqrt_one_minus_alphas_cumprod, t,
                x0.ndim).astype(x0.dtype)
    return a * noise - s * x0


def sample_timesteps(rng, batch_size: int, num_train_timesteps: int):
    """Uniform integer timesteps, one per example."""
    return jax.random.randint(rng, (batch_size,), 0, num_train_timesteps)


def offset_noise(rng, noise, offset: float):
    """Noise-offset augmentation (crosslabs blog; reference
    stage1_train_prior_model.py:274-276): add a per-(batch, channel) DC
    shift. noise: (..., C) NHWC or (B, D) embeddings."""
    if offset == 0.0:
        return noise
    if noise.ndim == 4:
        shift_shape = (noise.shape[0], 1, 1, noise.shape[-1])
    else:
        shift_shape = noise.shape[:1] + (1,) * (noise.ndim - 1)
    return noise + offset * jax.random.normal(rng, shift_shape, noise.dtype)
