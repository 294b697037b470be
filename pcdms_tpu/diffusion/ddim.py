"""DDIM sampler as precomputed per-step coefficient tables.

Matches diffusers ``DDIMScheduler`` with the SD-2.1 config the demo uses
(/root/reference/pcdms_kaggle_demo.ipynb cell 15): scaled_linear betas,
``steps_offset=1``, 'leading' timestep spacing, ``clip_sample=False``,
``set_alpha_to_one=False`` (the final step targets alphas_cumprod[0]),
eta=0 (deterministic).

The sampler loop is:  x <- cx0[i] * x0_pred + ceps[i] * eps_pred
with x0/eps derived from the model output via pred_to_x0 / pred_to_eps,
so one table pair serves epsilon-, sample- and v-prediction models.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pcdms_tpu.diffusion.schedules import NoiseSchedule


def ddim_timesteps(num_train_timesteps: int, num_inference_steps: int,
                   steps_offset: int = 1) -> np.ndarray:
    """'leading' spacing: arange(N) * (T // N), descending, + offset."""
    ratio = num_train_timesteps // num_inference_steps
    t = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.int64)
    return t + steps_offset


def ddim_step_tables(schedule: NoiseSchedule, num_inference_steps: int,
                     steps_offset: int = 1, eta: float = 0.0):
    """Returns (timesteps (N,), cx0 (N,), ceps (N,), sigma (N,)) tables.

    Step i maps x_{t_i} -> x_{t_{i+1}} (t decreasing); the last step's
    'previous' alpha is alphas_cumprod[0] (set_alpha_to_one=False).
    eta > 0 adds the DDIM ancestral noise term (diffusers
    ``DDIMScheduler.step`` eta semantics): sigma_i =
    eta * sqrt((1-ac_prev)/(1-ac_t)) * sqrt(1 - ac_t/ac_prev), and the
    epsilon coefficient becomes sqrt(1 - ac_prev - sigma^2).
    """
    T = schedule.num_train_timesteps
    ts = ddim_timesteps(T, num_inference_steps, steps_offset)
    ratio = T // num_inference_steps
    ac = np.asarray(schedule.alphas_cumprod)

    prev_ts = ts - ratio
    ac_t = ac[np.clip(ts, 0, T - 1)]
    ac_prev = np.where(prev_ts >= 0, ac[np.clip(prev_ts, 0, T - 1)], ac[0])

    sigma = eta * np.sqrt((1.0 - ac_prev) / (1.0 - ac_t)
                          * (1.0 - ac_t / ac_prev))
    cx0 = np.sqrt(ac_prev)
    ceps = np.sqrt(np.maximum(1.0 - ac_prev - sigma ** 2, 0.0))
    # numpy outputs: table builders run at trace time inside jitted
    # pipelines and must stay host constants (lax.scan converts xs).
    return (np.asarray(ts, np.int32),
            np.asarray(cx0, np.float32),
            np.asarray(ceps, np.float32),
            np.asarray(sigma, np.float32))
