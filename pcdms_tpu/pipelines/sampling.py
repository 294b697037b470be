"""Shared denoising-loop drivers.

Each loop is a single ``lax.scan`` over precomputed per-step coefficient
tables, so a whole N-step sampler jit-compiles to one XLA computation with
zero host-device sync inside the loop (the reference's per-step Python loop
+ stateful scheduler objects become carried scan state, SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.diffusion.ddim import ddim_step_tables
from pcdms_tpu.diffusion.schedules import NoiseSchedule
from pcdms_tpu.diffusion.unipc import unipc_sample


def ddim_sample_loop(schedule: NoiseSchedule, model_eps_fn: Callable,
                     x_init, num_steps: int, unroll: int = 1,
                     eta: float = 0.0, rng=None):
    """DDIM; deterministic for eta=0, ancestral for eta>0 (requires rng).
    model_eps_fn(x, t) -> epsilon."""
    ts, cx0, ceps, sigma = ddim_step_tables(schedule, num_steps, eta=eta)
    sa = jnp.asarray(schedule.sqrt_alphas_cumprod[np.asarray(ts)])
    ssg = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod[np.asarray(ts)])

    if eta > 0.0:
        if rng is None:
            raise ValueError("eta > 0 requires an rng")
        step_rngs = jax.random.split(rng, num_steps)

        def step(x, per):
            t, a_prev, e_prev, a_t, s_t, sig, r = per
            eps = model_eps_fn(x, t)
            x0 = (x - s_t * eps) / a_t
            z = jax.random.normal(r, x.shape, x.dtype)
            return a_prev * x0 + e_prev * eps + sig * z, None

        x, _ = jax.lax.scan(
            step, x_init, (ts, cx0, ceps, sa, ssg, jnp.asarray(sigma),
                           step_rngs), unroll=unroll)
        return x

    def step(x, per):
        t, a_prev, e_prev, a_t, s_t = per
        eps = model_eps_fn(x, t)
        x0 = (x - s_t * eps) / a_t
        return a_prev * x0 + e_prev * eps, None

    x, _ = jax.lax.scan(step, x_init, (ts, cx0, ceps, sa, ssg),
                        unroll=unroll)
    return x


def unipc_sample_loop(schedule: NoiseSchedule, model_eps_fn: Callable,
                      x_init, num_steps: int, unroll: int = 1):
    """UniPC order-2 predictor-corrector over an epsilon-prediction model."""
    ac = jnp.asarray(schedule.alphas_cumprod)

    def model_x0(x, t):
        a = jnp.sqrt(ac[t])
        s = jnp.sqrt(1.0 - ac[t])
        eps = model_eps_fn(x, t)
        return (x - s * eps) / a

    return unipc_sample(schedule, model_x0, x_init, num_steps,
                        unroll=unroll)


SAMPLERS = {"ddim": ddim_sample_loop, "unipc": unipc_sample_loop}
