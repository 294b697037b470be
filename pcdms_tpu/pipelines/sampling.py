"""Shared denoising-loop drivers.

Each loop is a single ``lax.scan`` over precomputed per-step coefficient
tables, so a whole N-step sampler jit-compiles to one XLA computation with
zero host-device sync inside the loop (the reference's per-step Python loop
+ stateful scheduler objects become carried scan state, SURVEY.md §7.3).

Loops optionally thread a *model carry* through the scan
(``model_carry=...``): the model is then called as
``model(x, t, carry) -> (eps, carry)``. This is the hook the
encoder-propagation sampler mode uses to cache UNet encoder features
across steps (arXiv 2312.09608); with ``model_carry=None`` the classic
``model(x, t) -> eps`` contract is unchanged.
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
                     eta: float = 0.0, rng=None, model_carry=None):
    """DDIM; deterministic for eta=0, ancestral for eta>0 (requires rng).
    model_eps_fn(x, t) -> epsilon (or (x, t, carry) -> (eps, carry) when
    model_carry is given; with model_carry=None the scan carry and graph
    are exactly the classic ones)."""
    ts, cx0, ceps, sigma = ddim_step_tables(schedule, num_steps, eta=eta)
    sa = jnp.asarray(schedule.sqrt_alphas_cumprod[np.asarray(ts)])
    ssg = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod[np.asarray(ts)])
    carried = model_carry is not None

    def split(c):
        return c if carried else (c, None)

    def join(x, mc):
        return (x, mc) if carried else x

    if eta > 0.0:
        if rng is None:
            raise ValueError("eta > 0 requires an rng")
        step_rngs = jax.random.split(rng, num_steps)

        def step(c, per):
            x, mc = split(c)
            t, a_prev, e_prev, a_t, s_t, sig, r = per
            if carried:
                eps, mc = model_eps_fn(x, t, mc)
            else:
                eps = model_eps_fn(x, t)
            x0 = (x - s_t * eps) / a_t
            z = jax.random.normal(r, x.shape, x.dtype)
            return join(a_prev * x0 + e_prev * eps + sig * z, mc), None

        init = join(x_init, model_carry)
        out, _ = jax.lax.scan(
            step, init,
            (ts, cx0, ceps, sa, ssg, jnp.asarray(sigma), step_rngs),
            unroll=unroll)
        return split(out)[0]

    def step(c, per):
        x, mc = split(c)
        t, a_prev, e_prev, a_t, s_t = per
        if carried:
            eps, mc = model_eps_fn(x, t, mc)
        else:
            eps = model_eps_fn(x, t)
        x0 = (x - s_t * eps) / a_t
        return join(a_prev * x0 + e_prev * eps, mc), None

    out, _ = jax.lax.scan(step, join(x_init, model_carry),
                          (ts, cx0, ceps, sa, ssg), unroll=unroll)
    return split(out)[0]


def unipc_sample_loop(schedule: NoiseSchedule, model_eps_fn: Callable,
                      x_init, num_steps: int, unroll: int = 1,
                      model_carry=None):
    """UniPC order-2 predictor-corrector over an epsilon-prediction model."""
    ac = jnp.asarray(schedule.alphas_cumprod)

    if model_carry is None:
        def model_x0(x, t):
            a = jnp.sqrt(ac[t])
            s = jnp.sqrt(1.0 - ac[t])
            eps = model_eps_fn(x, t)
            return (x - s * eps) / a

        return unipc_sample(schedule, model_x0, x_init, num_steps,
                            unroll=unroll)

    def model_x0(x, t, carry):
        a = jnp.sqrt(ac[t])
        s = jnp.sqrt(1.0 - ac[t])
        eps, carry = model_eps_fn(x, t, carry)
        return (x - s * eps) / a, carry

    return unipc_sample(schedule, model_x0, x_init, num_steps,
                        unroll=unroll, model_carry=model_carry)


SAMPLERS = {"ddim": ddim_sample_loop, "unipc": unipc_sample_loop}
