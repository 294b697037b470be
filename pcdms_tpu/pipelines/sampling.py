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


def encoder_prop_model_eps(params, cfg, make_inp, feature_f, *,
                           interval: int, latent_shape,
                           zero_ctx_prefix: int = 0,
                           use_cfg: bool = False,
                           guidance_scale: float = 0.0,
                           guidance_rescale: float = 0.0,
                           compute_dtype=jnp.float32,
                           class_labels=None, pose_cond=None,
                           timestep_cond=None):
    """Build the carried model for encoder-propagation sampling
    (arXiv 2312.09608): the UNet down-path + mid block run only on key
    steps (every ``interval``-th, always step 0) and their features are
    carried through the scan; non-key steps run the decoder only with a
    fresh time embedding. Shared by the stage-2 and stage-3 pipelines —
    the subtle scan-carry logic must not diverge between them.

    ``make_inp(x, t) -> (unet_input, per-sample timesteps)`` is the
    pipeline-specific channel concat (9ch inpaint / 8ch refine + CFG
    doubling). Returns ``(model_eps(x, t, carry) -> (eps, carry),
    carry0)`` for the ``model_carry`` hook of the loops above.
    """
    from pcdms_tpu.diffusion.guidance import apply_cfg
    from pcdms_tpu.models.unet2d import (
        unet_decode, unet_encode, unet_time_embedding,
    )

    def embed(tt):
        return unet_time_embedding(params, cfg, tt,
                                   class_labels=class_labels,
                                   timestep_cond=timestep_cond,
                                   dtype=compute_dtype)

    def encode_at(x, t):
        inp, tt = make_inp(x, t)
        return unet_encode(params, cfg, inp, embed(tt), feature_f,
                           pose_cond=pose_cond,
                           zero_ctx_prefix=zero_ctx_prefix)

    def model_eps(x, t, mcarry):
        step_i, cache = mcarry
        inp, tt = make_inp(x, t)
        emb = embed(tt)
        is_key = (step_i % interval) == 0
        cache = jax.lax.cond(
            is_key,
            lambda c: unet_encode(params, cfg, inp, emb, feature_f,
                                  pose_cond=pose_cond,
                                  zero_ctx_prefix=zero_ctx_prefix),
            lambda c: c,
            cache)
        h, skips = cache
        eps = unet_decode(params, cfg, h, skips, emb, feature_f,
                          zero_ctx_prefix=zero_ctx_prefix)
        eps = eps.astype(jnp.float32)
        if use_cfg:
            eps = apply_cfg(eps, guidance_scale, guidance_rescale)
        return eps, (step_i + 1, cache)

    cache_shape = jax.eval_shape(
        encode_at, jax.ShapeDtypeStruct(tuple(latent_shape), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32))
    cache0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                          cache_shape)
    return model_eps, (jnp.zeros((), jnp.int32), cache0)


def lcm_inference_timesteps(num_train_timesteps: int, num_steps: int,
                            origin_steps: int = 50) -> np.ndarray:
    """LCM inference timesteps: picked from the TRAINED skipped-DDIM
    boundary grid (train/lcm_distill.skipped_timesteps), descending from
    the top — the diffusers LCMScheduler selection. Sampling off this
    grid would query w-conditioning at timesteps the distillation never
    optimized."""
    if not 1 <= origin_steps <= num_train_timesteps \
            or num_train_timesteps % origin_steps:
        raise ValueError(f"origin_steps {origin_steps} must divide "
                         f"{num_train_timesteps}")
    k = num_train_timesteps // origin_steps
    ddim_ts = np.arange(1, origin_steps + 1) * k - 1
    skip = max(len(ddim_ts) // num_steps, 1)
    ts = ddim_ts[::-1][::skip][:num_steps]
    return ts.astype(np.int32)


def lcm_sample_loop(schedule: NoiseSchedule, model_eps_fn: Callable,
                    x_init, num_steps: int, rng, *,
                    origin_steps: int = 50,
                    sigma_data: float = 0.5,
                    timestep_scaling: float = 10.0):
    """Latent-consistency sampling (arXiv 2310.04378 / LCMScheduler):
    at each boundary timestep the student's eps output is wrapped with
    the SAME c_skip/c_out consistency parameterization it was distilled
    under (train/lcm_distill.lcm_boundary_scalings), and the denoised
    estimate is re-noised to the next boundary with fresh noise (none
    after the final step). num_steps is small (4-8); the loop unrolls
    inside the enclosing jit."""
    from pcdms_tpu.train.lcm_distill import lcm_boundary_scalings

    ts = lcm_inference_timesteps(schedule.num_train_timesteps, num_steps,
                                 origin_steps)
    a = jnp.asarray(schedule.sqrt_alphas_cumprod)
    s = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod)
    x = x_init
    for i, t in enumerate(ts):
        t_arr = jnp.asarray(t, jnp.int32)
        eps = model_eps_fn(x, t_arr)
        x0 = (x - s[t] * eps) / a[t]
        c_skip, c_out = lcm_boundary_scalings(
            jnp.asarray(float(t)), sigma_data, timestep_scaling)
        denoised = c_skip * x + c_out * x0
        if i < len(ts) - 1:
            t_next = int(ts[i + 1])
            noise = jax.random.normal(jax.random.fold_in(rng, i),
                                      x.shape, jnp.float32)
            x = a[t_next] * denoised + s[t_next] * noise
        else:
            x = denoised
    return x
