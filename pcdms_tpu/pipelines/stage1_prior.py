"""Stage-1 prior pipeline: diffuse the target image's CLIP embedding.

Mirrors ``Stage1_PriorPipeline.__call__``
(/root/reference/src/pipelines/stage1_prior_pipeline.py:357-505): UnCLIP
ancestral sampling over 1024-d embedding vectors with 'sample' prediction,
x0 clipping to +/-10, and final un-normalization by the CLIP stats. The
reference's per-step Python loop becomes one ``lax.scan``; CFG (rarely used
— the batch test runs guidance 0) zeroes the pose tokens and the source
embedding, matching the ``test_flag`` branch + zero negative prompt embeds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pcdms_tpu.diffusion.guidance import apply_cfg
from pcdms_tpu.diffusion.schedules import prior_schedule
from pcdms_tpu.diffusion.unclip import unclip_clip_x0, unclip_step_tables
from pcdms_tpu.models.prior_transformer import (
    PriorConfig, prior_apply, prior_post_process_latents,
)
from pcdms_tpu.utils.tree import cast_pytree


@functools.partial(
    jax.jit,
    static_argnames=("prior_cfg", "num_steps", "guidance_scale",
                     "compute_dtype"),
)
def stage1_generate(params, s_embed, s_pose, t_pose, rng, latents=None,
                    seeds=None, *,
                    prior_cfg: PriorConfig = PriorConfig(),
                    num_steps: int = 20,
                    guidance_scale: float = 0.0,
                    compute_dtype=jnp.float32):
    """Predict target CLIP image embeddings.

    s_embed: (B, 1024) source image CLIP embedding.
    s_pose / t_pose: (B, 36) normalized keypoint coordinates.
    seeds: optional (B,) int32 per-request seeds. When given, the initial
        latents (unless ``latents`` is also given) and every UnCLIP
        ancestral noise draw are derived *per row* from
        ``fold_in(seed, step)`` instead of from ``rng`` over the whole
        batch — so row i's trajectory is a pure function of its own
        inputs + seed, independent of batch size or position (the
        serving layer's batch-composition-invariance contract,
        serve/stage2.py). Without seeds the reference-shaped ``rng``
        path is unchanged (golden-trajectory tests pin it).
    Returns (B, 1024) predicted target embeddings (un-normalized).
    """
    schedule = prior_schedule()
    cparams = cast_pytree(params, compute_dtype)
    use_cfg = guidance_scale > 1.0
    b = s_embed.shape[0]
    e = s_embed.shape[-1]

    ts, cx0, cxt, std = unclip_step_tables(schedule, num_steps)

    s_embed = s_embed.astype(compute_dtype)
    if use_cfg:
        proj = jnp.concatenate([jnp.zeros_like(s_embed), s_embed], axis=0)
    else:
        proj = s_embed

    rng, rng_init = jax.random.split(rng)
    if seeds is not None:
        # per-request noise streams: one key per row, folded with the
        # step index — invariant to batch composition
        row_keys = jax.vmap(
            lambda s: jax.random.fold_in(jax.random.PRNGKey(0), s)
        )(jnp.asarray(seeds, jnp.int32))

        def row_noise(step_idx):
            return jax.vmap(lambda k: jax.random.normal(
                jax.random.fold_in(k, step_idx), (e,), jnp.float32)
            )(row_keys)
    if latents is not None:
        x_init = latents.astype(jnp.float32)
    elif seeds is not None:
        x_init = row_noise(num_steps)       # index num_steps = init draw
    else:
        x_init = jax.random.normal(rng_init, (b, e), jnp.float32)
    step_rngs = jax.random.split(rng, num_steps)
    step_idx = jnp.arange(num_steps)

    def step(x, per):
        t, c0, ct, sd, r, i = per
        lat = jnp.concatenate([x] * 2, 0) if use_cfg else x
        tt = jnp.broadcast_to(t, (lat.shape[0],))
        pred = prior_apply(cparams, prior_cfg, lat.astype(compute_dtype), tt,
                           proj, s_pose.astype(compute_dtype),
                           t_pose.astype(compute_dtype),
                           cfg_zero_cond=use_cfg).astype(jnp.float32)
        if use_cfg:
            pred = apply_cfg(pred, guidance_scale)
        x0 = unclip_clip_x0(pred)
        if seeds is not None:
            noise = row_noise(i)
        else:
            noise = jax.random.normal(r, x.shape, jnp.float32)
        return c0 * x0 + ct * x + sd * noise, None

    x, _ = jax.lax.scan(step, x_init,
                        (ts, cx0, cxt, std, step_rngs, step_idx))
    return prior_post_process_latents(x)
