"""Latent-consistency distillation for the stage-2 inpainting UNet.

Produces the LCM student checkpoints that the inference stack already
consumes (``UNetConfig.time_cond_proj_dim`` + guidance-scale embedding,
``pipelines/stage2_inpaint.py`` lcm_mode — the reference's demo pipeline
has the same consumption-side hooks, PCDMs_pipeline.py:832-859, but
NEITHER repo could produce such a checkpoint before this trainer).
Algorithm follows latent consistency models (arXiv 2310.04378) in the
diffusers trainer's parameterization:

  * skipped DDIM schedule: N boundary timesteps t_n = (n+1)*k - 1 over
    the 1000-step SD-2.1 schedule (k = 1000/N);
  * one *teacher* (the frozen, trained stage-2 epsilon-UNet) DDIM step
    from t to s = t - k under classifier-free guidance at a per-example
    w ~ U[w_min, w_max];
  * consistency parameterization f(x, t, w) = c_skip(t) x +
    c_out(t) x0_pred(x, t, w) with the boundary scalings
    c_skip(0)=1, c_out(0)=0;
  * pseudo-Huber loss between the student at (x_t, t, w) and the target
    network at (x_hat_s, s, w).

The target network is the stop-gradient student (EMA momentum 0) — the
"improved consistency training" finding (arXiv 2310.14189 §3.2) that the
EMA target can be dropped; this keeps the loss inside the standard
``loss_fn(params, batch, rng)`` contract so ``run_training`` (and its
ZeRO-1 / preemption / resume machinery) is reused unchanged. The
separate ``--use_ema`` shadow still provides EMA *final* weights.

Trainable: {"unet" (student, w-conditioned), "image_proj", "pose_proj"}.
Frozen: teacher UNet + its projections, VAE.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.diffusion.ddpm import ddpm_add_noise
from pcdms_tpu.diffusion.schedules import NoiseSchedule, sd21_schedule
from pcdms_tpu.models.projections import (
    image_proj_mlp_apply, pose_cond_embedding_apply,
)
from pcdms_tpu.models.unet2d import UNetConfig, unet_apply, unet_init
from pcdms_tpu.models.vae import VAEConfig, vae_encode
from pcdms_tpu.nn.layers import guidance_scale_embedding
from pcdms_tpu.pipelines.stage2_inpaint import build_half_mask
from pcdms_tpu.utils.tree import cast_pytree


def lcm_boundary_scalings(t, sigma_data: float = 0.5,
                          timestep_scaling: float = 10.0):
    """c_skip/c_out for the consistency boundary condition
    (diffusers ``scalings_for_boundary_conditions``): c_skip(0) = 1,
    c_out(0) = 0, and c_skip ~ 0 away from t = 0. t: raw schedule
    timesteps (float/int array)."""
    st = timestep_scaling * jnp.asarray(t, jnp.float32)
    c_skip = sigma_data ** 2 / (st ** 2 + sigma_data ** 2)
    c_out = st / jnp.sqrt(st ** 2 + sigma_data ** 2)
    return c_skip, c_out


def _gather(table, t):
    return jnp.asarray(table)[t][:, None, None, None]


def eps_to_x0(schedule: NoiseSchedule, x_t, eps, t):
    """x0 from an epsilon prediction at per-example timesteps t."""
    a = _gather(schedule.sqrt_alphas_cumprod, t)
    s = _gather(schedule.sqrt_one_minus_alphas_cumprod, t)
    return (x_t - s * eps) / a


def ddim_solver_step(schedule: NoiseSchedule, x0, eps, s):
    """Deterministic DDIM move to per-example timesteps s given the
    (x0, eps) decomposition at the current timestep; s = 0 returns x0
    exactly (alpha_cumprod[-1-like] boundary handled by gathering s)."""
    a = _gather(schedule.sqrt_alphas_cumprod, s)
    sig = _gather(schedule.sqrt_one_minus_alphas_cumprod, s)
    return a * x0 + sig * eps


def skipped_timesteps(num_train_timesteps: int, num_ddim_timesteps: int):
    """The N boundary timesteps (n+1)*k - 1 of the skipped DDIM schedule
    and the skip k (diffusers DDIMSolver). N must divide the schedule:
    a non-divisor would leave the top of the schedule untrained (where
    few-step inference STARTS), and N > T would silently degenerate
    every pair to t=s=0."""
    if not 1 <= num_ddim_timesteps <= num_train_timesteps \
            or num_train_timesteps % num_ddim_timesteps:
        raise ValueError(
            f"num_ddim_timesteps={num_ddim_timesteps} must divide "
            f"num_train_timesteps={num_train_timesteps}")
    k = num_train_timesteps // num_ddim_timesteps
    ts = np.arange(1, num_ddim_timesteps + 1) * k - 1
    return ts.astype(np.int32), k


def init_student_from_teacher(rng, teacher_unet_params,
                              student_cfg: UNetConfig,
                              zero_init_w_proj: bool = True):
    """Student UNet params = teacher weights + the w-conditioning
    projection the teacher lacks. With zero_init_w_proj (default) the
    cond_proj starts at zero, so the student's initial function equals
    the teacher's at every w — distillation starts from the teacher
    rather than from a perturbed network."""
    if student_cfg.time_cond_proj_dim is None:
        raise ValueError("student_cfg must set time_cond_proj_dim")
    student = unet_init(rng, student_cfg)

    def merge(dst, src):
        # leaves take the teacher's value, COPIED (jnp.array): the
        # student is donated by the train step and must not alias the
        # frozen, closure-held teacher buffers
        if isinstance(dst, dict):
            return {k: (merge(v, src[k]) if k in src else v)
                    for k, v in dst.items()}
        if isinstance(dst, (list, tuple)):
            return type(dst)(merge(d, s) for d, s in zip(dst, src))
        return jnp.array(src)

    student = merge(student, teacher_unet_params)
    if zero_init_w_proj:
        cp = student["time_embedding"]["cond_proj"]
        student["time_embedding"]["cond_proj"] = jax.tree.map(
            jnp.zeros_like, cp)
    return student


def lcm_distill_loss_fn(student_cfg: UNetConfig, teacher_cfg: UNetConfig,
                        teacher_params, vae_params,
                        vae_cfg: VAEConfig = VAEConfig(),
                        num_ddim_timesteps: int = 50,
                        w_min: float = 1.5, w_max: float = 4.0,
                        huber_c: float = 0.001,
                        sigma_data: float = 0.5,
                        timestep_scaling: float = 10.0,
                        compute_dtype=jnp.bfloat16):
    """Build the distillation loss. batch: the stage-2 training batch
    (st_image, masked_image, pose_image, dino_features, clip_embed).

    w_min/w_max bracket the reference's guidance_scale=2.0 operating
    point (stage2_batchtest_inpaint_model.py defaults) rather than the
    SD text-to-image [5, 15] range.
    """
    schedule = sd21_schedule()
    boundary_ts, k = skipped_timesteps(schedule.num_train_timesteps,
                                       num_ddim_timesteps)

    def consistency_f(unet_params, x_t, t, w_embed, mask, masked, ctx,
                      class_labels, pose_cond):
        inp = jnp.concatenate([x_t, mask, masked],
                              axis=-1).astype(compute_dtype)
        eps = unet_apply(unet_params, student_cfg, inp, t, ctx,
                         class_labels=class_labels, pose_cond=pose_cond,
                         timestep_cond=w_embed).astype(jnp.float32)
        x0 = eps_to_x0(schedule, x_t, eps, t)
        c_skip, c_out = lcm_boundary_scalings(t, sigma_data,
                                              timestep_scaling)
        c_skip = c_skip[:, None, None, None]
        c_out = c_out[:, None, None, None]
        return c_skip * x_t + c_out * x0

    def loss_fn(params, batch, rng):
        rng_v1, rng_v2, rng_noise, rng_idx, rng_w = jax.random.split(rng, 5)

        vae = cast_pytree(jax.lax.stop_gradient(vae_params), compute_dtype)
        latents = vae_encode(vae, batch["st_image"].astype(compute_dtype),
                             rng=rng_v1, cfg=vae_cfg).astype(jnp.float32)
        masked = vae_encode(vae,
                            batch["masked_image"].astype(compute_dtype),
                            rng=rng_v2, cfg=vae_cfg).astype(jnp.float32)
        b, lh, lw, _ = latents.shape
        mask = build_half_mask(b, lh, lw, jnp.float32)
        mask_c = mask.astype(compute_dtype)
        masked_c = masked.astype(compute_dtype)

        # skipped-schedule boundary pair (t, s = t - k, clamped to 0)
        idx = jax.random.randint(rng_idx, (b,), 0, len(boundary_ts))
        t = jnp.asarray(boundary_ts)[idx]
        s = jnp.maximum(t - k, 0)

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        x_t = ddpm_add_noise(schedule, latents, noise, t)

        w = jax.random.uniform(rng_w, (b,), jnp.float32, w_min, w_max)
        w_embed = guidance_scale_embedding(
            w, student_cfg.time_cond_proj_dim).astype(compute_dtype)

        # ---- student-side conditioning (trainable projections) ----
        proj_f = image_proj_mlp_apply(
            params["image_proj"],
            batch["dino_features"].astype(compute_dtype))
        clip_embed = batch["clip_embed"].astype(compute_dtype)
        ctx = jnp.concatenate([proj_f, clip_embed], axis=1)
        class_labels = clip_embed[:, 0, :]
        pose_cond = pose_cond_embedding_apply(
            params["pose_proj"], batch["pose_image"].astype(compute_dtype))

        # ---- teacher CFG DDIM step t -> s (frozen) ----
        teacher = jax.lax.stop_gradient(teacher_params)
        t_proj = image_proj_mlp_apply(
            teacher["image_proj"],
            batch["dino_features"].astype(compute_dtype))
        t_ctx = jnp.concatenate([t_proj, clip_embed], axis=1)
        t_pose = pose_cond_embedding_apply(
            teacher["pose_proj"], batch["pose_image"].astype(compute_dtype))
        inp = jnp.concatenate([x_t, mask, masked],
                              axis=-1).astype(compute_dtype)
        # CFG doubling like the inference pipeline: uncond = zero image
        # features + zero class labels, duplicated pose/mask/latents
        inp2 = jnp.concatenate([inp, inp], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        ctx2 = jnp.concatenate([jnp.zeros_like(t_ctx), t_ctx], axis=0)
        cl2 = jnp.concatenate([jnp.zeros_like(class_labels), class_labels],
                              axis=0)
        pose2 = jnp.concatenate([t_pose, t_pose], axis=0)
        eps2 = unet_apply(teacher["unet"], teacher_cfg, inp2, t2, ctx2,
                          class_labels=cl2, pose_cond=pose2,
                          zero_ctx_prefix=b).astype(jnp.float32)
        eps_u, eps_c = jnp.split(eps2, 2, axis=0)
        w4 = w[:, None, None, None]
        eps_teacher = eps_u + w4 * (eps_c - eps_u)
        x0_teacher = eps_to_x0(schedule, x_t, eps_teacher, t)
        x_s = ddim_solver_step(schedule, x0_teacher, eps_teacher, s)

        # ---- consistency pair ----
        f_student = consistency_f(params["unet"], x_t, t, w_embed, mask_c,
                                  masked_c, ctx, class_labels, pose_cond)
        target_params = jax.lax.stop_gradient(params)
        f_target = consistency_f(
            target_params["unet"], jax.lax.stop_gradient(x_s), s, w_embed,
            mask_c, masked_c, jax.lax.stop_gradient(ctx),
            jax.lax.stop_gradient(class_labels),
            jax.lax.stop_gradient(pose_cond))
        f_target = jax.lax.stop_gradient(f_target)

        # pseudo-Huber (arXiv 2310.14189 §3.3)
        diff2 = jnp.square(f_student - f_target)
        loss = jnp.mean(jnp.sqrt(diff2 + huber_c ** 2) - huber_c)
        return loss, {"mean_w": jnp.mean(w)}

    return loss_fn
