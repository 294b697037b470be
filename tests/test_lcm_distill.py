"""LCM distillation trainer tests: boundary scalings, solver helpers,
student-from-teacher init (exact teacher equivalence at init), loss
descent on a fixed objective, and the CLI main end-to-end.

Neither the reference nor this repo could previously *produce* the LCM
checkpoints both can consume (PCDMs_pipeline.py guidance-embedding /
UNetConfig.time_cond_proj_dim); pcdms_tpu/train/lcm_distill.py adds the
producer side (arXiv 2310.04378 recipe)."""

import dataclasses
import logging
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdms_tpu.diffusion.ddpm import ddpm_add_noise
from pcdms_tpu.diffusion.schedules import sd21_schedule
from pcdms_tpu.models.projections import (
    image_proj_mlp_init, pose_cond_embedding_init,
)
from pcdms_tpu.models.unet2d import UNetConfig, unet_apply, unet_init
from pcdms_tpu.models.vae import VAEConfig, vae_init
from pcdms_tpu.train.lcm_distill import (
    ddim_solver_step, eps_to_x0, init_student_from_teacher,
    lcm_boundary_scalings, lcm_distill_loss_fn, skipped_timesteps,
)

TEACHER_CFG = UNetConfig(in_channels=9, block_out_channels=(8, 16, 16, 16),
                         layers_per_block=1, cross_attention_dim=16,
                         head_dim=8, class_embed_proj_dim=16,
                         norm_groups=4, use_flash=False)
STUDENT_CFG = dataclasses.replace(TEACHER_CFG, time_cond_proj_dim=8)
VAE_CFG = VAEConfig(block_out_channels=(4, 8, 8, 8), layers_per_block=1,
                    norm_groups=2)


class TestPieces:
    def test_boundary_scalings(self):
        c_skip0, c_out0 = lcm_boundary_scalings(jnp.asarray([0]))
        assert float(c_skip0[0]) == 1.0 and float(c_out0[0]) == 0.0
        ts = jnp.asarray([0, 19, 199, 999])
        c_skip, c_out = lcm_boundary_scalings(ts)
        assert np.all(np.diff(np.asarray(c_skip)) < 0)      # decreasing
        assert np.all(np.diff(np.asarray(c_out)) > 0)       # increasing
        assert float(c_skip[-1]) < 1e-6 and float(c_out[-1]) > 0.999

    def test_skipped_timesteps(self):
        ts, k = skipped_timesteps(1000, 50)
        assert k == 20 and len(ts) == 50
        assert ts[0] == 19 and ts[-1] == 999
        assert np.all(np.diff(ts) == 20)

    def test_solver_roundtrip(self):
        """x_t built from (x0, eps) decomposes back exactly, and the
        DDIM move to s reproduces the closed form; s=0 returns x0 up to
        the schedule's alpha_cumprod[0] (not exactly 1)."""
        schedule = sd21_schedule()
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
        eps = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
        t = jnp.asarray([999, 499])
        x_t = ddpm_add_noise(schedule, x0, eps, t)
        np.testing.assert_allclose(np.asarray(eps_to_x0(schedule, x_t,
                                                        eps, t)),
                                   np.asarray(x0), rtol=1e-4, atol=1e-4)
        s = jnp.asarray([979, 479])
        moved = ddim_solver_step(schedule, x0, eps, s)
        a = schedule.sqrt_alphas_cumprod[np.asarray(s)][:, None, None,
                                                        None]
        sg = schedule.sqrt_one_minus_alphas_cumprod[
            np.asarray(s)][:, None, None, None]
        np.testing.assert_allclose(np.asarray(moved),
                                   a * np.asarray(x0) + sg *
                                   np.asarray(eps), rtol=1e-5)

    def test_student_init_equals_teacher_function(self):
        """Zero-init cond_proj means the student's initial function is
        exactly the teacher's, for ANY guidance embedding — distillation
        starts from the teacher."""
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        teacher = unet_init(ks[0], TEACHER_CFG)
        student = init_student_from_teacher(ks[1], teacher, STUDENT_CFG)

        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 8, 16, 9)), jnp.float32)
        t = jnp.asarray([100.0, 700.0])
        ctx = jnp.ones((2, 5, 16), jnp.float32) * 0.1
        cl = jnp.ones((2, 16), jnp.float32) * 0.2
        w_embed = jnp.asarray(np.random.default_rng(2).normal(
            size=(2, 8)), jnp.float32)

        out_t = unet_apply(teacher, TEACHER_CFG, x, t, ctx,
                           class_labels=cl)
        out_s = unet_apply(student, STUDENT_CFG, x, t, ctx,
                           class_labels=cl, timestep_cond=w_embed)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_t),
                                   atol=1e-6)

        # and a non-zero cond_proj changes the output (the knob is live)
        live = jax.tree.map(
            lambda p: p + 0.1,
            student["time_embedding"]["cond_proj"])
        student["time_embedding"]["cond_proj"] = live
        out_s2 = unet_apply(student, STUDENT_CFG, x, t, ctx,
                            class_labels=cl, timestep_cond=w_embed)
        assert np.abs(np.asarray(out_s2) - np.asarray(out_t)).max() > 1e-4


class TestLcmSampler:
    def test_inference_timesteps_on_trained_grid(self):
        from pcdms_tpu.pipelines.sampling import lcm_inference_timesteps
        ts = lcm_inference_timesteps(1000, 4, origin_steps=50)
        np.testing.assert_array_equal(ts, [999, 759, 519, 279])
        # every inference timestep sits on the TRAINED boundary grid
        trained, _ = skipped_timesteps(1000, 50)
        assert set(ts.tolist()) <= set(trained.tolist())
        with pytest.raises(ValueError, match="divide"):
            lcm_inference_timesteps(1000, 4, origin_steps=300)
        with pytest.raises(ValueError, match="divide"):
            skipped_timesteps(1000, 1001)

    def test_sampler_matches_numpy_mirror(self):
        """lcm_sample_loop vs an independent numpy implementation of the
        LCMScheduler recipe, using a zero-eps model (closed form)."""
        from pcdms_tpu.pipelines.sampling import (
            lcm_inference_timesteps, lcm_sample_loop,
        )
        schedule = sd21_schedule()
        rng = jax.random.PRNGKey(3)
        x0 = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 4, 4, 4)), jnp.float32)

        out = lcm_sample_loop(schedule, lambda x, t: jnp.zeros_like(x),
                              x0, 4, rng, origin_steps=50)

        ts = lcm_inference_timesteps(1000, 4, 50)
        a = schedule.sqrt_alphas_cumprod
        s = schedule.sqrt_one_minus_alphas_cumprod
        x = np.asarray(x0)
        for i, t in enumerate(ts):
            x0_pred = x / a[t]                       # eps = 0
            st = 10.0 * float(t)
            c_skip = 0.25 / (st ** 2 + 0.25)
            c_out = st / np.sqrt(st ** 2 + 0.25)
            denoised = c_skip * x + c_out * x0_pred
            if i < len(ts) - 1:
                tn = ts[i + 1]
                noise = np.asarray(jax.random.normal(
                    jax.random.fold_in(rng, i), x.shape, jnp.float32))
                x = a[tn] * denoised + s[tn] * noise
            else:
                x = denoised
        np.testing.assert_allclose(np.asarray(out), x, rtol=1e-5,
                                   atol=1e-5)

    def test_lcm_scheduler_requires_w_conditioning(self):
        from pcdms_tpu.pipelines.stage2_inpaint import stage2_generate
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        params = {
            "unet": unet_init(ks[0], TEACHER_CFG),   # no time_cond
            "image_proj": image_proj_mlp_init(ks[1], 24, 16, 16),
            "pose_proj": pose_cond_embedding_init(
                ks[2], out_channels=8, block_out_channels=(4, 4, 4, 4)),
            "vae": vae_init(ks[3], VAE_CFG),
        }
        z = jnp.zeros((1, 64, 128, 3), jnp.float32)
        with pytest.raises(ValueError, match="w-conditioned"):
            stage2_generate(params, z, z,
                            jnp.zeros((1, 5, 24), jnp.float32),
                            jnp.zeros((1, 1, 16), jnp.float32),
                            jax.random.PRNGKey(1), unet_cfg=TEACHER_CFG,
                            vae_cfg=VAE_CFG, num_steps=4,
                            scheduler="lcm", compute_dtype=jnp.float32)


def tiny_batch(b=2, h=64, w=128, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return {
        "st_image": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "masked_image": rng.uniform(-1, 1, (b, h, w, 3)).astype(
            np.float32),
        "pose_image": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "dino_features": rng.standard_normal((b, 5, 24),
                                             dtype=np.float32),
        "clip_embed": rng.standard_normal((b, 1, 16), dtype=np.float32),
    }


class TestDistillLoss:
    pytestmark = pytest.mark.slow
    def test_loss_descends_on_fixed_objective(self):
        from pcdms_tpu.train.common import (
            TrainConfig, init_train_state, make_train_step,
        )
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        teacher = {
            "unet": unet_init(ks[0], TEACHER_CFG),
            "image_proj": image_proj_mlp_init(ks[1], 24, 16, 16),
            "pose_proj": pose_cond_embedding_init(
                ks[2], out_channels=8, block_out_channels=(4, 4, 4, 4)),
        }
        vae = vae_init(ks[3], VAE_CFG)
        trainable = {
            "unet": init_student_from_teacher(ks[4], teacher["unet"],
                                              STUDENT_CFG),
            # copies: the step donates trainable, the teacher is closed
            # over by the loss
            "image_proj": jax.tree.map(jnp.copy, teacher["image_proj"]),
            "pose_proj": jax.tree.map(jnp.copy, teacher["pose_proj"]),
        }
        loss_fn = lcm_distill_loss_fn(
            STUDENT_CFG, TEACHER_CFG, teacher, vae, vae_cfg=VAE_CFG,
            num_ddim_timesteps=10, compute_dtype=jnp.float32)
        cfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=1)
        state = init_train_state(trainable, cfg)
        step = make_train_step(loss_fn, cfg)
        batch = tiny_batch()
        rng = jax.random.PRNGKey(7)     # FIXED: deterministic objective
        losses = []
        for _ in range(4):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))
            assert np.isfinite(losses[-1])
            assert 1.0 <= float(m["mean_w"]) <= 4.5
        assert losses[-1] < losses[0], losses


class TestLcmCli:
    pytestmark = pytest.mark.slow
    def test_main_tiny_synthetic(self, tmp_path, caplog):
        from pcdms_tpu.cli.lcm_distill import main
        from pcdms_tpu.train import checkpoint as ckpt
        steps = 4
        with caplog.at_level(logging.INFO, logger="pcdms_tpu.train"):
            main(["--output_dir", str(tmp_path / "out"),
                  "--tiny_config", "--random_init", "--synthetic_data",
                  "--max_train_steps", str(steps),
                  "--checkpointing_steps", "100",
                  "--train_batch_size", "8",
                  "--img_height", "64", "--img_width", "64",
                  "--learning_rate", "1e-3", "--lr_warmup_steps", "1",
                  "--log_every", "1", "--mixed_precision", "no",
                  "--num_ddim_timesteps", "10", "--zero1"])
        losses = []
        for rec in caplog.records:
            m = re.match(r"step (\d+) loss ([-\d.einfa]+)",
                         rec.getMessage())
            if m:
                losses.append(float(m.group(2)))
        assert len(losses) == steps and np.isfinite(losses).all()
        assert ckpt.latest_step(str(tmp_path / "out")) == steps

    def test_distilled_student_samples_few_step(self):
        """The distillation student's config drops straight into the
        pipeline's lcm_mode for 4-step sampling."""
        from pcdms_tpu.pipelines.stage2_inpaint import stage2_generate
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        teacher_unet = unet_init(ks[0], TEACHER_CFG)
        params = {
            "unet": init_student_from_teacher(ks[1], teacher_unet,
                                              STUDENT_CFG),
            "image_proj": image_proj_mlp_init(ks[2], 24, 16, 16),
            "pose_proj": pose_cond_embedding_init(
                ks[3], out_channels=8, block_out_channels=(4, 4, 4, 4)),
            "vae": vae_init(ks[4], VAE_CFG),
        }
        rng = np.random.default_rng(3)
        img = stage2_generate(
            params,
            jnp.asarray(rng.uniform(-1, 1, (1, 64, 128, 3)), jnp.float32),
            jnp.asarray(rng.uniform(-1, 1, (1, 64, 128, 3)), jnp.float32),
            jnp.asarray(rng.standard_normal((1, 5, 24)), jnp.float32),
            jnp.asarray(rng.standard_normal((1, 1, 16)), jnp.float32),
            jax.random.PRNGKey(1), unet_cfg=STUDENT_CFG, vae_cfg=VAE_CFG,
            num_steps=4, guidance_scale=2.0, scheduler="lcm",
            compute_dtype=jnp.float32)
        assert img.shape == (1, 64, 128, 3)
        assert np.isfinite(np.asarray(img)).all()
