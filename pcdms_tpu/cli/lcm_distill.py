"""LCM distillation CLI: distill the trained stage-2 inpainting UNet
into a w-conditioned latent-consistency student (4-8 step sampling).

Beyond the reference: its demo pipeline can *consume* LCM checkpoints
(PCDMs_pipeline.py guidance-embedding path) but nothing in either repo
could produce one. The student trains on the stage-2 data pipeline
(same batches/flags as cli/stage2_train.py, condition dropout off —
the teacher supplies CFG) and checkpoints through the standard SPMD
harness (ZeRO-1, resume, preemption, --use_ema all apply).

    python -m pcdms_tpu.cli.lcm_distill \
        --weights_name stage2_ckpt.pt \
        --pretrained_model_name_or_path /ckpts/sd21 \
        --image_encoder_p_path /ckpts/dinov2 --image_encoder_g_path \
        /ckpts/clip --json_path data.json --image_root_path /data \
        --output_dir lcm_out --img_height 512 --img_width 512

Memory note: teacher + student + AdamW state at SD-2.1 scale is ~18 GB
f32 — a single 16G chip needs --zero1 on a slice (or bf16 teacher);
--tiny_config drives the full code path on CPU.

After training, sample with ``UNetConfig.time_cond_proj_dim=256`` and
``stage2_generate(..., scheduler="lcm", num_steps=4,
guidance_scale=2.0)`` — the lcm scheduler samples on the trained
boundary grid with the trained consistency parameterization, and
lcm_mode disables CFG doubling and embeds w
(pipelines/stage2_inpaint.py, pipelines/sampling.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging

import jax

from pcdms_tpu.cli.common import (
    add_common_train_flags, compute_dtype_from_args, default_mesh,
    setup_logging, train_config_from_args,
)

logger = logging.getLogger("pcdms_tpu.lcm_distill")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_train_flags(p)
    p.add_argument("--weights_name", type=str, default=None,
                   help="trained stage-2 monolithic checkpoint (.pt) — "
                        "the distillation teacher")
    p.add_argument("--train_ckpt_dir", type=str, default=None,
                   help="orbax checkpoint dir of a cli/stage2_train run "
                        "to use as the teacher (EMA preferred); "
                        "alternative to --weights_name — pair with the "
                        "run's --frozen_dir so the student trains "
                        "against the same frozen encoders")
    p.add_argument("--image_encoder_p_path", type=str, default=None)
    p.add_argument("--image_encoder_g_path", type=str, default=None)
    # condition dropout stays OFF for distillation: the student always
    # sees real conditions; guidance comes from the teacher's CFG
    p.add_argument("--imgp_drop_rate", type=float, default=0.0)
    p.add_argument("--imgg_drop_rate", type=float, default=0.0)
    p.add_argument("--num_ddim_timesteps", type=int, default=50)
    p.add_argument("--w_min", type=float, default=1.5)
    p.add_argument("--w_max", type=float, default=4.0)
    p.add_argument("--huber_c", type=float, default=0.001)
    p.add_argument("--time_cond_proj_dim", type=int, default=256)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--tiny_config", action="store_true")
    return p.parse_args(argv)


def build_teacher_and_student(args):
    """Returns (student_cfg, teacher_cfg, trainable, teacher_params,
    vae, clip, dino, aux)."""
    from pcdms_tpu.cli.stage2_train import ModelAux
    from pcdms_tpu.models.projections import (
        image_proj_mlp_init, pose_cond_embedding_init,
    )
    from pcdms_tpu.models.unet2d import stage2_unet_config, unet_init
    from pcdms_tpu.models.vae import vae_init
    from pcdms_tpu.train.lcm_distill import init_student_from_teacher

    from pcdms_tpu.train.frozen import frozen_dir_or_build

    key = jax.random.PRNGKey(args.seed)
    ks = jax.random.split(key, 8)

    def frozen(vae_b, clip_b, dino_b):
        """Resolve {vae, clip, dino} through the --frozen_dir bundle
        (same contract as cli/stage2_train.build_models)."""
        builders = {"vae": vae_b}
        if not args.synthetic_data:
            builders.update(clip=clip_b, dino=dino_b)
        f = frozen_dir_or_build(args.frozen_dir, builders)
        return f["vae"], f.get("clip"), f.get("dino")

    if args.tiny_config:
        from pcdms_tpu.cli.common import tiny_configs
        from pcdms_tpu.models.vit import vit_init
        tiny = tiny_configs()
        teacher_cfg = tiny.unet2(with_class_embed=True)
        teacher = {
            "unet": unet_init(ks[0], teacher_cfg),
            "image_proj": image_proj_mlp_init(ks[1],
                                              **tiny.image_proj_kwargs),
            "pose_proj": pose_cond_embedding_init(
                ks[2], **tiny.pose_proj_kwargs),
        }
        vae, clip, dino = frozen(lambda: vae_init(ks[3], tiny.vae),
                                 lambda: vit_init(ks[4], tiny.clip),
                                 lambda: vit_init(ks[5], tiny.dino))
        aux = ModelAux(vae_cfg=tiny.vae, clip_cfg=tiny.clip,
                       dino_cfg=tiny.dino, dino_tokens=5,
                       dino_dim=tiny.dino.hidden_size,
                       clip_dim=tiny.clip.projection_dim)
    else:
        from pcdms_tpu.models.vit import (
            clip_vit_h14_config, dinov2_giant_config,
        )
        teacher_cfg = stage2_unet_config()
        if args.random_init:
            from pcdms_tpu.models.vit import vit_init
            teacher = {
                "unet": unet_init(ks[0], teacher_cfg),
                "image_proj": image_proj_mlp_init(ks[1]),
                "pose_proj": pose_cond_embedding_init(ks[2]),
            }
            vae, clip, dino = frozen(
                lambda: vae_init(ks[3]),
                lambda: vit_init(ks[4], clip_vit_h14_config()),
                lambda: vit_init(ks[5], dinov2_giant_config()))
        else:
            from pcdms_tpu.compat.load import (
                load_clip_vision, load_dinov2,
                load_pcdms_stage2_checkpoint, load_sd_vae,
            )
            if not (args.weights_name or args.train_ckpt_dir):
                raise SystemExit("--weights_name or --train_ckpt_dir "
                                 "(trained stage-2 teacher) required "
                                 "without --random_init")
            teacher = (load_pcdms_stage2_checkpoint(args.weights_name)
                       if args.weights_name else None)
            vae = load_sd_vae(args.pretrained_model_name_or_path)
            clip = dino = None
            if not args.synthetic_data:
                clip = load_clip_vision(args.image_encoder_g_path)
                dino = load_dinov2(args.image_encoder_p_path)
        aux = ModelAux()

    if args.train_ckpt_dir:
        from pcdms_tpu.train.frozen import load_trained_params
        teacher = load_trained_params(args.train_ckpt_dir)

    student_cfg = dataclasses.replace(
        teacher_cfg, time_cond_proj_dim=args.time_cond_proj_dim,
        remat=args.gradient_checkpointing)
    import jax.numpy as jnp
    trainable = {
        "unet": init_student_from_teacher(ks[6], teacher["unet"],
                                          student_cfg),
        # student conditioning projections start at the teacher's —
        # COPIED: the train step donates trainable buffers, which must
        # not alias the frozen teacher held by the loss closure
        "image_proj": jax.tree.map(jnp.copy, teacher["image_proj"]),
        "pose_proj": jax.tree.map(jnp.copy, teacher["pose_proj"]),
    }
    return (student_cfg, teacher_cfg, trainable, teacher, vae, clip,
            dino, aux)


def main(argv=None):
    setup_logging()
    args = parse_args(argv)
    tcfg = train_config_from_args(args)
    dtype = compute_dtype_from_args(args)

    (student_cfg, teacher_cfg, trainable, teacher, vae, clip, dino,
     aux) = build_teacher_and_student(args)

    from pcdms_tpu.cli.stage2_train import make_batches
    from pcdms_tpu.train.lcm_distill import lcm_distill_loss_fn
    from pcdms_tpu.train.loop import make_tensorboard_writer, run_training

    loss_kwargs = {} if aux.vae_cfg is None else {"vae_cfg": aux.vae_cfg}
    loss_fn = lcm_distill_loss_fn(
        student_cfg, teacher_cfg, teacher, vae,
        num_ddim_timesteps=args.num_ddim_timesteps,
        w_min=args.w_min, w_max=args.w_max, huber_c=args.huber_c,
        compute_dtype=dtype, **loss_kwargs)
    mesh = default_mesh(args.dcn_slices)
    batches = make_batches(args, clip, dino, clip_cfg=aux.clip_cfg,
                           dino_cfg=aux.dino_cfg, aux=aux)
    clip = dino = None
    run_training(loss_fn, trainable, batches, tcfg, mesh=mesh,
                 rng=jax.random.PRNGKey(args.seed),
                 output_dir=args.output_dir,
                 checkpointing_steps=args.checkpointing_steps,
                 log_every=args.log_every,
                 resume_from_checkpoint=args.resume_from_checkpoint,
                 profile_dir=args.profile_dir,
                 tensorboard_writer=(
                     make_tensorboard_writer(args.output_dir + "/logs")
                     if args.report_to == "tensorboard" else None))


if __name__ == "__main__":
    main()
