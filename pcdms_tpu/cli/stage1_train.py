"""Stage-1 prior trainer CLI (flag parity with run_stage1.sh +
stage1_train_prior_model.py): diffuse target CLIP embeddings from pose
coordinates. Default hyperparameters follow the launcher (bs 128/device
group, lr 1e-5, 100k steps).
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp

from pcdms_tpu.cli.common import (
    add_common_train_flags, compute_dtype_from_args, default_mesh,
    setup_logging, train_config_from_args,
)

logger = logging.getLogger("pcdms_tpu.stage1_train")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_train_flags(p)
    p.add_argument("--image_encoder_path", type=str, default=None,
                   help="local CLIP ViT-H dir")
    p.add_argument("--prior_path", type=str, default=None,
                   help="local Kandinsky-2-2 prior dir for weight init")
    p.add_argument("--s_img_drop_rate", type=float, default=0.1)
    p.add_argument("--s_pose_drop_rate", type=float, default=0.1)
    p.add_argument("--t_pose_drop_rate", type=float, default=0.1)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--tiny_config", action="store_true",
                   help="tiny model geometry (CI/CPU smoke of the full "
                        "CLI code path)")
    p.set_defaults(learning_rate=1e-5, train_batch_size=128,
                   max_train_steps=100_000)
    return p.parse_args(argv)


def build_models(args):
    from pcdms_tpu.models.prior_transformer import PriorConfig, prior_init
    from pcdms_tpu.models.vit import clip_vit_h14_config, vit_init
    from pcdms_tpu.train.frozen import frozen_dir_or_build

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)

    def frozen_clip(build):
        # synthetic batches never touch the frozen encoder — don't
        # build (or load) it for benchmark runs
        if args.synthetic_data:
            return None
        return frozen_dir_or_build(args.frozen_dir,
                                   {"clip": build})["clip"]

    if args.tiny_config:
        from pcdms_tpu.cli.common import tiny_configs
        tiny = tiny_configs()
        prior = prior_init(k1, tiny.prior)
        clip = frozen_clip(lambda: vit_init(k2, tiny.clip))
        return tiny.prior, prior, clip, tiny.clip
    prior_cfg = PriorConfig()
    if args.random_init:
        prior = prior_init(k1, prior_cfg)
        clip = frozen_clip(lambda: vit_init(k2, clip_vit_h14_config()))
    else:
        from pcdms_tpu.compat.load import load_clip_vision, load_prior
        prior = (load_prior(args.prior_path) if args.prior_path
                 else prior_init(k1, prior_cfg))
        clip = frozen_clip(
            lambda: load_clip_vision(args.image_encoder_path))
    return prior_cfg, prior, clip, None


def synthetic_batches(args, embed_dim=1024):
    import numpy as np
    rng = np.random.default_rng(args.seed)
    b = args.train_batch_size
    while True:
        yield {
            "s_embed": rng.standard_normal((b, embed_dim),
                                           dtype=np.float32),
            "t_embed": rng.standard_normal((b, embed_dim),
                                           dtype=np.float32),
            "s_pose": rng.random((b, 36), dtype=np.float32),
            "t_pose": rng.random((b, 36), dtype=np.float32),
        }


def make_batches(args, clip_params, clip_cfg=None, embed_dim=1024):
    if args.synthetic_data:
        yield from synthetic_batches(args, embed_dim)
        return
    from pcdms_tpu.data.datasets import (
        PairList, Stage1Dataset,
    )
    from pcdms_tpu.data.loader import DataLoader
    from pcdms_tpu.data.preprocess import clip_preprocess, load_image
    from pcdms_tpu.models.vit import clip_vit_h14_config
    from pcdms_tpu.train.encoders import clip_image_embed

    pairs = PairList(args.json_path, args.image_root_path).shard(
        jax.process_index(), jax.process_count())
    clip_cfg = clip_cfg or clip_vit_h14_config()
    size = (args.img_width, args.img_height)
    use_cache = args.cache_embeddings is not None
    dataset = Stage1Dataset(pairs, size=size,
                            s_img_drop_rate=args.s_img_drop_rate,
                            s_pose_drop_rate=args.s_pose_drop_rate,
                            t_pose_drop_rate=args.t_pose_drop_rate,
                            seed=args.seed, embed_refs=use_cache)

    def encode(px):
        return clip_image_embed(clip_params, jnp.asarray(px), cfg=clip_cfg)

    if use_cache:
        from pcdms_tpu.train.embed_cache import build_or_load
        paths = [pairs.image_path(i[k]) for i in pairs.pairs
                 for k in ("source_image", "target_image")]
        cache = build_or_load(
            args.cache_embeddings,
            f"s1_clip_{args.img_width}x{args.img_height}", encode,
            lambda p: clip_preprocess(load_image(p, size)), paths,
            batch_size=args.train_batch_size)
        clip_params = None      # free the frozen encoder's HBM
        for batch in DataLoader(dataset, args.train_batch_size,
                                num_workers=args.dataloader_num_workers,
                                seed=args.seed):
            yield {
                "s_embed": cache.lookup(batch["s_ref"], batch["s_drop"]),
                "t_embed": cache.lookup(batch["t_ref"], batch["t_drop"]),
                "s_pose": batch["s_pose"],
                "t_pose": batch["t_pose"],
            }
        return

    for batch in DataLoader(dataset, args.train_batch_size,
                            num_workers=args.dataloader_num_workers,
                            seed=args.seed):
        yield {
            "s_embed": encode(batch["clip_s_img"]),
            "t_embed": encode(batch["clip_t_img"]),
            "s_pose": batch["s_pose"],
            "t_pose": batch["t_pose"],
        }


def main(argv=None):
    setup_logging()
    args = parse_args(argv)
    tcfg = train_config_from_args(args)
    dtype = compute_dtype_from_args(args)

    prior_cfg, prior, clip, clip_cfg = build_models(args)

    from pcdms_tpu.train.loop import (
        make_tensorboard_writer, run_training,
    )
    from pcdms_tpu.train.stage1 import stage1_loss_fn

    loss_fn = stage1_loss_fn(prior_cfg, noise_offset=args.noise_offset,
                             compute_dtype=dtype)
    mesh = default_mesh(args.dcn_slices)
    batches = make_batches(args, clip, clip_cfg=clip_cfg,
                           embed_dim=prior_cfg.embedding_dim)
    clip = None      # generator owns the encoder ref now (see stage2)
    run_training(loss_fn, prior, batches, tcfg, mesh=mesh,
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
