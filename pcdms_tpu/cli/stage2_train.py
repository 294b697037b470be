"""Stage-2 inpainting trainer CLI.

Flag-compatible with /root/reference/run_stage2.sh +
stage2_train_inpaint_model.py; runs the SPMD train loop over all local
devices. The frozen DINOv2/CLIP encoders run as a jitted encode pass per
batch (the reference re-encodes under no_grad inside the step).

    python -m pcdms_tpu.cli.stage2_train \
        --pretrained_model_name_or_path /path/to/sd21 \
        --image_encoder_p_path /path/to/dinov2-giant \
        --image_encoder_g_path /path/to/clip-vit-h \
        --json_path data.json --image_root_path /data \
        --output_dir out --img_height 512 --img_width 512 \
        --learning_rate 1e-4 --train_batch_size 8
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

logger = logging.getLogger("pcdms_tpu.stage2_train")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_train_flags(p)
    p.add_argument("--image_encoder_p_path", type=str, default=None,
                   help="local DINOv2-giant dir")
    p.add_argument("--image_encoder_g_path", type=str, default=None,
                   help="local CLIP ViT-H dir")
    p.add_argument("--imgp_drop_rate", type=float, default=0.1)
    p.add_argument("--imgg_drop_rate", type=float, default=0.1)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--tiny_config", action="store_true",
                   help="tiny model geometry (CI/CPU smoke of the full "
                        "CLI code path)")
    return p.parse_args(argv)


class ModelAux:
    """Side-band configs build_models hands to the loss/batch builders
    (full-size defaults unless --tiny_config)."""

    def __init__(self, vae_cfg=None, clip_cfg=None, dino_cfg=None,
                 dino_tokens=257, dino_dim=1536, clip_dim=1024):
        self.vae_cfg = vae_cfg
        self.clip_cfg = clip_cfg
        self.dino_cfg = dino_cfg
        self.dino_tokens = dino_tokens
        self.dino_dim = dino_dim
        self.clip_dim = clip_dim


def build_models(args):
    from pcdms_tpu.models.projections import (
        image_proj_mlp_init, pose_cond_embedding_init,
    )
    from pcdms_tpu.models.unet2d import stage2_unet_config, unet_init
    from pcdms_tpu.models.vae import vae_init
    import dataclasses

    from pcdms_tpu.models.vit import clip_vit_h14_config, dinov2_giant_config

    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

    from pcdms_tpu.train.frozen import frozen_dir_or_build

    def frozen(vae_b, clip_b, dino_b):
        """Resolve {vae, clip, dino} through the --frozen_dir bundle
        (synthetic batches never touch clip/dino — skip them)."""
        builders = {"vae": vae_b}
        if not args.synthetic_data:
            builders.update(clip=clip_b, dino=dino_b)
        f = frozen_dir_or_build(args.frozen_dir, builders)
        return f["vae"], f.get("clip"), f.get("dino")

    if args.tiny_config:
        from pcdms_tpu.cli.common import tiny_configs
        from pcdms_tpu.models.vit import vit_init
        tiny = tiny_configs()
        unet_cfg = tiny.unet2(with_class_embed=True)
        if args.gradient_checkpointing:
            unet_cfg = dataclasses.replace(unet_cfg, remat=True)
        trainable = {
            "unet": unet_init(k1, unet_cfg),
            "image_proj": image_proj_mlp_init(
                k5, **tiny.image_proj_kwargs),
            "pose_proj": pose_cond_embedding_init(
                k6, **tiny.pose_proj_kwargs),
        }
        vae, clip, dino = frozen(lambda: vae_init(k2, tiny.vae),
                                 lambda: vit_init(k3, tiny.clip),
                                 lambda: vit_init(k4, tiny.dino))
        aux = ModelAux(vae_cfg=tiny.vae, clip_cfg=tiny.clip,
                       dino_cfg=tiny.dino, dino_tokens=5,
                       dino_dim=tiny.dino.hidden_size,
                       clip_dim=tiny.clip.projection_dim)
        return unet_cfg, trainable, vae, clip, dino, aux

    unet_cfg = stage2_unet_config()
    if args.gradient_checkpointing:
        unet_cfg = dataclasses.replace(unet_cfg, remat=True)

    if args.random_init:
        from pcdms_tpu.models.vit import vit_init
        unet = unet_init(k1, unet_cfg)
        vae, clip, dino = frozen(
            lambda: vae_init(k2),
            lambda: vit_init(k3, clip_vit_h14_config()),
            lambda: vit_init(k4, dinov2_giant_config()))
    else:
        from pcdms_tpu.compat.load import (
            load_clip_vision, load_dinov2, load_sd_unet, load_sd_vae,
        )
        unet = load_sd_unet(args.pretrained_model_name_or_path)
        # SD-2.1 init: conv_in is 4ch -> grow to 9ch with zeros
        # (ignore_mismatched_sizes=True equivalent)
        unet = _grow_conv_in(unet, unet_cfg, k1)
        unet = _maybe_init_class_embedding(unet, unet_cfg, k1)
        vae, clip, dino = frozen(
            lambda: load_sd_vae(args.pretrained_model_name_or_path),
            lambda: load_clip_vision(args.image_encoder_g_path),
            lambda: load_dinov2(args.image_encoder_p_path))

    trainable = {
        "unet": unet,
        "image_proj": image_proj_mlp_init(k5),
        "pose_proj": pose_cond_embedding_init(k6),
    }
    return unet_cfg, trainable, vae, clip, dino, ModelAux()


def _grow_conv_in(unet_params, cfg, key):
    import jax.numpy as jnp
    kernel = unet_params["conv_in"]["kernel"]
    if kernel.shape[2] < cfg.in_channels:
        extra = jnp.zeros(kernel.shape[:2]
                          + (cfg.in_channels - kernel.shape[2],
                             kernel.shape[3]), kernel.dtype)
        unet_params["conv_in"]["kernel"] = jnp.concatenate(
            [kernel, extra], axis=2)
    return unet_params


def _maybe_init_class_embedding(unet_params, cfg, key):
    if cfg.class_embed_proj_dim and "class_embedding" not in unet_params:
        from pcdms_tpu.nn.layers import timestep_embedding_init
        unet_params["class_embedding"] = timestep_embedding_init(
            key, cfg.class_embed_proj_dim, cfg.time_embed_dim)
    return unet_params


def synthetic_batches(args, aux=None):
    import numpy as np
    aux = aux or ModelAux()
    rng = np.random.default_rng(args.seed)
    b, h, w = args.train_batch_size, args.img_height, 2 * args.img_width
    while True:
        yield {
            "st_image": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
            "masked_image": rng.uniform(-1, 1, (b, h, w, 3)).astype(
                np.float32),
            "pose_image": rng.uniform(-1, 1, (b, h, w, 3)).astype(
                np.float32),
            "dino_features": rng.standard_normal(
                (b, aux.dino_tokens, aux.dino_dim), dtype=np.float32),
            "clip_embed": rng.standard_normal(
                (b, 1, aux.clip_dim), dtype=np.float32),
        }


def make_batches(args, clip_params, dino_params, clip_cfg=None,
                 dino_cfg=None, aux=None):
    """Host data iterator + on-device frozen-encoder pass (or the
    precomputed embedding cache when --cache_embeddings is set)."""
    if args.synthetic_data:
        yield from synthetic_batches(args, aux)
        return
    from pcdms_tpu.data.datasets import (
        PairList, Stage2Dataset,
    )
    from pcdms_tpu.data.loader import DataLoader
    from pcdms_tpu.data.preprocess import clip_preprocess, load_image
    from pcdms_tpu.models.vit import clip_vit_h14_config, dinov2_giant_config
    from pcdms_tpu.train.encoders import clip_image_embed, dino_features

    pairs = PairList(args.json_path, args.image_root_path).shard(
        jax.process_index(), jax.process_count())
    use_cache = args.cache_embeddings is not None
    dataset = Stage2Dataset(pairs, size=(args.img_width, args.img_height),
                            imgp_drop_rate=args.imgp_drop_rate,
                            imgg_drop_rate=args.imgg_drop_rate,
                            seed=args.seed, embed_refs=use_cache)
    clip_cfg = clip_cfg or clip_vit_h14_config()
    dino_cfg = dino_cfg or dinov2_giant_config()
    size = (args.img_width, args.img_height)

    if use_cache:
        import numpy as np

        from pcdms_tpu.train.embed_cache import build_or_load

        def pre(p):
            return clip_preprocess(load_image(p, size))

        s_paths = [pairs.image_path(i["source_image"]) for i in pairs.pairs]
        t_paths = [pairs.image_path(i["target_image"]) for i in pairs.pairs]
        # DINOv2 feature maps are (257, hidden) per image — stored fp16
        # (~0.8 MB/row at giant scale); the CLIP head rows are tiny
        dino_cache = build_or_load(
            args.cache_embeddings,
            f"s2_dino_{args.img_width}x{args.img_height}",
            lambda px: np.asarray(dino_features(
                dino_params, jnp.asarray(px), cfg=dino_cfg)),
            pre, s_paths, batch_size=args.train_batch_size,
            store_dtype=np.float16)
        clip_cache = build_or_load(
            args.cache_embeddings,
            f"s2_clip_{args.img_width}x{args.img_height}",
            lambda px: np.asarray(clip_image_embed(
                clip_params, jnp.asarray(px), cfg=clip_cfg)),
            pre, t_paths, batch_size=args.train_batch_size)
        # the frozen encoders (CLIP-H + DINOv2-g: ~6.8 GB f32 on device)
        # are only needed to build the cache; free their HBM before the
        # train step allocates its state
        clip_params = dino_params = None
        for batch in DataLoader(dataset, args.train_batch_size,
                                num_workers=args.dataloader_num_workers,
                                seed=args.seed):
            yield {
                "st_image": batch["st_image"],
                "masked_image": batch["masked_image"],
                "pose_image": batch["pose_image"],
                "dino_features": dino_cache.lookup(batch["s_ref"],
                                                   batch["s_drop"]),
                "clip_embed": clip_cache.lookup(batch["t_ref"],
                                                batch["t_drop"])[:, None, :],
            }
        return

    for batch in DataLoader(dataset, args.train_batch_size,
                            num_workers=args.dataloader_num_workers,
                            seed=args.seed):
        feats = dino_features(dino_params, jnp.asarray(batch["clip_s_img"]),
                              cfg=dino_cfg)
        embed = clip_image_embed(clip_params,
                                 jnp.asarray(batch["clip_t_img"]),
                                 cfg=clip_cfg)
        yield {
            "st_image": batch["st_image"],
            "masked_image": batch["masked_image"],
            "pose_image": batch["pose_image"],
            "dino_features": feats,
            "clip_embed": embed[:, None, :],
        }


def main(argv=None):
    setup_logging()
    args = parse_args(argv)
    tcfg = train_config_from_args(args)
    dtype = compute_dtype_from_args(args)

    unet_cfg, trainable, vae, clip, dino, aux = build_models(args)

    from pcdms_tpu.train.loop import (
        make_tensorboard_writer, run_training,
    )
    from pcdms_tpu.train.stage2 import stage2_loss_fn

    loss_kwargs = {} if aux.vae_cfg is None else {"vae_cfg": aux.vae_cfg}
    loss_fn = stage2_loss_fn(unet_cfg, vae, noise_offset=args.noise_offset,
                             compute_dtype=dtype, **loss_kwargs)
    mesh = default_mesh(args.dcn_slices)
    batches = make_batches(args, clip, dino, clip_cfg=aux.clip_cfg,
                           dino_cfg=aux.dino_cfg, aux=aux)
    # the generator owns the encoder refs now (and drops them after the
    # cache build); keeping ours alive would pin ~6.8 GB of HBM
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
