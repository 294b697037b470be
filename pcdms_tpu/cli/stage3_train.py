"""Stage-3 refinement trainer CLI (flag parity with run_stage3.sh +
stage3_train_refined_model.py): polish stage-2 outputs with an 8-channel
img2img UNet. Stage-2 generated images are read from --gen_dir using the
``{src}_to_{tgt}.png`` layout.
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

logger = logging.getLogger("pcdms_tpu.stage3_train")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_train_flags(p)
    p.add_argument("--image_encoder_p_path", type=str, default=None,
                   help="local DINOv2-giant dir")
    p.add_argument("--gen_dir", type=str, default=None, required=False,
                   help="directory of stage-2 generated images")
    p.add_argument("--gen_drop_rate", type=float, default=0.1)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--tiny_config", action="store_true",
                   help="tiny model geometry (CI/CPU smoke of the full "
                        "CLI code path)")
    p.set_defaults(learning_rate=1e-5, train_batch_size=16)
    return p.parse_args(argv)


def build_models(args):
    from pcdms_tpu.cli.stage2_train import ModelAux
    from pcdms_tpu.models.projections import image_proj_mlp_init
    from pcdms_tpu.models.unet2d import stage3_unet_config, unet_init
    from pcdms_tpu.models.vae import vae_init
    import dataclasses

    from pcdms_tpu.models.vit import dinov2_giant_config, vit_init

    from pcdms_tpu.train.frozen import frozen_dir_or_build

    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def frozen(vae_b, dino_b):
        builders = {"vae": vae_b}
        if not args.synthetic_data:
            builders["dino"] = dino_b
        f = frozen_dir_or_build(args.frozen_dir, builders)
        return f["vae"], f.get("dino")

    if args.tiny_config:
        from pcdms_tpu.cli.common import tiny_configs
        tiny = tiny_configs()
        unet_cfg = tiny.unet3
        if args.gradient_checkpointing:
            unet_cfg = dataclasses.replace(unet_cfg, remat=True)
        trainable = {
            "unet": unet_init(k1, unet_cfg),
            "image_proj": image_proj_mlp_init(
                k4, **tiny.image_proj_kwargs),
        }
        vae, dino = frozen(lambda: vae_init(k2, tiny.vae),
                           lambda: vit_init(k3, tiny.dino))
        aux = ModelAux(vae_cfg=tiny.vae, dino_cfg=tiny.dino, dino_tokens=5,
                       dino_dim=tiny.dino.hidden_size)
        return unet_cfg, trainable, vae, dino, aux

    unet_cfg = stage3_unet_config()
    if args.gradient_checkpointing:
        unet_cfg = dataclasses.replace(unet_cfg, remat=True)
    if args.random_init:
        unet = unet_init(k1, unet_cfg)
        vae, dino = frozen(lambda: vae_init(k2),
                           lambda: vit_init(k3, dinov2_giant_config()))
    else:
        from pcdms_tpu.compat.load import (
            load_dinov2, load_sd_unet, load_sd_vae,
        )
        from pcdms_tpu.cli.stage2_train import _grow_conv_in
        unet = load_sd_unet(args.pretrained_model_name_or_path)
        unet = _grow_conv_in(unet, unet_cfg, k1)   # 4ch -> 8ch
        vae, dino = frozen(
            lambda: load_sd_vae(args.pretrained_model_name_or_path),
            lambda: load_dinov2(args.image_encoder_p_path))
    trainable = {"unet": unet, "image_proj": image_proj_mlp_init(k4)}
    return unet_cfg, trainable, vae, dino, ModelAux()


def synthetic_batches(args, aux=None):
    import numpy as np
    from pcdms_tpu.cli.stage2_train import ModelAux
    aux = aux or ModelAux()
    rng = np.random.default_rng(args.seed)
    b, h, w = args.train_batch_size, args.img_height, args.img_width
    while True:
        yield {
            "target_image": rng.uniform(-1, 1, (b, h, w, 3)).astype(
                np.float32),
            "gen_image": rng.uniform(-1, 1, (b, h, w, 3)).astype(
                np.float32),
            "dino_features": rng.standard_normal(
                (b, aux.dino_tokens, aux.dino_dim), dtype=np.float32),
        }


def make_batches(args, dino_params, dino_cfg=None, aux=None):
    if args.synthetic_data:
        yield from synthetic_batches(args, aux)
        return
    from pcdms_tpu.data.datasets import (
        PairList, Stage3Dataset,
    )
    from pcdms_tpu.data.loader import DataLoader
    from pcdms_tpu.models.vit import dinov2_giant_config
    from pcdms_tpu.train.encoders import dino_features

    pairs = PairList(args.json_path, args.image_root_path).shard(
        jax.process_index(), jax.process_count())
    use_cache = args.cache_embeddings is not None
    dataset = Stage3Dataset(pairs, args.gen_dir,
                            size=(args.img_width, args.img_height),
                            gen_drop_rate=args.gen_drop_rate,
                            seed=args.seed, embed_refs=use_cache)
    dino_cfg = dino_cfg or dinov2_giant_config()

    if use_cache:
        import numpy as np

        from pcdms_tpu.data.preprocess import clip_preprocess, load_image
        from pcdms_tpu.train.embed_cache import build_or_load
        size = (args.img_width, args.img_height)
        dino_cache = build_or_load(
            args.cache_embeddings,
            f"s3_dino_{args.img_width}x{args.img_height}",
            lambda px: np.asarray(dino_features(
                dino_params, jnp.asarray(px), cfg=dino_cfg)),
            lambda p: clip_preprocess(load_image(p, size)),
            [pairs.image_path(i["source_image"]) for i in pairs.pairs],
            batch_size=args.train_batch_size, store_dtype=np.float16)
        dino_params = None      # free the frozen encoder's HBM
        for batch in DataLoader(dataset, args.train_batch_size,
                                num_workers=args.dataloader_num_workers,
                                seed=args.seed):
            yield {
                "target_image": batch["target_image"],
                "gen_image": batch["gen_image"],
                "dino_features": dino_cache.lookup(batch["s_ref"]),
            }
        return

    for batch in DataLoader(dataset, args.train_batch_size,
                            num_workers=args.dataloader_num_workers,
                            seed=args.seed):
        feats = dino_features(dino_params, jnp.asarray(batch["clip_s_img"]),
                              cfg=dino_cfg)
        yield {
            "target_image": batch["target_image"],
            "gen_image": batch["gen_image"],
            "dino_features": feats,
        }


def main(argv=None):
    setup_logging()
    args = parse_args(argv)
    tcfg = train_config_from_args(args)
    dtype = compute_dtype_from_args(args)

    unet_cfg, trainable, vae, dino, aux = build_models(args)

    from pcdms_tpu.train.loop import (
        make_tensorboard_writer, run_training,
    )
    from pcdms_tpu.train.stage3 import stage3_loss_fn

    loss_kwargs = {} if aux.vae_cfg is None else {"vae_cfg": aux.vae_cfg}
    loss_fn = stage3_loss_fn(unet_cfg, vae, noise_offset=args.noise_offset,
                             compute_dtype=dtype, **loss_kwargs)
    mesh = default_mesh(args.dcn_slices)
    batches = make_batches(args, dino, dino_cfg=aux.dino_cfg, aux=aux)
    dino = None      # generator owns the encoder ref now (see stage2)
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
