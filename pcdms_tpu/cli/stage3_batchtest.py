"""Stage-3 batch test CLI.

Equivalent of /root/reference/stage3_batchtest_refined_model.py: refine
each stage-2 generated image (read from --gen_dir, ``{src}_to_{tgt}.png``)
conditioned on DINOv2 source features, best-of-N SSIM selection, write
refined ``{src}_to_{tgt}.png`` to --save_path.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import numpy as np

from pcdms_tpu.cli.common import save_images, setup_logging
from pcdms_tpu.cli.stage2_batchtest import best_of_n_ssim

logger = logging.getLogger("pcdms_tpu.stage3_batchtest")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", type=str, required=True)
    p.add_argument("--image_root_path", type=str, default="")
    p.add_argument("--gen_dir", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--weights_name", type=str, default=None)
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--image_encoder_p_path", type=str, default=None)
    p.add_argument("--img_width", type=int, default=512)
    p.add_argument("--img_height", type=int, default=512)
    p.add_argument("--num_inference_steps", type=int, default=20)
    p.add_argument("--guidance_scale", type=float, default=2.0)
    p.add_argument("--num_images_per_prompt", type=int, default=4)
    p.add_argument("--scheduler", type=str, default="unipc",
                   choices=["unipc", "ddim"])
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--tiny_config", action="store_true",
                   help="tiny-geometry models (CI / CPU smoke runs)")
    p.add_argument("--device_select", action="store_true",
                   help="best-of-N SSIM selection on device (see "
                        "stage2_batchtest --device_select)")
    p.add_argument("--grid_output", action="store_true",
                   help="also save [source | gen | refined | GT] grids "
                        "(stage3_batchtest_refined_model.py:190-209)")
    p.add_argument("--train_ckpt_dir", type=str, default=None,
                   help="orbax checkpoint dir of a stage-3 training run "
                        "(cli/stage3_train.py --output_dir): load the "
                        "trained {unet, image_proj} (EMA if tracked); "
                        "pair with --frozen_dir")
    p.add_argument("--frozen_dir", type=str, default=None,
                   help="frozen-encoder bundle the training run used "
                        "(train/frozen.py: vae + dino)")
    return p.parse_args(argv)


def main(argv=None):
    setup_logging()
    args = parse_args(argv)
    os.makedirs(args.save_path, exist_ok=True)

    from pcdms_tpu.data.datasets import PairList, Stage3Dataset
    from pcdms_tpu.data.preprocess import clip_preprocess, load_image, \
        to_neg1_1
    from pcdms_tpu.models.projections import image_proj_mlp_init
    from pcdms_tpu.models.unet2d import stage3_unet_config, unet_init
    from pcdms_tpu.models.vae import vae_init
    from pcdms_tpu.models.vit import dinov2_giant_config, vit_init
    from pcdms_tpu.pipelines.stage3_refine import stage3_generate
    from pcdms_tpu.train.encoders import dino_features

    vae_cfg = None
    proj_kwargs = {}
    if args.tiny_config:
        from pcdms_tpu.cli.common import tiny_configs
        tiny = tiny_configs()
        unet_cfg, dino_cfg, vae_cfg = tiny.unet3, tiny.dino, tiny.vae
        proj_kwargs = tiny.image_proj_kwargs
    else:
        unet_cfg = stage3_unet_config()
        dino_cfg = dinov2_giant_config()
    key = jax.random.PRNGKey(args.seed)
    ks = jax.random.split(key, 4)

    if args.train_ckpt_dir:
        from pcdms_tpu.train.frozen import load_frozen, load_trained_params
        if not args.frozen_dir:
            raise SystemExit("--train_ckpt_dir needs --frozen_dir (the "
                             "VAE/DINOv2 the run trained against)")
        params = dict(load_trained_params(args.train_ckpt_dir))
        bundle = load_frozen(args.frozen_dir)
        params["vae"] = bundle["vae"]
        dino = bundle["dino"]
    elif args.random_init:
        params = {
            "unet": unet_init(ks[0], unet_cfg),
            "image_proj": image_proj_mlp_init(ks[1], **proj_kwargs),
            "vae": vae_init(ks[2], vae_cfg) if vae_cfg else vae_init(ks[2]),
        }
        dino = vit_init(ks[3], dino_cfg)
    else:
        from pcdms_tpu.compat.load import (
            load_dinov2, load_pcdms_stage3_checkpoint, load_sd_vae,
        )
        params = load_pcdms_stage3_checkpoint(args.weights_name)
        params["vae"] = load_sd_vae(args.pretrained_model_name_or_path)
        dino = load_dinov2(args.image_encoder_p_path)

    pairs = PairList(args.json_path, args.image_root_path).shard(
        jax.process_index(), jax.process_count())
    helper = Stage3Dataset(pairs, args.gen_dir,
                           size=(args.img_width, args.img_height))
    size = (args.img_width, args.img_height)

    from pcdms_tpu.cli.common import default_mesh
    from pcdms_tpu.parallel.mesh import pad_and_shard
    mesh = default_mesh()
    logger.info("inference sharded over %d device(s): %s",
                mesh.devices.size, mesh.devices.ravel().tolist())

    t0 = time.time()
    items = pairs.pairs
    bs = args.batch_size

    def _u8(x):
        return np.clip((x + 1.0) * 127.5, 0, 255).astype(np.uint8)

    def finish(pending):
        """Read back + select + save one batch, deferred one batch
        behind dispatch so the host work overlaps device sampling
        (same pipelining as stage2_batchtest)."""
        chunk, dev_images, host_gen, gt_imgs, start, n = pending
        images = np.asarray(dev_images)
        for i, item in enumerate(chunk):
            if args.device_select:
                best_img = images[i]
            else:
                cands = images[i::n]
                best = best_of_n_ssim(cands, gt_imgs[i])
                best_img = cands[best]
            s = os.path.basename(item["source_image"]).rsplit(".", 1)[0]
            t = os.path.basename(item["target_image"]).rsplit(".", 1)[0]
            save_images(best_img[None],
                        [os.path.join(args.save_path, f"{s}_to_{t}.png")])
            if args.grid_output:
                src_img = to_neg1_1(load_image(
                    pairs.image_path(item["source_image"]), size))
                grid = np.concatenate(
                    [_u8(src_img), _u8(host_gen[i]), best_img,
                     _u8(gt_imgs[i])], axis=1)
                save_images(grid[None],
                            [os.path.join(args.save_path,
                                          f"grid_{s}_to_{t}.png")])
        logger.info("processed %d/%d", min(start + bs, len(items)),
                    len(items))

    pending = None
    for start in range(0, len(items), bs):
        chunk = items[start:start + bs]
        host_gen = np.stack([
            to_neg1_1(load_image(helper.gen_path(i), size)) for i in chunk])
        gt_imgs = [to_neg1_1(load_image(pairs.image_path(i["target_image"]),
                                        size)) for i in chunk]
        s_pix = np.stack([
            clip_preprocess(load_image(pairs.image_path(i["source_image"]),
                                       size)) for i in chunk])
        gen_imgs, s_pix, n = pad_and_shard(mesh, host_gen, s_pix)
        feats = dino_features(dino, s_pix, cfg=dino_cfg)

        from pcdms_tpu.cli.common import per_item_latents
        from pcdms_tpu.parallel.mesh import batch_sharding
        g_idx = [start + min(i, len(chunk) - 1) for i in range(n)]
        latents = jax.device_put(
            per_item_latents(args.seed, g_idx, args.num_images_per_prompt,
                             (args.img_height // 8, args.img_width // 8, 4)),
            batch_sharding(mesh))

        gen_kwargs = {"vae_cfg": vae_cfg} if vae_cfg is not None else {}
        images = stage3_generate(
            params, gen_imgs, feats,
            jax.random.PRNGKey(args.seed + start), latents=latents,
            unet_cfg=unet_cfg,
            num_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale, scheduler=args.scheduler,
            num_samples=args.num_images_per_prompt, **gen_kwargs)
        if args.device_select:
            from pcdms_tpu.cli.common import device_select_best
            # gt_imgs came from uint8 PIL via to_neg1_1 — recover the
            # exact bytes the host path scores against
            gt_u8 = np.stack([
                np.rint((gt_imgs[min(i, len(chunk) - 1)] + 1.0) * 127.5)
                .astype(np.uint8) for i in range(n)])
            dev_images, _ = device_select_best(
                images, gt_u8, args.num_images_per_prompt)
        else:
            from pcdms_tpu.cli.common import device_uint8
            dev_images = device_uint8(images)   # async dispatch, no block
        if pending is not None:
            finish(pending)
        pending = (chunk, dev_images, host_gen, gt_imgs, start, n)

    if pending is not None:
        finish(pending)
    logger.info("done in %.1fs", time.time() - t0)


if __name__ == "__main__":
    main()
