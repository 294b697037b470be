"""Stage-2 batch test CLI.

Equivalent of /root/reference/stage2_batchtest_inpaint_model.py: for every
test pair, build the [source | black] canvas and [source pose | target
pose] skeleton canvas, sample ``num_images_per_prompt`` candidates with
UniPC, keep the best-SSIM right-half crop vs the GT target, and write it
as ``{src}_to_{tgt}.png`` (the stage-2 -> stage-3 handoff).

Train-mode vs test-mode conditioning follows the reference's switch: if
the json filename starts with 'train', the GT target CLIP embedding is
used; otherwise the stage-1 ``.npy`` predictions are loaded from
--prior_embeds_dir (stage2_batchtest_inpaint_model.py:176-185).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import numpy as np

from pcdms_tpu.cli.common import save_images, setup_logging

logger = logging.getLogger("pcdms_tpu.stage2_batchtest")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", type=str, required=True)
    p.add_argument("--image_root_path", type=str, default="")
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--weights_name", type=str, default=None,
                   help="monolithic stage-2 checkpoint (.pt)")
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--image_encoder_p_path", type=str, default=None)
    p.add_argument("--image_encoder_g_path", type=str, default=None,
                   help="CLIP ViT-H dir (train-mode GT conditioning)")
    p.add_argument("--prior_embeds_dir", type=str, default=None,
                   help="stage-1 .npy output dir (test mode)")
    p.add_argument("--img_width", type=int, default=512)
    p.add_argument("--img_height", type=int, default=512)
    p.add_argument("--num_inference_steps", type=int, default=20)
    p.add_argument("--guidance_scale", type=float, default=2.0)
    p.add_argument("--num_images_per_prompt", type=int, default=4)
    p.add_argument("--scheduler", type=str, default="unipc",
                   choices=["unipc", "ddim"])
    p.add_argument("--batch_size", type=int, default=4,
                   help="pairs per pipeline call; device batch is "
                        "batch_size x num_images_per_prompt x 2 (CFG) "
                        "split over the mesh — on a SINGLE 16G v5e chip "
                        "at 512px keep that product <= 16 (e.g. "
                        "--batch_size 2 with 4 samples); the default "
                        "assumes a v5e-8 slice")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--encoder_cache_interval", type=int, default=1,
                   help=">1 = encoder-propagation sampling (UNet "
                        "down-path runs every k-th step only; ~+20% "
                        "img/s at 2 on v5e, approximate — see PERF.md). "
                        "1 (default) = reference-exact")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--simple_variant", action="store_true",
                   help="released simplified ckpt: no prior/class embed")
    p.add_argument("--tiny_config", action="store_true",
                   help="tiny-geometry models (CI / CPU smoke runs)")
    p.add_argument("--train_ckpt_dir", type=str, default=None,
                   help="orbax checkpoint dir of a stage-2 training run "
                        "(cli/stage2_train.py --output_dir): load the "
                        "trained {unet, image_proj, pose_proj} (EMA if "
                        "tracked); pair with --frozen_dir")
    p.add_argument("--frozen_dir", type=str, default=None,
                   help="frozen-encoder bundle the training run used "
                        "(train/frozen.py: vae + dino, clip for "
                        "train-mode conditioning)")
    p.add_argument("--device_select", action="store_true",
                   help="run the best-of-N SSIM candidate selection ON "
                        "DEVICE (cli/common.device_select_best): only "
                        "the selected candidate is read back "
                        "(num_images_per_prompt x less transfer) and "
                        "the host scipy-SSIM work disappears. Protocol-"
                        "faithful (same uint8 scoring as the host "
                        "path); selection can differ only on ~1e-6 "
                        "SSIM ties (f32 vs f64)")
    p.add_argument("--sequential", action="store_true",
                   help="disable the host/device pipelining: block on "
                        "each batch's readback + SSIM select + PNG "
                        "writes before prepping the next (the "
                        "reference's ordering, stage2_batchtest_"
                        "inpaint_model.py:188-225) — for the A/B in "
                        "PERF.md, not production use")
    return p.parse_args(argv)


def best_of_n_ssim(candidates: np.ndarray, gt: np.ndarray) -> int:
    """candidates: (N, H, W, 3) uint8 (device-quantized readback) or
    float in [-1,1]; gt: (H, W, 3) in [-1,1]. Returns the index with the
    best SSIM (reference stage2_batchtest_inpaint_model.py:212-225 —
    which likewise scores uint8-derived PIL pixels)."""
    from pcdms_tpu.eval.metrics import compare_ssim
    gt01 = (gt + 1.0) / 2.0
    if candidates.dtype == np.uint8:
        cands01 = candidates.astype(np.float32) / 255.0
    else:
        cands01 = (candidates + 1.0) / 2.0
    scores = [compare_ssim(c, gt01, data_range=1.0, win_size=7)
              for c in cands01]
    return int(np.argmax(scores))


def main(argv=None):
    setup_logging()
    args = parse_args(argv)
    os.makedirs(args.save_path, exist_ok=True)

    from pcdms_tpu.data.datasets import PairList
    from pcdms_tpu.data.preprocess import (
        black_like, clip_preprocess, load_image, make_side_by_side,
        to_neg1_1,
    )
    from pcdms_tpu.models.projections import (
        image_proj_mlp_init, pose_cond_embedding_init,
    )
    from pcdms_tpu.models.unet2d import stage2_unet_config, unet_init
    from pcdms_tpu.models.vae import vae_init
    from pcdms_tpu.models.vit import dinov2_giant_config, vit_init
    from pcdms_tpu.pipelines.stage2_inpaint import stage2_generate
    from pcdms_tpu.train.encoders import dino_features

    vae_cfg = None
    proj_kwargs, pose_kwargs = {}, {}
    if args.tiny_config:
        from pcdms_tpu.cli.common import tiny_configs
        tiny = tiny_configs()
        unet_cfg = tiny.unet2(with_class_embed=not args.simple_variant)
        dino_cfg, vae_cfg = tiny.dino, tiny.vae
        proj_kwargs, pose_kwargs = tiny.image_proj_kwargs, \
            tiny.pose_proj_kwargs
    else:
        unet_cfg = stage2_unet_config(
            with_class_embed=not args.simple_variant)
        dino_cfg = dinov2_giant_config()
    key = jax.random.PRNGKey(args.seed)
    ks = jax.random.split(key, 5)

    frozen_bundle = None
    if args.train_ckpt_dir:
        from pcdms_tpu.train.frozen import load_frozen, load_trained_params
        if not args.frozen_dir:
            raise SystemExit("--train_ckpt_dir needs --frozen_dir (the "
                             "VAE/DINOv2 the run trained against)")
        params = dict(load_trained_params(args.train_ckpt_dir))
        frozen_bundle = load_frozen(args.frozen_dir)
        params["vae"] = frozen_bundle["vae"]
        dino = frozen_bundle["dino"]
    elif args.random_init:
        params = {
            "unet": unet_init(ks[0], unet_cfg),
            "image_proj": image_proj_mlp_init(ks[1], **proj_kwargs),
            "pose_proj": pose_cond_embedding_init(ks[2], **pose_kwargs),
            "vae": vae_init(ks[3], vae_cfg) if vae_cfg else vae_init(ks[3]),
        }
        dino = vit_init(ks[4], dino_cfg)
    else:
        from pcdms_tpu.compat.load import (
            load_dinov2, load_pcdms_stage2_checkpoint, load_sd_vae,
        )
        params = load_pcdms_stage2_checkpoint(args.weights_name)
        params["vae"] = load_sd_vae(args.pretrained_model_name_or_path)
        dino = load_dinov2(args.image_encoder_p_path)

    pairs = PairList(args.json_path, args.image_root_path).shard(
        jax.process_index(), jax.process_count())
    train_mode = os.path.basename(args.json_path).startswith("train")
    size = (args.img_width, args.img_height)

    clip_params = None
    if train_mode:
        # oracle-conditioned upper bound: GT target CLIP embeddings
        # (stage2_batchtest_inpaint_model.py:176-185)
        from pcdms_tpu.models.vit import clip_vit_h14_config, vit_init
        clip_cfg = tiny.clip if args.tiny_config else clip_vit_h14_config()
        if frozen_bundle is not None:
            clip_params = frozen_bundle["clip"]
        elif args.random_init:
            clip_params = vit_init(jax.random.PRNGKey(args.seed), clip_cfg)
        else:
            from pcdms_tpu.compat.load import load_clip_vision
            clip_params = load_clip_vision(args.image_encoder_g_path)
        logger.info("train-mode conditioning: GT CLIP embeddings")

    from pcdms_tpu.cli.common import default_mesh
    from pcdms_tpu.parallel.mesh import pad_and_shard
    mesh = default_mesh()
    logger.info("inference sharded over %d device(s): %s",
                mesh.devices.size, mesh.devices.ravel().tolist())

    t0 = time.time()
    items = pairs.pairs
    bs = args.batch_size

    def finish(pending):
        """Read back + select + save one batch (blocks on the device).

        Deferred one batch behind dispatch so SSIM selection, PNG writes
        and the next batch's host prep all overlap the device sampling
        the reference serializes (stage2_batchtest_inpaint_model.py:
        188-225 runs prep -> sample -> select strictly in sequence).
        Under --device_select the selection already happened on device;
        only the n chosen right-halves are read back here."""
        chunk, dev_images, t_imgs, start, n = pending
        images = np.asarray(dev_images)
        w = args.img_width
        for i, item in enumerate(chunk):
            if args.device_select:
                best_img = images[i]
            else:
                cands = images[i::n][:, :, w:, :]   # right halves
                gt = to_neg1_1(t_imgs[i])
                best = best_of_n_ssim(cands, gt)
                best_img = cands[best]
            s = os.path.basename(item["source_image"]).rsplit(".", 1)[0]
            t = os.path.basename(item["target_image"]).rsplit(".", 1)[0]
            save_images(best_img[None],
                        [os.path.join(args.save_path, f"{s}_to_{t}.png")])
        logger.info("processed %d/%d", min(start + bs, len(items)),
                    len(items))

    pending = None
    for start in range(0, len(items), bs):
        chunk = items[start:start + bs]
        s_imgs = [load_image(pairs.image_path(i["source_image"]), size)
                  for i in chunk]
        t_imgs = [load_image(pairs.image_path(i["target_image"]), size)
                  for i in chunk]
        s_poses = [load_image(pairs.pose_img_path(i["source_image"]), size)
                   for i in chunk]
        t_poses = [load_image(pairs.pose_img_path(i["target_image"]), size)
                   for i in chunk]

        canvas = np.stack([
            to_neg1_1(make_side_by_side(s, black_like(s))) for s in s_imgs])
        pose_canvas = np.stack([
            to_neg1_1(make_side_by_side(sp, tp))
            for sp, tp in zip(s_poses, t_poses)])
        s_pix = np.stack([clip_preprocess(s) for s in s_imgs])

        t_pix = emb_np = None
        if args.simple_variant:
            pass
        elif train_mode:
            t_pix = np.stack([clip_preprocess(t) for t in t_imgs])
        elif args.prior_embeds_dir:
            emb_np = []
            for item in chunk:
                s = os.path.basename(item["source_image"]).rsplit(".", 1)[0]
                t = os.path.basename(item["target_image"]).rsplit(".", 1)[0]
                emb_np.append(np.load(os.path.join(
                    args.prior_embeds_dir, f"{s}_to_{t}.npy")).reshape(1, -1))
            emb_np = np.stack(emb_np)
        else:
            raise SystemExit("need --prior_embeds_dir or --simple_variant "
                             "(or a train-mode json with CLIP weights)")

        canvas, pose_canvas, s_pix, t_pix, emb_np, n = pad_and_shard(
            mesh, canvas, pose_canvas, s_pix, t_pix, emb_np)
        feats = dino_features(dino, s_pix, cfg=dino_cfg)
        if t_pix is not None:
            from pcdms_tpu.train.encoders import clip_image_embed
            embeds = clip_image_embed(clip_params, t_pix,
                                      cfg=clip_cfg)[:, None, :]
        else:
            embeds = emb_np

        from pcdms_tpu.cli.common import per_item_latents
        from pcdms_tpu.parallel.mesh import batch_sharding
        g_idx = [start + min(i, len(chunk) - 1) for i in range(n)]
        latents = jax.device_put(
            per_item_latents(args.seed, g_idx, args.num_images_per_prompt,
                             (args.img_height // 8, args.img_width // 4, 4)),
            batch_sharding(mesh))

        gen_kwargs = {"vae_cfg": vae_cfg} if vae_cfg is not None else {}
        images = stage2_generate(
            params, canvas, pose_canvas, feats,
            embeds, jax.random.PRNGKey(args.seed + start), latents=latents,
            unet_cfg=unet_cfg, num_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale, scheduler=args.scheduler,
            num_samples=args.num_images_per_prompt,
            encoder_cache_interval=args.encoder_cache_interval,
            **gen_kwargs)
        if args.device_select:
            from pcdms_tpu.cli.common import device_select_best
            gt_u8 = np.stack([np.asarray(t_imgs[min(i, len(chunk) - 1)],
                                         np.uint8) for i in range(n)])
            dev_images, _ = device_select_best(
                images, gt_u8, args.num_images_per_prompt)
        else:
            from pcdms_tpu.cli.common import device_uint8
            dev_images = device_uint8(images)   # async dispatch, no block
        if args.sequential:
            finish((chunk, dev_images, t_imgs, start, n))
            continue
        if pending is not None:
            finish(pending)
        pending = (chunk, dev_images, t_imgs, start, n)

    if pending is not None:
        finish(pending)
    logger.info("done in %.1fs", time.time() - t0)


if __name__ == "__main__":
    main()
