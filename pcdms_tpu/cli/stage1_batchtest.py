"""Stage-1 batch test CLI.

Equivalent of /root/reference/stage1_batchtest_prior_model.py: predict
target CLIP embeddings for every test pair, save ``{src}_to_{tgt}.npy``
files (the stage-1 -> stage-2 disk handoff), and append the mean cosine
similarity vs the GT embeddings to ``a_results.txt``.

TPU-first: instead of one process per GPU with a chunked test list, the
whole batch runs through a single jitted, device-batched sampling loop;
multi-host runs shard the pair list by process index.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import numpy as np

from pcdms_tpu.cli.common import setup_logging

logger = logging.getLogger("pcdms_tpu.stage1_batchtest")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", type=str, required=True)
    p.add_argument("--image_root_path", type=str, default="")
    p.add_argument("--img_path", type=str, default=None,
                   help="unused; flag parity")
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--weights_name", type=str, default=None,
                   help="trained prior checkpoint (torch .pt or orbax dir)")
    p.add_argument("--image_encoder_path", type=str, default=None)
    p.add_argument("--num_inference_steps", type=int, default=20)
    p.add_argument("--guidance_scale", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--tiny_config", action="store_true",
                   help="tiny-geometry models (CI / CPU smoke runs)")
    p.add_argument("--train_ckpt_dir", type=str, default=None,
                   help="orbax checkpoint dir of a stage-1 training run "
                        "(cli/stage1_train.py --output_dir): load the "
                        "trained prior (EMA shadow if tracked) instead "
                        "of a torch .pt; pair with --frozen_dir")
    p.add_argument("--frozen_dir", type=str, default=None,
                   help="frozen-encoder bundle the training run used "
                        "(train/frozen.py; the trainers' --frozen_dir)")
    return p.parse_args(argv)


def main(argv=None):
    setup_logging()
    args = parse_args(argv)
    os.makedirs(args.save_path, exist_ok=True)

    from pcdms_tpu.data.datasets import PairList
    from pcdms_tpu.data.preprocess import clip_preprocess, load_image
    from pcdms_tpu.eval.metrics import cosine_similarity
    from pcdms_tpu.models.prior_transformer import PriorConfig, prior_init
    from pcdms_tpu.models.vit import clip_vit_h14_config, vit_init
    from pcdms_tpu.pipelines.stage1_prior import stage1_generate
    from pcdms_tpu.pose.keypoints import read_pose_txt
    from pcdms_tpu.train.encoders import clip_image_embed

    if args.tiny_config:
        from pcdms_tpu.cli.common import tiny_configs
        tiny = tiny_configs()
        prior_cfg, clip_cfg = tiny.prior, tiny.clip
    else:
        prior_cfg = PriorConfig()
        clip_cfg = clip_vit_h14_config()
    key = jax.random.PRNGKey(args.seed)
    if args.train_ckpt_dir:
        from pcdms_tpu.train.frozen import load_frozen, load_trained_params
        if not args.frozen_dir:
            raise SystemExit("--train_ckpt_dir needs --frozen_dir (the "
                             "CLIP encoder the run trained against)")
        prior = load_trained_params(args.train_ckpt_dir)
        clip = load_frozen(args.frozen_dir)["clip"]
    elif args.random_init:
        prior = prior_init(key, prior_cfg)
        clip = vit_init(key, clip_cfg)
    else:
        from pcdms_tpu.compat.load import load_clip_vision, load_state_dict
        from pcdms_tpu.compat.torch_convert import (
            convert_prior, split_reference_checkpoint,
        )
        sd = load_state_dict(args.weights_name)
        groups = split_reference_checkpoint(sd)
        prior = convert_prior(groups.get("prior", sd))
        clip = load_clip_vision(args.image_encoder_path)

    pairs = PairList(args.json_path, args.image_root_path).shard(
        jax.process_index(), jax.process_count())

    from pcdms_tpu.cli.common import default_mesh
    from pcdms_tpu.parallel.mesh import pad_and_shard
    mesh = default_mesh()
    logger.info("inference sharded over %d device(s): %s",
                mesh.devices.size, mesh.devices.ravel().tolist())

    t0 = time.time()
    sims = []
    bs = args.batch_size
    items = pairs.pairs

    def finish(pending):
        """Read back + save one batch, deferred one batch behind
        dispatch so the .npy writes and the next batch's PIL/CLIP prep
        overlap the device sampling (same pipelining as
        stage2_batchtest)."""
        chunk, dev_pred, dev_t_embed, start, n = pending
        pred = np.asarray(dev_pred)[:n]
        for i, item in enumerate(chunk):
            s = os.path.basename(item["source_image"]).rsplit(".", 1)[0]
            t = os.path.basename(item["target_image"]).rsplit(".", 1)[0]
            np.save(os.path.join(args.save_path, f"{s}_to_{t}.npy"),
                    pred[i:i + 1])
        sims.extend(cosine_similarity(
            pred, np.asarray(dev_t_embed)[:n]).tolist())
        logger.info("processed %d/%d", min(start + bs, len(items)),
                    len(items))

    pending = None
    for start in range(0, len(items), bs):
        chunk = items[start:start + bs]
        n = len(chunk)
        s_pix = np.stack([
            clip_preprocess(load_image(pairs.image_path(i["source_image"])))
            for i in chunk])
        t_pix = np.stack([
            clip_preprocess(load_image(pairs.image_path(i["target_image"])))
            for i in chunk])
        s_pose = np.stack([
            read_pose_txt(pairs.pose_txt_path(i["source_image"]))
            for i in chunk])
        t_pose = np.stack([
            read_pose_txt(pairs.pose_txt_path(i["target_image"]))
            for i in chunk])

        s_pix, t_pix, s_pose, t_pose, _ = pad_and_shard(
            mesh, s_pix, t_pix, s_pose, t_pose)
        s_embed = clip_image_embed(clip, s_pix, cfg=clip_cfg)
        t_embed = clip_image_embed(clip, t_pix, cfg=clip_cfg)

        pred = stage1_generate(
            prior, s_embed, s_pose, t_pose,
            jax.random.PRNGKey(args.seed + start),
            prior_cfg=prior_cfg, num_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale)
        if pending is not None:
            finish(pending)
        pending = (chunk, pred, t_embed, start, n)

    if pending is not None:
        finish(pending)
    mean_sim = float(np.mean(sims))
    elapsed = time.time() - t0
    logger.info("mean cosine similarity: %.5f (%.1fs)", mean_sim, elapsed)
    with open(os.path.join(args.save_path, "a_results.txt"), "a") as f:
        f.write(f"{args.weights_name}  {mean_sim}\n")


if __name__ == "__main__":
    main()
