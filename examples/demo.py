"""Single-image demo — equivalent of /root/reference/pcdms_kaggle_demo.ipynb.

The simplified stage-2-only release: one monolithic ``pcdms_ckpt.pt``
(unet 9ch without class embedding + pose_proj + image_proj_model), DDIM
sampling on a [source | black] 512x1024 canvas conditioned on a target
pose skeleton render and DINOv2 source features.

    python examples/demo.py \
        --source person.png --target_pose pose.txt \
        --ckpt pcdms_ckpt.pt --sd /ckpts/sd21 --dinov2 /ckpts/dinov2-giant \
        --out result.png

With --random_init it runs end-to-end without any checkpoints (produces
noise — useful as a smoke test of the demo path).
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", type=str, required=True,
                   help="source person image")
    p.add_argument("--target_pose", type=str, required=True,
                   help="18-keypoint pose .txt (normalized) OR a rendered "
                        "skeleton image")
    p.add_argument("--source_pose", type=str, default=None,
                   help="source pose .txt/render; omitted -> black")
    p.add_argument("--ckpt", type=str, default=None,
                   help="monolithic pcdms_ckpt.pt")
    p.add_argument("--sd", type=str, default=None, help="SD-2.1 dir (vae)")
    p.add_argument("--dinov2", type=str, default=None)
    p.add_argument("--out", type=str, default="result.png")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=2.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--encoder_cache_interval", type=int, default=1,
                   help=">1 = encoder-propagation speedup (approximate; "
                        "PERF.md)")
    p.add_argument("--tiny_config", action="store_true",
                   help="tiny model geometry (CI/CPU smoke; implies "
                        "--random_init weights semantics)")
    return p.parse_args(argv)


def load_pose_canvas(path, size):
    """Accept a keypoint .txt (rasterized here) or a pre-rendered image."""
    from pcdms_tpu.data.preprocess import load_image, to_neg1_1
    from pcdms_tpu.pose.keypoints import read_pose_txt
    from pcdms_tpu.pose.skeleton import render_pose

    if path is None:
        return np.full((size, size, 3), -1.0, np.float32)
    if path.endswith(".txt"):
        coords = read_pose_txt(path).reshape(18, 2)
        render = render_pose(coords, size, size)
        return render.astype(np.float32) / 127.5 - 1.0
    return to_neg1_1(load_image(path, (size, size)))


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from pcdms_tpu.data.preprocess import clip_preprocess, load_image, \
        to_neg1_1
    from pcdms_tpu.models.unet2d import stage2_unet_config, unet_init
    from pcdms_tpu.models.vae import vae_init
    from pcdms_tpu.models.vit import dinov2_giant_config, vit_init
    from pcdms_tpu.pipelines.stage2_inpaint import stage2_generate
    from pcdms_tpu.train.encoders import dino_features
    from pcdms_tpu.cli.common import save_images

    size = args.size
    if args.tiny_config:
        from pcdms_tpu.cli.common import tiny_configs
        tiny = tiny_configs()
        unet_cfg = tiny.unet2(with_class_embed=False)   # demo variant
        dino_cfg = tiny.dino
        args.random_init = True
    else:
        tiny = None
        unet_cfg = stage2_unet_config(with_class_embed=False)
        dino_cfg = dinov2_giant_config()
    key = jax.random.PRNGKey(args.seed)

    if not args.random_init:
        missing = [f for f in ("ckpt", "sd", "dinov2")
                   if getattr(args, f) is None]
        if missing:
            raise SystemExit(
                "the checkpoint path(s) --" + " --".join(missing)
                + " are required without --random_init (pass "
                "--random_init for a weight-free smoke run)")
    if args.random_init:
        ks = jax.random.split(key, 4)
        from pcdms_tpu.models.projections import (
            image_proj_mlp_init, pose_cond_embedding_init,
        )
        if tiny is not None:
            params = {
                "unet": unet_init(ks[0], unet_cfg),
                "image_proj": image_proj_mlp_init(
                    ks[1], **tiny.image_proj_kwargs),
                "pose_proj": pose_cond_embedding_init(
                    ks[2], **tiny.pose_proj_kwargs),
                "vae": vae_init(ks[3], tiny.vae),
            }
        else:
            params = {"unet": unet_init(ks[0], unet_cfg),
                      "image_proj": image_proj_mlp_init(ks[1]),
                      "pose_proj": pose_cond_embedding_init(ks[2]),
                      "vae": vae_init(ks[3])}
        dino = vit_init(key, dino_cfg)
    else:
        from pcdms_tpu.compat.load import (
            load_dinov2, load_pcdms_stage2_checkpoint, load_sd_vae,
        )
        params = load_pcdms_stage2_checkpoint(args.ckpt)
        params["vae"] = load_sd_vae(args.sd)
        dino = load_dinov2(args.dinov2)

    s_img = load_image(args.source, (size, size))
    canvas = np.concatenate(
        [to_neg1_1(s_img), np.full((size, size, 3), -1.0, np.float32)],
        axis=1)
    pose_canvas = np.concatenate(
        [load_pose_canvas(args.source_pose, size),
         load_pose_canvas(args.target_pose, size)], axis=1)
    feats = dino_features(dino, jnp.asarray(clip_preprocess(s_img))[None],
                          cfg=dino_cfg)

    gen_kwargs = {} if tiny is None else {"vae_cfg": tiny.vae}
    images = stage2_generate(
        params, jnp.asarray(canvas)[None], jnp.asarray(pose_canvas)[None],
        feats, None, jax.random.PRNGKey(args.seed), unet_cfg=unet_cfg,
        num_steps=args.steps, guidance_scale=args.guidance_scale,
        scheduler="ddim",
        encoder_cache_interval=args.encoder_cache_interval, **gen_kwargs)
    # right half = generated target
    target = np.asarray(images)[:, :, size:, :]
    save_images(target, [args.out])
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
