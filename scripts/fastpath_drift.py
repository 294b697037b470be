"""Quality drift of the approximate fast sampling paths vs the exact
sampler, on synthetic weights at the real stage-2 geometry.

The fast paths (`encoder_cache_interval > 1` encoder propagation,
4-step LCM consistency sampling) report throughput in PERF.md; this
script quantifies how far each one's OUTPUT drifts from the exact
50-step DDIM sampler under identical conditions — same random weights,
same inputs, same initial latents, posterior-mean VAE. For calibration
the table includes two LEGITIMATE sampler swaps (20-step UniPC — the
reference's own batch-test protocol, stage2_batchtest_inpaint_model.py
— and 20-step DDIM): an approximation whose drift is comparable to a
sampler swap users already accept is operating in a safe regime.

Metrics, per variant vs the exact reference:
  PSNR   on the decoded [-1, 1] images (data range 2.0)
  cosine of the flattened image tensors

For LCM, the student is `init_student_from_teacher` with the zero-init
w-projection, so its function EQUALS the teacher's — the number
measures pure sampler-structure drift (a real distilled student only
improves on it). Synthetic-weight caveat: a random UNet's eps field is
rougher than a trained one's, so these drifts are a conservative proxy;
trained-checkpoint FID validation stays gated on released weights
(PARITY.md).

Trained mode (--train_ckpt_dir + --frozen_dir + --data_root): the same
table measured on a REAL trained checkpoint — the learning-proof run's
tiny stage-2 on its synthetic pose-transfer world
(scripts/learning_proof.py) — with real test-pair inputs (canvases,
skeleton renders, frozen-DINOv2 features, oracle CLIP conditioning)
instead of noise. --lcm_ckpt_dir additionally scores an actually
DISTILLED 4-step student (cli/lcm_distill.py) against the same exact
reference, replacing the undistilled teacher-equal floor with the real
operating point. This closes the random-weights caveat above at tiny
scale (VERDICT r4 #2).

Usage: PYTHONPATH=. python scripts/fastpath_drift.py [--tiny] [--height 512]
  trained: JAX_PLATFORMS=cpu python scripts/fastpath_drift.py \
      --train_ckpt_dir /tmp/lp/s2 --frozen_dir /tmp/lp/frozen \
      --data_root /tmp/lp [--lcm_ckpt_dir /tmp/lp/lcm]
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b, data_range=2.0):
    mse = float(jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32))
                         ** 2))
    return 10.0 * np.log10(data_range ** 2 / mse)


def cosine(a, b):
    a = np.ravel(np.asarray(a, np.float64))
    b = np.ravel(np.asarray(b, np.float64))
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny configs (CPU smoke of the harness itself)")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--exact_steps", type=int, default=50)
    ap.add_argument("--train_ckpt_dir", type=str, default=None,
                    help="orbax stage-2 training checkpoint (tiny "
                         "config, e.g. the learning-proof run)")
    ap.add_argument("--frozen_dir", type=str, default=None,
                    help="the run's frozen {vae, clip, dino} bundle")
    ap.add_argument("--data_root", type=str, default=None,
                    help="synthetic-world root (test_pairs.json) for "
                         "real inputs in trained mode")
    ap.add_argument("--lcm_ckpt_dir", type=str, default=None,
                    help="cli/lcm_distill output: score the DISTILLED "
                         "4-step student instead of only the floor")
    args = ap.parse_args()

    from pcdms_tpu.models.projections import (
        image_proj_mlp_init, pose_cond_embedding_init,
    )
    from pcdms_tpu.models.unet2d import stage2_unet_config, unet_init
    from pcdms_tpu.models.vae import VAEConfig, vae_init
    from pcdms_tpu.pipelines.stage2_inpaint import stage2_generate
    from pcdms_tpu.train.lcm_distill import init_student_from_teacher

    trained = bool(args.train_ckpt_dir)
    if trained and not (args.frozen_dir and args.data_root):
        raise SystemExit("--train_ckpt_dir needs --frozen_dir and "
                         "--data_root")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    if args.tiny or trained:
        from pcdms_tpu.cli.common import tiny_configs
        t = tiny_configs()
        unet_cfg, vae_cfg = t.unet2(True), t.vae
        ip_kw, pp_kw = t.image_proj_kwargs, t.pose_proj_kwargs
        dino_shape = (5, t.dino.hidden_size)
        embed_dim = t.clip.projection_dim
        height = 64
    else:
        unet_cfg, vae_cfg = stage2_unet_config(), VAEConfig()
        ip_kw, pp_kw = {}, {}
        dino_shape, embed_dim = (257, 1536), 1024
        height = args.height
    width = 2 * height
    b = args.batch

    def bf16(tree):
        if trained:                      # trained tiny ckpts stay f32
            return tree
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, tree)

    if trained:
        import os

        from pcdms_tpu.data.datasets import PairList
        from pcdms_tpu.data.preprocess import (
            black_like, clip_preprocess, load_image, make_side_by_side,
            to_neg1_1,
        )
        from pcdms_tpu.train.encoders import clip_image_embed, dino_features
        from pcdms_tpu.train.frozen import load_frozen, load_trained_params

        params = dict(load_trained_params(args.train_ckpt_dir))
        frozen = load_frozen(args.frozen_dir)
        params["vae"] = frozen["vae"]

        plist = PairList(os.path.join(args.data_root, "test_pairs.json"),
                         args.data_root)
        pairs = plist.pairs[:b]
        size = (height, height)
        s_imgs = [load_image(plist.image_path(p["source_image"]), size)
                  for p in pairs]
        t_imgs = [load_image(plist.image_path(p["target_image"]), size)
                  for p in pairs]
        s_poses = [load_image(plist.pose_img_path(p["source_image"]),
                              size) for p in pairs]
        t_poses = [load_image(plist.pose_img_path(p["target_image"]),
                              size) for p in pairs]

        vae_image = jnp.asarray(np.stack(
            [to_neg1_1(make_side_by_side(s, black_like(s)))
             for s in s_imgs]))
        st_pose = jnp.asarray(np.stack(
            [to_neg1_1(make_side_by_side(sp, tp))
             for sp, tp in zip(s_poses, t_poses)]))
        dino = dino_features(frozen["dino"], np.stack(
            [clip_preprocess(s) for s in s_imgs]), cfg=t.dino)
        # oracle (train-mode) conditioning: GT target CLIP embedding
        t_embed = clip_image_embed(frozen["clip"], np.stack(
            [clip_preprocess(ti) for ti in t_imgs]),
            cfg=t.clip)[:, None, :]
        b = len(pairs)
    else:
        params = {
            "unet": bf16(unet_init(ks[0], unet_cfg)),
            "image_proj": bf16(image_proj_mlp_init(ks[1], **ip_kw)),
            "pose_proj": bf16(pose_cond_embedding_init(ks[2], **pp_kw)),
            "vae": bf16(vae_init(ks[3], vae_cfg)),
        }
        vae_image = jax.random.uniform(ks[4], (b, height, width, 3),
                                       jnp.float32, -1, 1)
        st_pose = jax.random.uniform(ks[5], (b, height, width, 3),
                                     jnp.float32, -1, 1)
        dino = jax.random.normal(ks[6], (b,) + dino_shape, jnp.float32)
        t_embed = jax.random.normal(ks[7], (b, 1, embed_dim), jnp.float32)

    latents = jax.random.normal(jax.random.PRNGKey(42),
                                (b, height // 8, width // 8, 4),
                                jnp.float32)
    rng = jax.random.PRNGKey(7)

    def gen(steps, scheduler="ddim", interval=1, cfg=unet_cfg, p=params):
        return np.asarray(stage2_generate(
            p, vae_image, st_pose, dino, t_embed, rng, latents=latents,
            unet_cfg=cfg, vae_cfg=vae_cfg, num_steps=steps,
            guidance_scale=2.0, scheduler=scheduler,
            encoder_cache_interval=interval, deterministic_vae=True))

    t0 = time.time()
    exact = gen(args.exact_steps)
    print(f"# exact DDIM {args.exact_steps}-step reference done "
          f"({time.time() - t0:.0f}s)", flush=True)

    variants = [
        ("UniPC 20 (reference batch-test protocol)",
         lambda: gen(20, scheduler="unipc")),
        ("DDIM 20", lambda: gen(20)),
        ("enc-prop interval 2 (DDIM 50)", lambda: gen(args.exact_steps,
                                                      interval=2)),
        ("enc-prop interval 3 (DDIM 50)", lambda: gen(args.exact_steps,
                                                      interval=3)),
    ]

    # LCM 4-step: teacher-equal student (zero-init w projection)
    lcm_cfg = dataclasses.replace(unet_cfg, time_cond_proj_dim=256)
    student = bf16(init_student_from_teacher(
        jax.random.PRNGKey(9), params["unet"], lcm_cfg))
    lcm_params = dict(params, unet=student)
    variants.append(
        ("LCM 4-step (teacher-equal student, undistilled floor)",
         lambda: gen(4, scheduler="lcm", cfg=lcm_cfg, p=lcm_params)))

    if args.lcm_ckpt_dir:
        from pcdms_tpu.train.frozen import load_trained_params
        distilled = dict(load_trained_params(args.lcm_ckpt_dir))
        distilled["vae"] = params["vae"]
        variants.append(
            ("LCM 4-step (DISTILLED student, cli/lcm_distill)",
             lambda: gen(4, scheduler="lcm", cfg=lcm_cfg, p=distilled)))

    gt_ssim = None
    if trained:
        # task quality vs GT: SSIM of each variant's generated right
        # half against the target image (what the batchtest protocol
        # scores) — the correct lens for the DISTILLED student, whose
        # objective moves it off the teacher's exact trajectory while
        # (ideally) improving few-step sample quality
        from pcdms_tpu.eval.metrics import compare_ssim

        def gt_ssim(out):
            vals = []
            for i, ti in enumerate(t_imgs):
                gen_u8 = np.rint(np.clip(
                    (out[i, :, height:, :] + 1.0) * 127.5,
                    0, 255)).astype(np.uint8)
                vals.append(compare_ssim(
                    gen_u8.astype(np.float32) / 127.5 - 1.0,
                    to_neg1_1(ti), data_range=2.0, win_size=7))
            return float(np.mean(vals))

    hdr_gt = " SSIM vs GT |" if trained else ""
    print(f"\n| variant | PSNR vs exact (dB) | cosine |{hdr_gt}")
    print(f"|---|---|---|" + ("---|" if trained else ""))
    if trained:
        print(f"| exact DDIM {args.exact_steps} (reference) | — | — | "
              f"{gt_ssim(exact):.4f} |", flush=True)
    for name, fn in variants:
        t0 = time.time()
        out = fn()
        gt_col = f" {gt_ssim(out):.4f} |" if trained else ""
        print(f"| {name} | {psnr(exact, out):.2f} | "
              f"{cosine(exact, out):.4f} |{gt_col}"
              f"   <!-- {time.time()-t0:.0f}s -->",
              flush=True)


if __name__ == "__main__":
    main()
