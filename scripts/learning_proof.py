"""End-to-end learning proof: the 3-stage system *learns* pose transfer.

Every other correctness artifact in this repo is untrained-weights
evidence (torch parity, golden schedulers, mechanics tests). This script
is the missing piece: it shows that training -> checkpoint -> cascade
inference -> metrics composes into a system whose samples actually
improve — the loss signs, condition dropout, embed normalization, CFG
null conventions and conditioning plumbing all have to be right at once
for that to happen.

Protocol (all through the real CLIs, mirroring the reference's
train/test scripts — /root/reference/stage{1,2,3}_train_*.py,
stage{1,2,3}_batchtest_*.py, caculate_metrics_512.py:18-27):

 0. Generate the synthetic pose-transfer world (data/synthetic.py) in
    the DeepFashion disk layout.
 1. Pre-train the tiny VAE on it (train/vae.py) and freeze it — with
    random tiny CLIP/DINOv2 encoders — into a shared bundle
    (train/frozen.py) every stage trains against. Record the VAE
    reconstruction ceiling (decode(encode(GT))) the diffusion stages
    cannot exceed.
 2. Stage 1: train the prior through cli/stage1_train (plus a 1-step
    "init" run from the same seed); run cli/stage1_batchtest on the test
    pairs for both checkpoints -> cosine-sim improvement + the `.npy`
    embedding handoff.
 3. Stage 2: train through cli/stage2_train (+ 1-step init); run
    cli/stage2_batchtest in train-mode on the TRAIN pairs (GT CLIP
    conditioning — the reference's stage-3 training diet,
    stage3_train_refined_model.py:202-207) and in test mode on the TEST
    pairs conditioned on stage-1's predicted embeddings, for both
    checkpoints -> SSIM/PSNR improvement.
 4. Stage 3: train the refiner on stage-2's train-split outputs
    (+ 1-step init); refine stage-2's test outputs for both
    checkpoints.
 5. Score everything with cli/calculate_metrics (the 176x256 protocol)
    and write learning_proof.json + a markdown table.

Run on the 8-device virtual CPU mesh:

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python scripts/learning_proof.py --root /tmp/learning_proof

(~40-80 min on one CPU core at the default budgets; --quick for the CI
 version, which tests/test_learning_proof.py drives with asserts.)
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import argparse
import json
import logging
import time

logger = logging.getLogger("pcdms_tpu.learning_proof")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", type=str, required=True,
                   help="working dir (dataset, checkpoints, outputs)")
    p.add_argument("--identities", type=int, default=6)
    p.add_argument("--poses", type=int, default=8)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--vae_steps", type=int, default=1200)
    p.add_argument("--stage1_steps", type=int, default=1000)
    p.add_argument("--stage2_steps", type=int, default=2000)
    p.add_argument("--stage3_steps", type=int, default=800)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--num_inference_steps", type=int, default=12)
    p.add_argument("--num_images_per_prompt", type=int, default=2)
    p.add_argument("--quick", action="store_true",
                   help="CI budget: tiny world, ~1/4 the steps")
    p.add_argument("--assert_improves", action="store_true",
                   help="fail unless trained beats init decisively")
    return p.parse_args(argv)


def _apply_quick(args):
    args.identities = 4
    args.poses = 6
    args.vae_steps = 250
    args.stage1_steps = 200
    args.stage2_steps = 350
    args.stage3_steps = 150
    args.batch_size = 8
    args.num_inference_steps = 6
    return args


# ---------------------------------------------------------------------------
# step 1: VAE pretrain + frozen bundle
# ---------------------------------------------------------------------------

def pretrain_vae_and_bundle(args, train_json):
    """Fit the tiny VAE on the world's images; freeze {vae, clip, dino}."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pcdms_tpu.cli.common import tiny_configs
    from pcdms_tpu.data.datasets import PairList
    from pcdms_tpu.data.preprocess import load_image, to_neg1_1
    from pcdms_tpu.models.vae import vae_decode, vae_encode, vae_init
    from pcdms_tpu.models.vit import vit_init
    from pcdms_tpu.parallel.mesh import make_mesh
    from pcdms_tpu.train.common import TrainConfig
    from pcdms_tpu.train.frozen import save_frozen
    from pcdms_tpu.train.loop import run_training
    from pcdms_tpu.train.vae import vae_pretrain_loss_fn

    tiny = tiny_configs()
    size = (args.size, args.size)
    pairs = PairList(train_json, args.root)
    # every distinct image in the world, plus one all-black frame (the
    # masked canvas's right half must encode/decode cleanly too)
    names = sorted({p["source_image"] for p in pairs.pairs}
                   | {p["target_image"] for p in pairs.pairs})
    imgs = np.stack([to_neg1_1(load_image(pairs.image_path(n), size))
                     for n in names] + [np.full(size + (3,), -1.0,
                                                np.float32)])
    logger.info("VAE pretrain set: %s", imgs.shape)

    def batches():
        rng = np.random.default_rng(args.seed)
        while True:
            idx = rng.integers(0, len(imgs), args.batch_size)
            yield {"image": imgs[idx]}

    tcfg = TrainConfig(learning_rate=2e-3, lr_warmup_steps=20,
                       max_train_steps=args.vae_steps, noise_offset=0.0)
    mesh = make_mesh(jax.devices())
    state = run_training(vae_pretrain_loss_fn(tiny.vae),
                         vae_init(jax.random.PRNGKey(args.seed), tiny.vae),
                         batches(), tcfg, mesh=mesh,
                         rng=jax.random.PRNGKey(args.seed), log_every=100)
    vae = jax.device_get(state["params"])

    k = jax.random.PRNGKey(args.seed + 1)
    k1, k2 = jax.random.split(k)
    save_frozen(os.path.join(args.root, "frozen"),
                {"vae": vae, "clip": vit_init(k1, tiny.clip),
                 "dino": vit_init(k2, tiny.dino)})

    # reconstruction ceiling: decode(encode(GT)) SSIM at native size
    from pcdms_tpu.eval.metrics import compare_ssim
    recon = np.asarray(vae_decode(
        vae, vae_encode(vae, jnp.asarray(imgs[:-1]), cfg=tiny.vae),
        cfg=tiny.vae))
    ssims = [compare_ssim((r + 1) / 2, (g + 1) / 2, data_range=1.0,
                          win_size=7)
             for r, g in zip(np.clip(recon, -1, 1), imgs[:-1])]
    ceiling = float(np.mean(ssims))
    logger.info("VAE recon SSIM ceiling: %.4f", ceiling)
    return ceiling


# ---------------------------------------------------------------------------
# step 2-4: train + sample each stage through the real CLIs
# ---------------------------------------------------------------------------

def _train(stage: int, args, out_name: str, steps: int, extra=()):
    """Run cli/stage{N}_train.main in-process. Returns the output dir."""
    mod = __import__(f"pcdms_tpu.cli.stage{stage}_train",
                     fromlist=["main"])
    out = os.path.join(args.root, out_name)
    argv = [
        "--output_dir", out,
        "--json_path", os.path.join(
            args.root, "train_pairs.json"),
        "--image_root_path", args.root,
        "--img_height", str(args.size), "--img_width", str(args.size),
        "--train_batch_size", str(args.batch_size),
        "--max_train_steps", str(steps),
        "--checkpointing_steps", str(max(steps, 1)),
        "--learning_rate", str(args.learning_rate),
        "--lr_warmup_steps", str(min(50, max(steps // 4, 1))),
        "--noise_offset", "0.0",
        "--seed", str(args.seed),
        "--random_init", "--tiny_config", "--mixed_precision", "no",
        "--frozen_dir", os.path.join(args.root, "frozen"),
        "--log_every", "100",
        "--dataloader_num_workers", "0",
    ] + list(extra)
    t0 = time.time()
    mod.main(argv)
    logger.info("stage-%d %s: %d steps in %.0fs", stage, out_name, steps,
                time.time() - t0)
    return out


def _batchtest(stage: int, args, ckpt_dir: str, save_name: str,
               json_name: str, extra=()):
    mod = __import__(f"pcdms_tpu.cli.stage{stage}_batchtest",
                     fromlist=["main"])
    out = os.path.join(args.root, save_name)
    argv = [
        "--json_path", os.path.join(args.root, json_name),
        "--image_root_path", args.root,
        "--save_path", out,
        "--num_inference_steps", str(args.num_inference_steps),
        "--batch_size", "8",
        "--seed", str(args.seed + 42),
        "--tiny_config",
        "--train_ckpt_dir", ckpt_dir,
        "--frozen_dir", os.path.join(args.root, "frozen"),
    ] + list(extra)
    if stage != 1:
        argv += ["--img_height", str(args.size),
                 "--img_width", str(args.size),
                 "--num_images_per_prompt",
                 str(args.num_images_per_prompt),
                 "--scheduler", "unipc"]
    t0 = time.time()
    mod.main(argv)
    logger.info("stage-%d batchtest -> %s (%.0fs)", stage, save_name,
                time.time() - t0)
    return out


def _cosine_from_results(save_dir: str) -> float:
    with open(os.path.join(save_dir, "a_results.txt")) as f:
        return float(f.read().strip().split()[-1])


def _metrics(args, gen_dir: str) -> dict:
    """SSIM/PSNR/L1/MAE through cli/calculate_metrics (176x256
    protocol; FID/LPIPS skipped — no pretrained extractors here)."""
    from pcdms_tpu.eval.metrics import (
        ReconstructionMetrics, preprocess_path_for_deform_task,
    )
    gt_dir = os.path.join(args.root, "train_all_png")
    gt_list, distorted = preprocess_path_for_deform_task(gt_dir, gen_dir)
    rec = ReconstructionMetrics().calculate_from_disk(
        distorted, gt_list, save_path=gen_dir, img_size=(176, 256),
        sort=False)
    return {k: float(v[0]) for k, v in rec.items()}


def main(argv=None):
    logging.basicConfig(
        format="%(asctime)s %(levelname)s %(name)s %(message)s",
        level=logging.INFO)
    logging.getLogger("absl").setLevel(logging.WARNING)  # orbax chatter
    args = parse_args(argv)
    if args.quick:
        args = _apply_quick(args)
    os.makedirs(args.root, exist_ok=True)
    t_start = time.time()
    results = {"config": vars(args).copy()}

    from pcdms_tpu.data.synthetic import generate_dataset
    train_json, test_json = generate_dataset(
        args.root, n_identities=args.identities, n_poses=args.poses,
        size=args.size, seed=args.seed)
    logger.info("world: %d identities x %d poses at %dpx",
                args.identities, args.poses, args.size)

    results["vae_recon_ssim_ceiling"] = pretrain_vae_and_bundle(
        args, train_json)

    # ---- stage 1 ----
    s1_init = _train(1, args, "s1_init", 1)
    s1_ckpt = _train(1, args, "s1", args.stage1_steps)
    d = _batchtest(1, args, s1_init, "s1_out_init", "test_pairs.json")
    results["stage1_cosine_init"] = _cosine_from_results(d)
    s1_npy = _batchtest(1, args, s1_ckpt, "s1_out", "test_pairs.json")
    results["stage1_cosine_trained"] = _cosine_from_results(s1_npy)
    logger.info("stage-1 cosine: init %.4f -> trained %.4f",
                results["stage1_cosine_init"],
                results["stage1_cosine_trained"])

    # ---- stage 2 ----
    s2_init = _train(2, args, "s2_init", 1)
    s2_ckpt = _train(2, args, "s2", args.stage2_steps)
    d = _batchtest(2, args, s2_init, "s2_out_init", "test_pairs.json",
                   ["--prior_embeds_dir", s1_npy])
    results["stage2_init"] = _metrics(args, d)
    s2_test = _batchtest(2, args, s2_ckpt, "s2_out", "test_pairs.json",
                         ["--prior_embeds_dir", s1_npy])
    results["stage2_trained"] = _metrics(args, s2_test)
    # train-split generations (GT-CLIP "train mode") = stage-3's diet
    s2_train_gen = _batchtest(2, args, s2_ckpt, "s2_out_train",
                              "train_pairs.json")
    logger.info("stage-2 ssim: init %.4f -> trained %.4f",
                results["stage2_init"]["ssim"],
                results["stage2_trained"]["ssim"])

    # ---- stage 3 ----
    s3_init = _train(3, args, "s3_init", 1,
                     ["--gen_dir", s2_train_gen, "--gen_drop_rate", "0.1"])
    s3_ckpt = _train(3, args, "s3", args.stage3_steps,
                     ["--gen_dir", s2_train_gen, "--gen_drop_rate", "0.1"])
    d = _batchtest(3, args, s3_init, "s3_out_init", "test_pairs.json",
                   ["--gen_dir", s2_test])
    results["stage3_init"] = _metrics(args, d)
    d = _batchtest(3, args, s3_ckpt, "s3_out", "test_pairs.json",
                   ["--gen_dir", s2_test])
    results["stage3_trained"] = _metrics(args, d)
    logger.info("stage-3 ssim: init %.4f -> trained %.4f",
                results["stage3_init"]["ssim"],
                results["stage3_trained"]["ssim"])

    results["wall_s"] = round(time.time() - t_start, 1)
    out_json = os.path.join(args.root, "learning_proof.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)

    print("\n== learning proof ==")
    print(f"VAE recon SSIM ceiling:      "
          f"{results['vae_recon_ssim_ceiling']:.4f}")
    print(f"stage-1 cosine sim:          "
          f"{results['stage1_cosine_init']:.4f} -> "
          f"{results['stage1_cosine_trained']:.4f}")
    for st in (2, 3):
        i, t = results[f"stage{st}_init"], results[f"stage{st}_trained"]
        print(f"stage-{st} SSIM / PSNR / L1:   "
              f"{i['ssim']:.4f} / {i['psnr']:.2f} / {i['l1']:.4f} -> "
              f"{t['ssim']:.4f} / {t['psnr']:.2f} / {t['l1']:.4f}")
    print(f"(wall: {results['wall_s']}s; artifacts in {args.root})")

    if args.assert_improves:
        assert (results["stage1_cosine_trained"]
                > results["stage1_cosine_init"] + 0.05), "stage-1 flat"
        assert (results["stage2_trained"]["ssim"]
                > results["stage2_init"]["ssim"] + 0.05), "stage-2 flat"
        assert (results["stage3_trained"]["ssim"]
                > results["stage3_init"]["ssim"] + 0.02), "stage-3 flat"
        print("ASSERTIONS PASSED: the system learns")
    return results


if __name__ == "__main__":
    main()
