"""Input-pipeline A/B: real-data vs synthetic train-step rate (v5e-1).

VERDICT r2 item 1 acceptance: with the overlapped multi-worker loader,
real-data training at the measured shape must come within ~10% of the
``--synthetic_data`` device rate (the old serial generator could not).

Builds an on-disk DeepFashion-layout dataset of random PNGs (noise PNGs
decode *slower* than photos — conservative), then drives the actual
``cli.stage2_train.main()`` three ways at the full SD-2.1 scale:

  synthetic      device ceiling (no host image work)
  real-serial    --dataloader_num_workers 0 (stateless fetch, inline)
  real-workers   --dataloader_num_workers 8 (thread pool + prefetch)

Embeddings are cached (--cache_embeddings) in all real runs: the frozen
encoders are not part of the input pipeline under test (the reference
re-encodes per step; our cache removes that from both sides).

Usage:  PYTHONPATH=/root/.axon_site:. python scripts/bench_loader_ab.py
        [--px 256] [--pairs 64] [--steps 13] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import re
import tempfile


def build_dataset(root: str, n_pairs: int, px: int):
    import numpy as np
    from PIL import Image
    img_dir = os.path.join(root, "train_all_png")
    pose_dir = os.path.join(root, "openpose_all_img")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pose_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    names = [f"p{i:03d}" for i in range(n_pairs)]
    for stem in names:
        Image.fromarray(rng.integers(0, 255, (px, px, 3),
                                     dtype=np.uint8)).save(
            os.path.join(img_dir, f"{stem}.png"))
        Image.fromarray(rng.integers(0, 255, (px, px, 3),
                                     dtype=np.uint8)).save(
            os.path.join(pose_dir, f"{stem}_pose.jpg"))
    pairs = [{"source_image": f"train_all_png/{names[i]}.jpg",
              "target_image": f"train_all_png/{names[(i + 1) % n_pairs]}.jpg"}
             for i in range(n_pairs)]
    jp = os.path.join(root, "pairs.json")
    with open(jp, "w") as f:
        json.dump(pairs, f)
    return jp


class RateCapture(logging.Handler):
    PAT = re.compile(r"step (\d+) loss \S+ \| ([\d.]+) examples/s")

    def __init__(self):
        super().__init__()
        self.rates = []

    def emit(self, record):
        m = self.PAT.match(record.getMessage())
        if m:
            self.rates.append((int(m.group(1)), float(m.group(2))))


def run_config(argv, label):
    """The CLI code path minus checkpoint I/O (device->host through the
    tunnel is ~1 MB/s; the closing orbax save of a ~10 GB train state
    would dominate everything — same policy as scripts/bench_train.py)."""
    import jax

    from pcdms_tpu.cli.common import (
        compute_dtype_from_args, default_mesh, train_config_from_args,
    )
    from pcdms_tpu.cli.stage2_train import (
        build_models, make_batches, parse_args,
    )
    from pcdms_tpu.train.loop import run_training
    from pcdms_tpu.train.stage2 import stage2_loss_fn

    args = parse_args(argv)
    tcfg = train_config_from_args(args)
    unet_cfg, trainable, vae, clip, dino, aux = build_models(args)
    loss_kwargs = {} if aux.vae_cfg is None else {"vae_cfg": aux.vae_cfg}
    loss_fn = stage2_loss_fn(unet_cfg, vae, noise_offset=args.noise_offset,
                             compute_dtype=compute_dtype_from_args(args),
                             **loss_kwargs)
    batches = make_batches(args, clip, dino, clip_cfg=aux.clip_cfg,
                           dino_cfg=aux.dino_cfg, aux=aux)
    clip = dino = None      # generator owns them (freed post cache-build)

    cap = RateCapture()
    logger = logging.getLogger("pcdms_tpu.train")
    logger.addHandler(cap)
    try:
        state = run_training(loss_fn, trainable, batches, tcfg,
                             mesh=default_mesh(),
                             rng=jax.random.PRNGKey(args.seed),
                             output_dir=None, log_every=4,
                             max_train_steps=args.max_train_steps)
    finally:
        logger.removeHandler(cap)
    del state
    # steady state: the step-1 window contains the jit compile
    steady = [r for s, r in cap.rates if s > 1] or \
        [r for _, r in cap.rates]
    rate = max(steady)
    print(f"[loader-ab] {label}: windows={cap.rates} -> {rate:.2f} ex/s",
          flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--px", type=int, default=256)
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=13)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--root", type=str, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny models (CPU wiring smoke)")
    ap.add_argument("--only", type=str, default=None,
                    choices=["synthetic", "real_workers", "real_serial"],
                    help="run one config only — at full SD-2.1 scale a "
                         "single 16G chip cannot hold two configs' "
                         "states/executables back to back; run each in "
                         "its own process (same --root to share the "
                         "dataset/cache)")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    logging.getLogger("pcdms_tpu.train").setLevel(logging.INFO)

    root = args.root or tempfile.mkdtemp(prefix="loader_ab_")
    jp = build_dataset(root, args.pairs, args.px)
    cache = os.path.join(root, "embed_cache")

    base = ["--output_dir", os.path.join(root, "out"),
            "--random_init", "--train_batch_size", str(args.batch),
            "--img_height", str(args.px), "--img_width", str(args.px),
            "--max_train_steps", str(args.steps),
            "--checkpointing_steps", "1000000",
            "--log_every", "4", "--learning_rate", "1e-5"]
    if args.tiny:
        base.append("--tiny_config")
    real = ["--json_path", jp, "--image_root_path", root,
            "--cache_embeddings", cache,
            "--imgp_drop_rate", "0.1", "--imgg_drop_rate", "0.1"]

    configs = {
        "synthetic": (base + ["--synthetic_data"], "synthetic"),
        "real_workers": (
            base + real + ["--dataloader_num_workers", str(args.workers)],
            f"real+{args.workers}w"),
        "real_serial": (
            base + real + ["--dataloader_num_workers", "0"],
            "real+serial"),
    }
    results = {}
    for name, (argv, label) in configs.items():
        if args.only and name != args.only:
            continue
        results[name] = run_config(argv, label)

    if "synthetic" in results:
        for name in ("real_workers", "real_serial"):
            if name in results:
                results[f"{name.split('_')[1]}_vs_synthetic"] = round(
                    results[name] / results["synthetic"], 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
