"""Metric sweep CLI — equivalent of caculate_metrics_{256,512}.py.

Computes FID (generated vs train split), LPIPS* and SSIM/PSNR/L1/MAE
(generated vs test split) with the ``_to_`` filename pairing, at 176x256
(--resolution 256) or 352x512 (--resolution 512), and appends results to
``{save_name}_results.txt``.

*FID and LPIPS need pretrained feature extractors (InceptionV3 /
AlexNet-LPIPS). Pass --inception_weights / --lpips_weights with local
torch checkpoints; without them those metrics are skipped with a notice
(this environment has no network egress to download them).
"""

from __future__ import annotations

import argparse
import logging
import os

logger = logging.getLogger("pcdms_tpu.metrics")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fid_real_path", type=str, required=True,
                   help="train-split image dir (FID reference)")
    p.add_argument("--test_path", type=str, required=True,
                   help="test-split GT image dir")
    p.add_argument("--generated_path", type=str, required=True)
    p.add_argument("--resolution", type=int, default=512,
                   choices=[256, 512])
    p.add_argument("--save_name", type=str, default="metrics")
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--lpips_weights", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)

    from pcdms_tpu.eval.metrics import (
        FID, ReconstructionMetrics, preprocess_path_for_deform_task,
    )

    img_size = (176, 256) if args.resolution == 256 else (352, 512)
    gt_list, distorted_list = preprocess_path_for_deform_task(
        args.test_path, args.generated_path)
    logger.info("%d generated/GT pairs", len(gt_list))

    results = {}

    if args.inception_weights:
        from pcdms_tpu.eval.inception import make_inception_feature_fn
        feature_fn = make_inception_feature_fn(args.inception_weights)
        fid = FID(feature_fn)
        results["fid"] = fid.calculate_from_disk(
            args.generated_path, args.fid_real_path, img_size)
        logger.info("FID: %.4f", results["fid"])
    else:
        logger.warning("skipping FID (no --inception_weights)")

    if args.lpips_weights:
        from pcdms_tpu.eval.lpips import lpips_from_disk
        results["lpips"] = lpips_from_disk(
            args.lpips_weights, distorted_list, gt_list, img_size)
        logger.info("LPIPS: %.4f", results["lpips"])
    else:
        logger.warning("skipping LPIPS (no --lpips_weights)")

    rec = ReconstructionMetrics()
    rec_out = rec.calculate_from_disk(
        distorted_list, gt_list, save_path=args.generated_path,
        img_size=img_size, sort=False)
    results.update({k: v[0] for k, v in rec_out.items()})
    logger.info("reconstruction: %s", rec_out)

    with open(f"{args.save_name}_results.txt", "a") as f:
        f.write(f"{args.generated_path} {results}\n")


if __name__ == "__main__":
    main()
