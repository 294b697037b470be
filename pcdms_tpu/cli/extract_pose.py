"""Pose extraction CLI — equivalent of /root/reference/single_extract_pose.py.

Runs host-side DWPose (ONNX) on an image directory, writing per-image
normalized keypoint ``.txt`` files and ``*_pose.jpg`` skeleton renders in
the reference's dataset layout (normalized_pose_txt/ + openpose_all_img/).
Requires onnxruntime + local ONNX exports of YOLOX-l and DWPose-l.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

logger = logging.getLogger("pcdms_tpu.extract_pose")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--out_txt_dir", type=str, required=True)
    p.add_argument("--out_pose_dir", type=str, required=True)
    p.add_argument("--det_onnx", type=str, required=True,
                   help="YOLOX-l ONNX export")
    p.add_argument("--pose_onnx", type=str, required=True,
                   help="DWPose-l ONNX export")
    p.add_argument("--image_resolution", type=int, default=512)
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    from PIL import Image

    from pcdms_tpu.pose.dwpose import DWposeDetector
    from pcdms_tpu.pose.keypoints import write_pose_txt

    os.makedirs(args.out_txt_dir, exist_ok=True)
    os.makedirs(args.out_pose_dir, exist_ok=True)
    detector = DWposeDetector(args.det_onnx, args.pose_onnx)

    names = [n for n in sorted(os.listdir(args.image_dir))
             if n.lower().endswith((".png", ".jpg", ".jpeg"))]
    for i, name in enumerate(names):
        img = np.asarray(Image.open(
            os.path.join(args.image_dir, name)).convert("RGB"))
        render, kpts, scores = detector(
            img, render_size=(args.image_resolution,
                              args.image_resolution))
        stem = name.rsplit(".", 1)[0]
        # first (highest-score) person's 18 joints -> 36-float txt
        coords = kpts[0] if len(kpts) else np.zeros((18, 2), np.float32)
        write_pose_txt(os.path.join(args.out_txt_dir, f"{stem}.txt"),
                       coords)
        Image.fromarray(render).save(
            os.path.join(args.out_pose_dir, f"{stem}_pose.jpg"))
        if i % 100 == 0:
            logger.info("processed %d/%d", i, len(names))


if __name__ == "__main__":
    main()
