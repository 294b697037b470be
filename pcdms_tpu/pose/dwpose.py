"""Host-side DWPose detector: person detection + wholebody keypoints.

The reference extracts poses with mmdet YOLOX-l + mmpose DWPose-l
(/root/reference/src/controlnet_aux/dwpose/wholebody.py:32-98,
 /root/reference/single_extract_pose.py:6-29). The mm ecosystem (with its
CUDA ops) is not a TPU dependency we want; this wrapper runs the same two
models from their ONNX exports on the host CPU via onnxruntime, then
applies the COCO->OpenPose remap + neck synthesis
(pcdms_tpu/pose/keypoints.py) and the skeleton rasterizer
(pcdms_tpu/pose/skeleton.py).

onnxruntime and the ONNX files are optional (this image has neither); the
class raises a clear error at construction when unavailable. Everything
downstream (normalized keypoint files, skeleton renders) also accepts
precomputed inputs, so pose extraction can run on any machine once and
feed the device pipeline from disk — the same contract as the reference.

Detection protocol (YOLOX-l, 640x640 letterbox):
  * BGR input, letterbox-resized with ratio r, no normalization
  * outputs decoded with per-level strides (8, 16, 32), NMS at 0.45 IoU,
    score threshold 0.3, person class only
Pose protocol (DWPose/RTMPose-l 384x288 top-down, SimCC):
  * crop each person box expanded 1.25x, affine-resize to 288x384
  * SimCC x/y logits -> argmax / 2.0 (simcc_split_ratio)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from pcdms_tpu.pose.keypoints import coco_to_openpose
from pcdms_tpu.pose.skeleton import render_pose


def _require_ort():
    try:
        import onnxruntime  # noqa: F401
        return onnxruntime
    except ImportError as e:
        raise ImportError(
            "DWposeDetector needs onnxruntime + local ONNX exports of "
            "YOLOX-l and DWPose-l. Precompute keypoint .txt files offline "
            "(pcdms_tpu.pose.keypoints.write_pose_txt) if onnxruntime is "
            "unavailable on this host.") from e


def _letterbox(img: np.ndarray, size: int = 640):
    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    import cv2
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.full((size, size, 3), 114, np.uint8)
    canvas[:nh, :nw] = resized
    return canvas, r


def _nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.45):
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        xx1 = np.maximum(boxes[i, 0], boxes[order[1:], 0])
        yy1 = np.maximum(boxes[i, 1], boxes[order[1:], 1])
        xx2 = np.minimum(boxes[i, 2], boxes[order[1:], 2])
        yy2 = np.minimum(boxes[i, 3], boxes[order[1:], 3])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_o = ((boxes[order[1:], 2] - boxes[order[1:], 0])
                  * (boxes[order[1:], 3] - boxes[order[1:], 1]))
        iou = inter / np.maximum(area_i + area_o - inter, 1e-9)
        order = order[1:][iou <= iou_thresh]
    return keep


def decode_yolox(outputs: np.ndarray, ratio: float, input_size: int = 640,
                 score_thresh: float = 0.3):
    """Decode raw YOLOX head outputs (1, N, 85) -> person boxes xyxy."""
    strides = [8, 16, 32]
    grids, expanded = [], []
    for s in strides:
        n = input_size // s
        ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        grids.append(np.stack([xs, ys], -1).reshape(-1, 2))
        expanded.append(np.full((n * n, 1), s, np.float32))
    grid = np.concatenate(grids, 0).astype(np.float32)
    stride = np.concatenate(expanded, 0)

    preds = outputs[0].astype(np.float32)
    xy = (preds[:, :2] + grid) * stride
    wh = np.exp(preds[:, 2:4]) * stride
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
    scores = preds[:, 4] * preds[:, 5]          # objectness * person prob
    mask = scores > score_thresh
    boxes, scores = boxes[mask] / ratio, scores[mask]
    if len(boxes) == 0:
        return boxes, scores
    keep = _nms(boxes, scores)
    return boxes[keep], scores[keep]


def _bbox_to_center_scale(box, aspect: float = 288 / 384, padding=1.25):
    x1, y1, x2, y2 = box
    w, h = x2 - x1, y2 - y1
    cx, cy = x1 + w / 2, y1 + h / 2
    if w > aspect * h:
        h = w / aspect
    else:
        w = h * aspect
    return np.array([cx, cy]), np.array([w, h]) * padding


def _pose_crop(image_rgb: np.ndarray, box):
    """Expanded-box affine crop to the 288x384 top-down input."""
    import cv2
    center, scale = _bbox_to_center_scale(box)
    w, h = 288, 384
    src = np.array([center - scale / 2,
                    center + np.array([scale[0], -scale[1]]) / 2,
                    center + scale / 2], np.float32)
    dst = np.array([[0, 0], [w, 0], [w, h]], np.float32)
    mat = cv2.getAffineTransform(src, dst)
    return cv2.warpAffine(image_rgb, mat, (w, h)), mat


def _simcc_to_image(simcc_x: np.ndarray, simcc_y: np.ndarray, mat):
    """SimCC argmax / split-ratio decode + inverse-affine to image coords.
    simcc_x: (K, Wbins), simcc_y: (K, Hbins)."""
    import cv2
    kx = simcc_x.argmax(-1) / 2.0
    ky = simcc_y.argmax(-1) / 2.0
    scores = np.minimum(simcc_x.max(-1), simcc_y.max(-1))
    pts = np.stack([kx, ky], -1)
    inv = cv2.invertAffineTransform(np.asarray(mat))
    pts = pts @ inv[:, :2].T + inv[:, 2]
    return pts, scores


class DWposeDetector:
    """Reference-compatible facade: detector(image) -> skeleton render +
    keypoints (dwpose/__init__.py:33-43)."""

    det_size = 640          # YOLOX letterbox edge (wholebody protocol)

    def __init__(self, det_onnx: str, pose_onnx: str,
                 providers: Optional[List[str]] = None):
        ort = _require_ort()
        providers = providers or ["CPUExecutionProvider"]
        self.det = ort.InferenceSession(det_onnx, providers=providers)
        self.pose = ort.InferenceSession(pose_onnx, providers=providers)

    def detect_persons(self, image_rgb: np.ndarray):
        import cv2
        bgr = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR)
        inp, ratio = _letterbox(bgr, self.det_size)
        blob = inp.transpose(2, 0, 1)[None].astype(np.float32)
        out = self.det.run(None, {self.det.get_inputs()[0].name: blob})[0]
        return decode_yolox(out, ratio, input_size=self.det_size)

    def estimate_pose(self, image_rgb: np.ndarray, box):
        crop, mat = _pose_crop(image_rgb, box)
        blob = crop.transpose(2, 0, 1)[None].astype(np.float32)
        simcc_x, simcc_y = self.pose.run(
            None, {self.pose.get_inputs()[0].name: blob})[:2]
        return _simcc_to_image(simcc_x[0], simcc_y[0], mat)

    def __call__(self, image_rgb: np.ndarray,
                 render_size: Optional[Tuple[int, int]] = None):
        """image_rgb: (H, W, 3) uint8. Returns (skeleton_render,
        openpose_kpts (N, 18, 2) normalized, scores (N, 18)). The render
        includes the 21-point hand skeletons like the reference's
        draw_pose (dwpose/__init__.py:19-31: body + hands, face
        disabled); low-score hand points are masked to -1
        (un_visible, dwpose/__init__.py:67-68)."""
        h, w = image_rgb.shape[:2]
        boxes, _ = self.detect_persons(image_rgb)
        all_k, all_s, hands = [], [], []
        for box in boxes:
            pts, scores = self.estimate_pose(image_rgb, box)
            all_k.append(pts[:17])
            all_s.append(scores[:17])
            # COCO-wholebody 133 layout: 91:112 left hand, 112:133 right
            norm = pts / np.array([w, h], np.float32)
            for lo, hi in ((91, 112), (112, 133)):
                if pts.shape[0] >= hi:
                    hk = norm[lo:hi].copy()
                    hk[scores[lo:hi] < 0.3] = -1.0
                    hands.append(hk)
        if not all_k:
            kpts = np.zeros((0, 18, 2), np.float32)
            scores18 = np.zeros((0, 18), np.float32)
        else:
            k = np.stack(all_k) / np.array([w, h], np.float32)
            kpts, scores18 = coco_to_openpose(k, np.stack(all_s))
        rh, rw = render_size or (h, w)
        render = render_pose(kpts, rh, rw, visible=scores18 > 0.3,
                             hands=hands)
        return render, kpts, scores18


class DWposeJAX(DWposeDetector):
    """DWPose with on-device JAX networks instead of onnxruntime.

    Runs the from-scratch YOLOX-l / RTMPose-l implementations
    (pcdms_tpu/pose/detectors/{yolox,rtmpose}.py) under jit, sharing this
    module's protocol code (letterbox, NMS, SimCC decode, COCO->OpenPose
    remap) with the ONNX path. Weights come from the mm checkpoints the
    reference downloads (wholebody.py:37-49) via ``from_torch``.
    """

    def __init__(self, det_params, pose_params, det_size: int = 640):
        import jax as _jax
        self.det_size = det_size
        from pcdms_tpu.pose.detectors.rtmpose import rtmpose_apply
        from pcdms_tpu.pose.detectors.yolox import yolox_apply
        self.det_params = det_params
        self.pose_params = pose_params
        self._det = _jax.jit(yolox_apply)
        self._pose = _jax.jit(rtmpose_apply)

    @classmethod
    def from_torch(cls, det_ckpt: str, pose_ckpt: str) -> "DWposeJAX":
        from pcdms_tpu.pose.detectors.common import load_torch_state_dict
        from pcdms_tpu.pose.detectors.rtmpose import convert_rtmpose
        from pcdms_tpu.pose.detectors.yolox import convert_yolox
        return cls(convert_yolox(load_torch_state_dict(det_ckpt)),
                   convert_rtmpose(load_torch_state_dict(pose_ckpt)))

    def detect_persons(self, image_rgb: np.ndarray):
        import cv2
        import jax.numpy as jnp
        bgr = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR)
        inp, ratio = _letterbox(bgr, self.det_size)
        out = np.asarray(self._det(self.det_params,
                                   jnp.asarray(inp, jnp.float32)[None]))
        return decode_yolox(out, ratio, input_size=self.det_size)

    def estimate_pose(self, image_rgb: np.ndarray, box):
        import jax.numpy as jnp
        crop, mat = _pose_crop(image_rgb, box)
        simcc_x, simcc_y = self._pose(self.pose_params,
                                      jnp.asarray(crop, jnp.float32)[None])
        return _simcc_to_image(np.asarray(simcc_x[0]),
                               np.asarray(simcc_y[0]), mat)
