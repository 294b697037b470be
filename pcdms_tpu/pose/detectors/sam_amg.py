"""SAM automatic mask generation + detector facade (host side).

Behavioral equivalent of /root/reference/src/controlnet_aux/
segment_anything/{automatic_mask_generator.py, predictor.py, utils/
amg.py, utils/transforms.py, __init__.py}: longest-side-1024 PIL resize
+ pad preprocessing, a 32x32 point grid run through the jitted predict
step in batches of 64, filtering by predicted IoU (0.88) and stability
score (0.95 at +-1.0 logit offset), box NMS at 0.7 IoU, optional crop
layers, and the SamDetector facade that paints each kept mask a random
color (seeded np.random like the reference's show_anns).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.pose.detectors.common import hwc3, resize_to_64, shape_to_64
from pcdms_tpu.pose.detectors.sam import (
    SAM_CONFIGS, SamConfig, sam_encode_image, sam_predict_points,
)

_IMG_SIZE = 1024
_MASK_THRESHOLD = 0.0


def build_point_grid(n_per_side: int) -> np.ndarray:
    offset = 1 / (2 * n_per_side)
    one = np.linspace(offset, 1 - offset, n_per_side)
    xs = np.tile(one[None, :], (n_per_side, 1))
    ys = np.tile(one[:, None], (1, n_per_side))
    return np.stack([xs, ys], axis=-1).reshape(-1, 2)


def generate_crop_boxes(im_size, n_layers: int, overlap_ratio: float):
    crop_boxes, layer_idxs = [[0, 0, im_size[1], im_size[0]]], [0]
    im_h, im_w = im_size
    short_side = min(im_h, im_w)

    def crop_len(orig, n, overlap):
        return int(math.ceil((overlap * (n - 1) + orig) / n))

    for layer in range(n_layers):
        n_crops = 2 ** (layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_crops))
        cw = crop_len(im_w, n_crops, overlap)
        ch = crop_len(im_h, n_crops, overlap)
        x0s = [int((cw - overlap) * i) for i in range(n_crops)]
        y0s = [int((ch - overlap) * i) for i in range(n_crops)]
        for x0 in x0s:
            for y0 in y0s:
                crop_boxes.append([x0, y0, min(x0 + cw, im_w),
                                   min(y0 + ch, im_h)])
                layer_idxs.append(layer + 1)
    return crop_boxes, layer_idxs


def calculate_stability_score(masks: np.ndarray, thresh: float,
                              offset: float) -> np.ndarray:
    inter = (masks > (thresh + offset)).sum(axis=(-2, -1),
                                            dtype=np.int64)
    union = (masks > (thresh - offset)).sum(axis=(-2, -1),
                                            dtype=np.int64)
    return inter / np.maximum(union, 1)


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(N, H, W) bool -> (N, 4) xyxy with INCLUSIVE max-pixel edges
    (utils/amg.py computes edges as coordinate-grid max); all-zero masks
    get [0,0,0,0]."""
    n, h, w = masks.shape
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        ys, xs = np.nonzero(masks[i])
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return boxes


def box_nms(boxes: np.ndarray, scores: np.ndarray,
            iou_thresh: float) -> List[int]:
    order = np.argsort(-scores, kind="stable")
    keep: List[int] = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_r = ((boxes[rest, 2] - boxes[rest, 0])
               * (boxes[rest, 3] - boxes[rest, 1]))
        iou = inter / np.maximum(a_i + a_r - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return keep


def is_box_near_crop_edge(boxes, crop_box, orig_box,
                          atol: float = 20.0) -> np.ndarray:
    cb = np.asarray(crop_box, np.float32)
    ob = np.asarray(orig_box, np.float32)
    offset = np.array([crop_box[0], crop_box[1], crop_box[0], crop_box[1]],
                      np.float32)
    uncropped = boxes + offset
    near_crop = np.isclose(uncropped, cb[None], atol=atol, rtol=0)
    near_img = np.isclose(uncropped, ob[None], atol=atol, rtol=0)
    return np.any(near_crop & ~near_img, axis=1)


def _preprocess_shape(h: int, w: int,
                      long_side: int = _IMG_SIZE) -> Tuple[int, int]:
    scale = long_side / max(h, w)
    return (int(h * scale + 0.5), int(w * scale + 0.5))


class SamAutomaticMaskGenerator:
    """Grid-prompted whole-image mask generation over the JAX model."""

    def __init__(self, params: Dict, cfg: SamConfig,
                 points_per_side: int = 32, points_per_batch: int = 64,
                 pred_iou_thresh: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7,
                 crop_n_layers: int = 0, crop_nms_thresh: float = 0.7,
                 crop_overlap_ratio: float = 512 / 1500,
                 crop_n_points_downscale_factor: int = 1):
        self.params = params
        self.cfg = cfg
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.point_grids = [
            build_point_grid(
                int(points_per_side / crop_n_points_downscale_factor ** i))
            for i in range(crop_n_layers + 1)]
        self._encode = jax.jit(sam_encode_image, static_argnames=("cfg",))
        self._predict = jax.jit(sam_predict_points,
                                static_argnames=("input_size",))

    # -- predictor internals -------------------------------------------------

    def _set_image(self, image: np.ndarray):
        from PIL import Image
        size = self.cfg.img_size
        h, w = image.shape[:2]
        nh, nw = _preprocess_shape(h, w, size)
        resized = np.asarray(Image.fromarray(image).resize(
            (nw, nh), Image.BILINEAR))
        padded = np.zeros((size, size, 3), np.float32)
        padded[:nh, :nw] = resized
        self._embedding = self._encode(self.params,
                                       jnp.asarray(padded)[None],
                                       cfg=self.cfg)
        self._input_size = (nh, nw)
        self._orig_size = (h, w)

    def _predict_batch(self, points: np.ndarray):
        """points: (B, 2) image-frame pixel coords -> (masks logits
        (B, 3, H, W) at original size, iou (B, 3))."""
        import cv2
        h, w = self._orig_size
        nh, nw = self._input_size
        coords = points.astype(np.float32).copy()
        coords[:, 0] *= nw / w
        coords[:, 1] *= nh / h
        size = self.cfg.img_size
        low, iou = self._predict(
            self.params, self._embedding,
            jnp.asarray(coords)[:, None, :],
            jnp.asarray(np.ones((len(points), 1), np.float32)),
            input_size=size)
        low = np.asarray(low, np.float32)          # (B, 3, s/4, s/4)
        # postprocess_masks (modeling/sam.py:134-160): up to the model
        # input size, crop the pad, resize to original
        b, m = low.shape[:2]
        flat = low.reshape(b * m, *low.shape[2:])
        up = np.stack([cv2.resize(s, (size, size),
                                  interpolation=cv2.INTER_LINEAR)
                       for s in flat])
        up = up[:, :nh, :nw]
        out = np.stack([cv2.resize(s, (w, h),
                                   interpolation=cv2.INTER_LINEAR)
                        for s in up])
        return out.reshape(b, m, h, w), np.asarray(iou, np.float32)

    # -- generation ----------------------------------------------------------

    def _process_crop(self, image, crop_box, layer_idx, orig_size):
        x0, y0, x1, y1 = crop_box
        cropped = image[y0:y1, x0:x1]
        self._set_image(cropped)
        ch, cw = cropped.shape[:2]
        points_all = self.point_grids[layer_idx] * np.array([cw, ch])

        recs: List[Dict] = []
        for s in range(0, len(points_all), self.points_per_batch):
            pts = points_all[s:s + self.points_per_batch]
            masks, ious = self._predict_batch(pts)
            masks = masks.reshape(-1, ch, cw)
            ious = ious.reshape(-1)
            pts_rep = np.repeat(pts, 3, axis=0)

            keep = ious > self.pred_iou_thresh
            masks, ious, pts_rep = masks[keep], ious[keep], pts_rep[keep]
            stability = calculate_stability_score(
                masks, _MASK_THRESHOLD, self.stability_score_offset)
            keep = stability >= self.stability_score_thresh
            masks = masks[keep] > _MASK_THRESHOLD
            ious, pts_rep = ious[keep], pts_rep[keep]
            stability = stability[keep]

            boxes = batched_mask_to_box(masks)
            orig_h, orig_w = orig_size
            edge = is_box_near_crop_edge(boxes, crop_box,
                                         [0, 0, orig_w, orig_h])
            for i in np.nonzero(~edge)[0]:
                recs.append({"mask": masks[i], "iou": float(ious[i]),
                             "stability": float(stability[i]),
                             "box": boxes[i],
                             "point": pts_rep[i]})

        if not recs:
            return recs
        keep = box_nms(np.stack([r["box"] for r in recs]),
                       np.array([r["iou"] for r in recs]),
                       self.box_nms_thresh)
        recs = [recs[i] for i in keep]
        orig_h, orig_w = orig_size
        for r in recs:
            full = np.zeros((orig_h, orig_w), bool)
            full[y0:y1, x0:x1] = r["mask"]
            r["mask"] = full
            r["box"] = r["box"] + np.array([x0, y0, x0, y0], np.float32)
            r["point"] = r["point"] + np.array([x0, y0], np.float32)
            r["crop_box"] = list(crop_box)
        return recs

    def generate(self, image: np.ndarray) -> List[Dict]:
        orig_size = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio)
        recs: List[Dict] = []
        for box, layer in zip(crop_boxes, layer_idxs):
            recs.extend(self._process_crop(image, box, layer, orig_size))
        if len(crop_boxes) > 1 and recs:
            # prefer masks from smaller crops (amg scores 1/box_area)
            scores = np.array([1.0 / max(
                (r["crop_box"][2] - r["crop_box"][0])
                * (r["crop_box"][3] - r["crop_box"][1]), 1) for r in recs])
            keep = box_nms(np.stack([r["box"] for r in recs]), scores,
                           self.crop_nms_thresh)
            recs = [recs[i] for i in keep]
        anns = []
        for r in recs:
            x0, y0, x1, y1 = r["box"]
            anns.append({
                "segmentation": r["mask"],
                "area": int(r["mask"].sum()),
                "bbox": [float(x0), float(y0), float(x1 - x0),
                         float(y1 - y0)],
                "predicted_iou": r["iou"],
                "point_coords": [r["point"].tolist()],
                "stability_score": r["stability"],
                "crop_box": r.get("crop_box", [0, 0, orig_size[1],
                                               orig_size[0]]),
            })
        return anns


class SamDetector:
    """controlnet-aux SamDetector facade: colored segment map."""

    def __init__(self, params: Dict, cfg: SamConfig = SAM_CONFIGS["vit_h"],
                 **amg_kwargs):
        self.mask_generator = SamAutomaticMaskGenerator(params, cfg,
                                                        **amg_kwargs)

    @classmethod
    def from_pretrained(cls, weights_path: str,
                        **amg_kwargs) -> "SamDetector":
        import torch
        from pcdms_tpu.pose.detectors.sam import convert_sam
        sd = torch.load(weights_path, map_location="cpu",
                        weights_only=False)
        sd = {k: v.detach().numpy() for k, v in sd.items()}
        params, cfg = convert_sam(sd)
        return cls(params, cfg, **amg_kwargs)

    def show_anns(self, anns: List[Dict]) -> Optional[np.ndarray]:
        if len(anns) == 0:
            return None
        anns = sorted(anns, key=lambda a: a["area"], reverse=True)
        h, w = anns[0]["segmentation"].shape
        canvas = np.zeros((h, w, 3), np.uint8)
        for ann in anns:
            color = np.random.randint(255, size=3, dtype=np.uint8)
            canvas[ann["segmentation"]] = color
        return canvas

    def __call__(self, input_image, detect_resolution: int = 512,
                 image_resolution: int = 512):
        import cv2
        img = hwc3(np.asarray(input_image, np.uint8))
        img = resize_to_64(img, detect_resolution)
        anns = self.mask_generator.generate(img)
        canvas = self.show_anns(anns)
        if canvas is None:
            canvas = np.zeros_like(img)
        detected = hwc3(canvas)
        out_hw = shape_to_64(*img.shape[:2], image_resolution)
        return cv2.resize(detected, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_LINEAR)
