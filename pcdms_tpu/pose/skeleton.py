"""OpenPose skeleton rasterizer (host-side, cv2).

Pixel-compatible reimplementation of the drawing convention the stage-2
conditioning was trained on
(/root/reference/src/controlnet_aux/dwpose/util.py:66-145,
 /root/reference/src/controlnet_aux/dwpose/__init__.py:19-30):
limb ellipses (stickwidth 4) at 0.6 brightness, joint circles (radius 4)
at full brightness, 18-color wheel; optional 21-point hand skeletons with
HSV edge colors. Face drawing is disabled, as in the reference.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:                                   # pragma: no cover
    cv2 = None

EPS = 0.01
STICKWIDTH = 4

# limb pairs in 1-based OpenPose indexing (as in the original CMU code)
LIMB_SEQ = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18], [3, 17], [6, 18],
]

COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]

HAND_EDGES = [
    [0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [5, 6], [6, 7], [7, 8],
    [0, 9], [9, 10], [10, 11], [11, 12], [0, 13], [13, 14], [14, 15],
    [15, 16], [0, 17], [17, 18], [18, 19], [19, 20],
]


def _require_cv2():
    if cv2 is None:
        raise ImportError("skeleton rendering requires opencv (cv2)")


def draw_bodypose(canvas: np.ndarray, keypoints: np.ndarray,
                  visible: Optional[np.ndarray] = None) -> np.ndarray:
    """Draw OpenPose-18 skeletons.

    canvas: (H, W, 3) uint8 (modified copy is returned).
    keypoints: (N, 18, 2) normalized [0,1] (x, y) coordinates.
    visible: (N, 18) bool/float mask; joints with coords <= 0 and
      non-visible joints are skipped (matches the reference's -1 index
      convention for missing joints).
    """
    _require_cv2()
    h, w, _ = canvas.shape
    keypoints = np.asarray(keypoints, np.float32)
    if keypoints.ndim == 2:
        keypoints = keypoints[None]
    n = keypoints.shape[0]
    if visible is None:
        visible = (keypoints > EPS).all(axis=-1)
    visible = np.asarray(visible).astype(bool)

    # limbs: first 17 pairs only (as in the reference)
    for i in range(17):
        a, b = LIMB_SEQ[i][0] - 1, LIMB_SEQ[i][1] - 1
        for p in range(n):
            if not (visible[p, a] and visible[p, b]):
                continue
            y = keypoints[p, [a, b], 0] * w
            x = keypoints[p, [a, b], 1] * h
            m_x, m_y = x.mean(), y.mean()
            length = float(np.hypot(x[0] - x[1], y[0] - y[1]))
            angle = math.degrees(math.atan2(x[0] - x[1], y[0] - y[1]))
            poly = cv2.ellipse2Poly(
                (int(m_y), int(m_x)), (int(length / 2), STICKWIDTH),
                int(angle), 0, 360, 1)
            cv2.fillConvexPoly(canvas, poly, COLORS[i])

    canvas = (canvas * 0.6).astype(np.uint8)

    for i in range(18):
        for p in range(n):
            if not visible[p, i]:
                continue
            px = int(keypoints[p, i, 0] * w)
            py = int(keypoints[p, i, 1] * h)
            cv2.circle(canvas, (px, py), 4, COLORS[i], thickness=-1)
    return canvas


def draw_handpose(canvas: np.ndarray,
                  hands: Sequence[np.ndarray]) -> np.ndarray:
    """Draw 21-keypoint hand skeletons (normalized coords)."""
    _require_cv2()
    h, w, _ = canvas.shape
    n_edges = len(HAND_EDGES)
    for peaks in hands:
        peaks = np.asarray(peaks, np.float32)
        for ie, (a, b) in enumerate(HAND_EDGES):
            # the visibility check is on the SCALED INT pixel coords (so an
            # edge touching column/row 0 is skipped), and the color is the
            # unrounded float hsv->rgb*255 — both exactly as the drawing
            # code stage-2 was trained on (dwpose/util.py:115-133)
            x1, y1 = int(peaks[a, 0] * w), int(peaks[a, 1] * h)
            x2, y2 = int(peaks[b, 0] * w), int(peaks[b, 1] * h)
            if min(x1, y1, x2, y2) <= EPS:
                continue
            hue = ie / float(n_edges)
            rgb = _hsv_to_rgb(hue, 1.0, 1.0)
            cv2.line(canvas, (x1, y1), (x2, y2), rgb, thickness=1)
        for x, y in peaks:
            x, y = int(x * w), int(y * h)
            if x > EPS and y > EPS:
                cv2.circle(canvas, (x, y), 1, (0, 0, 255), thickness=-1)
    return canvas


def draw_facepose(canvas: np.ndarray,
                  faces: Sequence[np.ndarray]) -> np.ndarray:
    """Draw face landmarks as white dots, radius 3 (normalized coords;
    reference: open_pose/util.py:172-199 — the dwpose variant keeps this
    commented out, so render_pose only uses it for the openpose family)."""
    _require_cv2()
    h, w, _ = canvas.shape
    for peaks in faces:
        for x, y in np.asarray(peaks, np.float32):
            xi, yi = int(x * w), int(y * h)
            if xi > EPS and yi > EPS:
                cv2.circle(canvas, (xi, yi), 3, (255, 255, 255),
                           thickness=-1)
    return canvas


def _hsv_to_rgb(h, s, v):
    i = int(h * 6.0) % 6
    f = h * 6.0 - int(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    rgb = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v),
           (v, p, q)][i]
    return tuple(c * 255.0 for c in rgb)


def render_pose(keypoints: np.ndarray, height: int, width: int,
                visible: Optional[np.ndarray] = None,
                hands: Optional[Sequence[np.ndarray]] = None,
                faces: Optional[Sequence[np.ndarray]] = None,
                draw_body: bool = True) -> np.ndarray:
    """Render a skeleton image. keypoints: (N, 18, 2) or (18, 2) normalized.
    Returns (H, W, 3) uint8 RGB on black."""
    canvas = np.zeros((height, width, 3), np.uint8)
    if draw_body:
        canvas = draw_bodypose(canvas, keypoints, visible)
    if hands:
        canvas = draw_handpose(canvas, hands)
    if faces:
        canvas = draw_facepose(canvas, faces)
    return canvas
