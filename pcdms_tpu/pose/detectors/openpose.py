"""OpenPose detector family (CMU body/hand/face CPM networks).

Behavioral equivalent of /root/reference/src/controlnet_aux/open_pose/:
  * body:  VGG-19 stem + 6 refinement stages with two branches — 38-ch
    part-affinity fields (L1) and 19-ch keypoint heatmaps (L2)
    (model.py:24-141), decoded by peak-picking + PAF line integrals +
    greedy bipartite growth into per-person subsets (body.py:42-227).
  * hand:  single-branch 22-ch CPM (model.py:143-216) decoded by
    connected-component peak picking (hand.py:22-80).
  * face:  VGG stem + 6 cascaded 71-ch heatmap stages (face.py:12-276)
    decoded by thresholded argmax per landmark (face.py:349-363).

The networks run as JAX NHWC pytrees (jitted); all decode logic is
host-side numpy (scipy.ndimage for the gaussian blur / connected
components — skimage is not present in this environment). Input
protocol: BGR, /256 - 0.5, multi-scale with stride-8 right/down padding
at value 128 (body.py:44-60).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.nn.layers import conv2d_init
from pcdms_tpu.pose.detectors.common import (
    conv, hwc3, max_pool_2x2, resize_to_64, shape_to_64, t2j_conv,
)

# ---------------------------------------------------------------------------
# table-driven conv stacks (name, in, out, ksize); pools are explicit
# ---------------------------------------------------------------------------

_BODY_STEM = [
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), ("pool",),
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), ("pool",),
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3), ("pool",),
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3_CPM", 512, 256, 3), ("conv4_4_CPM", 256, 128, 3),
]


def _body_stage1(branch: str, out_ch: int):
    return [(f"conv5_{i}_CPM_{branch}", 128, 128, 3) for i in (1, 2, 3)] + [
        (f"conv5_4_CPM_{branch}", 128, 512, 1),
        (f"conv5_5_CPM_{branch}", 512, out_ch, 1),
    ]


def _body_stageN(n: int, branch: str, out_ch: int):
    return ([(f"Mconv1_stage{n}_{branch}", 185, 128, 7)]
            + [(f"Mconv{i}_stage{n}_{branch}", 128, 128, 7)
               for i in (2, 3, 4, 5)]
            + [(f"Mconv6_stage{n}_{branch}", 128, 128, 1),
               (f"Mconv7_stage{n}_{branch}", 128, out_ch, 1)])


def _stack_init(key, table, dtype):
    params = {}
    for i, row in enumerate(table):
        if row[0] == "pool":
            continue
        name, cin, cout, k = row
        params[name] = conv2d_init(jax.random.fold_in(key, i), cin, cout, k,
                                   dtype=dtype)
    return params


def _stack_apply(params, table, x, final_relu: bool):
    """Sequential conv(+relu) stack; the last conv of every branch head
    (conv5_5/Mconv7/conv6_2) has no relu (model.py no_relu_layers)."""
    convs = [r for r in table if r[0] != "pool"]
    for row in table:
        if row[0] == "pool":
            x = max_pool_2x2(x)
            continue
        name, _, _, k = row
        p = params[name]
        x = conv(x, p["kernel"], p["bias"], padding=(k - 1) // 2)
        if final_relu or row is not convs[-1]:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# body network
# ---------------------------------------------------------------------------

def body_init(key, dtype=jnp.float32) -> Dict:
    params = {"model0": _stack_init(jax.random.fold_in(key, 0), _BODY_STEM,
                                    dtype)}
    for n in range(1, 7):
        for bi, (branch, out_ch) in enumerate((("L1", 38), ("L2", 19))):
            table = (_body_stage1(branch, out_ch) if n == 1
                     else _body_stageN(n, branch, out_ch))
            params[f"model{n}_{bi + 1}"] = _stack_init(
                jax.random.fold_in(key, 10 * n + bi), table, dtype)
    return params


def body_apply(params: Dict, x):
    """x: (N, H, W, 3) BGR in [-0.5, 0.5] -> (paf (N,H/8,W/8,38),
    heatmap (N,H/8,W/8,19)) — stage-6 outputs.

    Quirk preserved: the reference's no_relu_layers list names
    'Mconv7_stage6_L1' twice and never 'Mconv7_stage6_L2'
    (open_pose/model.py:28-32), so the FINAL heatmap branch output IS
    relu'd while every other branch head is linear. The released weights
    were trained/exported with that graph, so we reproduce it.
    """
    feat = _stack_apply(params["model0"], _BODY_STEM, x, final_relu=True)
    out1 = _stack_apply(params["model1_1"], _body_stage1("L1", 38), feat,
                        final_relu=False)
    out2 = _stack_apply(params["model1_2"], _body_stage1("L2", 19), feat,
                        final_relu=False)
    for n in range(2, 7):
        h = jnp.concatenate([out1, out2, feat], axis=-1)
        out1 = _stack_apply(params[f"model{n}_1"], _body_stageN(n, "L1", 38),
                            h, final_relu=False)
        out2 = _stack_apply(params[f"model{n}_2"], _body_stageN(n, "L2", 19),
                            h, final_relu=(n == 6))
    return out1, out2


# ---------------------------------------------------------------------------
# hand network
# ---------------------------------------------------------------------------

_HAND_STEM = [
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), ("pool",),
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), ("pool",),
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3), ("pool",),
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3", 512, 512, 3), ("conv4_4", 512, 512, 3),
    ("conv5_1", 512, 512, 3), ("conv5_2", 512, 512, 3),
    ("conv5_3_CPM", 512, 128, 3),
]
_HAND_HEAD = [("conv6_1_CPM", 128, 512, 1), ("conv6_2_CPM", 512, 22, 1)]


def _hand_stageN(n: int):
    return ([(f"Mconv1_stage{n}", 150, 128, 7)]
            + [(f"Mconv{i}_stage{n}", 128, 128, 7) for i in (2, 3, 4, 5)]
            + [(f"Mconv6_stage{n}", 128, 128, 1),
               (f"Mconv7_stage{n}", 128, 22, 1)])


def hand_init(key, dtype=jnp.float32) -> Dict:
    params = {
        "model1_0": _stack_init(jax.random.fold_in(key, 0), _HAND_STEM,
                                dtype),
        "model1_1": _stack_init(jax.random.fold_in(key, 1), _HAND_HEAD,
                                dtype),
    }
    for n in range(2, 7):
        params[f"model{n}"] = _stack_init(jax.random.fold_in(key, n),
                                          _hand_stageN(n), dtype)
    return params


def hand_apply(params: Dict, x):
    """x: (N, H, W, 3) BGR in [-0.5, 0.5] -> (N, H/8, W/8, 22) heatmaps."""
    feat = _stack_apply(params["model1_0"], _HAND_STEM, x, final_relu=True)
    out = _stack_apply(params["model1_1"], _HAND_HEAD, feat,
                       final_relu=False)
    for n in range(2, 7):
        h = jnp.concatenate([out, feat], axis=-1)
        out = _stack_apply(params[f"model{n}"], _hand_stageN(n), h,
                           final_relu=False)
    return out


# ---------------------------------------------------------------------------
# face network
# ---------------------------------------------------------------------------

_FACE_STEM = [
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), ("pool",),
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), ("pool",),
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3), ("pool",),
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3", 512, 512, 3), ("conv4_4", 512, 512, 3),
    ("conv5_1", 512, 512, 3), ("conv5_2", 512, 512, 3),
    ("conv5_3_CPM", 512, 128, 3),
]
_FACE_HEAD = [("conv6_1_CPM", 128, 512, 1), ("conv6_2_CPM", 512, 71, 1)]


def _face_stageN(n: int):
    return ([(f"Mconv1_stage{n}", 199, 128, 7)]
            + [(f"Mconv{i}_stage{n}", 128, 128, 7) for i in (2, 3, 4, 5)]
            + [(f"Mconv6_stage{n}", 128, 128, 1),
               (f"Mconv7_stage{n}", 128, 71, 1)])


def face_init(key, dtype=jnp.float32) -> Dict:
    params = {"stem": _stack_init(jax.random.fold_in(key, 0), _FACE_STEM,
                                  dtype),
              "head": _stack_init(jax.random.fold_in(key, 1), _FACE_HEAD,
                                  dtype)}
    for n in range(2, 7):
        params[f"stage{n}"] = _stack_init(jax.random.fold_in(key, n),
                                          _face_stageN(n), dtype)
    return params


def face_apply(params: Dict, x):
    """x: (N, H, W, 3) BGR in [-0.5, 0.5] -> (N, H/8, W/8, 71) final-stage
    heatmaps (face.py returns all stages; only the last is consumed)."""
    feat = _stack_apply(params["stem"], _FACE_STEM, x, final_relu=True)
    out = _stack_apply(params["head"], _FACE_HEAD, feat, final_relu=False)
    for n in range(2, 7):
        h = jnp.concatenate([out, feat], axis=-1)
        out = _stack_apply(params[f"stage{n}"], _face_stageN(n), h,
                           final_relu=False)
    return out


# ---------------------------------------------------------------------------
# torch conversion (flat attribute-named modules)
# ---------------------------------------------------------------------------

def _convert_stacks(sd: Dict[str, np.ndarray], layout) -> Dict:
    """layout: {param_group: (torch_module_name, table)}."""
    params: Dict = {}
    for group, (mod, table) in layout.items():
        g = {}
        for row in table:
            if row[0] == "pool":
                continue
            name = row[0]
            g[name] = {
                "kernel": jnp.asarray(t2j_conv(sd[f"{mod}.{name}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{mod}.{name}.bias"])),
            }
        params[group] = g
    return params


def convert_body(sd: Dict[str, np.ndarray]) -> Dict:
    layout = {"model0": ("model0", _BODY_STEM)}
    for n in range(1, 7):
        for bi, (branch, out_ch) in enumerate((("L1", 38), ("L2", 19))):
            table = (_body_stage1(branch, out_ch) if n == 1
                     else _body_stageN(n, branch, out_ch))
            layout[f"model{n}_{bi + 1}"] = (f"model{n}_{bi + 1}", table)
    return _convert_stacks(sd, layout)


def convert_hand(sd: Dict[str, np.ndarray]) -> Dict:
    layout = {"model1_0": ("model1_0", _HAND_STEM),
              "model1_1": ("model1_1", _HAND_HEAD)}
    for n in range(2, 7):
        layout[f"model{n}"] = (f"model{n}", _hand_stageN(n))
    return _convert_stacks(sd, layout)


def convert_face(sd: Dict[str, np.ndarray]) -> Dict:
    """FaceNet names its convs as direct attributes (no submodule)."""
    layout = {"stem": ("", _FACE_STEM), "head": ("", _FACE_HEAD)}
    for n in range(2, 7):
        layout[f"stage{n}"] = ("", _face_stageN(n))
    params: Dict = {}
    for group, (_, table) in layout.items():
        g = {}
        for row in table:
            if row[0] == "pool":
                continue
            name = row[0]
            g[name] = {
                "kernel": jnp.asarray(t2j_conv(sd[f"{name}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
            }
        params[group] = g
    return params


# ---------------------------------------------------------------------------
# host-side image protocol (open_pose/util.py:11-60)
# ---------------------------------------------------------------------------

def smart_resize(x: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """AREA-down / LANCZOS4-up resize; >3-channel maps go per-channel
    (util.py:smart_resize)."""
    import cv2
    ht, wt = int(hw[0]), int(hw[1])
    co = 1 if x.ndim == 2 else x.shape[2]
    if co in (1, 3):
        k = float(ht + wt) / float(sum(x.shape[:2]))
        interp = cv2.INTER_AREA if k < 1 else cv2.INTER_LANCZOS4
        return cv2.resize(x, (wt, ht), interpolation=interp)
    return np.stack([smart_resize(x[:, :, i], hw) for i in range(co)],
                    axis=2)


def smart_resize_k(x: np.ndarray, fx: float, fy: float) -> np.ndarray:
    h = x.shape[0] * fy
    w = x.shape[1] * fx
    return smart_resize(x, (int(h), int(w)))


def pad_right_down(img: np.ndarray, stride: int = 8,
                   value: int = 128) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Pad H/W up to multiples of ``stride`` on the bottom/right with a
    constant (util.py:padRightDownCorner)."""
    h, w = img.shape[:2]
    pd = 0 if h % stride == 0 else stride - h % stride
    pr = 0 if w % stride == 0 else stride - w % stride
    out = np.pad(img, ((0, pd), (0, pr), (0, 0)), mode="constant",
                 constant_values=value)
    return out, (pd, pr)


def bilinear_align_corners(x: np.ndarray, h: int, w: int) -> np.ndarray:
    """F.interpolate(mode='bilinear', align_corners=True) on (H, W, C)
    numpy — the face heatmap upsample (face.py:342-346) uses corner-
    aligned sampling, which cv2/jax half-pixel resize does not match."""
    hs, ws = x.shape[:2]
    ys = np.linspace(0.0, hs - 1.0, h, dtype=np.float64)
    xs = np.linspace(0.0, ws - 1.0, w, dtype=np.float64)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, hs - 1)
    x1 = np.minimum(x0 + 1, ws - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    a = x[y0][:, x0]
    b = x[y0][:, x1]
    c = x[y1][:, x0]
    d = x[y1][:, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx).astype(x.dtype)


# ---------------------------------------------------------------------------
# detector wrapper (open_pose/__init__.py:70-237)
# ---------------------------------------------------------------------------

class OpenposeDetector:
    """Body(+hand+face) pose detector with the reference call protocol.

    Mirrors /root/reference/src/controlnet_aux/open_pose/__init__.py:
    ``__call__(image, detect_resolution, image_resolution, include_body,
    include_hand, include_face)`` -> rendered skeleton image. The decode
    constants (boxsize 368, stride 8, pad 128, thresholds 0.1/0.05) follow
    body.py:345-355 / hand.py:25-29 / face.py:88-93.
    """

    BOXSIZE = 368
    STRIDE = 8
    PAD_VALUE = 128

    def __init__(self, body_params: Dict,
                 hand_params: Optional[Dict] = None,
                 face_params: Optional[Dict] = None):
        self.body_params = body_params
        self.hand_params = hand_params
        self.face_params = face_params
        self._body = jax.jit(body_apply)
        self._hand = jax.jit(hand_apply)
        self._face = jax.jit(face_apply)

    @classmethod
    def from_pretrained(cls, body_path: str,
                        hand_path: Optional[str] = None,
                        face_path: Optional[str] = None) -> "OpenposeDetector":
        from pcdms_tpu.pose.detectors.common import load_torch_state_dict
        body = convert_body(load_torch_state_dict(body_path))
        hand = (convert_hand(load_torch_state_dict(hand_path))
                if hand_path else None)
        face = (convert_face(load_torch_state_dict(face_path))
                if face_path else None)
        return cls(body, hand, face)

    # -- body ---------------------------------------------------------------

    def estimate_body(self, bgr: np.ndarray,
                      scale_search=(0.5,)):
        """Multi-scale body forward + decode (body.py:42-105). Returns
        (candidate, subset) in pixel coords of ``bgr``. With the default
        single 0.5 scale the plain mean below equals the reference's
        accumulate expression exactly (0 += 0 + h/1)."""
        h, w = bgr.shape[:2]
        heat_avg = np.zeros((h, w, 19), np.float64)
        paf_avg = np.zeros((h, w, 38), np.float64)
        for s in scale_search:
            scale = s * self.BOXSIZE / h
            resized = smart_resize_k(bgr, scale, scale)
            padded, (pd, pr) = pad_right_down(resized, self.STRIDE,
                                              self.PAD_VALUE)
            x = jnp.asarray(padded, jnp.float32)[None] / 256.0 - 0.5
            paf, heat = self._body(self.body_params, x)
            paf = np.asarray(paf[0], np.float32)
            heat = np.asarray(heat[0], np.float32)
            ph, pw = padded.shape[:2]
            heat = smart_resize_k(heat, float(self.STRIDE),
                                  float(self.STRIDE))[:ph - pd, :pw - pr]
            heat = smart_resize(heat, (h, w))
            paf = smart_resize_k(paf, float(self.STRIDE),
                                 float(self.STRIDE))[:ph - pd, :pw - pr]
            paf = smart_resize(paf, (h, w))
            heat_avg += heat / len(scale_search)
            paf_avg += paf / len(scale_search)
        from pcdms_tpu.pose.detectors.openpose_decode import (
            assemble_people, find_peaks, people_from_subset,
        )
        peaks = find_peaks(heat_avg, thresh=0.1)
        candidate, subset = assemble_people(peaks, paf_avg, h)
        return people_from_subset(candidate, subset)

    # -- hands / face (crop protocols: hand.py:22-80, face.py:327-346) ------

    def estimate_hand(self, crop_bgr: np.ndarray,
                      scale_search=(0.5, 1.0, 1.5, 2.0)) -> np.ndarray:
        """(21, 2) peak pixel coords in the crop, [0, 0] = missing."""
        import cv2
        from pcdms_tpu.pose.detectors.openpose_decode import (
            hand_peaks_from_heatmaps,
        )
        hr, wr = crop_bgr.shape[:2]
        wsize = 128
        avg = np.zeros((wsize, wsize, 22), np.float64)
        blurred = cv2.GaussianBlur(crop_bgr, (0, 0), 0.8)
        for s in scale_search:
            size = int(s * self.BOXSIZE)
            resized = smart_resize(blurred, (size, size))
            padded, (pd, pr) = pad_right_down(resized, self.STRIDE,
                                              self.PAD_VALUE)
            x = jnp.asarray(padded, jnp.float32)[None] / 256.0 - 0.5
            heat = np.asarray(self._hand(self.hand_params, x)[0], np.float32)
            ph, pw = padded.shape[:2]
            heat = smart_resize_k(heat, float(self.STRIDE),
                                  float(self.STRIDE))[:ph - pd, :pw - pr]
            avg += smart_resize(heat, (wsize, wsize)) / len(scale_search)
        peaks = hand_peaks_from_heatmaps(avg, thresh=0.05).astype(np.float64)
        # scale from the 128x128 decode grid back to crop pixels with the
        # reference's int() truncation (hand.py:75-77)
        out = np.zeros_like(peaks)
        out[:, 0] = np.floor(peaks[:, 0] * wr / wsize)
        out[:, 1] = np.floor(peaks[:, 1] * hr / wsize)
        return out

    def estimate_face(self, crop_bgr: np.ndarray) -> np.ndarray:
        """(N<=70, 2) landmark pixel coords in the crop."""
        from pcdms_tpu.pose.detectors.openpose_decode import (
            face_peaks_from_heatmaps,
        )
        hr, wr = crop_bgr.shape[:2]
        resized = smart_resize(crop_bgr, (384, 384))
        x = jnp.asarray(resized, jnp.float32)[None] / 256.0 - 0.5
        heat = np.asarray(self._face(self.face_params, x)[0], np.float32)
        heat = bilinear_align_corners(heat, hr, wr)
        return face_peaks_from_heatmaps(heat, thresh=0.05)

    # -- full pipeline --------------------------------------------------------

    def detect_poses(self, rgb: np.ndarray, include_hand: bool = False,
                     include_face: bool = False):
        """List[Person] with normalized coordinates (missing = -1), plus
        normalized hand/face landmark arrays when requested."""
        from pcdms_tpu.pose.detectors.openpose_decode import (
            face_box, hand_boxes,
        )
        bgr = rgb[:, :, ::-1].copy()
        h, w = bgr.shape[:2]
        people = self.estimate_body(bgr)
        for person in people:
            if include_hand and self.hand_params is not None:
                for x0, y0, ww, is_left in hand_boxes(person, h, w):
                    peaks = self.estimate_hand(bgr[y0:y0 + ww, x0:x0 + ww])
                    peaks[:, 0] = np.where(peaks[:, 0] < 1e-6, -1,
                                           peaks[:, 0] + x0) / float(w)
                    peaks[:, 1] = np.where(peaks[:, 1] < 1e-6, -1,
                                           peaks[:, 1] + y0) / float(h)
                    if is_left:
                        person.left_hand = peaks
                    else:
                        person.right_hand = peaks
            if include_face and self.face_params is not None:
                box = face_box(person, h, w)
                if box is not None:
                    x0, y0, ww = box
                    peaks = self.estimate_face(bgr[y0:y0 + ww, x0:x0 + ww])
                    if peaks.size:
                        peaks[:, 0] = np.where(peaks[:, 0] < 1e-6, -1,
                                               peaks[:, 0] + x0) / float(w)
                        peaks[:, 1] = np.where(peaks[:, 1] < 1e-6, -1,
                                               peaks[:, 1] + y0) / float(h)
                        person.face = peaks
            # normalize the body joints last (crops above need pixels)
            kp = person.keypoints.copy()
            kp[:, 0] = np.where(kp[:, 0] < 0, -1, kp[:, 0] / float(w))
            kp[:, 1] = np.where(kp[:, 1] < 0, -1, kp[:, 1] / float(h))
            person.keypoints = kp
        return people

    def __call__(self, input_image, detect_resolution: int = 512,
                 image_resolution: int = 512, include_body: bool = True,
                 include_hand: bool = False, include_face: bool = False,
                 output_type: str = "np"):
        import cv2
        img = hwc3(np.asarray(input_image, np.uint8))
        img = resize_to_64(img, detect_resolution)
        h, w = img.shape[:2]

        people = self.detect_poses(img, include_hand, include_face)
        from pcdms_tpu.pose.skeleton import render_pose
        if people:
            kpts = np.stack([p.keypoints for p in people])
            vis = np.stack([p.visible for p in people])
            hands = [x for p in people
                     for x in (p.left_hand, p.right_hand) if x is not None]
            faces = [p.face for p in people if p.face is not None]
            canvas = render_pose(kpts, h, w, vis, hands=hands, faces=faces,
                                 draw_body=include_body)
        else:
            canvas = np.zeros((h, w, 3), np.uint8)

        out_hw = shape_to_64(*img.shape[:2], image_resolution)
        canvas = cv2.resize(canvas, (out_hw[1], out_hw[0]),
                            interpolation=cv2.INTER_LINEAR)
        if output_type == "pil":
            from PIL import Image
            return Image.fromarray(canvas)
        return canvas
