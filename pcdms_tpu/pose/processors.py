"""Auxiliary condition processors (controlnet-aux ``Processor`` facade).

The reference vendors controlnet-aux 0.0.6 (25 detector types,
/root/reference/src/controlnet_aux/processor.py:33-60), of which PCDMs
itself only uses DWPose. This module provides the same facade surface:

  * non-NN detectors implemented natively: canny, shuffle (content
    shuffle), scribble/threshold utilities, resize
  * ``dwpose`` routed to pcdms_tpu.pose.dwpose (ONNX host path, or the
    JAX YOLOX+RTMPose pair via params={'det_torch': ..., 'pose_torch':
    ...})
  * NN detectors with JAX-native models (hed, pidinet, lineart(+anime),
    mlsd, openpose family, midas depth/normal, leres(+boost), normalbae,
    zoe, sam) run once their torch checkpoint is supplied via
    params={'weights': ...}
  * ``mediapipe_face`` passes through to the external mediapipe
    package when it is importable (exactly as the reference wraps the
    same pip dependency), and raises a clear NotImplementedError
    otherwise — this image has no network egress, and PCDMs' own
    pipelines never call it.

API parity: Processor(processor_id)(image, to_pil=True).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
from PIL import Image

_NN_DETECTORS = (
    "hed", "hed_safe", "midas", "depth_midas", "depth_zoe", "depth_leres",
    "depth_leres++", "normal_bae", "normal_midas", "lineart_anime",
    "lineart_coarse", "lineart_realistic", "mlsd", "openpose",
    "openpose_face", "openpose_faceonly", "openpose_full", "openpose_hand",
    "scribble_hed", "scribble_pidinet", "softedge_hed", "softedge_hedsafe",
    "softedge_pidinet", "softedge_pidsafe", "mediapipe_face", "sam",
)

# detectors with JAX-native architectures + converters in
# pcdms_tpu/pose/detectors/ — runnable once their torch checkpoint is
# supplied via params={'weights': ...}
_IMPLEMENTED_NN = (
    "hed", "hed_safe", "scribble_hed", "softedge_hed", "softedge_hedsafe",
    "scribble_pidinet", "softedge_pidinet", "softedge_pidsafe",
    "lineart_realistic", "lineart_coarse", "lineart_anime", "mlsd",
    "openpose", "openpose_face", "openpose_faceonly", "openpose_full",
    "openpose_hand", "midas", "depth_midas", "normal_midas",
    "depth_leres", "depth_leres++", "normal_bae", "depth_zoe", "sam",
)

# controlnet-aux processor.py:59-63 include-flag table
_OPENPOSE_FLAGS = {
    "openpose": (True, False, False),
    "openpose_face": (True, False, True),
    "openpose_faceonly": (False, False, True),
    "openpose_full": (True, True, True),
    "openpose_hand": (False, True, False),
}


def _to_np(img) -> np.ndarray:
    if isinstance(img, Image.Image):
        return np.asarray(img.convert("RGB"))
    return np.asarray(img)


def canny(img, low_threshold: int = 100, high_threshold: int = 200):
    import cv2
    arr = _to_np(img)
    edges = cv2.Canny(arr, low_threshold, high_threshold)
    return np.stack([edges] * 3, axis=-1)


def shuffle(img, seed: int = 0, grid: int = 8):
    """Content shuffle: coarse flow-field warp destroying layout while
    keeping color statistics (controlnet-aux ShuffleDetector equivalent)."""
    import cv2
    arr = _to_np(img)
    h, w = arr.shape[:2]
    rng = np.random.default_rng(seed)
    flow = rng.normal(size=(grid, grid, 2)).astype(np.float32)
    flow = cv2.resize(flow, (w, h), interpolation=cv2.INTER_CUBIC)
    flow *= np.array([w, h], np.float32) / grid
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    map_x = np.clip(xs + flow[..., 0], 0, w - 1)
    map_y = np.clip(ys + flow[..., 1], 0, h - 1)
    return cv2.remap(arr, map_x, map_y, cv2.INTER_LINEAR)


def scribble_from_edges(img, low_threshold: int = 100,
                        high_threshold: int = 200, dilate: int = 2):
    """Binary scribble map from canny edges (threshold-based stand-in)."""
    import cv2
    edges = canny(img, low_threshold, high_threshold)[..., 0]
    if dilate > 0:
        kernel = np.ones((dilate * 2 + 1,) * 2, np.uint8)
        edges = cv2.dilate(edges, kernel)
    return np.stack([edges] * 3, axis=-1)


def mediapipe_face(img, max_faces: int = 1,
                   min_confidence: float = 0.5):
    """Face landmark annotation via the external ``mediapipe`` package
    (the reference wraps the same pip dependency —
    /root/reference/src/controlnet_aux/mediapipe_face/mediapipe_face_common.py:1-10):
    run FaceMesh on the image and rasterize the detected landmark mesh
    (contours emphasized) onto a black canvas of the same size.

    Only available when ``mediapipe`` is importable; the Processor
    facade gates on that at construction time.
    """
    import mediapipe as mp

    arr = _to_np(img)
    h, w = arr.shape[:2]
    canvas = np.zeros((h, w, 3), np.uint8)
    face_mesh = mp.solutions.face_mesh
    draw = mp.solutions.drawing_utils
    # ControlNet-style annotation: dim tesselation mesh + bright contours
    mesh_spec = draw.DrawingSpec(color=(10, 200, 10), thickness=1,
                                 circle_radius=1)
    contour_spec = draw.DrawingSpec(color=(10, 10, 200), thickness=2,
                                    circle_radius=1)
    with face_mesh.FaceMesh(
            static_image_mode=True, max_num_faces=max_faces,
            refine_landmarks=True,
            min_detection_confidence=min_confidence) as fm:
        results = fm.process(arr)
    if results.multi_face_landmarks:
        for landmarks in results.multi_face_landmarks:
            draw.draw_landmarks(
                canvas, landmarks,
                connections=face_mesh.FACEMESH_TESSELATION,
                landmark_drawing_spec=None,
                connection_drawing_spec=mesh_spec)
            draw.draw_landmarks(
                canvas, landmarks,
                connections=face_mesh.FACEMESH_CONTOURS,
                landmark_drawing_spec=None,
                connection_drawing_spec=contour_spec)
    return canvas


class Processor:
    """controlnet-aux ``Processor``-compatible facade."""

    def __init__(self, processor_id: str, params: Optional[Dict] = None):
        self.processor_id = processor_id
        self.params = params or {}
        self._fn = self._resolve(processor_id)

    def _resolve(self, pid: str) -> Callable:
        if pid == "canny":
            return canny
        if pid == "shuffle":
            return shuffle
        if pid == "scribble":
            return scribble_from_edges
        if pid in ("dwpose", "dwpose_body"):
            if "det_torch" in self.params:
                # on-device JAX YOLOX-l + RTMPose-l from mm checkpoints
                from pcdms_tpu.pose.dwpose import DWposeJAX
                det = DWposeJAX.from_torch(self.params["det_torch"],
                                           self.params["pose_torch"])
            else:
                from pcdms_tpu.pose.dwpose import DWposeDetector
                det = DWposeDetector(self.params["det_onnx"],
                                     self.params["pose_onnx"])

            def run(img):
                render, _, _ = det(_to_np(img))
                return render
            return run
        if pid in ("none", "resize"):
            return _to_np
        if pid == "mediapipe_face":
            import importlib.util
            if importlib.util.find_spec("mediapipe") is None:
                raise NotImplementedError(
                    "processor 'mediapipe_face' requires the external "
                    "'mediapipe' package (the reference wraps the same pip "
                    "dependency); install it to enable this processor")
            return mediapipe_face
        if pid in _IMPLEMENTED_NN:
            return self._resolve_nn(pid)
        if pid in _NN_DETECTORS:
            raise NotImplementedError(
                f"processor '{pid}' needs pretrained torch weights that are "
                "not available in this offline environment; PCDMs' own "
                "pipelines only use 'dwpose' (host-side). Supply weights "
                "and extend pcdms_tpu/pose/processors.py to enable it.")
        raise ValueError(f"unknown processor: {pid}")

    def _resolve_nn(self, pid: str) -> Callable:
        """Detectors with JAX-native models (pcdms_tpu.pose.detectors).

        The architectures + converters are implemented and parity-tested;
        the pretrained checkpoint must be supplied via
        ``params['weights']`` (no network egress in this environment).
        """
        weights = self.params.get("weights")
        if not weights:
            raise NotImplementedError(
                f"processor '{pid}' is implemented "
                "(pcdms_tpu/pose/detectors/) but needs its pretrained "
                "checkpoint: pass params={'weights': '/path/to/ckpt.pth'}"
                + (" (+ 'coarse_weights')" if pid == "lineart_coarse"
                   else ""))
        from pcdms_tpu.pose import detectors as det
        if pid in ("hed", "softedge_hed", "scribble_hed", "hed_safe",
                   "softedge_hedsafe"):
            d = det.HEDdetector.from_pretrained(weights)
            safe = "safe" in pid
            scrib = pid.startswith("scribble")
            return lambda img, **kw: d(img, safe=kw.pop("safe", safe),
                                       scribble=kw.pop("scribble", scrib),
                                       **kw)
        if pid in ("softedge_pidinet", "scribble_pidinet",
                   "softedge_pidsafe"):
            d = det.PidiNetDetector.from_pretrained(weights)
            safe = "safe" in pid
            scrib = pid.startswith("scribble")
            return lambda img, **kw: d(img, safe=kw.pop("safe", safe),
                                       scribble=kw.pop("scribble", scrib),
                                       **kw)
        if pid in ("lineart_realistic", "lineart_coarse"):
            d = det.LineartDetector.from_pretrained(
                weights if pid == "lineart_realistic" else None,
                self.params.get("coarse_weights",
                                weights if pid == "lineart_coarse"
                                else None))
            return lambda img, **kw: d(
                img, coarse=kw.pop("coarse", pid == "lineart_coarse"), **kw)
        if pid == "lineart_anime":
            d = det.LineartAnimeDetector.from_pretrained(weights)
            return lambda img, **kw: d(img, **kw)
        if pid == "mlsd":
            d = det.MLSDdetector.from_pretrained(weights)
            return lambda img, **kw: d(img, **kw)
        if pid == "sam":
            from pcdms_tpu.pose.detectors.sam_amg import SamDetector
            d = SamDetector.from_pretrained(weights)
            return lambda img, **kw: d(img, **kw)
        if pid == "depth_zoe":
            d = det.ZoeDetector.from_pretrained(weights)
            return lambda img, **kw: d(img, **kw)
        if pid == "normal_bae":
            d = det.NormalBaeDetector.from_pretrained(weights)
            return lambda img, **kw: d(img, **kw)
        if pid in ("depth_leres", "depth_leres++"):
            d = det.LeresDetector.from_pretrained(
                weights, pix2pix_weights=self.params.get("pix2pix_weights"))
            boost = pid.endswith("++")
            return lambda img, **kw: d(img, boost=kw.pop("boost", boost),
                                       **kw)
        if pid in ("midas", "depth_midas", "normal_midas"):
            d = det.MidasDetector.from_pretrained(weights)
            if pid == "normal_midas":
                return lambda img, **kw: d(img, depth_and_normal=True,
                                           **kw)[1]
            return lambda img, **kw: d(img, **kw)
        if pid in _OPENPOSE_FLAGS:
            body, hand, face = _OPENPOSE_FLAGS[pid]
            d = det.OpenposeDetector.from_pretrained(
                weights,
                self.params.get("hand_weights") if hand else None,
                self.params.get("face_weights") if face else None)
            return lambda img, **kw: d(
                img, include_body=kw.pop("include_body", body),
                include_hand=kw.pop("include_hand", hand),
                include_face=kw.pop("include_face", face), **kw)
        raise ValueError(f"unhandled NN processor: {pid}")

    _CTOR_KEYS = ("det_onnx", "pose_onnx", "det_torch", "pose_torch",
                  "weights", "coarse_weights", "hand_weights",
                  "face_weights", "pix2pix_weights")

    def __call__(self, image, to_pil: bool = True):
        out = self._fn(image, **{k: v for k, v in self.params.items()
                                 if k not in self._CTOR_KEYS})
        if to_pil and isinstance(out, np.ndarray):
            return Image.fromarray(out.astype(np.uint8))
        return out
