"""ctypes bindings for the native (C++/OpenMP) preprocessing library.

Builds ``native/libpcdms_preprocess.so`` on first use (g++ is in the
image) and exposes the hot host-side ops with graceful fallback to the
Python implementations when the toolchain is unavailable. Opt-in for the
training data path; the PIL/cv2 Python path stays the default for
eval-protocol parity.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from pcdms_tpu.data.preprocess import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpcdms_preprocess.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            # concurrent first-use builds (DataLoader / pytest workers)
            # must not race g++'s in-place write against another
            # process's dlopen: build into a private temp dir and
            # os.replace (atomic) into place
            import shutil
            import tempfile
            with tempfile.TemporaryDirectory(dir=_NATIVE_DIR) as tmp:
                for f in os.listdir(_NATIVE_DIR):
                    p = os.path.join(_NATIVE_DIR, f)
                    if os.path.isfile(p):
                        shutil.copy2(p, tmp)
                    elif f == "src":
                        shutil.copytree(p, os.path.join(tmp, f))
                subprocess.run(["make", "-C", tmp], check=True,
                               capture_output=True)
                os.replace(os.path.join(
                    tmp, os.path.basename(_LIB_PATH)), _LIB_PATH)
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.CalledProcessError):
        _build_failed = True
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.resize_bicubic_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, u8p, ctypes.c_int,
                                      ctypes.c_int]
    lib.normalize_neg1_1.argtypes = [u8p, f32p, ctypes.c_int64]
    lib.normalize_clip.argtypes = [u8p, f32p, ctypes.c_int64, f32p, f32p]
    lib.compose_side_by_side.argtypes = [u8p, u8p, u8p, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int]
    lib.draw_bodypose_native.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                         f32p, u8p, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bicubic(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """(H, W, C) uint8 -> (height, width, C) uint8, cv2-INTER_CUBIC-style."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    if lib is None:
        import cv2
        return cv2.resize(img, (width, height),
                          interpolation=cv2.INTER_CUBIC)
    sh, sw, c = img.shape
    out = np.empty((height, width, c), np.uint8)
    lib.resize_bicubic_u8(_u8(img), sh, sw, c, _u8(out), height, width)
    return out


def to_neg1_1(img: np.ndarray) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    if lib is None:
        return img.astype(np.float32) / 127.5 - 1.0
    out = np.empty(img.shape, np.float32)
    lib.normalize_neg1_1(_u8(img), _f32(out), img.size)
    return out


def clip_normalize(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> CLIP-normalized float32 (no resize/crop)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    if lib is None:
        arr = img.astype(np.float32) / 255.0
        return (arr - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    out = np.empty(img.shape, np.float32)
    mean = np.ascontiguousarray(CLIP_IMAGE_MEAN, np.float32)
    std = np.ascontiguousarray(CLIP_IMAGE_STD, np.float32)
    lib.normalize_clip(_u8(img), _f32(out), img.shape[0] * img.shape[1],
                       _f32(mean), _f32(std))
    return out


def compose_side_by_side(left: np.ndarray,
                         right: Optional[np.ndarray]) -> np.ndarray:
    """[left | right] uint8 canvases; right=None -> black."""
    lib = _load()
    left = np.ascontiguousarray(left, np.uint8)
    h, w, c = left.shape
    if lib is None:
        out = np.zeros((h, 2 * w, c), np.uint8)
        out[:, :w] = left
        if right is not None:
            out[:, w:] = right
        return out
    out = np.empty((h, 2 * w, c), np.uint8)
    rptr = _u8(np.ascontiguousarray(right, np.uint8)) if right is not None \
        else ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
    lib.compose_side_by_side(_u8(left), rptr, _u8(out), h, w, c)
    return out


def render_pose(keypoints: np.ndarray, height: int, width: int,
                visible: Optional[np.ndarray] = None) -> np.ndarray:
    """Native OpenPose-18 skeleton render (body only)."""
    lib = _load()
    keypoints = np.ascontiguousarray(keypoints, np.float32)
    if keypoints.ndim == 2:
        keypoints = keypoints[None]
    if visible is None:
        visible = (keypoints > 0.01).all(axis=-1)
    # bool-cast BEFORE uint8: float confidence masks (e.g. DWPose
    # scores) would otherwise truncate 0.9 -> 0 on the native path while
    # the Python fallback treats any nonzero as visible
    visible = np.ascontiguousarray(
        np.asarray(visible).astype(bool).astype(np.uint8))
    if lib is None:
        from pcdms_tpu.pose.skeleton import render_pose as py_render
        return py_render(keypoints, height, width, visible.astype(bool))
    canvas = np.zeros((height, width, 3), np.uint8)
    lib.draw_bodypose_native(_u8(canvas), height, width, _f32(keypoints),
                             _u8(visible), keypoints.shape[0])
    return canvas
