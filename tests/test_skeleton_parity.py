"""Golden pixel-parity of the skeleton rasterizer vs the reference's actual
drawing code (/root/reference/src/controlnet_aux/dwpose/util.py, pure
numpy/cv2/matplotlib — imported directly as the oracle). Stage-2 was
trained on exactly those renders, so a divergent ellipse polygon, color
order, or eps convention silently destroys conditioning quality."""

import importlib.util
import os

import numpy as np
import pytest

from pcdms_tpu.pose.skeleton import draw_handpose, render_pose

REF_UTIL = "/root/reference/src/controlnet_aux/dwpose/util.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_UTIL),
                                reason="reference tree not available")


@pytest.fixture(scope="module")
def ref_util():
    spec = importlib.util.spec_from_file_location("ref_dwpose_util",
                                                  REF_UTIL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _to_candidate_subset(keypoints, visible):
    """Our (N, 18, 2)+mask convention -> the reference's candidate/subset."""
    n = keypoints.shape[0]
    candidate = keypoints.reshape(n * 18, 2)
    subset = np.arange(n * 18, dtype=np.float64).reshape(n, 18)
    subset[~visible] = -1
    return candidate, subset


@pytest.mark.parametrize("hw", [(128, 96), (512, 352)])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bodypose_pixel_parity(ref_util, hw, seed):
    h, w = hw
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 4))
    keypoints = rng.uniform(0.02, 0.98, (n, 18, 2)).astype(np.float32)
    visible = rng.uniform(size=(n, 18)) > 0.25

    ours = render_pose(keypoints, h, w, visible=visible)
    ref = ref_util.draw_bodypose(np.zeros((h, w, 3), np.uint8),
                                 *_to_candidate_subset(keypoints, visible))
    np.testing.assert_array_equal(ours, np.asarray(ref))


def test_bodypose_all_visible_parity(ref_util):
    h, w = 256, 176
    rng = np.random.default_rng(7)
    keypoints = rng.uniform(0.05, 0.95, (1, 18, 2)).astype(np.float32)
    ours = render_pose(keypoints, h, w)   # default visibility: coords > eps
    visible = (keypoints > 0.01).all(axis=-1)
    ref = ref_util.draw_bodypose(np.zeros((h, w, 3), np.uint8),
                                 *_to_candidate_subset(keypoints, visible))
    np.testing.assert_array_equal(ours, np.asarray(ref))


def test_handpose_pixel_parity(ref_util):
    h, w = 192, 160
    rng = np.random.default_rng(3)
    hands = [rng.uniform(0.0, 1.0, (21, 2)).astype(np.float32)
             for _ in range(3)]
    # force the edge cases the eps convention hinges on: a peak at exactly
    # pixel column 0 (int(x*W)==0 -> edge skipped) and a sub-eps peak
    hands[0][0] = (0.5 / w, 0.4)
    hands[0][5] = (0.005, 0.005)

    ours = draw_handpose(np.zeros((h, w, 3), np.uint8),
                         [p.copy() for p in hands])
    ref = ref_util.draw_handpose(np.zeros((h, w, 3), np.uint8),
                                 [p.copy() for p in hands])
    np.testing.assert_array_equal(ours, np.asarray(ref))


def test_body_plus_hands_parity(ref_util):
    """The composed render (body ellipses+dimming+circles, then hands) as
    produced for the stage-2 pose canvases (dwpose/__init__.py:19-30)."""
    h, w = 320, 256
    rng = np.random.default_rng(11)
    keypoints = rng.uniform(0.05, 0.95, (2, 18, 2)).astype(np.float32)
    visible = np.ones((2, 18), bool)
    hands = [rng.uniform(0.1, 0.9, (21, 2)).astype(np.float32)
             for _ in range(4)]

    ours = render_pose(keypoints, h, w, visible=visible, hands=hands)
    ref = ref_util.draw_bodypose(np.zeros((h, w, 3), np.uint8),
                                 *_to_candidate_subset(keypoints, visible))
    ref = ref_util.draw_handpose(ref, [p.copy() for p in hands])
    np.testing.assert_array_equal(ours, np.asarray(ref))


def _ref_openpose_util():
    """Import the reference's open_pose/util.py (its draw_facepose is the
    variant the openpose_face* facade ids use)."""
    import importlib
    import sys
    import types
    pkg = types.ModuleType("_refop_skel")
    pkg.__path__ = ["/root/reference/src/controlnet_aux/open_pose"]
    sys.modules.setdefault("_refop_skel", pkg)
    util = importlib.import_module("_refop_skel.util")
    body = importlib.import_module("_refop_skel.body")
    return util, body


def test_facepose_pixel_parity_dwpose_variant(ref_util):
    """draw_facepose vs the dwpose util.py:146 variant (list-of-arrays
    landmarks). The dwpose render keeps faces disabled like the
    reference, but the function itself must stay pixel-exact."""
    h, w = 224, 160
    rng = np.random.default_rng(5)
    faces = [rng.uniform(0.0, 1.0, (70, 2)).astype(np.float32)
             for _ in range(2)]
    # eps edge cases: landmark at pixel 0 and sub-eps landmark
    faces[0][0] = (0.4, 0.5 / h)
    faces[0][1] = (0.005, 0.005)

    from pcdms_tpu.pose.skeleton import draw_facepose
    ours = draw_facepose(np.zeros((h, w, 3), np.uint8),
                         [f.copy() for f in faces])
    ref = ref_util.draw_facepose(np.zeros((h, w, 3), np.uint8),
                                 [f.copy() for f in faces])
    np.testing.assert_array_equal(ours, np.asarray(ref))


@pytest.mark.filterwarnings("ignore::DeprecationWarning")
def test_facepose_pixel_parity_openpose_variant():
    """draw_facepose vs open_pose/util.py:172 (List[Keypoint] protocol),
    drawn over an existing body render as openpose_face composes it.
    (filterwarnings: the reference's own body.py imports the deprecated
    scipy.ndimage.filters namespace — not ours to fix.)"""
    try:
        ref_util2, ref_body = _ref_openpose_util()
    except Exception as e:  # pragma: no cover - env guard
        pytest.skip(f"reference open_pose util unimportable: {e}")

    from pcdms_tpu.pose.skeleton import draw_facepose
    h, w = 256, 192
    rng = np.random.default_rng(9)
    base = (rng.uniform(0, 60, (h, w, 3))).astype(np.uint8)
    lmks = rng.uniform(0.0, 1.0, (70, 2)).astype(np.float32)
    lmks[3] = (0.5 / w, 0.7)

    ours = draw_facepose(base.copy(), [lmks.copy()])
    kpts = [ref_body.Keypoint(x=float(x), y=float(y)) for x, y in lmks]
    ref = ref_util2.draw_facepose(base.copy(), kpts)
    np.testing.assert_array_equal(ours, np.asarray(ref))

    # None/empty keypoints: reference returns the canvas untouched
    ours_none = draw_facepose(base.copy(), [])
    np.testing.assert_array_equal(ours_none,
                                  ref_util2.draw_facepose(base.copy(),
                                                          None))


def test_body_hands_faces_composed_parity(ref_util):
    """Full composition order (body -> hands -> faces) as the
    openpose_full render path draws it."""
    h, w = 320, 256
    rng = np.random.default_rng(13)
    keypoints = rng.uniform(0.05, 0.95, (1, 18, 2)).astype(np.float32)
    visible = np.ones((1, 18), bool)
    hands = [rng.uniform(0.1, 0.9, (21, 2)).astype(np.float32)]
    faces = [rng.uniform(0.1, 0.9, (70, 2)).astype(np.float32)]

    ours = render_pose(keypoints, h, w, visible=visible, hands=hands,
                       faces=faces)
    ref = ref_util.draw_bodypose(np.zeros((h, w, 3), np.uint8),
                                 *_to_candidate_subset(keypoints, visible))
    ref = ref_util.draw_handpose(ref, [p.copy() for p in hands])
    ref = ref_util.draw_facepose(ref, [f.copy() for f in faces])
    np.testing.assert_array_equal(ours, np.asarray(ref))
