"""Executed-line coverage for the DWPose numeric core without onnxruntime:
letterbox geometry, YOLOX grid/stride decode + NMS, bbox->center/scale,
the SimCC argmax decode and inverse-affine mapping, and the full
detector __call__ pipeline driven by stub ONNX sessions
(/root/reference/src/controlnet_aux/dwpose/wholebody.py:32-98 protocol)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pcdms_tpu.pose.dwpose import (  # noqa: E402
    DWposeDetector, _bbox_to_center_scale, _letterbox, _nms, decode_yolox,
)

N_CELLS = 80 * 80 + 40 * 40 + 20 * 20        # 640 input, strides 8/16/32


class TestLetterbox:
    def test_tall_image(self):
        img = np.full((1000, 500, 3), 200, np.uint8)
        canvas, r = _letterbox(img, 640)
        assert canvas.shape == (640, 640, 3)
        assert r == pytest.approx(0.64)
        # content occupies [0:640, 0:320]; the rest is the 114 pad
        assert (canvas[:, :320] == 200).all()
        assert (canvas[:, 330:] == 114).all()

    def test_small_image_upscales(self):
        img = np.zeros((64, 64, 3), np.uint8)
        canvas, r = _letterbox(img, 640)
        assert r == pytest.approx(10.0)
        assert (canvas[:640, :640] == 0).all()


class TestNMS:
    def test_suppresses_overlaps_keeps_distinct(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        keep = _nms(boxes, scores, iou_thresh=0.45)
        assert keep == [0, 2]

    def test_keeps_highest_score_first(self):
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
        scores = np.array([0.3, 0.9], np.float32)
        assert _nms(boxes, scores) == [1]


def _raw_yolox(entries):
    """entries: list of (cell_index, dx, dy, log_w, log_h, obj, person)."""
    out = np.zeros((1, N_CELLS, 85), np.float32)
    out[..., 2:4] = -10.0                     # exp(-10) ~ 0 size elsewhere
    for idx, dx, dy, lw, lh, obj, person in entries:
        out[0, idx, :2] = (dx, dy)
        out[0, idx, 2:4] = (lw, lh)
        out[0, idx, 4] = obj
        out[0, idx, 5] = person
    return out


class TestYoloxDecode:
    def test_known_box_geometry(self):
        # stride-8 level, cell (row 10, col 20) -> grid xy (20, 10)
        idx = 10 * 80 + 20
        raw = _raw_yolox([(idx, 0.5, 0.25, np.log(4.0), np.log(2.0),
                           1.0, 1.0)])
        boxes, scores = decode_yolox(raw, ratio=1.0)
        assert len(boxes) == 1
        cx, cy = (20 + 0.5) * 8, (10 + 0.25) * 8
        w, h = 4.0 * 8, 2.0 * 8
        np.testing.assert_allclose(
            boxes[0], [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
            atol=1e-4)
        assert scores[0] == pytest.approx(1.0)

    def test_stride_levels_and_ratio(self):
        # stride-32 level starts at 6400 + 1600; cell (2, 3)
        idx = 8000 + 2 * 20 + 3
        raw = _raw_yolox([(idx, 0.0, 0.0, 0.0, 0.0, 0.9, 0.8)])
        boxes, scores = decode_yolox(raw, ratio=0.5)
        cx, cy = 3 * 32, 2 * 32
        np.testing.assert_allclose(
            boxes[0], np.array([cx - 16, cy - 16, cx + 16, cy + 16]) / 0.5,
            atol=1e-4)
        assert scores[0] == pytest.approx(0.72)

    def test_score_threshold_and_nms(self):
        # below-threshold entry is dropped; two overlapping survive as one
        raw = _raw_yolox([
            (0, 0.0, 0.0, np.log(4.0), np.log(4.0), 0.5, 0.5),   # 0.25
            (1, -1.0, 0.0, np.log(4.0), np.log(4.0), 1.0, 0.9),  # same box
            (100, 0.0, 0.0, 0.0, 0.0, 0.1, 0.1),                 # 0.01
        ])
        boxes, scores = decode_yolox(raw, ratio=1.0)
        assert len(boxes) == 1 and scores[0] == pytest.approx(0.9)


class TestCenterScale:
    def test_wide_box_grows_height(self):
        center, scale = _bbox_to_center_scale([0, 0, 300, 100])
        np.testing.assert_allclose(center, [150, 50])
        # aspect 288/384 = 0.75: w=300 > 0.75*100 -> h = 300/0.75 = 400
        np.testing.assert_allclose(scale, [300 * 1.25, 400 * 1.25])

    def test_tall_box_grows_width(self):
        center, scale = _bbox_to_center_scale([0, 0, 30, 400])
        np.testing.assert_allclose(scale, [300 * 1.25, 400 * 1.25])


class _StubSession:
    def __init__(self, fn):
        self.fn = fn

    def get_inputs(self):
        class _I:
            name = "input"
        return [_I()]

    def run(self, _, feeds):
        return self.fn(feeds["input"])


def _make_detector(det_fn, pose_fn):
    d = DWposeDetector.__new__(DWposeDetector)
    d.det = _StubSession(det_fn)
    d.pose = _StubSession(pose_fn)
    return d


def _simcc_for(crop_pts, n_kpts=133):
    """SimCC logits whose decode lands on the given crop-space points."""
    sx = np.zeros((1, n_kpts, 288 * 2), np.float32)
    sy = np.zeros((1, n_kpts, 384 * 2), np.float32)
    for k in range(n_kpts):
        x, y = crop_pts[min(k, len(crop_pts) - 1)]
        sx[0, k, int(round(x * 2))] = 9.0
        sy[0, k, int(round(y * 2))] = 9.0
    return [sx, sy]


class TestDetectorPipeline:
    def test_full_call_round_trip(self):
        """A person box placed by the stub detector; stub SimCC puts all
        keypoints at the crop center -> image coords must equal the box
        center, and the render/keypoint contract holds."""
        h, w = 400, 320

        def det_fn(blob):
            assert blob.shape == (1, 3, 640, 640)
            # one confident stride-8 detection at cell (25, 20):
            # center (164, 204) at input scale; ratio = 640/400 = 1.6
            raw = _raw_yolox([(25 * 80 + 20, 0.5, 0.5, np.log(10.0),
                               np.log(15.0), 1.0, 1.0)])
            return [raw]

        def pose_fn(blob):
            assert blob.shape == (1, 3, 384, 288)
            return _simcc_for([(144.0, 192.0)])    # crop center

        det = _make_detector(det_fn, pose_fn)
        img = np.zeros((h, w, 3), np.uint8)
        render, kpts, scores = det(img)

        assert render.shape == (h, w, 3)
        assert kpts.shape == (1, 18, 2) and scores.shape == (1, 18)
        # crop center maps to the (ratio-corrected) box center
        expect = np.array([164.0 / 1.6 / w, 204.0 / 1.6 / h])
        got = kpts[0, :17][scores[0, :17] > 0.3]
        np.testing.assert_allclose(got, np.broadcast_to(expect, got.shape),
                                   atol=1e-2)

    def test_no_person_yields_empty(self):
        det = _make_detector(
            lambda blob: [_raw_yolox([])],
            lambda blob: _simcc_for([(0.0, 0.0)]))
        img = np.zeros((64, 64, 3), np.uint8)
        render, kpts, scores = det(img)
        assert kpts.shape == (0, 18, 2)
        assert (render == 0).all()


def test_call_renders_hand_skeletons():
    """The reference's draw_pose renders body AND 21-point hands
    (dwpose/__init__.py:19-31); wholebody indices 91:112 / 112:133 must
    reach the renderer with low-score points masked to -1."""
    from pcdms_tpu.pose.dwpose import DWposeDetector

    det = DWposeDetector.__new__(DWposeDetector)
    det.detect_persons = lambda img: (np.array([[4.0, 4.0, 60.0, 90.0]]),
                                      np.array([0.9]))

    def fake_pose(img, box):
        pts = np.full((133, 2), -10.0, np.float32)
        scores = np.zeros(133, np.float32)
        # a visible body frame
        body = np.array([[32, 10], [34, 14], [30, 14], [36, 18], [28, 18],
                         [40, 26], [24, 26], [44, 40], [20, 40], [46, 52],
                         [18, 52], [38, 56], [26, 56], [40, 74], [24, 74],
                         [40, 90], [24, 90]], np.float32)
        pts[:17] = body
        scores[:17] = 0.9
        # right-hand chain near (46, 52)
        for i in range(21):
            pts[91 + i] = [46 + i % 4, 52 + i // 4]
        scores[91:112] = 0.9
        return pts, scores

    det.estimate_pose = fake_pose
    img = np.zeros((96, 64, 3), np.uint8)
    render_hands, _, _ = det(img)

    det.estimate_pose = lambda img, box: (
        (lambda p, s: (p, s))(*fake_pose(img, box)[:1],
                              np.concatenate([fake_pose(img, box)[1][:91],
                                              np.zeros(42, np.float32)])))
    render_nohands, _, _ = det(img)
    # hand edges/dots add pixels the body-only render lacks
    assert (render_hands != render_nohands).any()
