"""Pose keypoint + skeleton rasterizer tests."""

import numpy as np
import pytest

from pcdms_tpu.pose.keypoints import (
    coco_to_openpose, flatten_keypoints, read_pose_txt, write_pose_txt,
)
from pcdms_tpu.pose.skeleton import COLORS, draw_bodypose, render_pose


class TestKeypointIO:
    def test_roundtrip(self, tmp_path):
        coords = np.random.default_rng(0).random((18, 2)).astype(np.float32)
        path = str(tmp_path / "pose.txt")
        write_pose_txt(path, coords)
        loaded = read_pose_txt(path)
        assert loaded.shape == (36,)
        np.testing.assert_allclose(loaded, coords.reshape(-1), atol=1e-6)

    def test_flatten(self):
        k = np.arange(36).reshape(18, 2)
        np.testing.assert_array_equal(flatten_keypoints(k), np.arange(36))


class TestCocoToOpenpose:
    def test_neck_synthesis(self):
        k = np.zeros((1, 17, 2), np.float32)
        s = np.ones((1, 17), np.float32)
        k[0, 5] = [0.4, 0.3]   # left shoulder
        k[0, 6] = [0.6, 0.3]   # right shoulder
        out_k, out_s = coco_to_openpose(k, s)
        np.testing.assert_allclose(out_k[0, 1], [0.5, 0.3], atol=1e-6)
        assert out_s[0, 1] > 0

    def test_neck_invalid_when_shoulder_missing(self):
        k = np.zeros((1, 17, 2), np.float32)
        s = np.ones((1, 17), np.float32)
        s[0, 5] = 0.0
        _, out_s = coco_to_openpose(k, s)
        assert out_s[0, 1] == 0.0

    def test_joint_remap(self):
        # nose stays at slot 0; left shoulder (coco 5) -> openpose 5;
        # right shoulder (coco 6) -> openpose 2
        k = np.random.default_rng(0).random((1, 17, 2)).astype(np.float32)
        s = np.ones((1, 17), np.float32)
        out_k, _ = coco_to_openpose(k, s)
        np.testing.assert_allclose(out_k[0, 0], k[0, 0])
        np.testing.assert_allclose(out_k[0, 5], k[0, 5])
        np.testing.assert_allclose(out_k[0, 2], k[0, 6])
        np.testing.assert_allclose(out_k[0, 14], k[0, 2])  # r_eye


class TestSkeletonRender:
    def _full_pose(self):
        rng = np.random.default_rng(0)
        return 0.2 + 0.6 * rng.random((1, 18, 2)).astype(np.float32)

    def test_render_shape_and_dtype(self):
        img = render_pose(self._full_pose(), 128, 96)
        assert img.shape == (128, 96, 3)
        assert img.dtype == np.uint8

    def test_blank_for_empty_pose(self):
        img = render_pose(np.zeros((1, 18, 2), np.float32), 64, 64)
        assert img.sum() == 0

    def test_joint_circles_present(self):
        kpts = self._full_pose()
        img = render_pose(kpts, 256, 256)
        # the nose circle is drawn at full color (after the 0.6 dimming)
        x = int(kpts[0, 0, 0] * 256)
        y = int(kpts[0, 0, 1] * 256)
        np.testing.assert_array_equal(img[y, x], COLORS[0])

    def test_limbs_dimmed(self):
        # limb pixels are drawn pre-dim -> value = 0.6 * color
        kpts = np.zeros((1, 18, 2), np.float32)
        kpts[0, 1] = [0.3, 0.5]   # neck
        kpts[0, 2] = [0.7, 0.5]   # r_shoulder
        img = render_pose(kpts, 100, 100)
        mid = img[50, 50]
        np.testing.assert_array_equal(mid, (np.array(COLORS[0]) * 0.6
                                            ).astype(np.uint8))

    def test_deterministic(self):
        kpts = self._full_pose()
        a = render_pose(kpts, 64, 64)
        b = render_pose(kpts, 64, 64)
        np.testing.assert_array_equal(a, b)
