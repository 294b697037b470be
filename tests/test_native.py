"""Native C++ preprocessing library vs Python/cv2 reference."""

import numpy as np
import pytest

from pcdms_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++)")


class TestResize:
    def test_matches_cv2_inter_cubic(self):
        import cv2
        rng = np.random.default_rng(0)
        img = (rng.random((96, 64, 3)) * 255).astype(np.uint8)
        ours = native.resize_bicubic(img, 48, 32)
        ref = cv2.resize(img, (32, 48), interpolation=cv2.INTER_CUBIC)
        # identical kernel; off-by-one rounding on a few pixels is fine
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert np.mean(diff) < 1.0
        assert np.percentile(diff, 99) <= 2

    def test_upscale(self):
        img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        out = native.resize_bicubic(img, 8, 8)
        assert out.shape == (8, 8, 3)


class TestNormalize:
    def test_neg1_1(self):
        img = np.array([[[0, 128, 255]]], np.uint8)
        out = native.to_neg1_1(img)
        np.testing.assert_allclose(out[0, 0], [-1.0, 128 * 2 / 255 - 1, 1.0],
                                   atol=1e-6)

    def test_clip_normalize_matches_python(self):
        from pcdms_tpu.data.preprocess import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD
        rng = np.random.default_rng(1)
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        out = native.clip_normalize(img)
        ref = (img.astype(np.float32) / 255.0 - CLIP_IMAGE_MEAN) \
            / CLIP_IMAGE_STD
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestCompose:
    def test_side_by_side(self):
        left = np.full((4, 3, 3), 10, np.uint8)
        right = np.full((4, 3, 3), 20, np.uint8)
        out = native.compose_side_by_side(left, right)
        assert out.shape == (4, 6, 3)
        assert (out[:, :3] == 10).all() and (out[:, 3:] == 20).all()

    def test_black_right_half(self):
        left = np.full((4, 3, 3), 10, np.uint8)
        out = native.compose_side_by_side(left, None)
        assert (out[:, 3:] == 0).all()


class TestNativeSkeleton:
    def test_against_python_renderer(self):
        """Native and cv2-based renderers must agree closely (the ellipse
        rasterization differs at edges by design)."""
        from pcdms_tpu.pose.skeleton import render_pose as py_render
        rng = np.random.default_rng(0)
        kpts = (0.2 + 0.6 * rng.random((1, 18, 2))).astype(np.float32)
        a = native.render_pose(kpts, 128, 128)
        b = py_render(kpts, 128, 128)
        assert a.shape == b.shape
        # joints: exact color match at centers
        for i in range(18):
            x = int(kpts[0, i, 0] * 128)
            y = int(kpts[0, i, 1] * 128)
            np.testing.assert_array_equal(a[y, x], b[y, x])
        # overall: drawn pixel sets overlap strongly
        da, db = (a.sum(-1) > 0), (b.sum(-1) > 0)
        inter = (da & db).sum()
        union = (da | db).sum()
        assert inter / union > 0.85

    def test_empty(self):
        out = native.render_pose(np.zeros((1, 18, 2), np.float32), 32, 32)
        assert out.sum() == 0
