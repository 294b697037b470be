"""Processor facade tests (non-NN detectors)."""

import numpy as np
import pytest
from PIL import Image

from pcdms_tpu.pose.processors import Processor, canny, shuffle


def _img():
    rng = np.random.default_rng(0)
    arr = np.zeros((64, 64, 3), np.uint8)
    arr[16:48, 16:48] = 255          # white square -> strong edges
    return Image.fromarray(arr)


class TestCanny:
    def test_edges_detected(self):
        out = canny(_img())
        assert out.shape == (64, 64, 3)
        assert out.max() == 255 and (out > 0).sum() > 0

    def test_facade(self):
        out = Processor("canny")(_img())
        assert isinstance(out, Image.Image)


class TestShuffle:
    def test_preserves_shape_and_stats(self):
        rng = np.random.default_rng(1)
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        out = shuffle(arr, seed=3)
        assert out.shape == arr.shape
        assert not np.array_equal(out, arr)
        # color statistics roughly preserved
        assert abs(float(out.mean()) - float(arr.mean())) < 20

    def test_deterministic(self):
        arr = (np.random.default_rng(2).random((32, 32, 3)) * 255
               ).astype(np.uint8)
        np.testing.assert_array_equal(shuffle(arr, seed=5),
                                      shuffle(arr, seed=5))


class TestFacadeErrors:
    def test_nn_detector_raises(self):
        with pytest.raises(NotImplementedError):
            Processor("hed")

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            Processor("not_a_processor")

    def test_mediapipe_face_gated_on_package(self):
        """Passthrough to the external mediapipe package when importable
        (mirroring the reference's external dep), clear error otherwise."""
        import importlib.util
        if importlib.util.find_spec("mediapipe") is None:
            with pytest.raises(NotImplementedError, match="mediapipe"):
                Processor("mediapipe_face")
        else:
            from pcdms_tpu.pose.processors import mediapipe_face
            assert Processor("mediapipe_face")._fn is mediapipe_face
