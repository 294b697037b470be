"""CI smoke of examples/demo.py — the Kaggle-notebook equivalent
(/root/reference/pcdms_kaggle_demo.ipynb cell 38): tiny configs,
``--random_init``, 64px, asserting a finite PNG lands on disk through
the monolithic-demo code path (pose-txt rasterization included)."""

import importlib.util
import os
import sys

import numpy as np
import pytest
from PIL import Image


def _load_demo_module():
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "demo.py")
    spec = importlib.util.spec_from_file_location("pcdms_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def demo():
    return _load_demo_module()


def test_demo_random_init_writes_finite_png(tmp_path, demo, capsys):
    rng = np.random.default_rng(0)
    src = tmp_path / "person.png"
    Image.fromarray(rng.integers(0, 255, (96, 80, 3),
                                 dtype=np.uint8)).save(src)
    pose_txt = tmp_path / "pose.txt"
    coords = rng.uniform(0.1, 0.9, (18, 2))
    pose_txt.write_text("".join(f"{x} {y}\n" for x, y in coords))
    out = tmp_path / "result.png"

    demo.main(["--source", str(src), "--target_pose", str(pose_txt),
               "--out", str(out), "--size", "64", "--steps", "3",
               "--tiny_config"])

    assert out.exists()
    arr = np.asarray(Image.open(out))
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr.astype(np.float64)).all()
    assert arr.std() > 0                     # not a constant image
    assert "wrote" in capsys.readouterr().out


def test_demo_missing_ckpt_flags_error(tmp_path, demo):
    rng = np.random.default_rng(0)
    src = tmp_path / "p.png"
    Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                 dtype=np.uint8)).save(src)
    pose = tmp_path / "pose.txt"
    pose.write_text("0.5 0.5\n" * 18)
    with pytest.raises(SystemExit, match="--random_init"):
        demo.main(["--source", str(src), "--target_pose", str(pose)])


def test_demo_prerendered_pose_image_accepted(tmp_path, demo):
    """The --target_pose argument also accepts a rendered skeleton
    image (notebook path), not just a keypoint txt."""
    rng = np.random.default_rng(1)
    src = tmp_path / "person.png"
    Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                 dtype=np.uint8)).save(src)
    pose_img = tmp_path / "pose.png"
    Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                 dtype=np.uint8)).save(pose_img)
    out = tmp_path / "r.png"
    demo.main(["--source", str(src), "--target_pose", str(pose_img),
               "--out", str(out), "--size", "64", "--steps", "2",
               "--tiny_config"])
    assert out.exists()
