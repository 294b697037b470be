"""Drive the batch-test CLI mains end to end (tiny configs, random init)
over the 8-device virtual mesh, asserting the device-sharded runs produce
the same artifacts as a single-device run. This is the SPMD equivalent of
the reference's one-process-per-GPU inference fan-out
(stage1_batchtest_prior_model.py:155-177): a 3-item pair list must pad to
the mesh and still write exactly 3 correct outputs.
"""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

import pcdms_tpu.cli.common as cli_common
from pcdms_tpu.parallel.mesh import make_mesh

NAMES = ["im0.jpg", "im1.jpg", "im2.jpg"]
PAIR_STEMS = [("im0", "im1"), ("im1", "im2"), ("im2", "im0")]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("deepfashion")
    img_dir = root / "train_all_png"
    txt_dir = root / "normalized_pose_txt"
    pose_dir = root / "openpose_all_img"
    for d in (img_dir, txt_dir, pose_dir):
        d.mkdir()
    rng = np.random.default_rng(0)
    for name in NAMES:
        stem = name.rsplit(".", 1)[0]
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{stem}.png")
        parr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(parr).save(pose_dir / f"{stem}_pose.jpg")
        coords = rng.uniform(0.05, 0.95, (18, 2))
        with open(txt_dir / f"{stem}.txt", "w") as f:
            for x, y in coords:
                f.write(f"{x} {y}\n")
    pairs = [{"source_image": f"train_all_png/{NAMES[i]}",
              "target_image": f"train_all_png/{NAMES[(i + 1) % 3]}"}
             for i in range(3)]
    json_path = root / "test_pairs.json"
    json_path.write_text(json.dumps(pairs))
    return str(root), str(json_path)


def _mesh_of(n):
    return lambda: make_mesh(jax.devices()[:n])


class TestStage1CLISharded:
    pytestmark = pytest.mark.slow
    def _run(self, monkeypatch, dataset, out_dir, n_dev):
        from pcdms_tpu.cli.stage1_batchtest import main
        root, json_path = dataset
        monkeypatch.setattr(cli_common, "default_mesh", _mesh_of(n_dev))
        main(["--json_path", json_path, "--image_root_path", root,
              "--save_path", out_dir, "--num_inference_steps", "2",
              "--batch_size", "3", "--random_init", "--tiny_config"])

    def test_sharded_matches_single_device(self, monkeypatch, tmp_path,
                                           dataset):
        d1, d8 = str(tmp_path / "one"), str(tmp_path / "eight")
        self._run(monkeypatch, dataset, d1, 1)
        self._run(monkeypatch, dataset, d8, 8)
        for s, t in PAIR_STEMS:
            a = np.load(os.path.join(d1, f"{s}_to_{t}.npy"))
            b = np.load(os.path.join(d8, f"{s}_to_{t}.npy"))
            assert a.shape == b.shape == (1, 16)
            np.testing.assert_allclose(a, b, atol=1e-3)
        assert os.path.exists(os.path.join(d8, "a_results.txt"))


class TestStage2CLISharded:
    pytestmark = pytest.mark.slow
    def _run(self, monkeypatch, dataset, out_dir, n_dev):
        from pcdms_tpu.cli.stage2_batchtest import main
        root, json_path = dataset
        monkeypatch.setattr(cli_common, "default_mesh", _mesh_of(n_dev))
        main(["--json_path", json_path, "--image_root_path", root,
              "--save_path", out_dir, "--img_width", "64",
              "--img_height", "64", "--num_inference_steps", "2",
              "--num_images_per_prompt", "2", "--scheduler", "ddim",
              "--batch_size", "3", "--random_init", "--tiny_config",
              "--simple_variant"])

    def test_sharded_matches_single_device(self, monkeypatch, tmp_path,
                                           dataset):
        d1, d8 = str(tmp_path / "one"), str(tmp_path / "eight")
        self._run(monkeypatch, dataset, d1, 1)
        self._run(monkeypatch, dataset, d8, 8)
        for s, t in PAIR_STEMS:
            a = np.asarray(Image.open(os.path.join(d1, f"{s}_to_{t}.png")),
                           np.int32)
            b = np.asarray(Image.open(os.path.join(d8, f"{s}_to_{t}.png")),
                           np.int32)
            assert a.shape == b.shape == (64, 64, 3)
            # identical math up to bf16 fusion differences + u8 rounding
            assert np.abs(a - b).max() <= 3


class TestStage2CLIFastLane:
    """Unmarked (fast-lane) single-run smoke of the stage-2 CLI: keeps the
    pipelined finish()/device_uint8/best-of-N-SSIM-on-uint8 path exercised
    by the default ``-m 'not slow'`` lane (the sharded-vs-single parity
    matrix above stays opt-in)."""

    def test_end_to_end(self, monkeypatch, tmp_path, dataset):
        from pcdms_tpu.cli.stage2_batchtest import main
        root, json_path = dataset
        out_dir = str(tmp_path / "out")
        monkeypatch.setattr(cli_common, "default_mesh", _mesh_of(8))
        main(["--json_path", json_path, "--image_root_path", root,
              "--save_path", out_dir, "--img_width", "64",
              "--img_height", "64", "--num_inference_steps", "2",
              "--num_images_per_prompt", "2", "--scheduler", "ddim",
              "--batch_size", "3", "--random_init", "--tiny_config",
              "--simple_variant"])
        for s, t in PAIR_STEMS:
            img = np.asarray(
                Image.open(os.path.join(out_dir, f"{s}_to_{t}.png")))
            assert img.shape == (64, 64, 3)
            assert img.std() > 0          # not a constant canvas

    def test_sequential_matches_pipelined(self, monkeypatch, tmp_path,
                                          dataset):
        """--sequential (the reference's prep->sample->select ordering,
        the PERF.md A/B baseline) must write byte-identical artifacts to
        the default pipelined ordering — pipelining is a scheduling
        change, never a numeric one. batch_size 1 forces multiple
        batches through the deferred-finish path."""
        from pcdms_tpu.cli.stage2_batchtest import main
        root, json_path = dataset
        monkeypatch.setattr(cli_common, "default_mesh", _mesh_of(1))
        outs = {}
        for mode in ("pipelined", "sequential"):
            out_dir = str(tmp_path / mode)
            main(["--json_path", json_path, "--image_root_path", root,
                  "--save_path", out_dir, "--img_width", "64",
                  "--img_height", "64", "--num_inference_steps", "2",
                  "--num_images_per_prompt", "2", "--scheduler", "ddim",
                  "--batch_size", "1", "--random_init", "--tiny_config",
                  "--simple_variant"]
                 + (["--sequential"] if mode == "sequential" else []))
            outs[mode] = {
                f"{s}_to_{t}": np.asarray(Image.open(
                    os.path.join(out_dir, f"{s}_to_{t}.png")))
                for s, t in PAIR_STEMS}
        for k in outs["pipelined"]:
            np.testing.assert_array_equal(outs["pipelined"][k],
                                          outs["sequential"][k])


class TestStage3CLISharded:
    pytestmark = pytest.mark.slow
    def _run(self, monkeypatch, dataset, gen_dir, out_dir, n_dev):
        from pcdms_tpu.cli.stage3_batchtest import main
        root, json_path = dataset
        monkeypatch.setattr(cli_common, "default_mesh", _mesh_of(n_dev))
        main(["--json_path", json_path, "--image_root_path", root,
              "--gen_dir", gen_dir, "--save_path", out_dir,
              "--img_width", "64", "--img_height", "64",
              "--num_inference_steps", "2", "--num_images_per_prompt", "2",
              "--scheduler", "ddim", "--batch_size", "3", "--random_init",
              "--tiny_config", "--grid_output"])

    def test_sharded_matches_single_device(self, monkeypatch, tmp_path,
                                           dataset):
        gen_dir = str(tmp_path / "gen")
        os.makedirs(gen_dir)
        rng = np.random.default_rng(7)
        for s, t in PAIR_STEMS:
            arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(gen_dir,
                                                   f"{s}_to_{t}.png"))
        d1, d8 = str(tmp_path / "one"), str(tmp_path / "eight")
        self._run(monkeypatch, dataset, gen_dir, d1, 1)
        self._run(monkeypatch, dataset, gen_dir, d8, 8)
        for s, t in PAIR_STEMS:
            a = np.asarray(Image.open(os.path.join(d1, f"{s}_to_{t}.png")),
                           np.int32)
            b = np.asarray(Image.open(os.path.join(d8, f"{s}_to_{t}.png")),
                           np.int32)
            assert a.shape == b.shape == (64, 64, 3)
            assert np.abs(a - b).max() <= 3
            assert os.path.exists(
                os.path.join(d8, f"grid_{s}_to_{t}.png"))
