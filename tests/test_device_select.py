"""On-device SSIM + best-of-N candidate selection (eval/ssim_jax.py,
cli/common.device_select_best) must match the host scoring protocol
(eval/metrics.compare_ssim + cli/stage2_batchtest.best_of_n_ssim) —
the device path is a transport optimization, never a scoring change."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

import pcdms_tpu.cli.common as cli_common
from pcdms_tpu.cli.common import device_select_best, device_uint8
from pcdms_tpu.cli.stage2_batchtest import best_of_n_ssim
from pcdms_tpu.eval.metrics import compare_ssim
from pcdms_tpu.eval.ssim_jax import ssim_jax
from pcdms_tpu.parallel.mesh import make_mesh


class TestSSIMJaxParity:
    @pytest.mark.parametrize("shape,data_range", [
        ((24, 24, 3), 1.0),
        ((32, 48, 3), 1.0),
        ((16, 16, 3), 2.0),
    ])
    def test_matches_host_compare_ssim(self, shape, data_range):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, data_range, shape).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.1 * data_range, shape),
                    0, data_range).astype(np.float32)
        host = compare_ssim(x, y, data_range=data_range, win_size=7)
        dev = float(ssim_jax(x[None], y[None], data_range=data_range)[0])
        assert abs(host - dev) < 1e-5

    def test_identical_images_score_one(self):
        x = np.random.default_rng(1).uniform(0, 1, (20, 20, 3))
        assert float(ssim_jax(x[None], x[None])[0]) == pytest.approx(1.0)

    def test_batched_equals_loop(self):
        rng = np.random.default_rng(2)
        xs = rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)
        ys = rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)
        batched = np.asarray(ssim_jax(xs, ys))
        singles = [float(ssim_jax(x[None], y[None])[0])
                   for x, y in zip(xs, ys)]
        np.testing.assert_allclose(batched, singles, atol=1e-6)


class TestDeviceSelectBest:
    def test_matches_host_selection(self):
        """Sample-major (S*n) candidate canvases: the device selection
        must pick the same candidates as best_of_n_ssim on the quantized
        readback and return their exact uint8 right-halves."""
        rng = np.random.default_rng(3)
        s, n, h, w = 3, 4, 24, 16
        images = rng.uniform(-1, 1, (s * n, h, 2 * w, 3)).astype(np.float32)
        gt_u8 = rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8)

        best_u8, best_idx = device_select_best(images, gt_u8, s)
        best_u8, best_idx = np.asarray(best_u8), np.asarray(best_idx)

        all_u8 = np.asarray(device_uint8(images))
        for j in range(n):
            cands = all_u8[j::n][:, :, w:, :]
            gt = gt_u8[j].astype(np.float32) / 127.5 - 1.0
            host_best = best_of_n_ssim(cands, gt)
            assert best_idx[j] == host_best
            np.testing.assert_array_equal(best_u8[j], cands[host_best])

    def test_no_crop_when_widths_match(self):
        """Stage-3 layout: candidate width == gt width, crop is a no-op."""
        rng = np.random.default_rng(4)
        s, n, h, w = 2, 3, 20, 20
        images = rng.uniform(-1, 1, (s * n, h, w, 3)).astype(np.float32)
        gt_u8 = rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8)
        best_u8, best_idx = device_select_best(images, gt_u8, s)
        all_u8 = np.asarray(device_uint8(images))
        for j in range(n):
            cands = all_u8[j::n]
            gt = gt_u8[j].astype(np.float32) / 127.5 - 1.0
            assert int(best_idx[j]) == best_of_n_ssim(cands, gt)
            np.testing.assert_array_equal(
                np.asarray(best_u8)[j], cands[int(best_idx[j])])


class TestStage2CLIDeviceSelect:
    """--device_select writes byte-identical artifacts to the host-select
    default (tiny geometry, random init): selection is protocol-equal,
    only the transport changes."""

    def test_identical_artifacts(self, monkeypatch, tmp_path):
        root = tmp_path / "data"
        img_dir = root / "train_all_png"
        pose_dir = root / "openpose_all_img"
        img_dir.mkdir(parents=True)
        pose_dir.mkdir()
        rng = np.random.default_rng(5)
        names = ["a", "b", "c"]
        for s_ in names:
            Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                         dtype=np.uint8)
                            ).save(img_dir / f"{s_}.png")
            Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                         dtype=np.uint8)
                            ).save(pose_dir / f"{s_}_pose.jpg")
        pairs = [{"source_image": f"train_all_png/{names[i]}.png",
                  "target_image":
                  f"train_all_png/{names[(i + 1) % 3]}.png"}
                 for i in range(3)]
        json_path = root / "test_pairs.json"
        json_path.write_text(json.dumps(pairs))

        from pcdms_tpu.cli.stage2_batchtest import main
        monkeypatch.setattr(cli_common, "default_mesh",
                            lambda: make_mesh(jax.devices()[:1]))
        outs = {}
        for mode in ("host", "device"):
            out_dir = str(tmp_path / mode)
            main(["--json_path", str(json_path),
                  "--image_root_path", str(root),
                  "--save_path", out_dir, "--img_width", "64",
                  "--img_height", "64", "--num_inference_steps", "2",
                  "--num_images_per_prompt", "3", "--scheduler", "ddim",
                  "--batch_size", "3", "--random_init", "--tiny_config",
                  "--simple_variant"]
                 + (["--device_select"] if mode == "device" else []))
            outs[mode] = {
                f: np.asarray(Image.open(os.path.join(out_dir, f)))
                for f in sorted(os.listdir(out_dir))}
        assert len(outs["host"]) == 3
        assert sorted(outs["host"]) == sorted(outs["device"])
        for k in outs["host"]:
            np.testing.assert_array_equal(outs["host"][k],
                                          outs["device"][k])


@pytest.mark.slow
class TestStage3CLIDeviceSelect:
    """Same contract for the stage-3 refiner CLI (no right-half crop;
    gt recovered from the float canvas via exact rint round-trip)."""

    def test_identical_artifacts(self, monkeypatch, tmp_path):
        root = tmp_path / "data"
        img_dir = root / "train_all_png"
        gen_dir = tmp_path / "gen"
        img_dir.mkdir(parents=True)
        gen_dir.mkdir()
        rng = np.random.default_rng(6)
        names = ["a", "b", "c"]
        for s_ in names:
            Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                         dtype=np.uint8)
                            ).save(img_dir / f"{s_}.png")
        pairs = [{"source_image": f"train_all_png/{names[i]}.png",
                  "target_image":
                  f"train_all_png/{names[(i + 1) % 3]}.png"}
                 for i in range(3)]
        for p in pairs:
            s_ = os.path.basename(p["source_image"]).rsplit(".", 1)[0]
            t_ = os.path.basename(p["target_image"]).rsplit(".", 1)[0]
            Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                         dtype=np.uint8)
                            ).save(gen_dir / f"{s_}_to_{t_}.png")
        json_path = root / "test_pairs.json"
        json_path.write_text(json.dumps(pairs))

        from pcdms_tpu.cli.stage3_batchtest import main
        monkeypatch.setattr(cli_common, "default_mesh",
                            lambda: make_mesh(jax.devices()[:1]))
        outs = {}
        for mode in ("host", "device"):
            out_dir = str(tmp_path / mode)
            main(["--json_path", str(json_path),
                  "--image_root_path", str(root),
                  "--gen_dir", str(gen_dir),
                  "--save_path", out_dir, "--img_width", "64",
                  "--img_height", "64", "--num_inference_steps", "2",
                  "--num_images_per_prompt", "3", "--scheduler", "ddim",
                  "--batch_size", "3", "--random_init", "--tiny_config"]
                 + (["--device_select"] if mode == "device" else []))
            outs[mode] = {
                f: np.asarray(Image.open(os.path.join(out_dir, f)))
                for f in sorted(os.listdir(out_dir))}
        assert len(outs["host"]) == 3
        for k in outs["host"]:
            np.testing.assert_array_equal(outs["host"][k],
                                          outs["device"][k])
