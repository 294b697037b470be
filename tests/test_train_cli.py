"""End-to-end CI drives of the three train CLI ``main()``s — the exact
counterpart of test_batchtest_cli.py for training: tiny configs on the
8-device mesh, a few steps, finite descending loss, checkpoints on
cadence, TensorBoard events, and the ``--resume_from_checkpoint`` path.

Reference launchers: /root/reference/run_stage{1,2,3}.sh (accelerate +
DeepSpeed over 8 GPUs).
"""

import glob
import json
import logging
import os
import re

import numpy as np
import pytest
from PIL import Image

from pcdms_tpu.train import checkpoint as ckpt

pytestmark = pytest.mark.slow


def _losses_from_log(caplog):
    out = []
    for rec in caplog.records:
        m = re.match(r"step (\d+) loss ([-\d.einfa]+)", rec.getMessage())
        if m:
            out.append((int(m.group(1)), float(m.group(2))))
    return out


def _common(tmp_path, steps=20):
    return ["--output_dir", str(tmp_path / "out"),
            "--tiny_config", "--random_init", "--synthetic_data",
            "--max_train_steps", str(steps),
            "--checkpointing_steps", "8",
            "--train_batch_size", "8",
            "--img_height", "64", "--img_width", "64",
            "--learning_rate", "1e-2", "--lr_warmup_steps", "1",
            "--log_every", "1", "--mixed_precision", "no",
            "--report_to", "tensorboard", "--zero1"]


def _check_run(caplog, out_dir, steps=20):
    losses = _losses_from_log(caplog)
    assert [s for s, _ in losses] == list(range(1, steps + 1))
    vals = [v for _, v in losses]
    assert np.isfinite(vals).all()
    # descending: each step draws a fresh random batch + noise, so compare
    # window means rather than endpoints
    assert np.mean(vals[-5:]) < np.mean(vals[:5]), vals
    # checkpoints on the cadence (8) plus the closing off-cadence save
    assert ckpt.latest_step(out_dir) == steps
    # TensorBoard event file written
    assert glob.glob(os.path.join(out_dir, "logs", "events.out.*"))


class TestStage1TrainMain:
    def test_synthetic_end_to_end(self, tmp_path, caplog):
        from pcdms_tpu.cli.stage1_train import main
        with caplog.at_level(logging.INFO, logger="pcdms_tpu.train"):
            main(_common(tmp_path))
        _check_run(caplog, str(tmp_path / "out"))

    def test_resume_from_checkpoint_cli(self, tmp_path, caplog):
        """Interrupt at step 3, resume via the CLI flag, finish at 6 —
        the reference's load_training_checkpoint path
        (stage1_train_prior_model.py:48-63)."""
        from pcdms_tpu.cli.stage1_train import main
        out = str(tmp_path / "out")
        main(_common(tmp_path, steps=3))
        assert ckpt.latest_step(out) == 3
        with caplog.at_level(logging.INFO, logger="pcdms_tpu.train"):
            main(_common(tmp_path, steps=6) + ["--resume_from_checkpoint"])
        assert ckpt.latest_step(out) == 6
        steps_logged = [s for s, _ in _losses_from_log(caplog)]
        assert steps_logged[0] == 4            # continued, not restarted


class TestStage2TrainMain:
    def test_synthetic_end_to_end(self, tmp_path, caplog):
        from pcdms_tpu.cli.stage2_train import main
        with caplog.at_level(logging.INFO, logger="pcdms_tpu.train"):
            main(_common(tmp_path))
        _check_run(caplog, str(tmp_path / "out"))

    def test_real_tiny_dataset(self, tmp_path, caplog):
        """Stage-2 main() over an on-disk tiny DeepFashion layout with
        worker-pool loading + tiny frozen encoders (no --synthetic_data)."""
        from pcdms_tpu.cli.stage2_train import main
        root = tmp_path / "df"
        img_dir = root / "train_all_png"
        pose_dir = root / "openpose_all_img"
        img_dir.mkdir(parents=True)
        pose_dir.mkdir()
        rng = np.random.default_rng(0)
        names = [f"p{i}" for i in range(8)]
        for stem in names:
            Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                         dtype=np.uint8)).save(
                img_dir / f"{stem}.png")
            Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                         dtype=np.uint8)).save(
                pose_dir / f"{stem}_pose.jpg")
        pairs = [{"source_image": f"train_all_png/{names[i]}.jpg",
                  "target_image":
                      f"train_all_png/{names[(i + 1) % 8]}.jpg"}
                 for i in range(8)]
        jp = root / "pairs.json"
        jp.write_text(json.dumps(pairs))

        steps = 3
        argv = ["--output_dir", str(tmp_path / "out2"),
                "--tiny_config", "--random_init",
                "--json_path", str(jp), "--image_root_path", str(root),
                "--max_train_steps", str(steps),
                "--checkpointing_steps", "2",
                "--train_batch_size", "8",
                "--img_height", "64", "--img_width", "64",
                "--learning_rate", "1e-2", "--lr_warmup_steps", "1",
                "--log_every", "1", "--mixed_precision", "no",
                "--dataloader_num_workers", "4"]
        with caplog.at_level(logging.INFO, logger="pcdms_tpu.train"):
            main(argv)
        losses = _losses_from_log(caplog)
        assert len(losses) == steps
        assert np.isfinite([v for _, v in losses]).all()
        assert ckpt.latest_step(str(tmp_path / "out2")) == steps


class TestStage3TrainMain:
    def test_synthetic_end_to_end(self, tmp_path, caplog):
        from pcdms_tpu.cli.stage3_train import main
        with caplog.at_level(logging.INFO, logger="pcdms_tpu.train"):
            main(_common(tmp_path))
        _check_run(caplog, str(tmp_path / "out"))
