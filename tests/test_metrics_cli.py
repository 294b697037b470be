"""End-to-end drive of cli/calculate_metrics.py — the equivalent of the
reference's caculate_metrics_{256,512}.py (metrics protocol: FID vs the
train split with npz-cached statistics, LPIPS + SSIM/PSNR/L1/MAE vs GT
with the '_to_' filename pairing, results appended to a txt report).

Inception/LPIPS weights are random full-geometry torch state dicts
(shared builders with tests/test_inception_lpips_parity.py, where the
same graphs are numerically parity-tested against torch mirrors).
"""

import os

import numpy as np
import pytest
import torch
from PIL import Image

from pcdms_tpu.cli.calculate_metrics import main, parse_args
from test_inception_lpips_parity import build_inception_sd, build_lpips_sd

pytestmark = pytest.mark.slow

TARGETS = ["ta.png", "tb.png", "tc.png"]


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("metrics_cli")
    gt, gen, train = root / "gt", root / "gen", root / "train"
    for d in (gt, gen, train):
        d.mkdir()
    rng = np.random.default_rng(0)
    for i, t in enumerate(TARGETS):
        arr = rng.integers(0, 255, (96, 72, 3), dtype=np.uint8)
        Image.fromarray(arr).save(gt / t)
        # generated file: '{src}_to_{tgt}' with a leading char the pairing
        # drops (reference metrics.py:421-437 takes basename[1:])
        noisy = np.clip(arr.astype(np.int16)
                        + rng.integers(-20, 20, arr.shape), 0,
                        255).astype(np.uint8)
        Image.fromarray(noisy).save(gen / f"gs{i}_to_{t}")
        Image.fromarray(rng.integers(0, 255, (96, 72, 3),
                                     dtype=np.uint8)).save(
            train / f"train{i}.png")
    return root, gt, gen, train


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    wdir = tmp_path_factory.mktemp("weights")
    inception = wdir / "inception.pth"
    lpips = wdir / "lpips.pth"
    torch.save(build_inception_sd(), inception)
    torch.save(build_lpips_sd(), lpips)
    return str(inception), str(lpips)


def _run(dirs, weights, resolution, save_name):
    root, gt, gen, train = dirs
    main(["--fid_real_path", str(train), "--test_path", str(gt),
          "--generated_path", str(gen), "--resolution", str(resolution),
          "--save_name", save_name,
          "--inception_weights", weights[0],
          "--lpips_weights", weights[1]])


def _parse_report(path):
    with open(path) as f:
        return f.read().strip().splitlines()


class TestCalculateMetricsCLI:
    @pytest.mark.parametrize("resolution,size_flag",
                             [(256, "176_256"), (512, "352_512")])
    def test_full_protocol(self, dirs, weights, tmp_path, resolution,
                           size_flag):
        root, gt, gen, train = dirs
        save = str(tmp_path / f"m{resolution}")
        _run(dirs, weights, resolution, save)

        # npz caches at the protocol resolution
        assert os.path.exists(train / f"{size_flag}_statistics.npz")
        assert os.path.exists(gen / f"{size_flag}_statistics.npz")
        assert os.path.exists(gen / f"{size_flag}_metrics.npz")

        lines = _parse_report(f"{save}_results.txt")
        assert len(lines) == 1 and str(gen) in lines[0]
        for key in ("fid", "lpips", "ssim", "ssim_256", "psnr", "mae",
                    "l1"):
            assert f"'{key}'" in lines[0], (key, lines[0])
        # every reported scalar is finite
        rec = eval(lines[0].split(" ", 1)[1])      # noqa: S307 (test)
        flat = {k: (v[0] if isinstance(v, list) else v)
                for k, v in rec.items()}
        assert all(np.isfinite(v) for v in flat.values()), flat
        assert flat["fid"] >= 0 and flat["lpips"] >= 0
        assert 0 < flat["ssim"] <= 1

    def test_caches_reused_and_report_appended(self, dirs, weights,
                                               tmp_path):
        root, gt, gen, train = dirs
        save = str(tmp_path / "mc")
        _run(dirs, weights, 256, save)
        # remove the raw train images: a second run can only succeed via
        # the cached statistics npz (reference metrics.py:97-121)
        stats = train / "176_256_statistics.npz"
        assert stats.exists()
        for f in train.glob("*.png"):
            f.unlink()
        _run(dirs, weights, 256, save)
        lines = _parse_report(f"{save}_results.txt")
        assert len(lines) == 2                     # appended, not replaced
        fids = [eval(l.split(" ", 1)[1])["fid"] for l in lines]  # noqa
        assert fids[0] == pytest.approx(fids[1])

    def test_pairing_respected(self, dirs):
        from pcdms_tpu.eval.metrics import preprocess_path_for_deform_task
        root, gt, gen, train = dirs
        gt_list, kept = preprocess_path_for_deform_task(str(gt), str(gen))
        assert len(gt_list) == len(TARGETS)
        assert [os.path.basename(g) for g in gt_list] == TARGETS
        assert all("_to_" in os.path.basename(k) for k in kept)

    def test_metrics_skipped_without_weights(self, dirs, tmp_path,
                                             caplog):
        import logging
        root, gt, gen, train = dirs
        save = str(tmp_path / "nw")
        with caplog.at_level(logging.WARNING, "pcdms_tpu.metrics"):
            main(["--fid_real_path", str(train), "--test_path", str(gt),
                  "--generated_path", str(gen), "--resolution", "256",
                  "--save_name", save])
        msgs = " ".join(r.getMessage() for r in caplog.records)
        assert "skipping FID" in msgs and "skipping LPIPS" in msgs
        line = _parse_report(f"{save}_results.txt")[0]
        assert "'ssim'" in line and "'fid'" not in line
