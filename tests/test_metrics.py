"""Metric suite tests (skimage is not installed; checked against analytic
values and invariants instead)."""

import numpy as np
import pytest

from pcdms_tpu.eval.metrics import (
    FID, ReconstructionMetrics, compare_l1, compare_mae, compare_psnr,
    compare_ssim, cosine_similarity, frechet_distance,
    preprocess_path_for_deform_task,
)


class TestPixelMetrics:
    def test_psnr_analytic(self):
        a = np.zeros((8, 8, 3))
        b = np.full((8, 8, 3), 0.1)
        # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
        np.testing.assert_allclose(compare_psnr(a, b, 1.0), 20.0, rtol=1e-6)

    def test_psnr_identical_inf(self):
        a = np.random.default_rng(0).random((4, 4, 3))
        assert compare_psnr(a, a) == float("inf")

    def test_l1_and_mae(self):
        a = np.full((2, 2), 1.0)
        b = np.full((2, 2), 0.5)
        np.testing.assert_allclose(compare_l1(a, b), 0.5)
        # mae = sum|a-b| / sum(a+b) = 2.0 / 6.0
        np.testing.assert_allclose(compare_mae(a, b), 2.0 / 6.0)

    def test_ssim_identical_is_one(self):
        img = np.random.default_rng(0).random((64, 64, 3))
        assert compare_ssim(img, img, win_size=7) == pytest.approx(1.0)
        assert compare_ssim(img, img, gaussian_weights=True, sigma=1.2,
                            use_sample_covariance=False) == pytest.approx(1.0)

    def test_ssim_decreases_with_noise(self):
        rng = np.random.default_rng(1)
        img = rng.random((64, 64, 3))
        small = np.clip(img + rng.normal(0, 0.05, img.shape), 0, 1)
        big = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1)
        s_small = compare_ssim(img, small, win_size=7)
        s_big = compare_ssim(img, big, win_size=7)
        assert 1.0 > s_small > s_big > 0.0

    def test_ssim_structural_change_detected(self):
        # structural change must reduce SSIM even with equal mean/var
        img = np.zeros((32, 32))
        img[4:12, 8:24] = 1.0          # horizontal bar
        shifted = np.roll(img, 12, axis=0)
        assert compare_ssim(img, shifted, data_range=1.0, win_size=7,
                            multichannel=False) < 0.9


class TestFrechet:
    def test_identical_is_zero(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(200, 16))
        mu, sigma = x.mean(0), np.cov(x, rowvar=False)
        assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6

    def test_mean_shift_analytic(self):
        # same covariance, mean shift d -> FID = ||d||^2
        sigma = np.eye(4)
        mu1 = np.zeros(4)
        mu2 = np.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(
            frechet_distance(mu1, sigma, mu2, sigma), 1.0, atol=1e-8)

    def test_diagonal_covariance_analytic(self):
        # diag covs a, b: trace(a) + trace(b) - 2 sum sqrt(a_i b_i)
        a = np.diag([1.0, 4.0])
        b = np.diag([9.0, 16.0])
        expected = (1 + 4) + (9 + 16) - 2 * (3 + 8)
        np.testing.assert_allclose(
            frechet_distance(np.zeros(2), a, np.zeros(2), b), expected,
            atol=1e-8)

    def test_fid_harness_with_fake_extractor(self):
        rng = np.random.default_rng(0)

        def feat(imgs):
            return imgs.reshape(len(imgs), -1)[:, :8]

        fid = FID(feat, batch_size=16)
        imgs1 = rng.random((64, 4, 4, 3)).astype(np.float32)
        mu1, s1 = fid.activation_statistics(imgs1)
        assert mu1.shape == (8,) and s1.shape == (8, 8)
        d = frechet_distance(mu1, s1, mu1, s1)
        assert abs(d) < 1e-6


class TestPairing:
    def test_to_pairing(self, tmp_path):
        gt = tmp_path / "gt"
        gen = tmp_path / "gen"
        gt.mkdir(), gen.mkdir()
        (gt / "img2.png").write_bytes(b"x")
        # leading char is stripped by the protocol
        (gen / "ximg1_to_img2.jpg").write_bytes(b"x")
        (gen / "xorphan_to_missing.jpg").write_bytes(b"x")
        gt_list, gen_list = preprocess_path_for_deform_task(str(gt), str(gen))
        assert len(gt_list) == len(gen_list) == 1
        assert gt_list[0].endswith("img2.png")


class TestCosine:
    def test_unit_vectors(self):
        a = np.array([[1.0, 0.0], [0.0, 1.0]])
        b = np.array([[1.0, 0.0], [1.0, 0.0]])
        np.testing.assert_allclose(cosine_similarity(a, b), [1.0, 0.0],
                                   atol=1e-12)


class TestReconstructionHarness:
    def test_compute_pair_keys(self):
        rng = np.random.default_rng(0)
        gt = rng.random((64, 64, 3))
        pred = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1)
        m = ReconstructionMetrics().compute_pair(gt, pred)
        assert set(m) == {"psnr", "ssim", "ssim_256", "mae", "l1"}
        assert 0 < m["ssim_256"] <= 1.0

    def test_from_disk_with_cache(self, tmp_path):
        from PIL import Image
        rng = np.random.default_rng(0)
        gt_dir, gen_dir = tmp_path / "gt", tmp_path / "gen"
        gt_dir.mkdir(), gen_dir.mkdir()
        for i in range(2):
            arr = (rng.random((64, 48, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(gt_dir / f"{i}.png")
            gen = arr.copy()
            gen[0, 0, 0] ^= 1          # finite PSNR (var of inf warns)
            Image.fromarray(gen).save(gen_dir / f"{i}.png")
        rm = ReconstructionMetrics()
        # images must exceed the reference's win_size=51 for plain SSIM
        out = rm.calculate_from_disk(str(gen_dir), str(gt_dir),
                                     save_path=str(tmp_path),
                                     img_size=(56, 64))
        assert out["psnr"][0] == float("inf") or out["psnr"][0] > 50
        assert (tmp_path / "56_64_metrics.npz").exists()
        # second call hits the cache
        out2 = rm.calculate_from_disk(str(gen_dir), str(gt_dir),
                                      save_path=str(tmp_path),
                                      img_size=(56, 64))
        assert out2["ssim_256"] == out["ssim_256"]

    def test_empty_pairing_raises(self, tmp_path):
        """Empty gen/GT dirs must error loudly, not emit NaN means."""
        gt_dir, gen_dir = tmp_path / "gt", tmp_path / "gen"
        gt_dir.mkdir(), gen_dir.mkdir()
        rm = ReconstructionMetrics()
        with pytest.raises(ValueError, match="no generated/GT image"):
            rm.calculate_from_disk(str(gen_dir), str(gt_dir),
                                   img_size=(56, 64))

    def test_win_size_exceeding_image_raises(self):
        rng = np.random.default_rng(0)
        img = rng.random((24, 24, 3))
        rm = ReconstructionMetrics()          # reference win_size=51
        with pytest.raises(ValueError, match="win_size=51 exceeds"):
            rm.compute_pair(img, img)
