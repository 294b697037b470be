"""Evaluation metric suite.

Torch/skimage-free reimplementation of the reference protocol
(/root/reference/metrics.py; /root/reference/caculate_metrics_{256,512}.py):

  * PSNR / L1 / MAE on [0,1] bicubic-resized images (176x256 or 352x512)
  * SSIM, two variants exactly as the reference computes them:
      - plain: uniform 51x51 window, sample covariance, data_range=1
        (metrics.py:261,344-345)
      - ssim_256: gaussian weights sigma=1.2, no sample covariance, on
        0-255 images with data_range = pred.max()-pred.min()
        (metrics.py:351-355)
  * FID: pluggable 2048-d feature extractor (InceptionV3 pool3 — see
    pcdms_tpu/eval/inception.py), per-directory mu/sigma cached to
    ``{W}_{H}_statistics.npz``, Frechet distance with the sqrtm
    stabilization (metrics.py:97-121,206-257)
  * ``{src}_to_{tgt}`` filename pairing (metrics.py:421-437)
  * per-example ``*_metrics.npz`` caching (metrics.py:313-317)
  * stage-1 cosine similarity proxy
    (/root/reference/stage1_batchtest_prior_model.py:119-122)

SSIM matches skimage.metrics.structural_similarity semantics: per-channel
2D windows averaged over channels, K1=0.01/K2=0.03, edge crop of
(win_size-1)//2, gaussian truncate=3.5.
"""

from __future__ import annotations

import glob
import os
import warnings
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
from scipy import linalg, ndimage


# ---------------------------------------------------------------------------
# pixel metrics
# ---------------------------------------------------------------------------

def compare_psnr(img_true: np.ndarray, img_test: np.ndarray,
                 data_range: float = 1.0) -> float:
    err = np.mean((img_true.astype(np.float64)
                   - img_test.astype(np.float64)) ** 2)
    if err == 0:
        return float("inf")
    return float(10.0 * np.log10((data_range ** 2) / err))


def compare_l1(img_true: np.ndarray, img_test: np.ndarray) -> float:
    return float(np.mean(np.abs(img_true.astype(np.float32)
                                - img_test.astype(np.float32))))


def compare_mae(img_true: np.ndarray, img_test: np.ndarray) -> float:
    """The reference's 'mae': sum|a-b| / sum(a+b) (metrics.py:415-419)."""
    a = img_true.astype(np.float32)
    b = img_test.astype(np.float32)
    return float(np.sum(np.abs(a - b)) / np.sum(a + b))


def _ssim_single(x: np.ndarray, y: np.ndarray, data_range: float,
                 win_size: int, gaussian_weights: bool, sigma: float,
                 use_sample_covariance: bool) -> float:
    """skimage-compatible single-channel SSIM."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)

    if gaussian_weights:
        truncate = 3.5
        r = int(truncate * sigma + 0.5)
        win_size = 2 * r + 1

        def filt(im):
            return ndimage.gaussian_filter(im, sigma=sigma,
                                           truncate=truncate, mode="reflect")
    else:
        def filt(im):
            return ndimage.uniform_filter(im, size=win_size, mode="reflect")

    if any(s < win_size for s in x.shape):
        # skimage raises here too; without this the interior slice below
        # is empty and inner.mean() silently yields NaN with a
        # mean-of-empty-slice RuntimeWarning
        raise ValueError(
            f"win_size={win_size} exceeds image extent {x.shape}; use "
            "smaller win_size or larger images")

    ndim = x.ndim
    NP = win_size ** ndim
    cov_norm = NP / (NP - 1) if use_sample_covariance else 1.0

    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2

    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))

    pad = (win_size - 1) // 2
    inner = S[tuple(slice(pad, s - pad) for s in S.shape)]
    return float(inner.mean())


def compare_ssim(img_true: np.ndarray, img_test: np.ndarray,
                 data_range: float = 1.0, win_size: int = 7,
                 gaussian_weights: bool = False, sigma: float = 1.5,
                 use_sample_covariance: bool = True,
                 multichannel: bool = True) -> float:
    """Multichannel SSIM = mean of per-channel SSIM (channel_axis=-1)."""
    if multichannel and img_true.ndim == 3:
        vals = [
            _ssim_single(img_true[..., c], img_test[..., c], data_range,
                         win_size, gaussian_weights, sigma,
                         use_sample_covariance)
            for c in range(img_true.shape[-1])
        ]
        return float(np.mean(vals))
    return _ssim_single(img_true, img_test, data_range, win_size,
                        gaussian_weights, sigma, use_sample_covariance)


# ---------------------------------------------------------------------------
# file handling
# ---------------------------------------------------------------------------

def get_image_list(flist) -> List[str]:
    if isinstance(flist, (list, tuple, np.ndarray)):
        return list(flist)
    if os.path.isdir(flist):
        files = glob.glob(os.path.join(flist, "*.jpg")) + \
            glob.glob(os.path.join(flist, "*.png"))
        return sorted(files)
    if os.path.isfile(flist):
        return [flist]
    return []


def preprocess_path_for_deform_task(gt_path: str, distorted_path):
    """Pair generated '{src}_to_{tgt}' files with their GT images
    (metrics.py:421-437: drops the first character of the basename, splits
    on '_to_', maps .jpg -> .png)."""
    distorted_list = sorted(get_image_list(distorted_path))
    gt_list, kept = [], []
    for f in distorted_list:
        name = os.path.basename(f)[1:]
        name = name.split("_to_")[-1]
        gt_image = os.path.join(gt_path, name.replace("jpg", "png"))
        if not os.path.isfile(gt_image):
            continue
        gt_list.append(gt_image)
        kept.append(f)
    return gt_list, kept


def _load_resized(path: str, img_size: Tuple[int, int]) -> np.ndarray:
    """imread + cv2 INTER_CUBIC resize to (W, H), /255 (metrics.py:330)."""
    import cv2
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"), np.float32)
    img = cv2.resize(img, img_size, interpolation=cv2.INTER_CUBIC)
    return img / 255.0


# ---------------------------------------------------------------------------
# reconstruction harness
# ---------------------------------------------------------------------------

class ReconstructionMetrics:
    def __init__(self, data_range: float = 1.0, win_size: int = 51,
                 multichannel: bool = True):
        self.data_range = data_range
        self.win_size = win_size
        self.multichannel = multichannel

    def compute_pair(self, img_gt: np.ndarray, img_pred: np.ndarray):
        """Images in [0,1], (H, W, 3)."""
        out = {
            "psnr": compare_psnr(img_gt, img_pred, self.data_range),
            "ssim": compare_ssim(img_gt, img_pred, self.data_range,
                                 win_size=self.win_size,
                                 multichannel=self.multichannel),
            "l1": compare_l1(img_gt, img_pred),
            "mae": compare_mae(img_gt, img_pred),
        }
        g255, p255 = img_gt * 255.0, img_pred * 255.0
        out["ssim_256"] = compare_ssim(
            g255, p255, data_range=float(p255.max() - p255.min()),
            gaussian_weights=True, sigma=1.2, use_sample_covariance=False,
            multichannel=True)
        return out

    def calculate_from_disk(self, inputs, gts, save_path: Optional[str] = None,
                            img_size: Tuple[int, int] = (176, 256),
                            sort: bool = True):
        input_list = sorted(get_image_list(inputs)) if sort \
            else get_image_list(inputs)
        gt_list = sorted(get_image_list(gts)) if sort else get_image_list(gts)

        size_flag = f"{img_size[0]}_{img_size[1]}"
        npz_file = (os.path.join(save_path, size_flag + "_metrics.npz")
                    if save_path else None)
        if npz_file and os.path.exists(npz_file):
            f = np.load(npz_file)
            vals = {k: f[k] for k in ("psnr", "ssim", "ssim_256", "mae",
                                      "l1")}
        else:
            if not input_list or not gt_list:
                # an empty pairing would silently yield NaN means
                # (numpy mean-of-empty-slice); fail loudly instead
                raise ValueError(
                    "no generated/GT image pairs to score (check the "
                    "'_to_' filename pairing and directory paths)")
            vals = {k: [] for k in ("psnr", "ssim", "ssim_256", "mae", "l1")}
            for pred_path, gt_path in zip(input_list, gt_list):
                img_gt = _load_resized(gt_path, img_size)
                img_pred = _load_resized(pred_path, img_size)
                pair = self.compute_pair(img_gt, img_pred)
                for k in vals:
                    vals[k].append(pair[k])
            if npz_file:
                np.savez(npz_file, **{k: np.asarray(v)
                                      for k, v in vals.items()})

        return {
            **{k: [round(float(np.mean(v)), 6)] for k, v in vals.items()},
            **{f"{k}_variance": [round(float(np.var(v)), 6)]
               for k, v in vals.items()},
        }


# ---------------------------------------------------------------------------
# FID
# ---------------------------------------------------------------------------

def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance with the standard sqrtm stabilization
    (metrics.py:206-257)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    # scipy deprecated sqrtm's disp/tuple return (removal in 1.18);
    # errors now surface as non-finite entries, which the eps-offset
    # retry below already handles (the reference relied on disp=False
    # for the same stabilization, metrics.py:206-257)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        covmean = linalg.sqrtm(sigma1.dot(sigma2))
        if not np.isfinite(covmean).all():
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("large imaginary component in cov sqrt")
        covmean = covmean.real

    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


class FID:
    """FID harness with a pluggable feature extractor.

    feature_fn: (B, H, W, 3) float32 in [0, 1] -> (B, D) features.
    The canonical extractor is InceptionV3 pool3 (D=2048) with torchvision
    FID weights (pcdms_tpu/eval/inception.py + compat converter).
    """

    def __init__(self, feature_fn: Callable, batch_size: int = 128):
        self.feature_fn = feature_fn
        self.batch_size = batch_size

    def activation_statistics(self, images: np.ndarray):
        # the reference uses only n_batches * batch_size images,
        # dropping the ragged tail (metrics.py:170-184) — statistics
        # must match for cached npz interchangeability
        batch_size = min(self.batch_size, len(images))
        n_used = (len(images) // batch_size) * batch_size
        feats = []
        for i in range(0, n_used, batch_size):
            feats.append(np.asarray(
                self.feature_fn(images[i:i + batch_size])))
        feats = np.concatenate(feats, axis=0)
        mu = feats.mean(axis=0)
        sigma = np.cov(feats, rowvar=False)
        return mu, sigma

    def compute_statistics_of_path(self, path: str,
                                   img_size: Tuple[int, int]):
        size_flag = f"{img_size[0]}_{img_size[1]}"
        npz_file = os.path.join(path, size_flag + "_statistics.npz")
        if os.path.exists(npz_file):
            f = np.load(npz_file)
            mu, sigma = f["mu"][:], f["sigma"][:]
            f.close()
            return mu, sigma
        files = get_image_list(path)
        images = np.stack([_load_resized(f, img_size) for f in files])
        mu, sigma = self.activation_statistics(images)
        np.savez(npz_file, mu=mu, sigma=sigma)
        return mu, sigma

    def calculate_from_disk(self, generated_path: str, gt_path: str,
                            img_size: Tuple[int, int]) -> float:
        m1, s1 = self.compute_statistics_of_path(gt_path, img_size)
        m2, s2 = self.compute_statistics_of_path(generated_path, img_size)
        return frechet_distance(m1, s1, m2, s2)


# ---------------------------------------------------------------------------
# stage-1 proxy metric
# ---------------------------------------------------------------------------

def cosine_similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine similarity (stage1_batchtest_prior_model.py:119-122)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = np.sum(a * b, axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-12)
