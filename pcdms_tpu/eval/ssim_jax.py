"""On-device (jittable) SSIM for batch-test candidate selection.

``eval/metrics.compare_ssim`` is the scoring protocol of the batch-test
CLIs (reference ``stage2_batchtest_inpaint_model.py:212-225``): skimage
semantics, uniform 7x7 windows with reflect padding, interior crop of
``(win_size-1)//2`` on every side, per-channel SSIM averaged last. The
reflect padding only ever touches the ``pad`` border that the interior
crop then discards, so the cropped result is EXACTLY the mean of
VALID-window statistics — which is what this module computes with one
``lax.reduce_window`` per moment field. That makes ``ssim_jax``
mathematically identical to ``compare_ssim(..., win_size=7,
gaussian_weights=False, use_sample_covariance=True)`` on the same
inputs; the only deviation is arithmetic precision (f32 on device vs
the host path's f64), which can reorder candidates whose scores agree
to ~1e-6 — far below any meaningful quality difference.

Why it exists: best-of-N selection on the host costs five
``scipy.ndimage.uniform_filter`` passes per channel per candidate
(N x 15 filtered fields per pair at 512px) plus an N-candidate
device->host readback; on device the same statistics are a handful of
fused reductions, and only the single selected candidate crosses the
PCIe link (see ``cli/common.device_select_best``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mean_valid(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """VALID-window mean over the two spatial dims of (B, H, W, C)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, win, win, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID")
    return s / (win * win)


def ssim_jax(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
             win_size: int = 7) -> jnp.ndarray:
    """Batched SSIM of (B, H, W, C) images in [0, data_range] -> (B,).

    Matches ``eval/metrics.compare_ssim`` (skimage defaults: uniform
    window, sample covariance, K1=0.01/K2=0.03, multichannel = mean of
    per-channel scores) up to f32 rounding; see module docstring.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)            # sample covariance

    ux = _mean_valid(x, win_size)
    uy = _mean_valid(y, win_size)
    uxx = _mean_valid(x * x, win_size)
    uyy = _mean_valid(y * y, win_size)
    uxy = _mean_valid(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2))
    # interior mean over (H', W') x channel mean == flat mean: the
    # cropped extent is identical for every channel
    return jnp.mean(s, axis=(1, 2, 3))
