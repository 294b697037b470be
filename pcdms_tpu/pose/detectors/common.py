"""Shared protocol helpers + JAX conv primitives for the aux detectors.

The reference vendors controlnet-aux 0.0.6; every detector shares the same
host-side image protocol (/root/reference/src/controlnet_aux/util.py):
uint8 HWC3 input, resized so min(H, W) == detect_resolution rounded to a
multiple of 64 (Lanczos up / area down), model output resized back to the
image_resolution grid, optional edge-NMS "scribble" post-pass.

The models themselves run as JAX NHWC pytrees (device-jittable); torch
checkpoints are converted once (OIHW -> HWIO) at load.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# host-side image protocol (numpy/cv2)
# ---------------------------------------------------------------------------


def hwc3(x: np.ndarray) -> np.ndarray:
    """Coerce to 3-channel uint8 (util.py:HWC3 semantics incl. alpha)."""
    assert x.dtype == np.uint8
    if x.ndim == 2:
        x = x[:, :, None]
    c = x.shape[2]
    if c == 3:
        return x
    if c == 1:
        return np.concatenate([x] * 3, axis=2)
    color = x[:, :, :3].astype(np.float32)
    alpha = x[:, :, 3:4].astype(np.float32) / 255.0
    return (color * alpha + 255.0 * (1.0 - alpha)).clip(0, 255).astype(np.uint8)


def shape_to_64(h: int, w: int, resolution: int):
    """The output grid resize_to_64 would produce, without resizing."""
    k = float(resolution) / min(h, w)
    return (int(np.round(h * k / 64.0)) * 64,
            int(np.round(w * k / 64.0)) * 64)


def resize_to_64(img: np.ndarray, resolution: int) -> np.ndarray:
    """Scale so min side ~= resolution, snapped to multiples of 64
    (util.py:resize_image: Lanczos upsample / area downsample)."""
    import cv2
    h, w = img.shape[:2]
    nh, nw = shape_to_64(h, w, resolution)
    interp = (cv2.INTER_LANCZOS4 if resolution > min(h, w)
              else cv2.INTER_AREA)
    return cv2.resize(img, (nw, nh), interpolation=interp)


def edge_nms(x: np.ndarray, t: float, s: float) -> np.ndarray:
    """Directional edge thinning (util.py:nms): keep pixels that are the
    local max of a Gaussian-blurred map along any of 4 line directions,
    then threshold to {0, 255}."""
    import cv2
    x = cv2.GaussianBlur(x.astype(np.float32), (0, 0), s)
    horiz = np.array([[0, 0, 0], [1, 1, 1], [0, 0, 0]], np.uint8)
    vert = horiz.T.copy()
    diag = np.eye(3, dtype=np.uint8)
    anti = diag[::-1].copy()
    y = np.zeros_like(x)
    for f in (horiz, vert, diag, anti):
        np.putmask(y, cv2.dilate(x, kernel=f) == x, x)
    out = np.zeros_like(y, dtype=np.uint8)
    out[y > t] = 255
    return out


def scribble_postprocess(detected: np.ndarray) -> np.ndarray:
    """NMS + blur + binarize used by hed/pidi scribble modes
    (hed/__init__.py:124-127)."""
    import cv2
    out = edge_nms(detected, 127, 3.0)
    out = cv2.GaussianBlur(out, (0, 0), 3.0)
    out[out > 4] = 255
    out[out < 255] = 0
    return out


def safe_step(x: np.ndarray, step: int = 2) -> np.ndarray:
    """Quantize [0,1] maps to step+1 levels (util.py:safe_step)."""
    y = x.astype(np.float32) * float(step + 1)
    return y.astype(np.int32).astype(np.float32) / float(step)


# ---------------------------------------------------------------------------
# JAX NHWC primitives (torch-semantic)
# ---------------------------------------------------------------------------

def conv(x, kernel, bias=None, *, stride: int = 1, padding: int = 0,
         dilation: int = 1, groups: int = 1):
    """torch.nn.Conv2d semantics on NHWC / HWIO."""
    pad = ((padding, padding), (padding, padding)) if isinstance(padding, int) \
        else padding
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), pad,
        rhs_dilation=(dilation, dilation), feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def conv_transpose(x, kernel, bias=None, *, stride: int = 2,
                   padding: int = 1, output_padding: int = 1):
    """torch.nn.ConvTranspose2d semantics via an input-dilated conv.

    kernel is stored pre-flipped in HWIO with (in, out) swapped relative
    to torch's (in, out, kH, kW) layout (see convert helpers), so this is
    a plain fractionally-strided convolution.
    """
    k = kernel.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d(affine=False): per-(sample, channel) spatial norm."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def reflect_pad(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="reflect")


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


def max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def bilinear_resize(x, h: int, w: int):
    """F.interpolate(mode='bilinear', align_corners=False) equivalent
    (jax.image.resize uses half-pixel centers)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


# ---------------------------------------------------------------------------
# torch state-dict conversion helpers
# ---------------------------------------------------------------------------

def t2j_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kH, kW) -> HWIO."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def t2j_conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kH, kW) -> spatially flipped
    HWIO with I/O in conv orientation (pairs with ``conv_transpose``)."""
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def load_torch_state_dict(path: str):
    """Load a torch checkpoint into {name: np.ndarray} without keeping
    torch tensors alive (detectors are host-side; weights are small)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "module"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return {k.replace("module.", ""): v.detach().numpy()
            for k, v in sd.items()}
