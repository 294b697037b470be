"""LeReS++ boost: pix2pix depth-merge network + multi-resolution boosting.

Behavioral equivalent of /root/reference/src/controlnet_aux/leres/
pix2pix/ + leres/depthmap.py (the BoostingMonocularDepth protocol):

  * merge network = pix2pix ``UnetGenerator(input_nc=2, output_nc=1,
    num_downs=10, ngf=64, norm='none')`` — ten bias-free k4/s2/p1
    downsamples and symmetric ConvTranspose upsamples with skip concat,
    LeakyReLU(0.2)/ReLU, tanh head, biased outermost upconv
    (pix2pix/models/networks.py:444-543, pix2pix4depth_model.py:32,63)
  * ``doubleestimate``: run LeReS at the receptive-field size (448) and
    at the adaptive R20 resolution, min-max normalize both to [-1, 1],
    merge at 1024x1024 through the network (depthmap.py:96-155)
  * ``estimateboost``: gradient-driven resolution search
    (calculateprocessingres), adaptive patch selection over a gradient
    integral image, per-patch double estimation merged back under a
    Gaussian blend mask with a linear polynomial value fit
    (depthmap.py:52-548).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.nn.layers import conv2d_init
from pcdms_tpu.pose.detectors.common import (
    conv, conv_transpose, leaky_relu, t2j_conv, t2j_conv_transpose,
)

_PIX2PIX_SIZE = 1024
_RECEPTIVE = 448                    # LeReS receptive field
_WHOLE_SIZE_THRESHOLD = 3000

# (outer_nc, inner_nc) outermost -> innermost, UnetGenerator(2,1,10,64)
_LEVELS = ([(1, 64), (64, 128), (128, 256), (256, 512)]
           + [(512, 512)] * 6)
_INPUT_NC = 2


# ---------------------------------------------------------------------------
# merge network (norm='none': bias-free convs, Identity norms, biased
# outermost upconv)
# ---------------------------------------------------------------------------

def pix2pix_init(key, dtype=jnp.float32) -> List[Dict]:
    params = []
    for i, (outer, inner) in enumerate(_LEVELS):
        kd, ku = jax.random.split(jax.random.fold_in(key, i))
        innermost = i == len(_LEVELS) - 1
        in_ch = _INPUT_NC if i == 0 else outer
        up_in = inner if innermost else inner * 2
        down = conv2d_init(kd, in_ch, inner, 4, dtype=dtype)
        up = conv2d_init(ku, up_in, outer, 4, dtype=dtype)
        if i != 0:
            up["bias"] = None
        down["bias"] = None
        params.append({"down": down, "up": up})
    return params


def _apply_level(params: List[Dict], i: int, x):
    level = params[i]
    outermost = i == 0
    innermost = i == len(params) - 1

    h = x if outermost else leaky_relu(x, 0.2)
    h = conv(h, level["down"]["kernel"], level["down"]["bias"],
             stride=2, padding=1)
    if not innermost:
        h = _apply_level(params, i + 1, h)
    h = jax.nn.relu(h)
    h = conv_transpose(h, level["up"]["kernel"], level["up"]["bias"],
                       stride=2, padding=1, output_padding=0)
    if outermost:
        return jnp.tanh(h)
    return jnp.concatenate([x, h], axis=-1)


def pix2pix_apply(params: List[Dict], x):
    """x: (N, 1024, 1024, 2) [outer, inner] in [-1, 1] ->
    (N, 1024, 1024, 1) in [-1, 1]."""
    return _apply_level(params, 0, x)


def convert_pix2pix4depth(sd: Dict[str, np.ndarray]) -> List[Dict]:
    """latest_net_G.pth state dict -> per-level param list (same nested
    Sequential key layout as the normed pix2pix variants — see below)."""
    params = []
    prefix = "model.model."
    for i in range(len(_LEVELS)):
        outermost = i == 0
        innermost = i == len(_LEVELS) - 1
        di = 0 if outermost else 1
        # norm='none' produces Identity MODULES that still occupy
        # Sequential slots (networks.py:31-32, 507-530), so the key
        # layout matches the normed variant: outermost [down, sub, relu,
        # up, tanh] -> up at 3; innermost [relu, down, relu, up, norm]
        # -> up at 3; middle [relu, down, norm, sub, relu, up, norm] ->
        # up at 5, submodule at 3
        ui = 3 if (outermost or innermost) else 5
        down = {"kernel": jnp.asarray(t2j_conv(sd[f"{prefix}{di}.weight"])),
                "bias": None}
        up = {"kernel": jnp.asarray(
            t2j_conv_transpose(sd[f"{prefix}{ui}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}{ui}.bias"]))
            if outermost else None}
        params.append({"down": down, "up": up})
        prefix += "1.model." if outermost else "3.model."
    return params


def merge_depths(params: List[Dict], outer: np.ndarray,
                 inner: np.ndarray, apply_fn=None) -> np.ndarray:
    """Pix2Pix4DepthModel.set_input + test (pix2pix4depth_model.py:
    96-117): min-max normalize each 1024x1024 estimate to [-1, 1],
    merge, return [0, 1] map."""
    def norm(x):
        x = x.astype(np.float32)
        rng = x.max() - x.min()
        x = (x - x.min()) / max(rng, 1e-12)
        return x * 2.0 - 1.0

    stacked = np.stack([norm(outer), norm(inner)], axis=-1)[None]
    fn = apply_fn if apply_fn is not None else pix2pix_apply
    out = np.asarray(fn(params, jnp.asarray(stacked))[0, :, :, 0],
                     np.float32)
    return (out + 1.0) / 2.0


# ---------------------------------------------------------------------------
# boosting protocol (host numpy/cv2)
# ---------------------------------------------------------------------------

def generatemask(size: Tuple[int, int]) -> np.ndarray:
    """Gaussian blend mask (depthmap.py:52-61)."""
    import cv2
    mask = np.zeros(size, np.float32)
    sigma = int(size[0] / 16)
    k_size = int(2 * np.ceil(2 * int(size[0] / 16)) + 1)
    mask[int(0.15 * size[0]):size[0] - int(0.15 * size[0]),
         int(0.15 * size[1]):size[1] - int(0.15 * size[1])] = 1
    mask = cv2.GaussianBlur(mask, (k_size, k_size), sigma)
    return ((mask - mask.min()) / (mask.max() - mask.min())
            ).astype(np.float32)


def _resizewithpool(img: np.ndarray, size: int) -> np.ndarray:
    """skimage.measure.block_reduce(img, (n, n), np.max) equivalent
    (depthmap.py:63-68; skimage is absent here) — non-overlapping max
    pooling with edge padding to a block multiple."""
    n = int(np.floor(img.shape[0] / size))
    h, w = img.shape
    ph, pw = (-h) % n, (-w) % n
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="constant",
                     constant_values=-np.inf)
    hh, ww = img.shape
    return img.reshape(hh // n, n, ww // n, n).max(axis=(1, 3))


def calculateprocessingres(img: np.ndarray, basesize: int,
                           confidence: float = 0.1,
                           scale_threshold: int = 3,
                           whole_size_threshold: int =
                           _WHOLE_SIZE_THRESHOLD) -> Tuple[int, float]:
    """R-x resolution search (depthmap.py:74-130)."""
    import cv2
    speed_scale = 32
    image_dim = int(min(img.shape[:2]))

    gray = np.dot(img[..., :3], [0.2989, 0.587, 0.114])
    grad = (np.abs(cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3))
            + np.abs(cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3)))
    grad = cv2.resize(grad, (image_dim, image_dim), cv2.INTER_AREA)
    middle = grad.min() + 0.4 * (grad.max() - grad.min())
    grad[grad < middle] = 0
    grad[grad >= middle] = 1

    kernel = np.ones((int(basesize / speed_scale),) * 2, float)
    kernel2 = np.ones((int(basesize / (4 * speed_scale)),) * 2, float)

    threshold = min(whole_size_threshold,
                    scale_threshold * max(img.shape[:2]))
    outputsize_scale = basesize / speed_scale
    grad_resized = grad
    for p_size in range(int(basesize / speed_scale),
                        int(threshold / speed_scale),
                        int(basesize / (2 * speed_scale))):
        grad_resized = _resizewithpool(grad, p_size)
        grad_resized = cv2.resize(grad_resized, (p_size, p_size),
                                  cv2.INTER_NEAREST)
        grad_resized = (grad_resized >= 0.5).astype(np.float32)
        dilated = cv2.dilate(grad_resized, kernel, iterations=1)
        if (1 - dilated).mean() > confidence:
            break
        outputsize_scale = p_size

    grad_region = cv2.dilate(grad_resized, kernel2, iterations=1)
    return int(outputsize_scale * speed_scale), float(grad_region.mean())


def _gf_from_integral(integral: np.ndarray, rect) -> float:
    x1, x2 = rect[1], rect[1] + rect[3]
    y1, y2 = rect[0], rect[0] + rect[2]
    return (integral[x2, y2] - integral[x1, y2] - integral[x2, y1]
            + integral[x1, y1])


def generatepatchs(img: np.ndarray, base_size: int,
                   factor: float) -> List:
    """Gradient-driven adaptive patch selection (depthmap.py:178-268)."""
    import cv2
    gray = np.dot(img[..., :3], [0.2989, 0.587, 0.114])
    whole_grad = (np.abs(cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3))
                  + np.abs(cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3)))
    threshold = whole_grad[whole_grad > 0].mean()
    whole_grad[whole_grad < threshold] = 0
    gf = whole_grad.sum() / whole_grad.size
    integral = cv2.integral(whole_grad)

    blsize = int(round(base_size / 2))
    stride = int(round(blsize * 0.75))

    bounds = []
    for k in range(blsize, img.shape[1] - blsize, stride):
        for j in range(blsize, img.shape[0] - blsize, stride):
            bounds.append([k - blsize, j - blsize, 2 * blsize, 2 * blsize])

    height, width = integral.shape
    search_step = int(32 / factor)
    selected = []
    for bbox in bounds:
        cgf = _gf_from_integral(integral, bbox) / (bbox[2] * bbox[3])
        if cgf < gf:
            continue
        bbox = list(bbox)
        while True:
            test = [bbox[0] - int(search_step / 2),
                    bbox[1] - int(search_step / 2),
                    bbox[2] + search_step, bbox[3] + search_step]
            if (test[0] < 0 or test[1] < 0
                    or test[1] + test[3] >= height
                    or test[0] + test[2] >= width):
                break
            if (_gf_from_integral(integral, test)
                    / (test[2] * test[3])) < gf:
                break
            bbox = test
        selected.append({"rect": bbox, "size": bbox[2]})
    selected.sort(key=lambda p: p["size"], reverse=True)
    return selected


def estimateboost(img: np.ndarray, single_estimate, params: List[Dict],
                  max_res: int = 512, apply_fn=None) -> np.ndarray:
    """BoostingMonocularDepth merge (depthmap.py:380-548).

    img: (H, W, 3) RGB uint8/float; single_estimate(img, w, h) -> (H, W)
    depth (the LeReS path); params: pix2pix merge net.
    """
    import cv2

    def double(im, size1, size2):
        e1 = cv2.resize(single_estimate(im, size1, size1),
                        (_PIX2PIX_SIZE, _PIX2PIX_SIZE),
                        interpolation=cv2.INTER_CUBIC)
        e2 = cv2.resize(single_estimate(im, size2, size2),
                        (_PIX2PIX_SIZE, _PIX2PIX_SIZE),
                        interpolation=cv2.INTER_CUBIC)
        merged = merge_depths(params, e1, e2, apply_fn=apply_fn)
        rng = merged.max() - merged.min()
        return (merged - merged.min()) / max(rng, 1e-12)

    input_res = img.shape
    whole_opt_size, patch_scale = calculateprocessingres(
        img, _RECEPTIVE, 0.2, 3, _WHOLE_SIZE_THRESHOLD)
    whole_estimate = double(img, _RECEPTIVE, whole_opt_size)
    factor = max(min(1.0, 4 * patch_scale * whole_opt_size
                     / _WHOLE_SIZE_THRESHOLD), 0.2)

    if max_res < whole_opt_size:
        return cv2.resize(whole_estimate, (input_res[1], input_res[0]),
                          interpolation=cv2.INTER_CUBIC)

    if img.shape[0] > img.shape[1]:
        a = 2 * whole_opt_size
        b = round(2 * whole_opt_size * img.shape[1] / img.shape[0])
    else:
        a = round(2 * whole_opt_size * img.shape[0] / img.shape[1])
        b = 2 * whole_opt_size
    a, b = int(round(a / factor)), int(round(b / factor))
    img_big = cv2.resize(img, (b, a), interpolation=cv2.INTER_CUBIC)

    patchset = generatepatchs(img_big, _RECEPTIVE * 2, factor)

    mergein_scale = input_res[0] / img_big.shape[0]
    rgb_scaled = cv2.resize(
        img_big, (round(img_big.shape[1] * mergein_scale),
                  round(img_big.shape[0] * mergein_scale)),
        interpolation=cv2.INTER_CUBIC)
    updated = cv2.resize(whole_estimate,
                         (rgb_scaled.shape[1], rgb_scaled.shape[0]),
                         interpolation=cv2.INTER_CUBIC)
    base = updated.copy()
    mask_org = generatemask((3000, 3000))
    mask = mask_org

    for patch in patchset:
        rect = np.round(np.array(patch["rect"]) * mergein_scale
                        ).astype(int)
        w1, h1 = rect[0], rect[1]
        w2, h2 = w1 + rect[2], h1 + rect[3]
        patch_rgb = rgb_scaled[h1:h2, w1:w2]
        patch_base = base[h1:h2, w1:w2]
        if patch_rgb.size == 0:
            continue
        org_size = patch_base.shape

        patch_est = double(patch_rgb, _RECEPTIVE, _RECEPTIVE * 2)
        patch_est = cv2.resize(patch_est, (_PIX2PIX_SIZE, _PIX2PIX_SIZE),
                               interpolation=cv2.INTER_CUBIC)
        base_up = cv2.resize(patch_base, (_PIX2PIX_SIZE, _PIX2PIX_SIZE),
                             interpolation=cv2.INTER_CUBIC)
        mapped = merge_depths(params, base_up, patch_est,
                              apply_fn=apply_fn)
        # linear value fit back to the base estimate's range — the
        # closed-form deg-1 least-squares solution (identical to
        # np.polyfit(deg=1) where that is well-posed, but with a
        # variance floor instead of a RankWarning on near-constant
        # merge outputs; degenerate patches collapse to the base mean)
        m = mapped.reshape(-1).astype(np.float64)
        b = base_up.reshape(-1).astype(np.float64)
        var = m.var()
        slope = ((m - m.mean()) * (b - b.mean())).mean() / var \
            if var > 1e-12 else 0.0
        intercept = b.mean() - slope * m.mean()
        merged = (slope * m + intercept).reshape(mapped.shape)
        merged = cv2.resize(merged, (org_size[1], org_size[0]),
                            interpolation=cv2.INTER_CUBIC)
        if mask.shape != org_size:
            mask = cv2.resize(mask_org, (org_size[1], org_size[0]),
                              interpolation=cv2.INTER_LINEAR)
        updated[h1:h2, w1:w2] = (updated[h1:h2, w1:w2] * (1 - mask)
                                 + merged * mask)

    return cv2.resize(updated, (input_res[1], input_res[0]),
                      interpolation=cv2.INTER_CUBIC)
