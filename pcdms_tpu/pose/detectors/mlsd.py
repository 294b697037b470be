"""M-LSD line-segment detector (MobileV2_MLSD_Large).

Behavioral equivalent of /root/reference/src/controlnet_aux/mlsd/
(models/mbv2_mlsd_large.py + utils.py:pred_lines): a trimmed MobileNetV2
trunk (14 feature blocks, TFLite asymmetric stride-2 padding, ReLU6) with
an FPN-style decoder (BlockTypeA cat-merge with align_corners=True 2x
upsampling, BlockTypeB residual refine, BlockTypeC dilated head) that
emits a 9-channel map at 1/2 resolution; channel 0 is the line-center
heat map and channels 1-4 the endpoint displacement field, decoded
host-side by top-k peak picking over a 3x3 max-pool NMS.

TPU-native treatment: BatchNorm (eval mode) is folded into the conv
weights at conversion time — the network runs as plain conv+ReLU6 XLA
ops with zero normalization traffic.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.nn.layers import conv2d_init
from pcdms_tpu.pose.detectors.common import (
    conv, hwc3, resize_to_64, shape_to_64, t2j_conv,
)

# (expand_ratio, out_ch, stride) per InvertedResidual, after expanding the
# (t, c, n, s) table [1,16,1,1],[6,24,2,2],[6,32,3,2],[6,64,4,2],[6,96,3,1]
_BLOCKS = [(1, 16, 1),
           (6, 24, 2), (6, 24, 1),
           (6, 32, 2), (6, 32, 1), (6, 32, 1),
           (6, 64, 2), (6, 64, 1), (6, 64, 1), (6, 64, 1),
           (6, 96, 1), (6, 96, 1), (6, 96, 1)]
_FPN_SELECTED = (1, 3, 6, 10, 13)        # feature indices -> c1..c5


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


def _tflite_s2_conv(x, p, k: int, groups: int = 1):
    """stride-2 ConvBNReLU: asymmetric (0,1) pad, conv padding 0
    (mbv2_mlsd_large.py:104-120)."""
    return conv(x, p["kernel"], p.get("bias"), stride=2,
                padding=((0, 1), (0, 1)), groups=groups)


def _cbr(x, p, *, stride=1, k=3, groups=1):
    if stride == 2:
        y = _tflite_s2_conv(x, p, k, groups)
    else:
        y = conv(x, p["kernel"], p.get("bias"), padding=(k - 1) // 2,
                 groups=groups)
    return relu6(y)


def upsample2x_align_corners(x):
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=True)."""
    n, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, 2 * h)
    xs = jnp.linspace(0.0, w - 1.0, 2 * w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def mlsd_init(key, dtype=jnp.float32) -> Dict:
    """Random init in folded (conv+bias) form."""
    ks = iter(jax.random.split(key, 128))

    def c(cin, cout, k=1, bias=True, depthwise=False):
        return conv2d_init(next(ks), 1 if depthwise else cin, cout, k,
                           use_bias=bias, dtype=dtype)

    params: Dict = {"stem": c(4, 32, 3), "features": []}
    in_ch = 32
    for t, out_ch, _ in _BLOCKS:
        hidden = in_ch * t
        blk = {}
        if t != 1:
            blk["expand"] = c(in_ch, hidden, 1)
        blk["dw"] = c(hidden, hidden, 3, depthwise=True)
        blk["project"] = c(hidden, out_ch, 1)
        params["features"].append(blk)
        in_ch = out_ch

    def block_a(c1_in, c2_in):
        return {"conv1": c(c2_in, 64, 1), "conv2": c(c1_in, 64, 1)}

    def block_b():
        return {"conv1": c(128, 128, 3), "conv2": c(128, 64, 3)}

    params.update({
        "block15": block_a(64, 96), "block16": block_b(),
        "block17": block_a(32, 64), "block18": block_b(),
        "block19": block_a(24, 64), "block20": block_b(),
        "block21": block_a(16, 64), "block22": block_b(),
        "block23": {"conv1": c(64, 64, 3), "conv2": c(64, 64, 3),
                    "conv3": c(64, 16, 1)},
    })
    return params


def mlsd_apply(params: Dict, x):
    """x: (1, H, W, 4) in [-1, 1] -> (1, H/2, W/2, 9) tpMap
    (center heat logit + 4 displacement + 4 aux channels)."""
    f = _cbr(x, params["stem"], stride=2)
    feats: List = []
    in_ch = 32
    for i, ((t, out_ch, stride), blk) in enumerate(
            zip(_BLOCKS, params["features"]), start=1):
        h = f
        if t != 1:
            h = _cbr(h, blk["expand"], k=1)
        h = _cbr(h, blk["dw"], stride=stride, groups=h.shape[-1])
        h = conv(h, blk["project"]["kernel"], blk["project"].get("bias"))
        if stride == 1 and in_ch == out_ch:
            h = f + h
        f = h
        in_ch = out_ch
        if i in _FPN_SELECTED:
            feats.append(f)
    c1, c2, c3, c4, c5 = feats

    # decoder blocks use plain ReLU (only the MobileNet trunk is ReLU6)
    def block_a(p, a, b, upscale=True):
        b = jax.nn.relu(conv(b, p["conv1"]["kernel"],
                             p["conv1"].get("bias")))
        a = jax.nn.relu(conv(a, p["conv2"]["kernel"],
                             p["conv2"].get("bias")))
        if upscale:
            b = upsample2x_align_corners(b)
        return jnp.concatenate([a, b], axis=-1)

    def block_b(p, h):
        h = jax.nn.relu(conv(h, p["conv1"]["kernel"],
                             p["conv1"].get("bias"), padding=1)) + h
        return jax.nn.relu(conv(h, p["conv2"]["kernel"],
                                p["conv2"].get("bias"), padding=1))

    h = block_b(params["block16"],
                block_a(params["block15"], c4, c5, upscale=False))
    h = block_b(params["block18"], block_a(params["block17"], c3, h))
    h = block_b(params["block20"], block_a(params["block19"], c2, h))
    h = block_b(params["block22"], block_a(params["block21"], c1, h))
    p = params["block23"]
    h = jax.nn.relu(conv(h, p["conv1"]["kernel"], p["conv1"].get("bias"),
                         padding=5, dilation=5))
    h = jax.nn.relu(conv(h, p["conv2"]["kernel"], p["conv2"].get("bias"),
                         padding=1))
    h = conv(h, p["conv3"]["kernel"], p["conv3"].get("bias"))
    return h[..., 7:]


# ---------------------------------------------------------------------------
# torch conversion with BatchNorm folding
# ---------------------------------------------------------------------------

def _fold_bn(sd: Dict[str, np.ndarray], conv_name: str, bn_name: str,
             eps: float = 1e-5) -> Dict:
    """Fold eval-mode BatchNorm into the preceding conv:
    w' = w * gamma / sqrt(var + eps); b' = beta - mean * gamma / sqrt(...).
    """
    w = t2j_conv(sd[f"{conv_name}.weight"])              # (kh, kw, I, O)
    gamma = np.asarray(sd[f"{bn_name}.weight"], np.float32)
    beta = np.asarray(sd[f"{bn_name}.bias"], np.float32)
    mean = np.asarray(sd[f"{bn_name}.running_mean"], np.float32)
    var = np.asarray(sd[f"{bn_name}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    if f"{conv_name}.bias" in sd:
        bias = bias + np.asarray(sd[f"{conv_name}.bias"], np.float32) * scale
    return {"kernel": jnp.asarray(w * scale), "bias": jnp.asarray(bias)}


def convert_mlsd(sd: Dict[str, np.ndarray]) -> Dict:
    def plain(name):
        p = {"kernel": jnp.asarray(t2j_conv(sd[f"{name}.weight"]))}
        if f"{name}.bias" in sd:
            p["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
        return p

    params: Dict = {
        "stem": _fold_bn(sd, "backbone.features.0.0",
                         "backbone.features.0.1"),
        "features": [],
    }
    for i, (t, _, _) in enumerate(_BLOCKS, start=1):
        pfx = f"backbone.features.{i}.conv"
        blk = {}
        j = 0
        if t != 1:
            blk["expand"] = _fold_bn(sd, f"{pfx}.{j}.0", f"{pfx}.{j}.1")
            j += 1
        blk["dw"] = _fold_bn(sd, f"{pfx}.{j}.0", f"{pfx}.{j}.1")
        blk["project"] = _fold_bn(sd, f"{pfx}.{j + 1}", f"{pfx}.{j + 2}")
        params["features"].append(blk)

    for n in (15, 17, 19, 21):              # BlockTypeA
        params[f"block{n}"] = {
            "conv1": _fold_bn(sd, f"block{n}.conv1.0", f"block{n}.conv1.1"),
            "conv2": _fold_bn(sd, f"block{n}.conv2.0", f"block{n}.conv2.1"),
        }
    for n in (16, 18, 20, 22):              # BlockTypeB
        params[f"block{n}"] = {
            "conv1": _fold_bn(sd, f"block{n}.conv1.0", f"block{n}.conv1.1"),
            "conv2": _fold_bn(sd, f"block{n}.conv2.0", f"block{n}.conv2.1"),
        }
    params["block23"] = {
        "conv1": _fold_bn(sd, "block23.conv1.0", "block23.conv1.1"),
        "conv2": _fold_bn(sd, "block23.conv2.0", "block23.conv2.1"),
        "conv3": plain("block23.conv3"),
    }
    return params


# ---------------------------------------------------------------------------
# host-side line decode + wrapper
# ---------------------------------------------------------------------------

def decode_lines(tp_map: np.ndarray, score_thr: float, dist_thr: float,
                 topk: int = 200, ksize: int = 3) -> np.ndarray:
    """utils.py:deccode_output_score_and_ptss + the pred_lines filter,
    in numpy. tp_map: (H, W, >=5) — channel 0 center logit, 1:5 the
    (dx_s, dy_s, dx_e, dy_e) displacement field. Returns (N, 4)
    [x_start, y_start, x_end, y_end] segments at map scale."""
    import cv2
    heat = 1.0 / (1.0 + np.exp(-tp_map[:, :, 0].astype(np.float64)))
    hmax = cv2.dilate(heat, np.ones((ksize, ksize)))
    heat = np.where(hmax == heat, heat, 0.0)
    flat = heat.reshape(-1)
    idx = np.argpartition(-flat, topk - 1)[:topk]
    idx = idx[np.argsort(-flat[idx])]
    w = tp_map.shape[1]
    yy, xx = idx // w, idx % w
    disp = tp_map[:, :, 1:5]
    segments = []
    for y, x, score in zip(yy, xx, flat[idx]):
        d = disp[y, x]
        if score > score_thr and np.hypot(d[2] - d[0], d[3] - d[1]) > dist_thr:
            segments.append([x + d[0], y + d[1], x + d[2], y + d[3]])
    return np.asarray(segments, np.float64).reshape(-1, 4)


class MLSDdetector:
    """Host wrapper with the reference call protocol
    (mlsd/__init__.py:41-79, utils.py:pred_lines)."""

    def __init__(self, params: Dict):
        self.params = params
        self._apply = jax.jit(mlsd_apply)

    @classmethod
    def from_pretrained(cls, weights_path: str) -> "MLSDdetector":
        from pcdms_tpu.pose.detectors.common import load_torch_state_dict
        return cls(convert_mlsd(load_torch_state_dict(weights_path)))

    def __call__(self, input_image, thr_v: float = 0.1,
                 thr_d: float = 0.1, detect_resolution: int = 512,
                 image_resolution: int = 512) -> np.ndarray:
        import cv2
        img = hwc3(np.asarray(input_image, np.uint8))
        img = resize_to_64(img, detect_resolution)
        h, w = img.shape[:2]

        # the reference feeds pred_lines the detect-resized image at its
        # OWN (possibly non-square) resolution with ratio-1 coordinate
        # mapping (mlsd/__init__.py:60: input_shape=[h, w])
        feed = np.concatenate([img, np.ones((h, w, 1))], axis=-1)
        x = jnp.asarray(feed[None], jnp.float32) / 127.5 - 1.0
        tp_map = np.asarray(self._apply(self.params, x)[0], np.float32)

        out = np.zeros_like(img)
        lines = 2.0 * decode_lines(tp_map, thr_v, thr_d)  # map -> image
        for x0, y0, x1, y1 in lines.astype(int):
            cv2.line(out, (x0, y0), (x1, y1), (255, 255, 255), 1)

        detected = hwc3(out[:, :, 0])
        out_hw = shape_to_64(*img.shape[:2], image_resolution)
        return cv2.resize(detected, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_LINEAR)
