"""PiDiNet soft-edge detector (pixel-difference network, 'carv4' config).

Behavioral equivalent of /root/reference/src/controlnet_aux/pidi/model.py
(PiDiNet(60, carv4, dil=24, sa=True), the ``table5_pidinet.pth`` model):
a 16-layer depthwise-separable CNN over 4 scales (60/120/240/240
channels) whose depthwise 3x3 convs are *pixel-difference* convolutions,
followed per scale by a compact dilated module (CDCM, dilations
5/7/9/11 -> 24ch), a compact spatial attention module (CSAM), a 1x1
reduction to an edge logit, bilinear upsampling to the input grid, and a
1x1 fusion classifier. Output = sigmoid(fused logit). BGR input in
[0, 1] (pidi/__init__.py:54-64).

TPU-native treatment of the difference convs: each variant is an exact
linear transform of the 3x3 kernel, applied once at parameter-load time,
so the network runs as plain XLA convolutions —
  * cd (central): y = conv(w) - conv(sum(w) 1x1)  ==  center tap -= sum(w)
  * ad (angular): w -= clockwise-rotated w
  * rd (radial):  3x3 ring scattered into a signed 5x5 kernel
(model.py:createConvFunc). The 'carv4' layer order is
[cd, ad, rd, cv] x 4 (model.py nets['carv4']).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.nn.layers import conv2d_init
from pcdms_tpu.pose.detectors.common import (
    bilinear_resize, conv, hwc3, max_pool_2x2, resize_to_64, shape_to_64, safe_step,
    scribble_postprocess, t2j_conv,
)

_PDCS = ["cd", "ad", "rd", "cv"] * 4        # 'carv4'
_PLANES = [60, 120, 240, 240]
_DIL = 24


# ---------------------------------------------------------------------------
# pixel-difference kernel transforms (HWIO layout)
# ---------------------------------------------------------------------------

def pdc_transform(kernel: np.ndarray, op: str) -> np.ndarray:
    """Fold a pixel-difference conv into an equivalent plain kernel.

    kernel: (3, 3, I, O) HWIO. Returns (3, 3, I, O) for cv/cd/ad and
    (5, 5, I, O) for rd (to be applied with padding=2).
    """
    k = np.asarray(kernel, np.float32)
    if op == "cv":
        return k
    if op == "cd":
        out = k.copy()
        out[1, 1] -= k.sum(axis=(0, 1))
        return out
    flat = k.reshape(9, *k.shape[2:])
    if op == "ad":
        # clockwise neighbor rotation in (3,3) row-major indexing
        rot = flat[[3, 0, 1, 6, 4, 2, 7, 8, 5]]
        return (flat - rot).reshape(k.shape)
    if op == "rd":
        buf = np.zeros((25,) + k.shape[2:], np.float32)
        ring = flat[1:]                     # taps excluding flat[0]
        buf[[0, 2, 4, 10, 14, 20, 22, 24]] = ring
        buf[[6, 7, 8, 11, 13, 16, 17, 18]] = -ring
        return buf.reshape((5, 5) + k.shape[2:])
    raise ValueError(f"unknown pdc op: {op}")


# ---------------------------------------------------------------------------
# init / apply
# ---------------------------------------------------------------------------

def _dw(key, ch, ksize, dtype):
    """Depthwise conv params: HWIO with I=1, O=ch (groups=ch)."""
    p = conv2d_init(key, 1, ch, ksize, use_bias=False, dtype=dtype)
    return p


def pidinet_init(key, dtype=jnp.float32) -> Dict:
    """Random init in post-transform form (what the network actually
    runs); converters produce the same structure from torch weights."""
    ks = iter(jax.random.split(key, 64))
    params: Dict = {
        "init_block": conv2d_init(next(ks), 3, _PLANES[0], 3,
                                  use_bias=False, dtype=dtype),
        "blocks": [], "cdcm": [], "csam": [], "reduce": [],
    }
    layer = 1
    in_ch = _PLANES[0]
    for stage, ch in enumerate(_PLANES):
        n = 3 if stage == 0 else 4
        stage_blocks = []
        for b in range(n):
            stride2 = stage > 0 and b == 0
            op = _PDCS[layer]
            ksize = 5 if op == "rd" else 3
            blk = {
                "conv1": _dw(next(ks), ch, ksize, dtype),
                "conv2": conv2d_init(next(ks), ch, ch, 1, use_bias=False,
                                     dtype=dtype),
            }
            if stride2:
                blk["conv1"] = _dw(next(ks), in_ch, ksize, dtype)
                blk["conv2"] = conv2d_init(next(ks), in_ch, ch, 1,
                                           use_bias=False, dtype=dtype)
                blk["shortcut"] = conv2d_init(next(ks), in_ch, ch, 1,
                                              dtype=dtype)
            stage_blocks.append(blk)
            layer += 1
        params["blocks"].append(stage_blocks)
        params["cdcm"].append({
            "conv1": conv2d_init(next(ks), ch, _DIL, 1, dtype=dtype),
            "dilated": [conv2d_init(next(ks), _DIL, _DIL, 3,
                                    use_bias=False, dtype=dtype)
                        for _ in range(4)],
        })
        params["csam"].append({
            "conv1": conv2d_init(next(ks), _DIL, 4, 1, dtype=dtype),
            "conv2": conv2d_init(next(ks), 4, 1, 3, use_bias=False,
                                 dtype=dtype),
        })
        params["reduce"].append(conv2d_init(next(ks), _DIL, 1, 1,
                                            dtype=dtype))
        in_ch = ch
    params["classifier"] = conv2d_init(next(ks), 4, 1, 1, dtype=dtype)
    return params


def _pdc_block(blk, x, stride2: bool):
    if stride2:
        x = max_pool_2x2(x)
    pad = (blk["conv1"]["kernel"].shape[0] - 1) // 2
    y = conv(x, blk["conv1"]["kernel"], padding=pad, groups=x.shape[-1])
    y = jax.nn.relu(y)
    y = conv(y, blk["conv2"]["kernel"])
    if stride2:
        x = conv(x, blk["shortcut"]["kernel"], blk["shortcut"]["bias"])
    return y + x


def pidinet_apply(params: Dict, x):
    """x: (N, H, W, 3) BGR in [0, 1] -> (N, H, W, 1) edge probability
    (the fused sigmoid output, model.py forward's outputs[-1])."""
    n, h, w, _ = x.shape
    f = conv(x, params["init_block"]["kernel"], padding=1)
    logits = []
    for stage in range(4):
        for b, blk in enumerate(params["blocks"][stage]):
            stride2 = stage > 0 and b == 0
            f = _pdc_block(blk, f, stride2)
        # CDCM: relu -> 1x1 -> sum of 4 dilated 3x3
        g = params["cdcm"][stage]
        y = jax.nn.relu(f)
        y = conv(y, g["conv1"]["kernel"], g["conv1"]["bias"])
        y = sum(conv(y, d["kernel"], padding=dil, dilation=dil)
                for d, dil in zip(g["dilated"], (5, 7, 9, 11)))
        # CSAM: sigmoid spatial gate
        a = params["csam"][stage]
        gate = jax.nn.relu(y)
        gate = conv(gate, a["conv1"]["kernel"], a["conv1"]["bias"])
        gate = jax.nn.sigmoid(conv(gate, a["conv2"]["kernel"], padding=1))
        y = y * gate
        r = params["reduce"][stage]
        e = conv(y, r["kernel"], r["bias"])
        logits.append(bilinear_resize(e, h, w))
    fused = conv(jnp.concatenate(logits, axis=-1),
                 params["classifier"]["kernel"],
                 params["classifier"]["bias"])
    return jax.nn.sigmoid(fused)


# ---------------------------------------------------------------------------
# torch conversion
# ---------------------------------------------------------------------------

def _dw_t2j(w: np.ndarray, op: str) -> jnp.ndarray:
    """torch depthwise (C, 1, kh, kw) -> transformed HWIO (kh, kw, 1, C)."""
    hwio = t2j_conv(w)                       # (kh, kw, 1, C)
    return jnp.asarray(pdc_transform(hwio, op))


def convert_pidinet(sd: Dict[str, np.ndarray]) -> Dict:
    def c(name, bias=True):
        p = {"kernel": jnp.asarray(t2j_conv(sd[f"{name}.weight"]))}
        if bias:
            p["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
        return p

    params: Dict = {
        "init_block": {"kernel": jnp.asarray(pdc_transform(
            t2j_conv(sd["init_block.weight"]), _PDCS[0]))},
        "blocks": [], "cdcm": [], "csam": [], "reduce": [],
    }
    layer = 1
    for stage in range(4):
        n = 3 if stage == 0 else 4
        stage_blocks = []
        for b in range(n):
            name = f"block{stage + 1}_{b + 1}"
            op = _PDCS[layer]
            blk = {
                "conv1": {"kernel": _dw_t2j(sd[f"{name}.conv1.weight"], op)},
                "conv2": {"kernel": jnp.asarray(
                    t2j_conv(sd[f"{name}.conv2.weight"]))},
            }
            if stage > 0 and b == 0:
                blk["shortcut"] = c(f"{name}.shortcut")
            stage_blocks.append(blk)
            layer += 1
        params["blocks"].append(stage_blocks)
        params["cdcm"].append({
            "conv1": c(f"dilations.{stage}.conv1"),
            "dilated": [
                {"kernel": jnp.asarray(t2j_conv(
                    sd[f"dilations.{stage}.conv2_{i}.weight"]))}
                for i in (1, 2, 3, 4)],
        })
        params["csam"].append({
            "conv1": c(f"attentions.{stage}.conv1"),
            "conv2": {"kernel": jnp.asarray(t2j_conv(
                sd[f"attentions.{stage}.conv2.weight"]))},
        })
        params["reduce"].append(c(f"conv_reduces.{stage}.conv"))
    params["classifier"] = c("classifier")
    return params


class PidiNetDetector:
    """Host wrapper with the reference call protocol
    (pidi/__init__.py:38-84): BGR/255 input, fused sigmoid output,
    optional safe_step and scribble NMS post-passes."""

    def __init__(self, params: Dict):
        self.params = params
        self._apply = jax.jit(pidinet_apply)

    @classmethod
    def from_pretrained(cls, weights_path: str) -> "PidiNetDetector":
        from pcdms_tpu.pose.detectors.common import load_torch_state_dict
        return cls(convert_pidinet(load_torch_state_dict(weights_path)))

    def __call__(self, input_image, detect_resolution: int = 512,
                 image_resolution: int = 512, safe: bool = False,
                 scribble: bool = False,
                 apply_filter: bool = False) -> np.ndarray:
        import cv2
        img = hwc3(np.asarray(input_image, np.uint8))
        img = resize_to_64(img, detect_resolution)

        x = jnp.asarray(img[:, :, ::-1].copy(), jnp.float32)[None] / 255.0
        edge = np.asarray(self._apply(self.params, x)[0, :, :, 0],
                          np.float32)
        if apply_filter:
            edge = (edge > 0.5).astype(np.float32)
        if safe:
            edge = safe_step(edge)
        detected = hwc3((edge * 255.0).clip(0, 255).astype(np.uint8))

        out_hw = shape_to_64(*img.shape[:2], image_resolution)
        detected = cv2.resize(detected, (out_hw[1], out_hw[0]),
                              interpolation=cv2.INTER_LINEAR)
        if scribble:
            detected = scribble_postprocess(detected)
        return detected
