"""HED soft-edge detector (ControlNet's Apache-2 HED variant).

Behavioral equivalent of /root/reference/src/controlnet_aux/hed/__init__.py:
a 5-stage VGG-style CNN (2/2/3/3/3 convs, 64/128/256/512/512 channels,
2x2 max-pool between stages, a learned per-channel input shift, and a 1x1
projection to a single edge logit per stage). The five logit maps are
bilinearly resized to the input grid, averaged, and squashed with a
sigmoid (hed/__init__.py:100-110). RGB input in [0, 255].

TPU-native form: NHWC param pytree + pure apply fn (jittable); the host
wrapper keeps the reference's resize/scribble protocol on numpy/cv2.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.nn.layers import conv2d_init
from pcdms_tpu.pose.detectors.common import (
    conv, hwc3, max_pool_2x2, resize_to_64, shape_to_64, safe_step,
    scribble_postprocess, t2j_conv,
)

# (n_convs, channels) per stage; stages 2..5 start with a 2x2 max-pool
_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


def hed_init(key, dtype=jnp.float32) -> Dict:
    params: Dict = {"norm": jnp.zeros((3,), dtype)}
    in_ch = 3
    for si, (n, ch) in enumerate(_STAGES, start=1):
        keys = jax.random.split(jax.random.fold_in(key, si), n + 1)
        block = {"convs": [conv2d_init(keys[i], in_ch if i == 0 else ch,
                                       ch, 3, dtype=dtype)
                           for i in range(n)],
                 "proj": conv2d_init(keys[n], ch, 1, 1, dtype=dtype)}
        params[f"block{si}"] = block
        in_ch = ch
    return params


def hed_apply(params: Dict, x):
    """x: (N, H, W, 3) float in [0, 255] -> list of 5 edge-logit maps,
    (N, H/2^s, W/2^s, 1) for s = 0..4."""
    h = x - params["norm"].astype(x.dtype)
    projections = []
    for si in range(1, 6):
        block = params[f"block{si}"]
        if si > 1:
            h = max_pool_2x2(h)
        for c in block["convs"]:
            h = jax.nn.relu(conv(h, c["kernel"], c["bias"], padding=1))
        projections.append(conv(h, block["proj"]["kernel"],
                                block["proj"]["bias"]))
    return projections


def convert_hed(sd: Dict[str, np.ndarray]) -> Dict:
    """torch ControlNetHED_Apache2 state dict -> param pytree."""
    params: Dict = {"norm": jnp.asarray(np.asarray(sd["norm"]).reshape(3))}
    for si, (n, _) in enumerate(_STAGES, start=1):
        pfx = f"block{si}"
        block = {"convs": [], "proj": None}
        for i in range(n):
            block["convs"].append({
                "kernel": jnp.asarray(t2j_conv(sd[f"{pfx}.convs.{i}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{pfx}.convs.{i}.bias"])),
            })
        block["proj"] = {
            "kernel": jnp.asarray(t2j_conv(sd[f"{pfx}.projection.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{pfx}.projection.bias"])),
        }
        params[pfx] = block
    return params


class HEDdetector:
    """Host-side wrapper with the reference's call protocol
    (hed/__init__.py:85-129)."""

    def __init__(self, params: Dict):
        self.params = params
        self._apply = jax.jit(hed_apply)

    @classmethod
    def from_pretrained(cls, weights_path: str) -> "HEDdetector":
        from pcdms_tpu.pose.detectors.common import load_torch_state_dict
        return cls(convert_hed(load_torch_state_dict(weights_path)))

    def __call__(self, input_image, detect_resolution: int = 512,
                 image_resolution: int = 512, safe: bool = False,
                 scribble: bool = False) -> np.ndarray:
        import cv2
        img = hwc3(np.asarray(input_image, np.uint8))
        img = resize_to_64(img, detect_resolution)
        h, w = img.shape[:2]

        x = jnp.asarray(img, jnp.float32)[None]
        edges = [np.asarray(e[0, :, :, 0], np.float32)
                 for e in self._apply(self.params, x)]
        edges = [cv2.resize(e, (w, h), interpolation=cv2.INTER_LINEAR)
                 for e in edges]
        edge = 1.0 / (1.0 + np.exp(-np.mean(np.stack(edges, -1), axis=2,
                                            dtype=np.float64)))
        if safe:
            edge = safe_step(edge)
        detected = hwc3((edge * 255.0).clip(0, 255).astype(np.uint8))

        out_hw = shape_to_64(*img.shape[:2], image_resolution)
        detected = cv2.resize(detected, (out_hw[1], out_hw[0]),
                              interpolation=cv2.INTER_LINEAR)
        if scribble:
            detected = scribble_postprocess(detected)
        return detected
