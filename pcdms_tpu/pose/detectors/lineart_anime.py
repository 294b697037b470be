"""LineArt-Anime detector (pix2pix-style 8-level UNet generator).

Behavioral equivalent of
/root/reference/src/controlnet_aux/lineart_anime/__init__.py: a
UnetGenerator(3, 1, num_downs=8, ngf=64) with InstanceNorm(affine=False)
— eight k4/s2/p1 downsamples (3->64->128->256->512x5), symmetric
ConvTranspose upsamples with skip concatenation, LeakyReLU(0.2) down /
ReLU up, tanh head. Input is fed at a multiple-of-256 grid in [-1, 1]
and the output line map is mapped back through 127.5*y + 127.5 and
inverted (lineart_anime/__init__.py:145-188).

Params are a list of per-level dicts, outermost first; InstanceNorm has
no weights, so each level holds just its down/up conv pair.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.nn.layers import conv2d_init
from pcdms_tpu.pose.detectors.common import (
    conv, conv_transpose, hwc3, instance_norm, leaky_relu, resize_to_64, shape_to_64,
    t2j_conv, t2j_conv_transpose,
)

# (outer_nc, inner_nc) outermost -> innermost for UnetGenerator(3,1,8,64)
_LEVELS = [(1, 64), (64, 128), (128, 256), (256, 512),
           (512, 512), (512, 512), (512, 512), (512, 512)]
_INPUT_NC = 3


def lineart_anime_init(key, dtype=jnp.float32) -> List[Dict]:
    params = []
    for i, (outer, inner) in enumerate(_LEVELS):
        kd, ku = jax.random.split(jax.random.fold_in(key, i))
        innermost = i == len(_LEVELS) - 1
        in_ch = _INPUT_NC if i == 0 else outer
        up_in = inner if innermost else inner * 2
        params.append({
            "down": conv2d_init(kd, in_ch, inner, 4, dtype=dtype),
            "up": conv2d_init(ku, up_in, outer, 4, dtype=dtype),
        })
    return params


def _apply_level(params: List[Dict], i: int, x):
    level = params[i]
    outermost = i == 0
    innermost = i == len(params) - 1

    h = x if outermost else leaky_relu(x, 0.2)
    h = conv(h, level["down"]["kernel"], level["down"]["bias"],
             stride=2, padding=1)
    if not (outermost or innermost):
        h = instance_norm(h)

    if not innermost:
        h = _apply_level(params, i + 1, h)

    h = jax.nn.relu(h)
    # torch ConvTranspose2d(k=4, s=2, p=1) — exact 2x upsample
    h = conv_transpose(h, level["up"]["kernel"], level["up"]["bias"],
                       stride=2, padding=1, output_padding=0)
    if outermost:
        return jnp.tanh(h)
    h = instance_norm(h)
    return jnp.concatenate([x, h], axis=-1)


def lineart_anime_apply(params: List[Dict], x):
    """x: (N, H, W, 3) in [-1, 1], H/W multiples of 256 ->
    (N, H, W, 1) in [-1, 1]."""
    return _apply_level(params, 0, x)


def convert_lineart_anime(sd: Dict[str, np.ndarray]) -> List[Dict]:
    """torch UnetGenerator state dict -> per-level param list.

    Nested Sequential naming: outermost = model.model.{0,3}; each middle
    level nests at index 3 of its parent with down at 1 / up at 5; the
    innermost has up at 3 (lineart_anime/__init__.py:86-107).
    """
    params = []
    prefix = "model.model."
    for i in range(len(_LEVELS)):
        outermost = i == 0
        innermost = i == len(_LEVELS) - 1
        di = 0 if outermost else 1
        ui = 3 if (outermost or innermost) else 5
        params.append({
            "down": {
                "kernel": jnp.asarray(t2j_conv(sd[f"{prefix}{di}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{prefix}{di}.bias"])),
            },
            "up": {
                "kernel": jnp.asarray(
                    t2j_conv_transpose(sd[f"{prefix}{ui}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{prefix}{ui}.bias"])),
            },
        })
        prefix += "1.model." if outermost else "3.model."
    return params


class LineartAnimeDetector:
    """Host wrapper with the reference call protocol
    (lineart_anime/__init__.py:145-188)."""

    def __init__(self, params: List[Dict]):
        self.params = params
        self._apply = jax.jit(lineart_anime_apply)

    @classmethod
    def from_pretrained(cls, weights_path: str) -> "LineartAnimeDetector":
        from pcdms_tpu.pose.detectors.common import load_torch_state_dict
        return cls(convert_lineart_anime(load_torch_state_dict(weights_path)))

    def __call__(self, input_image, detect_resolution: int = 512,
                 image_resolution: int = 512) -> np.ndarray:
        import cv2
        img = hwc3(np.asarray(input_image, np.uint8))
        img = resize_to_64(img, detect_resolution)
        h, w = img.shape[:2]
        hn = 256 * int(np.ceil(h / 256.0))
        wn = 256 * int(np.ceil(w / 256.0))
        feed = cv2.resize(img, (wn, hn), interpolation=cv2.INTER_CUBIC)

        x = jnp.asarray(feed, jnp.float32)[None] / 127.5 - 1.0
        line = np.asarray(self._apply(self.params, x)[0, :, :, 0],
                          np.float32) * 127.5 + 127.5
        line = cv2.resize(line, (w, h), interpolation=cv2.INTER_CUBIC)
        detected = hwc3(line.clip(0, 255).astype(np.uint8))

        out_hw = shape_to_64(*img.shape[:2], image_resolution)
        detected = cv2.resize(detected, (out_hw[1], out_hw[0]),
                              interpolation=cv2.INTER_LINEAR)
        return 255 - detected
