"""LineArt detector (anime2sketch-style ResNet generator).

Behavioral equivalent of /root/reference/src/controlnet_aux/lineart/__init__.py:
a 7x7-conv stem, two stride-2 downsamples (64->128->256), 3 residual
blocks (reflect-pad conv + InstanceNorm), two transposed-conv upsamples,
and a 7x7 sigmoid head producing a 1-channel line map. Input RGB in
[0, 1]; output is inverted to white-background lineart by the wrapper
(lineart/__init__.py:152-163). Two weight sets share the architecture:
``sk_model.pth`` (realistic) and ``sk_model2.pth`` (coarse).

InstanceNorm runs with affine=False, so checkpoints hold conv weights
only.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.nn.layers import conv2d_init
from pcdms_tpu.pose.detectors.common import (
    conv, conv_transpose, hwc3, instance_norm, reflect_pad, resize_to_64, shape_to_64,
    t2j_conv, t2j_conv_transpose,
)

_N_RESIDUAL = 3


def lineart_init(key, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 16)
    params: Dict = {
        "stem": conv2d_init(ks[0], 3, 64, 7, dtype=dtype),
        "down": [conv2d_init(ks[1], 64, 128, 3, dtype=dtype),
                 conv2d_init(ks[2], 128, 256, 3, dtype=dtype)],
        "res": [{"conv1": conv2d_init(ks[3 + 2 * i], 256, 256, 3,
                                      dtype=dtype),
                 "conv2": conv2d_init(ks[4 + 2 * i], 256, 256, 3,
                                      dtype=dtype)}
                for i in range(_N_RESIDUAL)],
        "up": [conv2d_init(ks[10], 256, 128, 3, dtype=dtype),
               conv2d_init(ks[11], 128, 64, 3, dtype=dtype)],
        "head": conv2d_init(ks[12], 64, 1, 7, dtype=dtype),
    }
    return params


def lineart_apply(params: Dict, x):
    """x: (N, H, W, 3) in [0, 1] -> (N, H, W, 1) line probability."""
    h = reflect_pad(x, 3)
    h = jax.nn.relu(instance_norm(conv(h, params["stem"]["kernel"],
                                       params["stem"]["bias"])))
    for d in params["down"]:
        h = jax.nn.relu(instance_norm(
            conv(h, d["kernel"], d["bias"], stride=2, padding=1)))
    for r in params["res"]:
        y = reflect_pad(h, 1)
        y = jax.nn.relu(instance_norm(conv(y, r["conv1"]["kernel"],
                                           r["conv1"]["bias"])))
        y = reflect_pad(y, 1)
        y = instance_norm(conv(y, r["conv2"]["kernel"], r["conv2"]["bias"]))
        h = h + y
    for u in params["up"]:
        h = jax.nn.relu(instance_norm(conv_transpose(
            h, u["kernel"], u["bias"], stride=2, padding=1,
            output_padding=1)))
    h = reflect_pad(h, 3)
    return jax.nn.sigmoid(conv(h, params["head"]["kernel"],
                               params["head"]["bias"]))


def convert_lineart(sd: Dict[str, np.ndarray]) -> Dict:
    """torch Generator(3, 1, 3) state dict -> param pytree.

    Sequential indices (lineart/__init__.py:40-82): model0 = [pad, conv,
    IN, relu]; model1 = 2x [conv, IN, relu]; model2 = 3 ResidualBlocks
    whose conv_block = [pad, conv, IN, relu, pad, conv, IN]; model3 =
    2x [deconv, IN, relu]; model4 = [pad, conv, (sigmoid)].
    """
    def c(name):
        return {"kernel": jnp.asarray(t2j_conv(sd[f"{name}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}

    def ct(name):
        return {"kernel": jnp.asarray(t2j_conv_transpose(sd[f"{name}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}

    return {
        "stem": c("model0.1"),
        "down": [c("model1.0"), c("model1.3")],
        "res": [{"conv1": c(f"model2.{i}.conv_block.1"),
                 "conv2": c(f"model2.{i}.conv_block.5")}
                for i in range(_N_RESIDUAL)],
        "up": [ct("model3.0"), ct("model3.3")],
        "head": c("model4.1"),
    }


class LineartDetector:
    """Host wrapper with the reference call protocol
    (lineart/__init__.py:126-166)."""

    def __init__(self, params: Dict, coarse_params: Dict = None):
        self.params = params
        self.coarse_params = coarse_params
        self._apply = jax.jit(lineart_apply)

    @classmethod
    def from_pretrained(cls, weights_path: str = None,
                        coarse_weights_path: str = None):
        from pcdms_tpu.pose.detectors.common import load_torch_state_dict
        main = (convert_lineart(load_torch_state_dict(weights_path))
                if weights_path else None)
        coarse = (convert_lineart(load_torch_state_dict(coarse_weights_path))
                  if coarse_weights_path else None)
        return cls(main, coarse)

    def __call__(self, input_image, coarse: bool = False,
                 detect_resolution: int = 512,
                 image_resolution: int = 512) -> np.ndarray:
        import cv2
        img = hwc3(np.asarray(input_image, np.uint8))
        img = resize_to_64(img, detect_resolution)

        params = self.coarse_params if coarse else self.params
        if params is None:
            raise ValueError(
                f"{'coarse' if coarse else 'realistic'} weights were "
                "not loaded")
        x = jnp.asarray(img, jnp.float32)[None] / 255.0
        line = np.asarray(self._apply(params, x)[0, :, :, 0], np.float32)
        detected = hwc3((line * 255.0).clip(0, 255).astype(np.uint8))

        out_hw = shape_to_64(*img.shape[:2], image_resolution)
        detected = cv2.resize(detected, (out_hw[1], out_hw[0]),
                              interpolation=cv2.INTER_LINEAR)
        return 255 - detected
