"""LeReS relative-depth detector (ResNeXt101-32x8d + FFM decoder) in JAX.

Behavioral equivalent of /root/reference/src/controlnet_aux/leres/:
``RelDepthModel(backbone='resnext101')`` = torchvision-style
ResNeXt101-32x8d encoder returning the four stage features
(Resnext_torch.py) + the FTB/FFM/AO decoder (network_auxi.py:15-286),
driven by the estimateleres protocol (leres/depthmap.py:18-50 — NB the
reference normalizes the **BGR**-flipped image with ImageNet RGB stats;
quirk preserved) and the 16-bit normalize / invert postprocess
(leres/__init__.py:60-112).

BN is folded into convs at conversion (inference-only). The ``boost``
mode runs the full BoostingMonocularDepth protocol via
pcdms_tpu.pose.detectors.leres_boost (pix2pix merge network + adaptive
patch refinement) when the merge checkpoint is supplied.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.pose.detectors.common import (
    conv, hwc3, resize_to_64, shape_to_64,
)
from pcdms_tpu.pose.detectors.midas import up2_align_corners
from pcdms_tpu.pose.detectors.yolox import fold_bn

_BN_EPS = 1e-5
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)
_LAYERS = (3, 4, 23, 3)
_GROUPS = 32
_WIDTH_PER_GROUP = 8


# ---------------------------------------------------------------------------
# ResNeXt101-32x8d encoder (BN folded)
# ---------------------------------------------------------------------------

def _bottleneck_apply(p: Dict, x, *, stride: int):
    sc = x
    if "downsample" in p:
        sc = conv(x, p["downsample"]["kernel"], p["downsample"]["bias"],
                  stride=stride)
    h = jax.nn.relu(conv(x, p["conv1"]["kernel"], p["conv1"]["bias"]))
    h = jax.nn.relu(conv(h, p["conv2"]["kernel"], p["conv2"]["bias"],
                         stride=stride, padding=1, groups=_GROUPS))
    h = conv(h, p["conv3"]["kernel"], p["conv3"]["bias"])
    return jax.nn.relu(h + sc)


def resnext_apply(p: Dict, x) -> List:
    """x: (B, H, W, 3) normalized -> [1/4 256, 1/8 512, 1/16 1024,
    1/32 2048] stage features."""
    h = conv(x, p["stem"]["kernel"], p["stem"]["bias"], stride=2, padding=3)
    h = jax.nn.relu(h)
    h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-np.inf)
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "VALID")
    outs = []
    for li, depth in enumerate(_LAYERS, 1):
        layer = p[f"layer{li}"]
        for bi in range(depth):
            h = _bottleneck_apply(layer[bi], h,
                                  stride=2 if (bi == 0 and li > 1) else 1)
        outs.append(h)
    return outs


# ---------------------------------------------------------------------------
# FTB / FFM / AO decoder
# ---------------------------------------------------------------------------

def _ftb_apply(p: Dict, x):
    """Feature-transfer block (network_auxi.py:100-124): 3x3 conv, then a
    relu-conv-bn-relu-conv residual branch, add, relu."""
    x = conv(x, p["conv1"]["kernel"], p["conv1"]["bias"], padding=1)
    h = jax.nn.relu(x)
    h = conv(h, p["branch1"]["kernel"], p["branch1"]["bias"], padding=1)
    h = jax.nn.relu(h)
    h = conv(h, p["branch2"]["kernel"], p["branch2"]["bias"], padding=1)
    return jax.nn.relu(x + h)


def _ffm_apply(p: Dict, low, high):
    """Feature-fusion module (network_auxi.py:191-214)."""
    h = _ftb_apply(p["ftb1"], low) + high
    h = _ftb_apply(p["ftb2"], h)
    return up2_align_corners(h)


def decoder_apply(p: Dict, feats: List):
    x = _ftb_apply(p["conv"], feats[3])
    x = conv(x, p["conv1"]["kernel"], p["conv1"]["bias"], padding=1)
    x = up2_align_corners(x)
    x = _ffm_apply(p["ffm2"], feats[2], x)
    x = _ffm_apply(p["ffm1"], feats[1], x)
    x = _ffm_apply(p["ffm0"], feats[0], x)
    # AO head (network_auxi.py:238-261): conv-bn-relu-conv, up2
    x = conv(x, p["ao1"]["kernel"], p["ao1"]["bias"], padding=1)
    x = jax.nn.relu(x)
    x = conv(x, p["ao2"]["kernel"], p["ao2"]["bias"], padding=1)
    return up2_align_corners(x)


def leres_apply(p: Dict, x):
    """x: (B, H, W, 3) raw 0-255 **BGR** (the reference's channel-flip
    quirk) -> (B, H, W) relative depth logits. ImageNet normalization
    applied here (depthmap.py:28)."""
    x = (x / 255.0 - jnp.asarray(_MEAN, x.dtype)) / jnp.asarray(_STD,
                                                                x.dtype)
    return decoder_apply(p["decoder"], resnext_apply(p["encoder"], x))[
        :, :, :, 0]


# ---------------------------------------------------------------------------
# conversion (res101.pth: checkpoint['depth_model'], 'module.' stripped)
# ---------------------------------------------------------------------------

def _fold(sd, conv_key: str, bn_key: str) -> Dict:
    """Fold BN into the conv; the decoder's convs carry their own bias
    (network_auxi.py passes bias=True), the encoder's do not."""
    return fold_bn(sd[f"{conv_key}.weight"],
                   {k: sd[f"{bn_key}.{k}"]
                    for k in ("weight", "bias", "running_mean",
                              "running_var")}, _BN_EPS,
                   conv_bias=sd.get(f"{conv_key}.bias"))


def _plain(sd, key: str) -> Dict:
    return {"kernel": jnp.asarray(np.transpose(
        np.asarray(sd[f"{key}.weight"]), (2, 3, 1, 0)).copy()),
        "bias": jnp.asarray(np.asarray(sd[f"{key}.bias"]))}


def _ftb_from_sd(sd, prefix: str) -> Dict:
    return {
        "conv1": _plain(sd, f"{prefix}.conv1"),
        "branch1": _fold(sd, f"{prefix}.conv_branch.1",
                         f"{prefix}.conv_branch.2"),
        "branch2": _plain(sd, f"{prefix}.conv_branch.4"),
    }


def convert_leres(sd: Dict[str, np.ndarray]) -> Dict:
    """RelDepthModel state dict (depth_model.encoder_modules. /
    depth_model.decoder_modules. prefixes) -> folded param pytree."""
    enc = "depth_model.encoder_modules"
    encoder: Dict = {"stem": _fold(sd, f"{enc}.conv1", f"{enc}.bn1")}
    for li, depth in enumerate(_LAYERS, 1):
        blocks = []
        for bi in range(depth):
            b = f"{enc}.layer{li}.{bi}"
            p = {f"conv{i}": _fold(sd, f"{b}.conv{i}", f"{b}.bn{i}")
                 for i in (1, 2, 3)}
            if f"{b}.downsample.0.weight" in sd:
                p["downsample"] = _fold(sd, f"{b}.downsample.0",
                                        f"{b}.downsample.1")
            blocks.append(p)
        encoder[f"layer{li}"] = blocks

    dec = "depth_model.decoder_modules"
    decoder = {
        "conv": _ftb_from_sd(sd, f"{dec}.conv"),
        "conv1": _plain(sd, f"{dec}.conv1"),
        "ffm2": {"ftb1": _ftb_from_sd(sd, f"{dec}.ffm2.ftb1"),
                 "ftb2": _ftb_from_sd(sd, f"{dec}.ffm2.ftb2")},
        "ffm1": {"ftb1": _ftb_from_sd(sd, f"{dec}.ffm1.ftb1"),
                 "ftb2": _ftb_from_sd(sd, f"{dec}.ffm1.ftb2")},
        "ffm0": {"ftb1": _ftb_from_sd(sd, f"{dec}.ffm0.ftb1"),
                 "ftb2": _ftb_from_sd(sd, f"{dec}.ffm0.ftb2")},
        "ao1": _fold(sd, f"{dec}.outconv.adapt_conv.0",
                     f"{dec}.outconv.adapt_conv.1"),
        "ao2": _plain(sd, f"{dec}.outconv.adapt_conv.3"),
    }
    return {"encoder": encoder, "decoder": decoder}


def leres_init(key, dtype=jnp.float32) -> Dict:
    """Random params with the converted structure (tests / smoke)."""

    def rconv(k, cin, cout, ksz, groups=1):
        fan = cin * ksz * ksz // groups
        return {"kernel": jax.random.normal(
            k, (ksz, ksz, cin // groups, cout), dtype) / np.sqrt(fan),
            "bias": jnp.zeros((cout,), dtype)}

    keys = jax.random.split(key, 40)
    ki = iter(keys)
    encoder: Dict = {"stem": rconv(next(ki), 3, 64, 7)}
    cin = 64
    for li, (depth, planes) in enumerate(zip(_LAYERS, (64, 128, 256, 512)),
                                         1):
        width = planes * _WIDTH_PER_GROUP * _GROUPS // 64
        cout = planes * 4
        blocks = []
        for bi in range(depth):
            k = jax.random.fold_in(keys[4 + li], bi)
            ks = jax.random.split(k, 4)
            p = {"conv1": rconv(ks[0], cin if bi == 0 else cout, width, 1),
                 "conv2": rconv(ks[1], width, width, 3, groups=_GROUPS),
                 "conv3": rconv(ks[2], width, cout, 1)}
            if bi == 0:
                p["downsample"] = rconv(ks[3], cin, cout, 1)
            blocks.append(p)
        encoder[f"layer{li}"] = blocks
        cin = cout

    def rftb(k, cin, mid):
        ks = jax.random.split(k, 3)
        return {"conv1": rconv(ks[0], cin, mid, 3),
                "branch1": rconv(ks[1], mid, mid, 3),
                "branch2": rconv(ks[2], mid, mid, 3)}

    decoder = {
        "conv": rftb(next(ki), 2048, 512),
        "conv1": rconv(next(ki), 512, 256, 3),
        "ffm2": {"ftb1": rftb(next(ki), 1024, 256),
                 "ftb2": rftb(next(ki), 256, 256)},
        "ffm1": {"ftb1": rftb(next(ki), 512, 256),
                 "ftb2": rftb(next(ki), 256, 256)},
        "ffm0": {"ftb1": rftb(next(ki), 256, 256),
                 "ftb2": rftb(next(ki), 256, 256)},
        "ao1": rconv(next(ki), 256, 128, 3),
        "ao2": rconv(next(ki), 128, 1, 3),
    }
    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# detector wrapper (leres/__init__.py:59-118)
# ---------------------------------------------------------------------------

class LeresDetector:
    def __init__(self, params: Dict, pix2pix_params=None):
        self.params = params
        self.pix2pix_params = pix2pix_params
        self._apply = jax.jit(leres_apply)

    @classmethod
    def from_pretrained(cls, weights_path: str,
                        pix2pix_weights: str = None) -> "LeresDetector":
        import torch
        ckpt = torch.load(weights_path, map_location="cpu",
                          weights_only=False)
        sd = {k.replace("module.", ""): v.detach().numpy()
              for k, v in ckpt["depth_model"].items()}
        p2p = None
        if pix2pix_weights is not None:
            from pcdms_tpu.pose.detectors.common import (
                load_torch_state_dict,
            )
            from pcdms_tpu.pose.detectors.leres_boost import (
                convert_pix2pix4depth,
            )
            p2p = convert_pix2pix4depth(
                load_torch_state_dict(pix2pix_weights))
        return cls(convert_leres(sd), p2p)

    def _estimate(self, rgb: np.ndarray, w: int, h: int) -> np.ndarray:
        """estimateleres protocol on an RGB image (the BGR flip +
        resize happen here, depthmap.py:35-50)."""
        import cv2
        bgr = rgb[:, :, ::-1].astype(np.float32)
        resized = cv2.resize(bgr, (w, h))
        depth = np.asarray(
            self._apply(self.params, jnp.asarray(resized)[None])[0],
            np.float32)
        return cv2.resize(depth, (rgb.shape[1], rgb.shape[0]),
                          interpolation=cv2.INTER_CUBIC)

    def __call__(self, input_image, thr_a: float = 0, thr_b: float = 0,
                 boost: bool = False, detect_resolution: int = 512,
                 image_resolution: int = 512):
        import cv2
        if boost and self.pix2pix_params is None:
            raise NotImplementedError(
                "LeReS boost mode needs the pix2pix merge network: pass "
                "pix2pix_weights=... (latest_net_G.pth) to "
                "from_pretrained.")
        img = hwc3(np.asarray(input_image, np.uint8))
        img = resize_to_64(img, detect_resolution)
        if boost:
            from pcdms_tpu.pose.detectors.leres_boost import estimateboost
            depth = estimateboost(
                img, self._estimate, self.pix2pix_params,
                max_res=max(img.shape[:2]))
        else:
            bgr = img[:, :, ::-1].astype(np.float32)  # reference quirk
            depth = np.asarray(
                self._apply(self.params, jnp.asarray(bgr)[None])[0],
                np.float32)

        dmin, dmax = depth.min(), depth.max()
        if dmax - dmin > np.finfo(np.float32).eps:
            out = 65535.0 * (depth - dmin) / (dmax - dmin)
        else:
            out = np.zeros(depth.shape, np.float32)
        depth_image = cv2.convertScaleAbs(out.astype(np.uint16),
                                          alpha=255.0 / 65535.0)
        if thr_a != 0:
            depth_image = cv2.threshold(depth_image, thr_a / 100 * 255,
                                        255, cv2.THRESH_TOZERO)[1]
        depth_image = cv2.bitwise_not(depth_image)
        if thr_b != 0:
            depth_image = cv2.threshold(depth_image, thr_b / 100 * 255,
                                        255, cv2.THRESH_TOZERO)[1]
        detected = hwc3(depth_image)

        out_hw = shape_to_64(*img.shape[:2], image_resolution)
        return cv2.resize(detected, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_LINEAR)
