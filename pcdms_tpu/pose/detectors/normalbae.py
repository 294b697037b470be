"""NormalBae surface-normal detector (EfficientNet-B5 + NNET) in JAX.

Behavioral equivalent of /root/reference/src/controlnet_aux/normalbae/:
``NNET`` = tf_efficientnet_b5_ap encoder (vendored geffnet repo; MBConv
stages with squeeze-excite, swish, TF SAME padding, BN eps 1e-3) +
the BN-architecture decoder (nets/submodules/decoder.py:16-57): 1x1 conv
on the 2048-ch head feature, four UpSampleBN skip-fusion stages, then
the coarse-to-fine normal heads — a 3x3 conv at 1/8 res and three
pointwise-MLP refinement heads at 1/4, 1/2, 1/1 applied to upsampled
(feature, previous-prediction) concats, each followed by norm_normalize
(unit-normalize xyz, kappa = elu+1.01 — submodules.py:64-70). Test-mode
path only: the train-time uncertainty-guided point sampling never runs
at inference (decoder.py:106-…).

BN is folded at conversion. Input: ImageNet-normalized RGB; output
normals are mapped to an RGB image by the wrapper
(normalbae/__init__.py:81-95: ((n+1)/2*255)).
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.pose.detectors.common import conv, hwc3, resize_to_64, shape_to_64
from pcdms_tpu.pose.detectors.midas import _same_pad, up2_align_corners
from pcdms_tpu.pose.detectors.yolox import fold_bn

_BN_EPS = 1e-3                # TF-default BN epsilon (geffnet tf_ variants)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

# (kernel, stride, expansion, out_ch, repeats) — B5 scaling of the
# EfficientNet base arch (width 1.6 / depth 2.2, channel divisor 8)
_STAGES = [
    (3, 1, 1, 24, 3),
    (3, 2, 6, 40, 5),
    (5, 2, 6, 64, 5),
    (3, 2, 6, 128, 7),
    (5, 1, 6, 176, 7),
    (5, 2, 6, 304, 9),
    (3, 1, 6, 512, 3),
]
_STEM_CH = 48
_HEAD_CH = 2048


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv_same(x, w, b=None, *, stride: int = 1, groups: int = 1):
    ph = _same_pad(x.shape[1], w.shape[0], stride)
    pw = _same_pad(x.shape[2], w.shape[1], stride)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), (ph, pw),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b.astype(x.dtype)


def _se_apply(p: Dict, x):
    g = jnp.mean(x, axis=(1, 2), keepdims=True)
    g = _swish(conv(g, p["reduce"]["kernel"], p["reduce"]["bias"]))
    g = jax.nn.sigmoid(conv(g, p["expand"]["kernel"], p["expand"]["bias"]))
    return x * g


def _block_apply(p: Dict, x, *, kernel: int, stride: int, expansion: int,
                 residual: bool):
    h = x
    if expansion != 1:
        h = _swish(_conv_same(h, p["pw"]["kernel"], p["pw"]["bias"]))
    hidden = h.shape[-1]
    h = _swish(_conv_same(h, p["dw"]["kernel"], p["dw"]["bias"],
                          stride=stride, groups=hidden))
    h = _se_apply(p["se"], h)
    h = _conv_same(h, p["pwl"]["kernel"], p["pwl"]["bias"])
    return x + h if residual else h


def encoder_apply(p: Dict, x) -> List:
    """x: (B, H, W, 3) ImageNet-normalized RGB -> skip features
    [block0 (24, 1/2), block1 (40, 1/4), block2 (64, 1/8),
    block4 (176, 1/16), head (2048, 1/32)]."""
    h = _swish(_conv_same(x, p["stem"]["kernel"], p["stem"]["bias"],
                          stride=2))
    skips = []
    for si, (k, s, e, cout, reps) in enumerate(_STAGES):
        for bi in range(reps):
            blk = p[f"stage{si}"][bi]
            stride = s if bi == 0 else 1
            residual = stride == 1 and h.shape[-1] == cout
            h = _block_apply(blk, h, kernel=k, stride=stride, expansion=e,
                             residual=residual)
        if si in (0, 1, 2, 4):
            skips.append(h)
    # the decoder consumes features[11] = the RAW conv_head output,
    # before bn2/act2 (encoder.py:24-31, decoder.py:60) — no norm or
    # activation here
    head = _conv_same(h, p["head"]["kernel"], p["head"].get("bias"))
    skips.append(head)
    return skips


# ---------------------------------------------------------------------------
# decoder (BN architecture, test mode)
# ---------------------------------------------------------------------------

def _resize_ac(x, h: int, w: int):
    """Bilinear align-corners resize to an exact size (UpSampleBN uses
    size=, which for these pyramids is always a 2x upsample)."""
    if (2 * x.shape[1], 2 * x.shape[2]) == (h, w):
        return up2_align_corners(x)
    hs, ws = x.shape[1], x.shape[2]
    ys = np.linspace(0.0, hs - 1.0, h)
    xs = np.linspace(0.0, ws - 1.0, w)
    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    y1 = np.minimum(y0 + 1, hs - 1)
    x1 = np.minimum(x0 + 1, ws - 1)
    ty = jnp.asarray((ys - y0)[None, :, None, None], x.dtype)
    tx = jnp.asarray((xs - x0)[None, None, :, None], x.dtype)
    top = x[:, y0] * (1 - ty) + x[:, y1] * ty
    return top[:, :, x0] * (1 - tx) + top[:, :, x1] * tx


def _upsample_bn(p: Dict, x, skip):
    h = _resize_ac(x, skip.shape[1], skip.shape[2])
    h = jnp.concatenate([h, skip], axis=-1)
    h = conv(h, p["conv1"]["kernel"], p["conv1"]["bias"], padding=1)
    h = jnp.where(h >= 0, h, 0.01 * h)               # LeakyReLU default
    h = conv(h, p["conv2"]["kernel"], p["conv2"]["bias"], padding=1)
    return jnp.where(h >= 0, h, 0.01 * h)


def norm_normalize(n):
    """submodules.py:64-70 on NHWC: unit xyz + kappa=elu(k)+1.01."""
    xyz, kappa = n[..., :3], n[..., 3:4]
    norm = jnp.sqrt(jnp.sum(jnp.square(xyz), axis=-1,
                            keepdims=True)) + 1e-10
    kappa = jnp.where(kappa >= 0, kappa, jnp.expm1(kappa)) + 1.0 + 0.01
    return jnp.concatenate([xyz / norm, kappa], axis=-1)


def _mlp_head(p: Dict, x):
    """Four 1x1 conv1d layers with ReLU between (out_conv_resN)."""
    for i, layer in enumerate(p):
        x = x @ layer["w"] + layer["b"]
        if i < len(p) - 1:
            x = jax.nn.relu(x)
    return x


def decoder_apply(p: Dict, feats: List):
    b0, b1, b2, b4, head = feats
    x_d0 = conv(head, p["conv2"]["kernel"], p["conv2"]["bias"])
    x_d1 = _upsample_bn(p["up1"], x_d0, b4)
    x_d2 = _upsample_bn(p["up2"], x_d1, b2)
    x_d3 = _upsample_bn(p["up3"], x_d2, b1)
    x_d4 = _upsample_bn(p["up4"], x_d3, b0)

    out8 = norm_normalize(conv(x_d2, p["res8"]["kernel"],
                               p["res8"]["bias"], padding=1))
    feat = jnp.concatenate([up2_align_corners(x_d2),
                            up2_align_corners(out8)], axis=-1)
    out4 = norm_normalize(_mlp_head(p["res4"], feat))
    feat = jnp.concatenate([up2_align_corners(x_d3),
                            up2_align_corners(out4)], axis=-1)
    out2 = norm_normalize(_mlp_head(p["res2"], feat))
    feat = jnp.concatenate([up2_align_corners(x_d4),
                            up2_align_corners(out2)], axis=-1)
    out1 = norm_normalize(_mlp_head(p["res1"], feat))
    return [out8, out4, out2, out1]


def nnet_apply(p: Dict, x):
    """Full NNET; returns the final full-res (B, H, W, 4) prediction."""
    return decoder_apply(p["decoder"], encoder_apply(p["encoder"], x))[-1]


# ---------------------------------------------------------------------------
# conversion (scannet.pt: ckpt['model'], 'module.' stripped)
# ---------------------------------------------------------------------------

def _fold(sd, conv_key: str, bn_key: str) -> Dict:
    return fold_bn(sd[f"{conv_key}.weight"],
                   {k: sd[f"{bn_key}.{k}"]
                    for k in ("weight", "bias", "running_mean",
                              "running_var")}, _BN_EPS,
                   conv_bias=sd.get(f"{conv_key}.bias"))


def _plain(sd, key: str) -> Dict:
    return {"kernel": jnp.asarray(np.transpose(
        np.asarray(sd[f"{key}.weight"]), (2, 3, 1, 0)).copy()),
        "bias": jnp.asarray(np.asarray(sd[f"{key}.bias"]))}


def convert_nnet(sd: Dict[str, np.ndarray]) -> Dict:
    enc = "encoder.original_model"
    encoder: Dict = {
        "stem": _fold(sd, f"{enc}.conv_stem", f"{enc}.bn1"),
        # bn2 is NOT folded: the decoder reads conv_head's raw output
        "head": {"kernel": jnp.asarray(np.transpose(np.asarray(
            sd[f"{enc}.conv_head.weight"]), (2, 3, 1, 0)).copy())},
    }
    for si, (_, _, e, _, reps) in enumerate(_STAGES):
        blocks = []
        for bi in range(reps):
            b = f"{enc}.blocks.{si}.{bi}"
            if e == 1:      # depthwise-separable block (no expansion)
                blk = {"dw": _fold(sd, f"{b}.conv_dw", f"{b}.bn1"),
                       "pwl": _fold(sd, f"{b}.conv_pw", f"{b}.bn2")}
            else:
                blk = {"pw": _fold(sd, f"{b}.conv_pw", f"{b}.bn1"),
                       "dw": _fold(sd, f"{b}.conv_dw", f"{b}.bn2"),
                       "pwl": _fold(sd, f"{b}.conv_pwl", f"{b}.bn3")}
            blk["se"] = {"reduce": _plain(sd, f"{b}.se.conv_reduce"),
                         "expand": _plain(sd, f"{b}.se.conv_expand")}
            blocks.append(blk)
        encoder[f"stage{si}"] = blocks

    def mlp(prefix):
        return [{"w": jnp.asarray(np.asarray(
            sd[f"{prefix}.{i}.weight"])[:, :, 0].T.copy()),
            "b": jnp.asarray(np.asarray(sd[f"{prefix}.{i}.bias"]))}
            for i in (0, 2, 4, 6)]

    decoder = {
        "conv2": _plain(sd, "decoder.conv2"),
        "res8": _plain(sd, "decoder.out_conv_res8"),
        "res4": mlp("decoder.out_conv_res4"),
        "res2": mlp("decoder.out_conv_res2"),
        "res1": mlp("decoder.out_conv_res1"),
    }
    for i in range(1, 5):
        decoder[f"up{i}"] = {
            "conv1": _fold(sd, f"decoder.up{i}._net.0",
                           f"decoder.up{i}._net.1"),
            "conv2": _fold(sd, f"decoder.up{i}._net.3",
                           f"decoder.up{i}._net.4"),
        }
    return {"encoder": encoder, "decoder": decoder}


def nnet_init(key, dtype=jnp.float32) -> Dict:
    """Random params with the converted structure."""

    def rconv(k, cin, cout, ksz, groups=1):
        fan = max(1, cin * ksz * ksz // groups)
        return {"kernel": jax.random.normal(
            k, (ksz, ksz, cin // groups, cout), dtype) / np.sqrt(fan),
            "bias": jnp.zeros((cout,), dtype)}

    keys = jax.random.split(key, 48)
    ki = iter(keys)
    head = rconv(next(ki), 512, _HEAD_CH, 1)
    head.pop("bias")                      # conv_head has no bias
    encoder: Dict = {"stem": rconv(next(ki), 3, _STEM_CH, 3),
                     "head": head}
    cin = _STEM_CH
    for si, (k, _, e, cout, reps) in enumerate(_STAGES):
        blocks = []
        for bi in range(reps):
            kk = jax.random.fold_in(keys[8 + si], bi)
            ks = jax.random.split(kk, 5)
            mid = cin * e
            se_red = max(1, cin // 4)
            blk: Dict = {}
            if e != 1:
                blk["pw"] = rconv(ks[0], cin, mid, 1)
            blk["dw"] = rconv(ks[1], mid, mid, k, groups=mid)
            blk["se"] = {"reduce": rconv(ks[2], mid, se_red, 1),
                         "expand": rconv(ks[3], se_red, mid, 1)}
            blk["pwl"] = rconv(ks[4], mid, cout, 1)
            blocks.append(blk)
            cin = cout
        encoder[f"stage{si}"] = blocks

    def rmlp(k, cin):
        ks = jax.random.split(k, 4)
        dims = [(cin, 128), (128, 128), (128, 128), (128, 4)]
        return [{"w": jax.random.normal(kk, d, dtype) / np.sqrt(d[0]),
                 "b": jnp.zeros((d[1],), dtype)}
                for kk, d in zip(ks, dims)]

    decoder = {
        "conv2": rconv(next(ki), _HEAD_CH, _HEAD_CH, 1),
        "up1": {"conv1": rconv(next(ki), _HEAD_CH + 176, 1024, 3),
                "conv2": rconv(next(ki), 1024, 1024, 3)},
        "up2": {"conv1": rconv(next(ki), 1024 + 64, 512, 3),
                "conv2": rconv(next(ki), 512, 512, 3)},
        "up3": {"conv1": rconv(next(ki), 512 + 40, 256, 3),
                "conv2": rconv(next(ki), 256, 256, 3)},
        "up4": {"conv1": rconv(next(ki), 256 + 24, 128, 3),
                "conv2": rconv(next(ki), 128, 128, 3)},
        "res8": rconv(next(ki), 512, 4, 3),
        "res4": rmlp(next(ki), 512 + 4),
        "res2": rmlp(next(ki), 256 + 4),
        "res1": rmlp(next(ki), 128 + 4),
    }
    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# detector wrapper (normalbae/__init__.py:63-108)
# ---------------------------------------------------------------------------

class NormalBaeDetector:
    def __init__(self, params: Dict):
        self.params = params
        self._apply = jax.jit(nnet_apply)

    @classmethod
    def from_pretrained(cls, weights_path: str) -> "NormalBaeDetector":
        import torch
        ckpt = torch.load(weights_path, map_location="cpu",
                          weights_only=False)["model"]
        sd = {k.replace("module.", ""): v.detach().numpy()
              for k, v in ckpt.items()}
        return cls(convert_nnet(sd))

    def __call__(self, input_image, detect_resolution: int = 512,
                 image_resolution: int = 512):
        import cv2
        img = hwc3(np.asarray(input_image, np.uint8))
        img = resize_to_64(img, detect_resolution)
        x = (img.astype(np.float32) / 255.0 - _MEAN) / _STD
        out = np.asarray(self._apply(self.params, jnp.asarray(x)[None])[0],
                         np.float32)
        normal = ((out[:, :, :3] + 1.0) * 0.5).clip(0, 1)
        detected = hwc3((normal * 255.0).clip(0, 255).astype(np.uint8))

        out_hw = shape_to_64(*img.shape[:2], image_resolution)
        return cv2.resize(detected, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_LINEAR)
