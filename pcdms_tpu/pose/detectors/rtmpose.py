"""DWPose-l / RTMPose-l wholebody keypoint model as a JAX NHWC pytree.

The reference runs mmpose's RTMPose-l ("DWPose") for top-down wholebody
keypoints (/root/reference/src/configs/dwpose-l_384x288.py:48-95). This
is a from-scratch JAX implementation of that graph:

  * CSPNeXt-l backbone (arch P5, deepen/widen 1.0, expand_ratio 0.5,
    channel_attention, SiLU/BN) -> 1024-ch stride-32 feature
  * RTMCCHead: 7x7 conv to 133 keypoint tokens, ScaleNorm + linear to
    256 dims, one GAU block (Gated Attention Unit, "Transformer Quality
    in Linear Time", arXiv 2202.10447: shared 128-d qk from a gamma/beta
    modulated base, relu^2 attention kernel, gating by u), then two
    bias-free linears to SimCC x/y bins (288*2 / 384*2 at
    simcc_split_ratio 2).

BN is folded at conversion (inference-only); preprocessing (ImageNet
mean/std on RGB — PoseDataPreprocessor, dwpose-l config:50-54) happens in
``rtmpose_apply`` so callers feed raw 0-255 RGB crops like the reference's
ONNX export path (pcdms_tpu/pose/dwpose.py).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.pose.detectors.common import conv
from pcdms_tpu.pose.detectors.yolox import (
    _cm_from_sd, conv_module_apply, conv_module_init, csp_layer_apply,
    csp_layer_init, fold_bn, silu, spp_apply, spp_init,
)

_BN_EPS = 1e-5                 # SyncBN default (dwpose-l config:64)
_MEAN = np.array([123.675, 116.28, 103.53], np.float32)     # RGB
_STD = np.array([58.395, 57.12, 57.375], np.float32)

# (in, out, num_blocks, add_identity, use_spp) — CSPNeXt P5 at
# deepen/widen 1.0
_CSPNEXT_ARCH = [
    (64, 128, 3, True, False),
    (128, 256, 6, True, False),
    (256, 512, 6, True, False),
    (512, 1024, 3, False, True),
]


# ---------------------------------------------------------------------------
# CSPNeXt pieces: depthwise-separable 5x5 block + channel attention
# ---------------------------------------------------------------------------

def cspnext_block_init(key, cin: int, cout: int, dtype=jnp.float32) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = cout // 2
    return {
        "conv1": conv_module_init(k1, cin, hidden, 3, dtype),
        "conv2_dw": {"kernel": jax.random.normal(k2, (5, 5, 1, hidden),
                                                 dtype) / 5.0,
                     "bias": jnp.zeros((hidden,), dtype)},
        "conv2_pw": conv_module_init(k3, hidden, cout, 1, dtype),
    }


def cspnext_block_apply(p: Dict, x, *, add_identity: bool):
    h = conv_module_apply(p["conv1"], x)
    # DepthwiseSeparableConvModule: 5x5 depthwise (+BN+SiLU) then 1x1
    # pointwise (+BN+SiLU)
    hidden = h.shape[-1]
    dw = conv(h, p["conv2_dw"]["kernel"], p["conv2_dw"]["bias"],
              padding=2, groups=hidden)
    dw = silu(dw)
    out = conv_module_apply(p["conv2_pw"], dw)
    return x + out if add_identity else out


def channel_attention_apply(p: Dict, x):
    """mmdet ChannelAttention: global-avg-pool -> 1x1 conv -> hardsigmoid
    gate."""
    g = jnp.mean(x, axis=(1, 2), keepdims=True)
    g = conv(g, p["kernel"], p["bias"])
    g = jnp.clip(g / 6.0 + 0.5, 0.0, 1.0)      # hardsigmoid
    return x * g


def cspnext_csp_init(key, cin: int, cout: int, n: int,
                     dtype=jnp.float32) -> Dict:
    mid = cout // 2
    ks = jax.random.split(key, 4 + n)
    p = {
        "main_conv": conv_module_init(ks[0], cin, mid, 1, dtype),
        "short_conv": conv_module_init(ks[1], cin, mid, 1, dtype),
        "final_conv": conv_module_init(ks[2], 2 * mid, cout, 1, dtype),
        "attention": conv_module_init(ks[3], 2 * mid, 2 * mid, 1, dtype),
        "blocks": [cspnext_block_init(ks[4 + i], mid, mid, dtype)
                   for i in range(n)],
    }
    return p


def cspnext_csp_apply(p: Dict, x, *, add_identity: bool):
    main = conv_module_apply(p["main_conv"], x)
    short = conv_module_apply(p["short_conv"], x)
    h = main
    for blk in p["blocks"]:
        h = cspnext_block_apply(blk, h, add_identity=add_identity)
    cat = jnp.concatenate([h, short], axis=-1)
    cat = channel_attention_apply(p["attention"], cat)
    return conv_module_apply(p["final_conv"], cat)


def cspnext_init(key, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 16)
    p: Dict = {"stem": [conv_module_init(ks[0], 3, 32, 3, dtype),
                        conv_module_init(ks[1], 32, 32, 3, dtype),
                        conv_module_init(ks[2], 32, 64, 3, dtype)]}
    for si, (cin, cout, n, _, use_spp) in enumerate(_CSPNEXT_ARCH, 1):
        stage = {"conv": conv_module_init(ks[3 * si], cin, cout, 3, dtype)}
        if use_spp:
            stage["spp"] = spp_init(ks[3 * si + 1], cout, cout, dtype)
        stage["csp"] = cspnext_csp_init(ks[3 * si + 2], cout, cout, n, dtype)
        p[f"stage{si}"] = stage
    return p


def cspnext_apply(p: Dict, x):
    """x: (B, H, W, 3) normalized RGB -> (B, H/32, W/32, 1024)."""
    h = conv_module_apply(p["stem"][0], x, stride=2)
    h = conv_module_apply(p["stem"][1], h)
    h = conv_module_apply(p["stem"][2], h)
    for si, (_, _, _, add_id, use_spp) in enumerate(_CSPNEXT_ARCH, 1):
        stage = p[f"stage{si}"]
        h = conv_module_apply(stage["conv"], h, stride=2)
        if use_spp:
            h = spp_apply(stage["spp"], h)
        h = cspnext_csp_apply(stage["csp"], h, add_identity=add_id)
    return h


# ---------------------------------------------------------------------------
# RTMCC head (SimCC coordinate classification via one GAU block)
# ---------------------------------------------------------------------------

_NUM_KPTS = 133
_FEAT_HW = (12, 9)             # 384x288 / 32 (in_featuremap_size (9, 12))
_HIDDEN = 256
_GAU_S = 128
_GAU_E = 512                   # hidden * expansion_factor 2
_SIMCC_X = 576                 # 288 * 2
_SIMCC_Y = 768                 # 384 * 2


def rtmcc_head_init(key, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 8)
    flat = _FEAT_HW[0] * _FEAT_HW[1]
    return {
        "final_layer": conv_module_init(ks[0], 1024, _NUM_KPTS, 7, dtype),
        "mlp_norm_g": jnp.ones((1,), dtype),
        "mlp": jax.random.normal(ks[1], (flat, _HIDDEN), dtype)
        / np.sqrt(flat),
        "gau": {
            "ln_g": jnp.ones((1,), dtype),
            "uv": jax.random.normal(ks[2], (_HIDDEN, 2 * _GAU_E + _GAU_S),
                                    dtype) / np.sqrt(_HIDDEN),
            "gamma": jax.random.uniform(ks[3], (2, _GAU_S), dtype),
            "beta": jax.random.uniform(ks[4], (2, _GAU_S), dtype),
            "o": jax.random.normal(ks[5], (_GAU_E, _HIDDEN), dtype)
            / np.sqrt(_GAU_E),
            "res_scale": jnp.ones((_HIDDEN,), dtype),
        },
        "cls_x": jax.random.normal(ks[6], (_HIDDEN, _SIMCC_X), dtype)
        / np.sqrt(_HIDDEN),
        "cls_y": jax.random.normal(ks[7], (_HIDDEN, _SIMCC_Y), dtype)
        / np.sqrt(_HIDDEN),
    }


def _scale_norm(x, g, eps: float = 1e-5):
    """mmpose ScaleNorm: x / max(||x|| * d^-0.5, eps) * g."""
    scale = x.shape[-1] ** -0.5
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * scale
    return x / jnp.maximum(norm, eps) * g


def gau_apply(p: Dict, x):
    """Self-attention GAU block (mmpose RTMCCBlock, self-attn mode,
    no rel-bias, no pos-enc, SiLU): shortcut scale + relu^2 kernel."""
    h = _scale_norm(x, p["ln_g"])
    uv = silu(h @ p["uv"])
    u, v, base = jnp.split(uv, [_GAU_E, 2 * _GAU_E], axis=-1)
    qk = base[:, :, None, :] * p["gamma"][None, None] + p["beta"][None, None]
    q, k = qk[:, :, 0], qk[:, :, 1]                      # (B, T, s)
    attn = jnp.einsum("bts,bus->btu", q, k) / math.sqrt(_GAU_S)
    kernel = jnp.square(jax.nn.relu(attn))
    out = u * jnp.einsum("btu,bue->bte", kernel, v)
    return x * p["res_scale"] + out @ p["o"]


def rtmcc_head_apply(p: Dict, feat) -> Tuple:
    """feat: (B, 12, 9, 1024) -> (simcc_x (B, 133, 576),
    simcc_y (B, 133, 768))."""
    h = conv(feat, p["final_layer"]["kernel"], p["final_layer"]["bias"],
             padding=3)                                   # (B, 12, 9, 133)
    b = h.shape[0]
    # torch flatten(2) runs row-major over (H, W)
    tokens = h.transpose(0, 3, 1, 2).reshape(b, _NUM_KPTS, -1)
    tokens = _scale_norm(tokens, p["mlp_norm_g"]) @ p["mlp"]
    tokens = gau_apply(p["gau"], tokens)
    return tokens @ p["cls_x"], tokens @ p["cls_y"]


def rtmpose_init(key, dtype=jnp.float32) -> Dict:
    kb, kh = jax.random.split(key)
    return {"backbone": cspnext_init(kb, dtype),
            "head": rtmcc_head_init(kh, dtype)}


def rtmpose_apply(p: Dict, x):
    """x: (B, 384, 288, 3) raw 0-255 RGB crop -> SimCC logits. ImageNet
    normalization is applied here (PoseDataPreprocessor semantics)."""
    x = (x - jnp.asarray(_MEAN, x.dtype)) / jnp.asarray(_STD, x.dtype)
    return rtmcc_head_apply(p["head"], cspnext_apply(p["backbone"], x))


# ---------------------------------------------------------------------------
# mmpose checkpoint conversion
# ---------------------------------------------------------------------------

def _cspnext_block_from_sd(sd, prefix: str, eps: float) -> Dict:
    # depthwise torch weight (C, 1, k, k): fold_bn's OIHW->HWIO transpose
    # already yields the (k, k, 1, C) layout feature_group_count expects
    dw = fold_bn(sd[f"{prefix}.conv2.depthwise_conv.conv.weight"],
                 {k: sd[f"{prefix}.conv2.depthwise_conv.bn.{k}"]
                  for k in ("weight", "bias", "running_mean",
                            "running_var")}, eps)
    return {
        "conv1": _cm_from_sd(sd, f"{prefix}.conv1", eps),
        "conv2_dw": dw,
        "conv2_pw": _cm_from_sd(sd, f"{prefix}.conv2.pointwise_conv", eps),
    }


def _cspnext_csp_from_sd(sd, prefix: str, n: int, eps: float) -> Dict:
    return {
        "main_conv": _cm_from_sd(sd, f"{prefix}.main_conv", eps),
        "short_conv": _cm_from_sd(sd, f"{prefix}.short_conv", eps),
        "final_conv": _cm_from_sd(sd, f"{prefix}.final_conv", eps),
        "attention": {
            "kernel": jnp.asarray(np.transpose(np.asarray(
                sd[f"{prefix}.attention.fc.weight"]), (2, 3, 1, 0)).copy()),
            "bias": jnp.asarray(np.asarray(
                sd[f"{prefix}.attention.fc.bias"])),
        },
        "blocks": [_cspnext_block_from_sd(sd, f"{prefix}.blocks.{i}", eps)
                   for i in range(n)],
    }


def _linear_t(w) -> jnp.ndarray:
    return jnp.asarray(np.asarray(w).T.copy())


def convert_rtmpose(sd: Dict[str, np.ndarray]) -> Dict:
    """mmpose RTMPose/DWPose state dict (backbone./head. prefixes) ->
    param pytree (BN folded)."""
    eps = _BN_EPS
    p: Dict = {"backbone": {"stem": [
        _cm_from_sd(sd, f"backbone.stem.{i}", eps) for i in range(3)]}}
    for si, (_, _, n, _, use_spp) in enumerate(_CSPNEXT_ARCH, 1):
        stage = {"conv": _cm_from_sd(sd, f"backbone.stage{si}.0", eps)}
        if use_spp:
            stage["spp"] = {
                "conv1": _cm_from_sd(sd, f"backbone.stage{si}.1.conv1", eps),
                "conv2": _cm_from_sd(sd, f"backbone.stage{si}.1.conv2", eps),
            }
            stage["csp"] = _cspnext_csp_from_sd(
                sd, f"backbone.stage{si}.2", n, eps)
        else:
            stage["csp"] = _cspnext_csp_from_sd(
                sd, f"backbone.stage{si}.1", n, eps)
        p["backbone"][f"stage{si}"] = stage

    p["head"] = {
        "final_layer": {
            "kernel": jnp.asarray(np.transpose(np.asarray(
                sd["head.final_layer.weight"]), (2, 3, 1, 0)).copy()),
            "bias": jnp.asarray(np.asarray(sd["head.final_layer.bias"])),
        },
        "mlp_norm_g": jnp.asarray(np.asarray(sd["head.mlp.0.g"]).reshape(1)),
        "mlp": _linear_t(sd["head.mlp.1.weight"]),
        "gau": {
            "ln_g": jnp.asarray(np.asarray(sd["head.gau.ln.g"]).reshape(1)),
            "uv": _linear_t(sd["head.gau.uv.weight"]),
            "gamma": jnp.asarray(np.asarray(sd["head.gau.gamma"])),
            "beta": jnp.asarray(np.asarray(sd["head.gau.beta"])),
            "o": _linear_t(sd["head.gau.o.weight"]),
            "res_scale": jnp.asarray(np.asarray(
                sd["head.gau.res_scale.scale"])),
        },
        "cls_x": _linear_t(sd["head.cls_x.weight"]),
        "cls_y": _linear_t(sd["head.cls_y.weight"]),
    }
    return p
