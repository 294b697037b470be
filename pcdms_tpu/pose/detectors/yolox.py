"""YOLOX-l person detector (mmdet flavor) as a JAX NHWC pytree.

The reference runs mmdet YOLOX-l for DWPose person detection
(/root/reference/src/configs/yolox_l_8xb8-300e_coco.py:4-44,
 /root/reference/src/controlnet_aux/dwpose/wholebody.py:51-58). This is a
from-scratch JAX implementation of that exact graph — CSPDarknet
(deepen/widen 1.0, out (2, 3, 4), SPP (5, 9, 13)), YOLOXPAFPN
(out_channels 256, 3 CSP blocks), decoupled YOLOXHead (2 stacked convs,
feat 256) — so the whole DWPose stack can run on-device without
onnxruntime/mmcv. BN (momentum 0.03, eps 0.001) is folded into conv
weights at conversion time (inference-only, frozen).

Raw head outputs are packed [xy, wh, obj, cls] per anchor point with
sigmoid on obj/cls, matching the official ONNX export layout that
``pcdms_tpu.pose.dwpose.decode_yolox`` already decodes (grid offsets +
exp(wh) are applied there, not here).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.pose.detectors.common import conv, max_pool_2x2  # noqa: F401

# ---------------------------------------------------------------------------
# primitives: ConvModule (conv + folded BN + SiLU)
# ---------------------------------------------------------------------------


def silu(x):
    return x * jax.nn.sigmoid(x)


def conv_module_init(key, cin: int, cout: int, k: int,
                     dtype=jnp.float32) -> Dict:
    fan = cin * k * k
    w = jax.random.normal(key, (k, k, cin, cout), dtype) / np.sqrt(fan)
    return {"kernel": w, "bias": jnp.zeros((cout,), dtype)}


def conv_module_apply(p: Dict, x, *, stride: int = 1, act: bool = True,
                      groups: int = 1):
    k = p["kernel"].shape[0]
    y = conv(x, p["kernel"], p["bias"], stride=stride, padding=(k - 1) // 2,
             groups=groups)
    return silu(y) if act else y


def fold_bn(w_oihw: np.ndarray, bn: Dict[str, np.ndarray],
            eps: float, conv_bias=None) -> Dict:
    """torch Conv2d + BatchNorm2d -> single HWIO conv+bias. ``conv_bias``
    is the conv's own bias when it has one (folded through the BN)."""
    gamma, beta = np.asarray(bn["weight"]), np.asarray(bn["bias"])
    mean, var = np.asarray(bn["running_mean"]), np.asarray(bn["running_var"])
    scale = gamma / np.sqrt(var + eps)
    w = np.asarray(w_oihw) * scale[:, None, None, None]
    b = beta - mean * scale
    if conv_bias is not None:
        b = b + np.asarray(conv_bias) * scale
    return {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)).copy()),
            "bias": jnp.asarray(b)}


def _cm_from_sd(sd: Dict, prefix: str, eps: float) -> Dict:
    """ConvModule ``{prefix}.conv`` + ``{prefix}.bn`` -> folded params."""
    return fold_bn(sd[f"{prefix}.conv.weight"],
                   {k: sd[f"{prefix}.bn.{k}"]
                    for k in ("weight", "bias", "running_mean",
                              "running_var")}, eps)


# ---------------------------------------------------------------------------
# CSPLayer (mmdet): main/short 1x1 split, n DarknetBottlenecks, 1x1 merge
# ---------------------------------------------------------------------------

def csp_layer_init(key, cin: int, cout: int, n: int,
                   dtype=jnp.float32) -> Dict:
    mid = cout // 2
    ks = jax.random.split(key, 3 + 2 * n)
    p = {
        "main_conv": conv_module_init(ks[0], cin, mid, 1, dtype),
        "short_conv": conv_module_init(ks[1], cin, mid, 1, dtype),
        "final_conv": conv_module_init(ks[2], 2 * mid, cout, 1, dtype),
        "blocks": [],
    }
    for i in range(n):
        p["blocks"].append({
            "conv1": conv_module_init(ks[3 + 2 * i], mid, mid, 1, dtype),
            "conv2": conv_module_init(ks[4 + 2 * i], mid, mid, 3, dtype),
        })
    return p


def csp_layer_apply(p: Dict, x, *, add_identity: bool):
    main = conv_module_apply(p["main_conv"], x)
    short = conv_module_apply(p["short_conv"], x)
    h = main
    for blk in p["blocks"]:
        y = conv_module_apply(blk["conv1"], h)
        y = conv_module_apply(blk["conv2"], y)
        h = h + y if add_identity else y
    return conv_module_apply(p["final_conv"],
                             jnp.concatenate([h, short], axis=-1))


def _csp_from_sd(sd: Dict, prefix: str, n: int, eps: float) -> Dict:
    p = {
        "main_conv": _cm_from_sd(sd, f"{prefix}.main_conv", eps),
        "short_conv": _cm_from_sd(sd, f"{prefix}.short_conv", eps),
        "final_conv": _cm_from_sd(sd, f"{prefix}.final_conv", eps),
        "blocks": [
            {"conv1": _cm_from_sd(sd, f"{prefix}.blocks.{i}.conv1", eps),
             "conv2": _cm_from_sd(sd, f"{prefix}.blocks.{i}.conv2", eps)}
            for i in range(n)
        ],
    }
    return p


def spp_init(key, cin: int, cout: int, dtype=jnp.float32) -> Dict:
    k1, k2 = jax.random.split(key)
    mid = cin // 2
    return {"conv1": conv_module_init(k1, cin, mid, 1, dtype),
            "conv2": conv_module_init(k2, mid * 4, cout, 1, dtype)}


def spp_apply(p: Dict, x, kernels: Sequence[int] = (5, 9, 13)):
    h = conv_module_apply(p["conv1"], x)
    pools = [h]
    for k in kernels:
        pools.append(jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
            [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)]))
    return conv_module_apply(p["conv2"], jnp.concatenate(pools, axis=-1))


# ---------------------------------------------------------------------------
# CSPDarknet-l backbone
# ---------------------------------------------------------------------------

# (in, out, num_blocks, add_identity, use_spp) — mmdet P5 arch at
# deepen/widen 1.0
_DARKNET_ARCH = [
    (64, 128, 3, True, False),
    (128, 256, 9, True, False),
    (256, 512, 9, True, False),
    (512, 1024, 3, False, True),
]
_BN_EPS = 1e-3          # norm_cfg eps 0.001 (yolox_l config:23)


def yolox_backbone_init(key, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 16)
    p: Dict = {"stem": conv_module_init(ks[0], 12, 64, 3, dtype)}
    for si, (cin, cout, n, _, use_spp) in enumerate(_DARKNET_ARCH, 1):
        stage = {"conv": conv_module_init(ks[3 * si], cin, cout, 3, dtype)}
        if use_spp:
            stage["spp"] = spp_init(ks[3 * si + 1], cout, cout, dtype)
        stage["csp"] = csp_layer_init(ks[3 * si + 2], cout, cout, n, dtype)
        p[f"stage{si}"] = stage
    return p


def _focus(x):
    """Space-to-depth stem rearrange (mmdet Focus): (B, H, W, 3) ->
    (B, H/2, W/2, 12), channel order [tl, bl, tr, br] per torch's
    cat([x[..., ::2, ::2], x[..., 1::2, ::2], x[..., ::2, 1::2],
    x[..., 1::2, 1::2]], 1)."""
    tl = x[:, ::2, ::2, :]
    bl = x[:, 1::2, ::2, :]
    tr = x[:, ::2, 1::2, :]
    br = x[:, 1::2, 1::2, :]
    return jnp.concatenate([tl, bl, tr, br], axis=-1)


def yolox_backbone_apply(p: Dict, x) -> List:
    """x: (B, H, W, 3) raw-scale BGR (no normalization — DetDataPreprocessor
    applies none, yolox_l config:6-8). Returns [C3 (256), C4 (512),
    C5 (1024)] at strides 8/16/32."""
    h = conv_module_apply(p["stem"], _focus(x))
    outs = []
    for si, (_, _, _, add_id, use_spp) in enumerate(_DARKNET_ARCH, 1):
        stage = p[f"stage{si}"]
        h = conv_module_apply(stage["conv"], h, stride=2)
        if use_spp:
            h = spp_apply(stage["spp"], h)
        h = csp_layer_apply(stage["csp"], h, add_identity=add_id)
        if si >= 2:
            outs.append(h)
    return outs


# ---------------------------------------------------------------------------
# YOLOXPAFPN neck (out_channels 256 at every level)
# ---------------------------------------------------------------------------

def yolox_neck_init(key, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 12)
    return {
        "reduce0": conv_module_init(ks[0], 1024, 512, 1, dtype),
        "reduce1": conv_module_init(ks[1], 512, 256, 1, dtype),
        "top_down0": csp_layer_init(ks[2], 1024, 512, 3, dtype),
        "top_down1": csp_layer_init(ks[3], 512, 256, 3, dtype),
        "down0": conv_module_init(ks[4], 256, 256, 3, dtype),
        "down1": conv_module_init(ks[5], 512, 512, 3, dtype),
        "bottom_up0": csp_layer_init(ks[6], 512, 512, 3, dtype),
        "bottom_up1": csp_layer_init(ks[7], 1024, 1024, 3, dtype),
        "out0": conv_module_init(ks[8], 256, 256, 1, dtype),
        "out1": conv_module_init(ks[9], 512, 256, 1, dtype),
        "out2": conv_module_init(ks[10], 1024, 256, 1, dtype),
    }


def _upsample2(x):
    b, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :],
                            (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)


def yolox_neck_apply(p: Dict, feats: List) -> List:
    c3, c4, c5 = feats
    r0 = conv_module_apply(p["reduce0"], c5)                       # 512
    td0 = csp_layer_apply(p["top_down0"],
                          jnp.concatenate([_upsample2(r0), c4], -1),
                          add_identity=False)                      # 512
    r1 = conv_module_apply(p["reduce1"], td0)                      # 256
    td1 = csp_layer_apply(p["top_down1"],
                          jnp.concatenate([_upsample2(r1), c3], -1),
                          add_identity=False)                      # 256
    d0 = conv_module_apply(p["down0"], td1, stride=2)              # 256
    bu0 = csp_layer_apply(p["bottom_up0"],
                          jnp.concatenate([d0, r1], -1),
                          add_identity=False)                      # 512
    d1 = conv_module_apply(p["down1"], bu0, stride=2)              # 512
    bu1 = csp_layer_apply(p["bottom_up1"],
                          jnp.concatenate([d1, r0], -1),
                          add_identity=False)                      # 1024
    return [conv_module_apply(p["out0"], td1),
            conv_module_apply(p["out1"], bu0),
            conv_module_apply(p["out2"], bu1)]


# ---------------------------------------------------------------------------
# decoupled head
# ---------------------------------------------------------------------------

def yolox_head_init(key, num_classes: int = 80, dtype=jnp.float32) -> Dict:
    p: Dict = {}
    for lvl in range(3):
        ks = jax.random.split(jax.random.fold_in(key, lvl), 7)
        p[f"lvl{lvl}"] = {
            "cls_convs": [conv_module_init(ks[i], 256, 256, 3, dtype)
                          for i in range(2)],
            "reg_convs": [conv_module_init(ks[2 + i], 256, 256, 3, dtype)
                          for i in range(2)],
            "conv_cls": conv_module_init(ks[4], 256, num_classes, 1, dtype),
            "conv_reg": conv_module_init(ks[5], 256, 4, 1, dtype),
            "conv_obj": conv_module_init(ks[6], 256, 1, 1, dtype),
        }
    return p


def yolox_head_apply(p: Dict, feats: List):
    """-> (B, sum(H*W), 4+1+C) packed [xy, wh, obj, cls], obj/cls
    sigmoided (official ONNX-export layout)."""
    outs = []
    for lvl, x in enumerate(feats):
        lp = p[f"lvl{lvl}"]
        cf = x
        for c in lp["cls_convs"]:
            cf = conv_module_apply(c, cf)
        rf = x
        for c in lp["reg_convs"]:
            rf = conv_module_apply(c, rf)
        cls = jax.nn.sigmoid(conv_module_apply(lp["conv_cls"], cf,
                                               act=False))
        reg = conv_module_apply(lp["conv_reg"], rf, act=False)
        obj = jax.nn.sigmoid(conv_module_apply(lp["conv_obj"], rf,
                                               act=False))
        packed = jnp.concatenate([reg, obj, cls], axis=-1)
        b, h, w, c = packed.shape
        outs.append(packed.reshape(b, h * w, c))
    return jnp.concatenate(outs, axis=1)


def yolox_init(key, dtype=jnp.float32) -> Dict:
    kb, kn, kh = jax.random.split(key, 3)
    return {"backbone": yolox_backbone_init(kb, dtype),
            "neck": yolox_neck_init(kn, dtype),
            "head": yolox_head_init(kh, dtype=dtype)}


def yolox_apply(p: Dict, x):
    return yolox_head_apply(p["head"],
                            yolox_neck_apply(p["neck"],
                                             yolox_backbone_apply(
                                                 p["backbone"], x)))


# ---------------------------------------------------------------------------
# mmdet checkpoint conversion (BN folded)
# ---------------------------------------------------------------------------

def convert_yolox(sd: Dict[str, np.ndarray]) -> Dict:
    """mmdet YOLOX state dict (backbone./neck./bbox_head. prefixes) ->
    folded param pytree."""
    eps = _BN_EPS
    p: Dict = {"backbone": {"stem": _cm_from_sd(sd, "backbone.stem.conv",
                                                eps)}}
    for si, (_, _, n, _, use_spp) in enumerate(_DARKNET_ARCH, 1):
        stage = {"conv": _cm_from_sd(sd, f"backbone.stage{si}.0", eps)}
        if use_spp:
            stage["spp"] = {
                "conv1": _cm_from_sd(sd, f"backbone.stage{si}.1.conv1", eps),
                "conv2": _cm_from_sd(sd, f"backbone.stage{si}.1.conv2", eps),
            }
            stage["csp"] = _csp_from_sd(sd, f"backbone.stage{si}.2", n, eps)
        else:
            stage["csp"] = _csp_from_sd(sd, f"backbone.stage{si}.1", n, eps)
        p["backbone"][f"stage{si}"] = stage

    p["neck"] = {
        "reduce0": _cm_from_sd(sd, "neck.reduce_layers.0", eps),
        "reduce1": _cm_from_sd(sd, "neck.reduce_layers.1", eps),
        "top_down0": _csp_from_sd(sd, "neck.top_down_blocks.0", 3, eps),
        "top_down1": _csp_from_sd(sd, "neck.top_down_blocks.1", 3, eps),
        "down0": _cm_from_sd(sd, "neck.downsamples.0", eps),
        "down1": _cm_from_sd(sd, "neck.downsamples.1", eps),
        "bottom_up0": _csp_from_sd(sd, "neck.bottom_up_blocks.0", 3, eps),
        "bottom_up1": _csp_from_sd(sd, "neck.bottom_up_blocks.1", 3, eps),
        "out0": _cm_from_sd(sd, "neck.out_convs.0", eps),
        "out1": _cm_from_sd(sd, "neck.out_convs.1", eps),
        "out2": _cm_from_sd(sd, "neck.out_convs.2", eps),
    }

    head: Dict = {}
    for lvl in range(3):
        head[f"lvl{lvl}"] = {
            "cls_convs": [
                _cm_from_sd(sd, f"bbox_head.multi_level_cls_convs.{lvl}.{i}",
                            eps) for i in range(2)],
            "reg_convs": [
                _cm_from_sd(sd, f"bbox_head.multi_level_reg_convs.{lvl}.{i}",
                            eps) for i in range(2)],
            "conv_cls": {
                "kernel": jnp.asarray(np.transpose(np.asarray(
                    sd[f"bbox_head.multi_level_conv_cls.{lvl}.weight"]),
                    (2, 3, 1, 0)).copy()),
                "bias": jnp.asarray(np.asarray(
                    sd[f"bbox_head.multi_level_conv_cls.{lvl}.bias"])),
            },
            "conv_reg": {
                "kernel": jnp.asarray(np.transpose(np.asarray(
                    sd[f"bbox_head.multi_level_conv_reg.{lvl}.weight"]),
                    (2, 3, 1, 0)).copy()),
                "bias": jnp.asarray(np.asarray(
                    sd[f"bbox_head.multi_level_conv_reg.{lvl}.bias"])),
            },
            "conv_obj": {
                "kernel": jnp.asarray(np.transpose(np.asarray(
                    sd[f"bbox_head.multi_level_conv_obj.{lvl}.weight"]),
                    (2, 3, 1, 0)).copy()),
                "bias": jnp.asarray(np.asarray(
                    sd[f"bbox_head.multi_level_conv_obj.{lvl}.bias"])),
            },
        }
    p["head"] = head
    return p
