"""TinyViT-5M image encoder for MobileSAM (sam vit_t) in JAX.

Behavioral equivalent of /root/reference/src/controlnet_aux/
segment_anything/modeling/tiny_vit_sam.py with build_sam.py:47-66's
configuration: Conv2d+BN patch stem (stride 4), an MBConv stage
(2 blocks, GELU, residual), three windowed-attention stages
(depths 2/6/2, heads 4/5/10, windows 7/14/7) whose attention uses
per-head packed qkv, learned |Δ|-offset attention biases, a depthwise
local conv between attention and MLP, and Conv2d+BN patch-merging
downsamples (stride 1 into the final 320-d stage so the output grid
stays 64x64), followed by the same 256-d LayerNorm2d neck as the big
SAM encoders. All BatchNorms are folded at conversion (Conv2d_BN.fuse
semantics, tiny_vit_sam.py:32-43).

Plugs into pcdms_tpu.pose.detectors.sam's prompt encoder / mask decoder
via sam_encode_image's dispatch (params["encoder"]["tiny"]).
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.pose.detectors.common import conv
from pcdms_tpu.pose.detectors.yolox import fold_bn

_EMBED_DIMS = (64, 128, 160, 320)
_DEPTHS = (2, 2, 6, 2)
_NUM_HEADS = (2, 4, 5, 10)
_WINDOWS = (7, 7, 14, 7)
_MBCONV_EXPAND = 4
_MLP_RATIO = 4


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _cbn(x, p: Dict, *, stride: int = 1, padding: int = 0,
         groups: int = 1):
    return conv(x, p["kernel"], p["bias"], stride=stride, padding=padding,
                groups=groups)


def _layer_norm(x, scale, bias, eps: float = 1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


@functools.lru_cache(maxsize=8)
def _attention_bias_idxs(h: int, w: int) -> np.ndarray:
    """(N, N) gather indices over unique |Δ| offsets, in the reference's
    insertion order (tiny_vit_sam.py:233-246)."""
    points = list(itertools.product(range(h), range(w)))
    offsets: Dict[Tuple[int, int], int] = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n)


def _tiny_attention(p: Dict, x, heads: int, window: int):
    """x: (B*, N, C) windowed tokens. Per-head PACKED qkv: the linear's
    output reshapes to (B, N, heads, 3*hd) and splits [q, k, v] within
    each head slice (tiny_vit_sam.py:267-275) — not the usual
    3*(heads*hd) layout."""
    b, n, c = x.shape
    hd = c // heads
    h = _layer_norm(x, p["norm_scale"], p["norm_bias"])
    qkv = h @ p["qkv_w"] + p["qkv_b"]
    qkv = qkv.reshape(b, n, heads, 3 * hd)
    q, k, v = (z.transpose(0, 2, 1, 3)
               for z in jnp.split(qkv, 3, axis=-1))
    bias = p["attention_biases"][:, _attention_bias_idxs(window, window)]
    attn = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(hd)
    attn = jax.nn.softmax(attn + bias.astype(attn.dtype)[None], axis=-1)
    o = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
    return o @ p["proj_w"] + p["proj_b"]


def _tiny_block(p: Dict, x, hw: Tuple[int, int], heads: int, window: int):
    """TinyViTBlock (tiny_vit_sam.py:333-370): windowed attention,
    depthwise local conv, MLP — all residual."""
    hh, ww = hw
    b, l, c = x.shape
    res = x
    if (hh, ww) == (window, window):
        x = _tiny_attention(p["attn"], x, heads, window)
    else:
        x = x.reshape(b, hh, ww, c)
        pad_b = (window - hh % window) % window
        pad_r = (window - ww % window) % window
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        ph, pw = hh + pad_b, ww + pad_r
        nh, nw = ph // window, pw // window
        x = (x.reshape(b, nh, window, nw, window, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b * nh * nw, window * window, c))
        x = _tiny_attention(p["attn"], x, heads, window)
        x = (x.reshape(b, nh, nw, window, window, c)
             .transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c))
        if pad_b or pad_r:
            x = x[:, :hh, :ww]
        x = x.reshape(b, l, c)
    x = res + x

    xm = x.reshape(b, hh, ww, c)
    xm = _cbn(xm, p["local_conv"], padding=1, groups=c)
    x = xm.reshape(b, l, c)

    h = _layer_norm(x, p["mlp"]["norm_scale"], p["mlp"]["norm_bias"])
    h = _gelu(h @ p["mlp"]["fc1_w"] + p["mlp"]["fc1_b"])
    return x + h @ p["mlp"]["fc2_w"] + p["mlp"]["fc2_b"]


def _mbconv(p: Dict, x):
    shortcut = x
    h = _gelu(_cbn(x, p["conv1"]))
    h = _gelu(_cbn(h, p["conv2"], padding=1, groups=h.shape[-1]))
    h = _cbn(h, p["conv3"])
    return _gelu(h + shortcut)


def _patch_merging(p: Dict, x4d, out_dim: int):
    """(B, H, W, C) -> (B, H', W', out) tokens stay 4D here; stride 1
    for the 320-d merge (tiny_vit_sam.py:126-129)."""
    stride = 1 if out_dim in (320, 448, 576) else 2
    h = _gelu(_cbn(x4d, p["conv1"]))
    h = _gelu(_cbn(h, p["conv2"], stride=stride, padding=1,
                   groups=h.shape[-1]))
    return _cbn(h, p["conv3"])


def tiny_vit_apply(p: Dict, x):
    """x: (B, 1024, 1024, 3) pixel-normalized -> (B, 64, 64, 256)."""
    h = _gelu(_cbn(x, p["patch_embed"][0], stride=2, padding=1))
    h = _cbn(h, p["patch_embed"][1], stride=2, padding=1)      # (B,256,256,64)

    for blk in p["stage0"]:
        h = _mbconv(blk, h)
    h = _patch_merging(p["down0"], h, _EMBED_DIMS[1])          # (B,128,128,128)

    for si in (1, 2, 3):
        hh, ww = h.shape[1], h.shape[2]
        b, c = h.shape[0], h.shape[3]
        tokens = h.reshape(b, hh * ww, c)
        for blk in p[f"stage{si}"]:
            tokens = _tiny_block(blk, tokens, (hh, ww), _NUM_HEADS[si],
                                 _WINDOWS[si])
        h = tokens.reshape(b, hh, ww, c)
        if si < 3:
            h = _patch_merging(p[f"down{si}"], h, _EMBED_DIMS[si + 1])

    from pcdms_tpu.pose.detectors.sam import _layer_norm_2d
    h = conv(h, p["neck0_w"])
    h = _layer_norm_2d(h, p["neck_ln0_scale"], p["neck_ln0_bias"])
    h = conv(h, p["neck1_w"], padding=1)
    return _layer_norm_2d(h, p["neck_ln1_scale"], p["neck_ln1_bias"])


# ---------------------------------------------------------------------------
# conversion (mobile_sam.pt, image_encoder. prefix)
# ---------------------------------------------------------------------------

def _fold_cbn(sd, prefix: str) -> Dict:
    return fold_bn(sd[f"{prefix}.c.weight"],
                   {k: sd[f"{prefix}.bn.{k}"]
                    for k in ("weight", "bias", "running_mean",
                              "running_var")}, 1e-5)


def _t(w):
    return jnp.asarray(np.asarray(w).T.copy())


def convert_tiny_vit(sd: Dict[str, np.ndarray],
                     prefix: str = "image_encoder") -> Dict:
    def mb(b):
        return {f"conv{i}": _fold_cbn(sd, f"{b}.conv{i}")
                for i in (1, 2, 3)}

    def merging(b):
        return {f"conv{i}": _fold_cbn(sd, f"{b}.conv{i}")
                for i in (1, 2, 3)}

    def block(b):
        return {
            "attn": {
                "norm_scale": jnp.asarray(np.asarray(
                    sd[f"{b}.attn.norm.weight"])),
                "norm_bias": jnp.asarray(np.asarray(
                    sd[f"{b}.attn.norm.bias"])),
                "qkv_w": _t(sd[f"{b}.attn.qkv.weight"]),
                "qkv_b": jnp.asarray(np.asarray(sd[f"{b}.attn.qkv.bias"])),
                "proj_w": _t(sd[f"{b}.attn.proj.weight"]),
                "proj_b": jnp.asarray(np.asarray(
                    sd[f"{b}.attn.proj.bias"])),
                "attention_biases": jnp.asarray(np.asarray(
                    sd[f"{b}.attn.attention_biases"])),
            },
            "local_conv": _fold_cbn(sd, f"{b}.local_conv"),
            "mlp": {
                "norm_scale": jnp.asarray(np.asarray(
                    sd[f"{b}.mlp.norm.weight"])),
                "norm_bias": jnp.asarray(np.asarray(
                    sd[f"{b}.mlp.norm.bias"])),
                "fc1_w": _t(sd[f"{b}.mlp.fc1.weight"]),
                "fc1_b": jnp.asarray(np.asarray(sd[f"{b}.mlp.fc1.bias"])),
                "fc2_w": _t(sd[f"{b}.mlp.fc2.weight"]),
                "fc2_b": jnp.asarray(np.asarray(sd[f"{b}.mlp.fc2.bias"])),
            },
        }

    p: Dict = {"patch_embed": [
        _fold_cbn(sd, f"{prefix}.patch_embed.seq.0"),
        _fold_cbn(sd, f"{prefix}.patch_embed.seq.2"),
    ]}
    for si, depth in enumerate(_DEPTHS):
        lb = f"{prefix}.layers.{si}"
        if si == 0:
            p["stage0"] = [mb(f"{lb}.blocks.{i}") for i in range(depth)]
        else:
            p[f"stage{si}"] = [block(f"{lb}.blocks.{i}")
                               for i in range(depth)]
        if si < 3:
            p[f"down{si}"] = merging(f"{lb}.downsample")
    p["neck0_w"] = jnp.asarray(np.transpose(np.asarray(
        sd[f"{prefix}.neck.0.weight"]), (2, 3, 1, 0)).copy())
    p["neck_ln0_scale"] = jnp.asarray(np.asarray(
        sd[f"{prefix}.neck.1.weight"]))
    p["neck_ln0_bias"] = jnp.asarray(np.asarray(
        sd[f"{prefix}.neck.1.bias"]))
    p["neck1_w"] = jnp.asarray(np.transpose(np.asarray(
        sd[f"{prefix}.neck.2.weight"]), (2, 3, 1, 0)).copy())
    p["neck_ln1_scale"] = jnp.asarray(np.asarray(
        sd[f"{prefix}.neck.3.weight"]))
    p["neck_ln1_bias"] = jnp.asarray(np.asarray(
        sd[f"{prefix}.neck.3.bias"]))
    return p


def tiny_vit_init(key, dtype=jnp.float32) -> Dict:
    """Random params with the converted structure."""

    def rcv(k, cin, cout, ksz, groups=1):
        fan = max(1, cin * ksz * ksz // groups)
        return {"kernel": jax.random.normal(
            k, (ksz, ksz, cin // groups, cout), dtype) / np.sqrt(fan),
            "bias": jnp.zeros((cout,), dtype)}

    def rl(k, cin, cout):
        return (jax.random.normal(k, (cin, cout), dtype) / np.sqrt(cin),
                jnp.zeros((cout,), dtype))

    keys = jax.random.split(key, 32)
    ki = iter(keys)
    d0 = _EMBED_DIMS[0]
    p: Dict = {"patch_embed": [rcv(next(ki), 3, d0 // 2, 3),
                               rcv(next(ki), d0 // 2, d0, 3)]}
    p["stage0"] = []
    for i in range(_DEPTHS[0]):
        ks = jax.random.split(jax.random.fold_in(keys[0], i), 3)
        hid = d0 * _MBCONV_EXPAND
        p["stage0"].append({"conv1": rcv(ks[0], d0, hid, 1),
                            "conv2": rcv(ks[1], hid, hid, 3, groups=hid),
                            "conv3": rcv(ks[2], hid, d0, 1)})
    for si in (1, 2, 3):
        dim = _EMBED_DIMS[si]
        heads = _NUM_HEADS[si]
        window = _WINDOWS[si]
        n_off = int(_attention_bias_idxs(window, window).max()) + 1
        blocks = []
        for i in range(_DEPTHS[si]):
            ks = jax.random.split(jax.random.fold_in(keys[si], i), 6)
            qkv_w, qkv_b = rl(ks[0], dim, 3 * dim)
            proj_w, proj_b = rl(ks[1], dim, dim)
            fc1_w, fc1_b = rl(ks[2], dim, dim * _MLP_RATIO)
            fc2_w, fc2_b = rl(ks[3], dim * _MLP_RATIO, dim)
            blocks.append({
                "attn": {
                    "norm_scale": jnp.ones((dim,), dtype),
                    "norm_bias": jnp.zeros((dim,), dtype),
                    "qkv_w": qkv_w, "qkv_b": qkv_b,
                    "proj_w": proj_w, "proj_b": proj_b,
                    "attention_biases": jax.random.normal(
                        ks[4], (heads, n_off), dtype) * 0.02,
                },
                "local_conv": rcv(ks[5], dim, dim, 3, groups=dim),
                "mlp": {
                    "norm_scale": jnp.ones((dim,), dtype),
                    "norm_bias": jnp.zeros((dim,), dtype),
                    "fc1_w": fc1_w, "fc1_b": fc1_b,
                    "fc2_w": fc2_w, "fc2_b": fc2_b,
                },
            })
        p[f"stage{si}"] = blocks
    for si in range(3):
        cin, cout = _EMBED_DIMS[si], _EMBED_DIMS[si + 1]
        ks = jax.random.split(jax.random.fold_in(keys[8], si), 3)
        p[f"down{si}"] = {"conv1": rcv(ks[0], cin, cout, 1),
                          "conv2": rcv(ks[1], cout, cout, 3, groups=cout),
                          "conv3": rcv(ks[2], cout, cout, 1)}
    p["neck0_w"] = jax.random.normal(next(ki), (1, 1, _EMBED_DIMS[3], 256),
                                     dtype) / np.sqrt(_EMBED_DIMS[3])
    p["neck_ln0_scale"] = jnp.ones((256,), dtype)
    p["neck_ln0_bias"] = jnp.zeros((256,), dtype)
    p["neck1_w"] = jax.random.normal(next(ki), (3, 3, 256, 256),
                                     dtype) / np.sqrt(9 * 256)
    p["neck_ln1_scale"] = jnp.ones((256,), dtype)
    p["neck_ln1_bias"] = jnp.zeros((256,), dtype)
    return p
