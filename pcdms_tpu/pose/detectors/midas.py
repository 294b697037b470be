"""MiDaS DPT-hybrid monocular depth detector as a JAX NHWC pytree.

The reference vendors isl-org/MiDaS inside controlnet-aux
(/root/reference/src/controlnet_aux/midas/: api.py loads
``dpt_hybrid-midas-501f0c75.pt`` into ``DPTDepthModel``). This is a
from-scratch JAX implementation of that exact graph:

  * timm ``vit_base_resnet50_384`` hybrid backbone: ResNetV2 stem +
    3 bottleneck stages (3/4/9 blocks) with weight-standardized convs
    (folded at conversion) and GroupNorm(32)+ReLU, then a 1x1 patch
    projection to 768-d tokens + cls token + bilinearly-resized position
    embeddings and 12 pre-LN ViT blocks (midas/vit.py:117-158, 343-491).
  * DPT neck: hooks at resnet stages 0/1 and transformer blocks 8/11;
    project-readout + 1x1 (+3x3 s2) reassemble for the two token hooks
    (vit.py:440-460); 3x3 scratch convs to 256; four
    FeatureFusionBlock_custom refinenets (relu-conv-relu-conv residual
    units, x2 align-corners bilinear upsample, 1x1 out conv —
    blocks.py:231-341); depth head conv3x3 -> up2 -> conv3x3 -> relu ->
    conv1x1 -> relu (dpt_depth.py:91-101).

Input protocol (midas/__init__.py:50-57): RGB resized to the 64-multiple
grid, scaled to [-1, 1] (identical to DPT's 0.5/0.5 normalization), NCHW
in torch — NHWC here. Output: inverse relative depth, min-max normalized
to a uint8 image by the wrapper.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.pose.detectors.common import hwc3, resize_to_64, shape_to_64

_GN_GROUPS = 32
_GN_EPS = 1e-5
_VIT_DIM = 768
_VIT_HEADS = 12
_DEPTHS = (3, 4, 9)
_STAGE_CH = (256, 512, 1024)
_FEATURES = (256, 512, 768, 768)      # reassemble channels per hook
_SCRATCH = 256


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _same_pad(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF-SAME asymmetric padding (timm StdConv2dSame / MaxPool2dSame)."""
    out = -(-size // s)
    pad = max(0, (out - 1) * s + k - size)
    return pad // 2, pad - pad // 2


def conv2d(x, w, b=None, *, stride: int = 1, same: bool = False,
           padding: int = 0):
    if same:
        ph = _same_pad(x.shape[1], w.shape[0], stride)
        pw = _same_pad(x.shape[2], w.shape[1], stride)
        pad = (ph, pw)
    else:
        pad = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b.astype(x.dtype)


def group_norm_relu(x, scale, bias, relu: bool = True):
    b, h, w, c = x.shape
    g = x.reshape(b, h * w, _GN_GROUPS, c // _GN_GROUPS)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = ((g - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + _GN_EPS)
    y = g.reshape(b, h, w, c) * scale + bias
    return jax.nn.relu(y) if relu else y


def _std_weight(w_oihw: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Fold timm's runtime weight standardization into the stored weight
    (StdConv2dSame: (w - mean) / sqrt(var + eps) over (I, kH, kW))."""
    w = np.asarray(w_oihw, np.float64)
    mean = w.mean(axis=(1, 2, 3), keepdims=True)
    var = w.var(axis=(1, 2, 3), keepdims=True)
    return ((w - mean) / np.sqrt(var + eps)).astype(np.float32)


def _hwio(w) -> jnp.ndarray:
    return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)).copy())


def max_pool_same(x, k: int = 3, s: int = 2):
    ph = _same_pad(x.shape[1], k, s)
    pw = _same_pad(x.shape[2], k, s)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), ph, pw, (0, 0)])


def up2_align_corners(x):
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=True)."""
    b, h, w, c = x.shape

    def axis_weights(n):
        pos = np.linspace(0.0, n - 1.0, 2 * n)
        i0 = np.floor(pos).astype(np.int32)
        i1 = np.minimum(i0 + 1, n - 1)
        t = (pos - i0).astype(np.float32)
        return i0, i1, t

    y0, y1, ty = axis_weights(h)
    x0, x1, tx = axis_weights(w)
    ty = jnp.asarray(ty)[None, :, None, None].astype(x.dtype)
    tx = jnp.asarray(tx)[None, None, :, None].astype(x.dtype)
    top = x[:, y0] * (1 - ty) + x[:, y1] * ty
    return top[:, :, x0] * (1 - tx) + top[:, :, x1] * tx


# ---------------------------------------------------------------------------
# ResNetV2 hybrid stem/stages
# ---------------------------------------------------------------------------

def _bottleneck_apply(p: Dict, x, *, stride: int):
    if "downsample" in p:
        sc = conv2d(x, p["downsample"]["conv"], stride=stride, same=True)
        sc = group_norm_relu(sc, p["downsample"]["scale"],
                             p["downsample"]["bias"], relu=False)
    else:
        sc = x
    h = conv2d(x, p["conv1"], same=True)
    h = group_norm_relu(h, p["norm1_scale"], p["norm1_bias"])
    h = conv2d(h, p["conv2"], stride=stride, same=True)
    h = group_norm_relu(h, p["norm2_scale"], p["norm2_bias"])
    h = conv2d(h, p["conv3"], same=True)
    h = group_norm_relu(h, p["norm3_scale"], p["norm3_bias"], relu=False)
    return jax.nn.relu(h + sc)


def _resnet_apply(p: Dict, x) -> List:
    h = conv2d(x, p["stem"]["conv"], stride=2, same=True)
    h = group_norm_relu(h, p["stem"]["scale"], p["stem"]["bias"])
    h = max_pool_same(h)
    outs = []
    for si, depth in enumerate(_DEPTHS):
        stage = p[f"stage{si}"]
        for bi in range(depth):
            stride = 2 if (bi == 0 and si > 0) else 1
            h = _bottleneck_apply(stage[bi], h, stride=stride)
        outs.append(h)
    return outs            # strides 4, 8, 16 with 256/512/1024 channels


# ---------------------------------------------------------------------------
# ViT trunk (12 pre-LN blocks; hooks collect block outputs 8 and 11)
# ---------------------------------------------------------------------------

def _layer_norm(x, scale, bias, eps: float = 1e-6):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _vit_block_apply(p: Dict, x):
    h = _layer_norm(x, p["ln1_scale"], p["ln1_bias"])
    b, t, c = h.shape
    qkv = h @ p["qkv_w"] + p["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = c // _VIT_HEADS

    def heads(z):
        return z.reshape(b, t, _VIT_HEADS, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd), -1)
    o = (attn @ v).transpose(0, 2, 1, 3).reshape(b, t, c)
    x = x + o @ p["proj_w"] + p["proj_b"]
    h = _layer_norm(x, p["ln2_scale"], p["ln2_bias"])
    h = jax.nn.gelu(h @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return x + h @ p["fc2_w"] + p["fc2_b"]


def _resize_pos_embed(pos_embed, gs_h: int, gs_w: int):
    """Bilinear (half-pixel) grid resize of the 24x24 position table,
    cls token kept (midas/vit.py:100-115)."""
    tok, grid = pos_embed[:, :1], pos_embed[0, 1:]
    gs_old = int(math.sqrt(grid.shape[0]))
    if (gs_h, gs_w) == (gs_old, gs_old):
        return pos_embed
    grid = grid.reshape(1, gs_old, gs_old, -1)
    grid = jax.image.resize(grid, (1, gs_h, gs_w, grid.shape[-1]),
                            "linear")
    return jnp.concatenate([tok, grid.reshape(1, gs_h * gs_w, -1)], axis=1)


def _project_readout(p: Dict, tokens):
    """ProjectReadout (midas/vit.py:30-42): concat cls onto every patch
    token, linear 1536->768 + GELU."""
    cls = jnp.broadcast_to(tokens[:, :1], tokens[:, 1:].shape)
    h = jnp.concatenate([tokens[:, 1:], cls], axis=-1)
    return jax.nn.gelu(h @ p["w"] + p["b"], approximate=False)


# ---------------------------------------------------------------------------
# DPT neck + head
# ---------------------------------------------------------------------------

def _residual_conv_unit(p: Dict, x):
    h = jax.nn.relu(x)
    h = conv2d(h, p["conv1"]["kernel"], p["conv1"]["bias"], padding=1)
    h = jax.nn.relu(h)
    h = conv2d(h, p["conv2"]["kernel"], p["conv2"]["bias"], padding=1)
    return h + x


def _fusion_block(p: Dict, x, skip=None):
    if skip is not None:
        x = x + _residual_conv_unit(p["res1"], skip)
    x = _residual_conv_unit(p["res2"], x)
    x = up2_align_corners(x)
    return conv2d(x, p["out_conv"]["kernel"], p["out_conv"]["bias"])


def dpt_hybrid_apply(params: Dict, x):
    """x: (B, H, W, 3) in [-1, 1], H/W multiples of 32 ->
    (B, H/2*2, W) inverse depth... returns (B, H, W) at input resolution
    (head upsamples the stride-2 path to full res)."""
    b, h, w, _ = x.shape
    gs_h, gs_w = h // 16, w // 16

    layer1, layer2, feat16 = _resnet_apply(params["resnet"], x)
    tokens = (feat16.reshape(b, gs_h * gs_w, feat16.shape[-1])
              @ params["patch_proj_w"] + params["patch_proj_b"])
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype),
                           (b, 1, _VIT_DIM))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + _resize_pos_embed(params["pos_embed"], gs_h,
                                        gs_w).astype(tokens.dtype)

    hook3 = hook4 = None
    for i, blk in enumerate(params["blocks"]):
        tokens = _vit_block_apply(blk, tokens)
        if i == 8:
            hook3 = tokens
        if i == 11:
            hook4 = tokens

    def tokens_to_map(tok):
        return tok.reshape(b, gs_h, gs_w, tok.shape[-1])

    layer3 = tokens_to_map(_project_readout(params["readout3"], hook3))
    layer3 = conv2d(layer3, params["post3"]["kernel"],
                    params["post3"]["bias"])
    layer4 = tokens_to_map(_project_readout(params["readout4"], hook4))
    layer4 = conv2d(layer4, params["post4a"]["kernel"],
                    params["post4a"]["bias"])
    layer4 = conv2d(layer4, params["post4b"]["kernel"],
                    params["post4b"]["bias"], stride=2, padding=1)

    rn = [conv2d(lyr, params[f"layer{i}_rn"], padding=1)
          for i, lyr in enumerate((layer1, layer2, layer3, layer4), 1)]

    path = _fusion_block(params["refinenet4"], rn[3])
    path = _fusion_block(params["refinenet3"], path, rn[2])
    path = _fusion_block(params["refinenet2"], path, rn[1])
    path = _fusion_block(params["refinenet1"], path, rn[0])

    hd = params["head"]
    out = conv2d(path, hd["conv1"]["kernel"], hd["conv1"]["bias"],
                 padding=1)
    out = up2_align_corners(out)
    out = conv2d(out, hd["conv2"]["kernel"], hd["conv2"]["bias"],
                 padding=1)
    out = jax.nn.relu(out)
    out = conv2d(out, hd["conv3"]["kernel"], hd["conv3"]["bias"])
    out = jax.nn.relu(out)                      # non_negative=True
    return out[:, :, :, 0]


# ---------------------------------------------------------------------------
# conversion from the released dpt_hybrid checkpoint
# ---------------------------------------------------------------------------

def _gn_from_sd(sd, prefix: str):
    return (jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
            jnp.asarray(np.asarray(sd[f"{prefix}.bias"])))


def _std_conv(sd, key: str) -> jnp.ndarray:
    return _hwio(_std_weight(sd[key]))


def _bottleneck_from_sd(sd, prefix: str) -> Dict:
    p: Dict = {}
    for i in (1, 2, 3):
        p[f"conv{i}"] = _std_conv(sd, f"{prefix}.conv{i}.weight")
        p[f"norm{i}_scale"], p[f"norm{i}_bias"] = _gn_from_sd(
            sd, f"{prefix}.norm{i}")
    if f"{prefix}.downsample.conv.weight" in sd:
        scale, bias = _gn_from_sd(sd, f"{prefix}.downsample.norm")
        p["downsample"] = {
            "conv": _std_conv(sd, f"{prefix}.downsample.conv.weight"),
            "scale": scale, "bias": bias,
        }
    return p


def _conv_from_sd(sd, key: str, bias: bool = True) -> Dict:
    p = {"kernel": _hwio(sd[f"{key}.weight"])}
    p["bias"] = (jnp.asarray(np.asarray(sd[f"{key}.bias"]))
                 if bias else None)
    return p


def _rcu_from_sd(sd, prefix: str) -> Dict:
    return {"conv1": _conv_from_sd(sd, f"{prefix}.conv1"),
            "conv2": _conv_from_sd(sd, f"{prefix}.conv2")}


def convert_dpt_hybrid(sd: Dict[str, np.ndarray]) -> Dict:
    """DPTDepthModel state dict (pretrained./scratch. prefixes, e.g. the
    released dpt_hybrid-midas-501f0c75.pt) -> param pytree."""
    bb = "pretrained.model.patch_embed.backbone"
    stem_scale, stem_bias = _gn_from_sd(sd, f"{bb}.stem.norm")
    resnet: Dict = {"stem": {"conv": _std_conv(sd, f"{bb}.stem.conv.weight"),
                             "scale": stem_scale, "bias": stem_bias}}
    for si, depth in enumerate(_DEPTHS):
        resnet[f"stage{si}"] = [
            _bottleneck_from_sd(sd, f"{bb}.stages.{si}.blocks.{bi}")
            for bi in range(depth)]

    pm = "pretrained.model"
    blocks = []
    for i in range(12):
        b = f"{pm}.blocks.{i}"
        blocks.append({
            "ln1_scale": jnp.asarray(np.asarray(sd[f"{b}.norm1.weight"])),
            "ln1_bias": jnp.asarray(np.asarray(sd[f"{b}.norm1.bias"])),
            "qkv_w": jnp.asarray(np.asarray(sd[f"{b}.attn.qkv.weight"]).T
                                 .copy()),
            "qkv_b": jnp.asarray(np.asarray(sd[f"{b}.attn.qkv.bias"])),
            "proj_w": jnp.asarray(np.asarray(sd[f"{b}.attn.proj.weight"]).T
                                  .copy()),
            "proj_b": jnp.asarray(np.asarray(sd[f"{b}.attn.proj.bias"])),
            "ln2_scale": jnp.asarray(np.asarray(sd[f"{b}.norm2.weight"])),
            "ln2_bias": jnp.asarray(np.asarray(sd[f"{b}.norm2.bias"])),
            "fc1_w": jnp.asarray(np.asarray(sd[f"{b}.mlp.fc1.weight"]).T
                                 .copy()),
            "fc1_b": jnp.asarray(np.asarray(sd[f"{b}.mlp.fc1.bias"])),
            "fc2_w": jnp.asarray(np.asarray(sd[f"{b}.mlp.fc2.weight"]).T
                                 .copy()),
            "fc2_b": jnp.asarray(np.asarray(sd[f"{b}.mlp.fc2.bias"])),
        })

    # 1x1 patch proj stored as conv (768, 1024, 1, 1) -> matmul weight
    proj = np.asarray(sd[f"{pm}.patch_embed.proj.weight"])[:, :, 0, 0]
    params: Dict = {
        "resnet": resnet,
        "patch_proj_w": jnp.asarray(proj.T.copy()),
        "patch_proj_b": jnp.asarray(np.asarray(
            sd[f"{pm}.patch_embed.proj.bias"])),
        "cls_token": jnp.asarray(np.asarray(sd[f"{pm}.cls_token"])[0]),
        "pos_embed": jnp.asarray(np.asarray(sd[f"{pm}.pos_embed"])),
        "blocks": blocks,
        "readout3": {
            "w": jnp.asarray(np.asarray(
                sd["pretrained.act_postprocess3.0.project.0.weight"]).T
                .copy()),
            "b": jnp.asarray(np.asarray(
                sd["pretrained.act_postprocess3.0.project.0.bias"])),
        },
        "readout4": {
            "w": jnp.asarray(np.asarray(
                sd["pretrained.act_postprocess4.0.project.0.weight"]).T
                .copy()),
            "b": jnp.asarray(np.asarray(
                sd["pretrained.act_postprocess4.0.project.0.bias"])),
        },
        "post3": _conv_from_sd(sd, "pretrained.act_postprocess3.3"),
        "post4a": _conv_from_sd(sd, "pretrained.act_postprocess4.3"),
        "post4b": _conv_from_sd(sd, "pretrained.act_postprocess4.4"),
        "head": {
            "conv1": _conv_from_sd(sd, "scratch.output_conv.0"),
            "conv2": _conv_from_sd(sd, "scratch.output_conv.2"),
            "conv3": _conv_from_sd(sd, "scratch.output_conv.4"),
        },
    }
    for i in range(1, 5):
        params[f"layer{i}_rn"] = _hwio(sd[f"scratch.layer{i}_rn.weight"])
        params[f"refinenet{i}"] = {
            "res1": _rcu_from_sd(sd, f"scratch.refinenet{i}.resConfUnit1"),
            "res2": _rcu_from_sd(sd, f"scratch.refinenet{i}.resConfUnit2"),
            "out_conv": _conv_from_sd(sd, f"scratch.refinenet{i}.out_conv"),
        }
    return params


# ---------------------------------------------------------------------------
# random init (tests / smoke)
# ---------------------------------------------------------------------------

def dpt_hybrid_init(key, dtype=jnp.float32) -> Dict:
    """Random-weight pytree with the exact converted structure."""

    def rconv(k, cin, cout, ksz, bias=True):
        fan = cin * ksz * ksz
        p = {"kernel": jax.random.normal(k, (ksz, ksz, cin, cout), dtype)
             / np.sqrt(fan)}
        p["bias"] = jnp.zeros((cout,), dtype) if bias else None
        return p

    def rbottleneck(k, cin, mid, cout, downsample):
        ks = jax.random.split(k, 4)
        p = {"conv1": rconv(ks[0], cin, mid, 1)["kernel"],
             "conv2": rconv(ks[1], mid, mid, 3)["kernel"],
             "conv3": rconv(ks[2], mid, cout, 1)["kernel"]}
        for i, c in ((1, mid), (2, mid), (3, cout)):
            p[f"norm{i}_scale"] = jnp.ones((c,), dtype)
            p[f"norm{i}_bias"] = jnp.zeros((c,), dtype)
        if downsample:
            p["downsample"] = {"conv": rconv(ks[3], cin, cout, 1)["kernel"],
                               "scale": jnp.ones((cout,), dtype),
                               "bias": jnp.zeros((cout,), dtype)}
        return p

    keys = jax.random.split(key, 64)
    ki = iter(keys)
    resnet: Dict = {"stem": {"conv": rconv(next(ki), 3, 64, 7)["kernel"],
                             "scale": jnp.ones((64,), dtype),
                             "bias": jnp.zeros((64,), dtype)}}
    cin = 64
    for si, (depth, cout) in enumerate(zip(_DEPTHS, _STAGE_CH)):
        mid = cout // 4
        resnet[f"stage{si}"] = [
            rbottleneck(jax.random.fold_in(keys[10 + si], bi),
                        cin if bi == 0 else cout, mid, cout, bi == 0)
            for bi in range(depth)]
        cin = cout

    def rlinear(k, cin, cout):
        return (jax.random.normal(k, (cin, cout), dtype) / np.sqrt(cin),
                jnp.zeros((cout,), dtype))

    blocks = []
    for i in range(12):
        ks = jax.random.split(jax.random.fold_in(keys[20], i), 4)
        qkv_w, qkv_b = rlinear(ks[0], _VIT_DIM, 3 * _VIT_DIM)
        proj_w, proj_b = rlinear(ks[1], _VIT_DIM, _VIT_DIM)
        fc1_w, fc1_b = rlinear(ks[2], _VIT_DIM, 4 * _VIT_DIM)
        fc2_w, fc2_b = rlinear(ks[3], 4 * _VIT_DIM, _VIT_DIM)
        blocks.append({
            "ln1_scale": jnp.ones((_VIT_DIM,), dtype),
            "ln1_bias": jnp.zeros((_VIT_DIM,), dtype),
            "qkv_w": qkv_w, "qkv_b": qkv_b,
            "proj_w": proj_w, "proj_b": proj_b,
            "ln2_scale": jnp.ones((_VIT_DIM,), dtype),
            "ln2_bias": jnp.zeros((_VIT_DIM,), dtype),
            "fc1_w": fc1_w, "fc1_b": fc1_b,
            "fc2_w": fc2_w, "fc2_b": fc2_b,
        })

    pw, pb = rlinear(next(ki), 1024, _VIT_DIM)
    r3w, r3b = rlinear(next(ki), 2 * _VIT_DIM, _VIT_DIM)
    r4w, r4b = rlinear(next(ki), 2 * _VIT_DIM, _VIT_DIM)
    params: Dict = {
        "resnet": resnet,
        "patch_proj_w": pw, "patch_proj_b": pb,
        "cls_token": jnp.zeros((1, _VIT_DIM), dtype),
        "pos_embed": jax.random.normal(next(ki), (1, 577, _VIT_DIM),
                                       dtype) * 0.02,
        "blocks": blocks,
        "readout3": {"w": r3w, "b": r3b},
        "readout4": {"w": r4w, "b": r4b},
        "post3": rconv(next(ki), _VIT_DIM, _FEATURES[2], 1),
        "post4a": rconv(next(ki), _VIT_DIM, _FEATURES[3], 1),
        "post4b": rconv(next(ki), _FEATURES[3], _FEATURES[3], 3),
        "head": {"conv1": rconv(next(ki), _SCRATCH, _SCRATCH // 2, 3),
                 "conv2": rconv(next(ki), _SCRATCH // 2, 32, 3),
                 "conv3": rconv(next(ki), 32, 1, 1)},
    }
    for i in range(1, 5):
        params[f"layer{i}_rn"] = rconv(next(ki), _FEATURES[i - 1],
                                       _SCRATCH, 3, bias=False)["kernel"]
        params[f"refinenet{i}"] = {
            "res1": {"conv1": rconv(next(ki), _SCRATCH, _SCRATCH, 3),
                     "conv2": rconv(next(ki), _SCRATCH, _SCRATCH, 3)},
            "res2": {"conv1": rconv(next(ki), _SCRATCH, _SCRATCH, 3),
                     "conv2": rconv(next(ki), _SCRATCH, _SCRATCH, 3)},
            "out_conv": rconv(next(ki), _SCRATCH, _SCRATCH, 1),
        }
    return params


# ---------------------------------------------------------------------------
# detector wrapper (midas/__init__.py protocol)
# ---------------------------------------------------------------------------

class MidasDetector:
    """``MidasDetector.__call__(image, a, bg_th, depth_and_normal,
    detect_resolution, image_resolution)`` parity."""

    def __init__(self, params: Dict):
        self.params = params
        self._apply = jax.jit(dpt_hybrid_apply)

    @classmethod
    def from_pretrained(cls, weights_path: str) -> "MidasDetector":
        from pcdms_tpu.pose.detectors.common import load_torch_state_dict
        return cls(convert_dpt_hybrid(load_torch_state_dict(weights_path)))

    def __call__(self, input_image, a: float = 2.0 * np.pi,
                 bg_th: float = 0.1, depth_and_normal: bool = False,
                 detect_resolution: int = 512,
                 image_resolution: int = 512):
        import cv2
        img = hwc3(np.asarray(input_image, np.uint8))
        img = resize_to_64(img, detect_resolution)
        x = jnp.asarray(img, jnp.float32)[None] / 127.5 - 1.0
        depth = np.asarray(self._apply(self.params, x)[0], np.float32)

        depth_pt = depth - depth.min()
        depth_pt /= max(depth_pt.max(), 1e-12)
        depth_image = hwc3((depth_pt * 255.0).clip(0, 255)
                           .astype(np.uint8))
        if depth_and_normal:
            gx = cv2.Sobel(depth, cv2.CV_32F, 1, 0, ksize=3)
            gy = cv2.Sobel(depth, cv2.CV_32F, 0, 1, ksize=3)
            gz = np.ones_like(gx) * a
            gx[depth_pt < bg_th] = 0
            gy[depth_pt < bg_th] = 0
            normal = np.stack([gx, gy, gz], axis=2)
            normal /= np.sum(normal ** 2.0, axis=2, keepdims=True) ** 0.5
            normal_image = hwc3(((normal * 127.5 + 127.5).clip(0, 255)
                                 .astype(np.uint8))[:, :, ::-1])

        out_hw = shape_to_64(*img.shape[:2], image_resolution)
        depth_image = cv2.resize(depth_image, (out_hw[1], out_hw[0]),
                                 interpolation=cv2.INTER_LINEAR)
        if depth_and_normal:
            normal_image = cv2.resize(normal_image, (out_hw[1], out_hw[0]),
                                      interpolation=cv2.INTER_LINEAR)
            return depth_image, normal_image
        return depth_image
