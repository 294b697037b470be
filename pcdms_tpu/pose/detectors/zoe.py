"""ZoeDepth metric-depth detector (DPT-BEiT-L-384 + metric bins) in JAX.

Behavioral equivalent of /root/reference/src/controlnet_aux/zoe/: the
``ZoeD_M12_N`` single-head model =

  * BEiT-Large/16 trunk (24 pre-LN blocks, dim 1024, 16 heads, q/v-only
    qkv bias, per-block decomposed relative position bias with
    arbitrary-window bilinear table resize — including the reference's
    transposed (width, height) table reshape quirk for non-square
    windows — and gamma_1/gamma_2 layer scale; midas_repo/midas/
    backbones/beit.py:14-196)
  * DPT neck with project-readout reassembles at blocks 5/11/17/23
    (ConvTranspose x4/x2 for the two shallow hooks), 3x3 scratch convs to
    256, four fusion refinenets, and the depth head (backbones/utils.py:
    144-255, dpt_depth.py:30-158)
  * ZoeDepth metric head (models/zoedepth/zoedepth_v1.py:101-202):
    bottleneck 1x1 conv on layer4_rn, softplus seed-bin regressor, bin
    projectors + 4 inverse-attractor layers (alpha 1000, gamma 2, mean
    aggregation — layers/attractor.py:45-57, 139-208) over the refinenet
    features, and a conditional log-binomial distribution head
    (layers/dist_layers.py:29-121) over [out_conv activation, rel depth].

The inference protocol (reflect pad-aug fh=fw=3, resize to the 512x384
'minimal' multiple-of-32 grid with kept aspect ratio, 0.5/0.5
normalization, horizontal-flip averaging, bicubic crop-back —
models/depth_model.py:57-128, base_models/midas.py:51-187) runs in the
wrapper; the percentile 2/85 normalization + inversion matches
zoe/__init__.py:68-83.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.pose.detectors.common import hwc3, resize_to_64, shape_to_64
from pcdms_tpu.pose.detectors.midas import (
    _fusion_block, _layer_norm, _project_readout, _residual_conv_unit,
    conv2d, up2_align_corners,
)

_DIM = 1024
_HEADS = 16                           # BEiT-L
_DEPTH = 24
_HOOKS = (5, 11, 17, 23)
_FEATURES = (256, 512, 1024, 1024)
_SCRATCH = 256
_ORIG_WINDOW = 24                     # 384 / 16

_N_BINS = 64
_BIN_EMBED = 128
_N_ATTRACTORS = (16, 8, 4, 1)
_ALPHA = 1000.0
_GAMMA = 2
_MIN_TEMP = 0.0212
_MAX_TEMP = 50.0


# ---------------------------------------------------------------------------
# BEiT trunk
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _gen_rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """timm gen_relative_position_index: (N+1, N+1) gather indices with
    the 3 special cls-relation slots at the end of the table."""
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))
    cf = coords.reshape(2, -1)
    rel = (cf[:, :, None] - cf[:, None, :]).transpose(1, 2, 0).copy()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    idx = np.zeros((n + 1, n + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, :] = num_rel - 3
    idx[:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


def _rel_pos_bias(table, wh: int, ww: int):
    """Resize the (2*24-1)^2+3 table to the (wh, ww) window and gather ->
    (heads, N+1, N+1). Quirk preserved: the reference reshapes the old
    table as (width, height) before the bilinear resize to
    (new_height, new_width) (beit.py:44-48)."""
    old = 2 * _ORIG_WINDOW - 1
    nh, nw = 2 * wh - 1, 2 * ww - 1
    heads = table.shape[-1]
    sub = table[:old * old].reshape(old, old, heads)
    if (nh, nw) != (old, old):
        sub = jax.image.resize(sub, (nh, nw, heads), "linear")
    new_table = jnp.concatenate([sub.reshape(nh * nw, heads),
                                 table[old * old:]], axis=0)
    idx = _gen_rel_pos_index(wh, ww)
    bias = new_table[idx.reshape(-1)].reshape(idx.shape[0], idx.shape[1],
                                              heads)
    return bias.transpose(2, 0, 1)


def _beit_block_apply(p: Dict, x, bias):
    b, t, c = x.shape
    heads = _HEADS
    hd = c // heads
    h = _layer_norm(x, p["ln1_scale"], p["ln1_bias"])
    qkv_bias = jnp.concatenate([p["q_bias"], jnp.zeros_like(p["q_bias"]),
                                p["v_bias"]])
    qkv = h @ p["qkv_w"] + qkv_bias

    def split_heads(z):
        return z.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = (split_heads(z) for z in jnp.split(qkv, 3, axis=-1))
    attn = (q / math.sqrt(hd)) @ k.transpose(0, 1, 3, 2)
    attn = jax.nn.softmax(attn + bias.astype(attn.dtype)[None], axis=-1)
    o = (attn @ v).transpose(0, 2, 1, 3).reshape(b, t, c)
    x = x + p["gamma1"] * (o @ p["proj_w"] + p["proj_b"])
    h = _layer_norm(x, p["ln2_scale"], p["ln2_bias"])
    h = jax.nn.gelu(h @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return x + p["gamma2"] * (h @ p["fc2_w"] + p["fc2_b"])


def beit_apply(p: Dict, x) -> List:
    """x: (B, H, W, 3) normalized; H/W multiples of 16. Returns the four
    hook token tensors (B, N+1, 1024)."""
    b, h, w, _ = x.shape
    wh, ww = h // 16, w // 16
    patches = conv2d(x, p["patch_w"], p["patch_b"], stride=16)
    tokens = patches.reshape(b, wh * ww, _DIM)
    cls = jnp.broadcast_to(p["cls_token"].astype(tokens.dtype),
                           (b, 1, _DIM))
    tokens = jnp.concatenate([cls, tokens], axis=1)

    hooks = []
    for i, blk in enumerate(p["blocks"]):
        bias = _rel_pos_bias(blk["rel_pos_table"], wh, ww)
        tokens = _beit_block_apply(blk, tokens, bias)
        if i in _HOOKS:
            hooks.append(tokens)
    return hooks


# ---------------------------------------------------------------------------
# DPT neck + head (BEiT flavor: 4 token hooks, ConvT reassembles)
# ---------------------------------------------------------------------------

def _conv_transpose_exact(x, w, b, k: int):
    """ConvTranspose2d with stride == kernel_size, padding 0: each input
    pixel emits a k x k tile. w: torch layout (I, O, k, k) as jnp."""
    bb, h, ww, _ = x.shape
    y = jnp.einsum("bhwi,iokl->bhkwlo", x, w.astype(x.dtype))
    y = y.reshape(bb, h * k, ww * k, -1)
    return y + b.astype(x.dtype)


def dpt_beit_apply(p: Dict, x) -> Tuple:
    """x: (B, H, W, 3) 0.5/0.5-normalized. Returns (rel_depth (B,H,W),
    out_conv activation (B,H,W,32), l4_rn, [r4, r3, r2, r1])."""
    b, h, w, _ = x.shape
    gs_h, gs_w = h // 16, w // 16
    hooks = beit_apply(p["beit"], x)

    def reassemble(tok, rp):
        t = _project_readout(rp["readout"], tok)
        return t.reshape(b, gs_h, gs_w, t.shape[-1])

    l1 = reassemble(hooks[0], p["post1"])
    l1 = conv2d(l1, p["post1"]["conv"]["kernel"], p["post1"]["conv"]["bias"])
    l1 = _conv_transpose_exact(l1, p["post1"]["convt_w"],
                               p["post1"]["convt_b"], 4)
    l2 = reassemble(hooks[1], p["post2"])
    l2 = conv2d(l2, p["post2"]["conv"]["kernel"], p["post2"]["conv"]["bias"])
    l2 = _conv_transpose_exact(l2, p["post2"]["convt_w"],
                               p["post2"]["convt_b"], 2)
    l3 = reassemble(hooks[2], p["post3"])
    l3 = conv2d(l3, p["post3"]["conv"]["kernel"], p["post3"]["conv"]["bias"])
    l4 = reassemble(hooks[3], p["post4"])
    l4 = conv2d(l4, p["post4"]["conv"]["kernel"], p["post4"]["conv"]["bias"])
    l4 = conv2d(l4, p["post4"]["conv2"]["kernel"],
                p["post4"]["conv2"]["bias"], stride=2, padding=1)

    rn = [conv2d(lyr, p[f"layer{i}_rn"], padding=1)
          for i, lyr in enumerate((l1, l2, l3, l4), 1)]
    l4_rn = rn[3]

    r4 = _fusion_block(p["refinenet4"], rn[3])
    r3 = _fusion_block(p["refinenet3"], r4, rn[2])
    r2 = _fusion_block(p["refinenet2"], r3, rn[1])
    r1 = _fusion_block(p["refinenet1"], r2, rn[0])

    hd = p["head"]
    out = conv2d(r1, hd["conv1"]["kernel"], hd["conv1"]["bias"], padding=1)
    out = up2_align_corners(out)
    out = conv2d(out, hd["conv2"]["kernel"], hd["conv2"]["bias"], padding=1)
    act = jax.nn.relu(out)                       # the 'out_conv' hook (32ch)
    out = conv2d(act, hd["conv3"]["kernel"], hd["conv3"]["bias"])
    rel_depth = jax.nn.relu(out)[:, :, :, 0]     # non_negative
    return rel_depth, act, l4_rn, [r4, r3, r2, r1]


# ---------------------------------------------------------------------------
# metric-bins head
# ---------------------------------------------------------------------------

def _mlp2(p: Dict, x, act_last=None, act=jax.nn.relu):
    """Conv1x1 -> act -> Conv1x1 (+ optional output activation)."""
    h = act(conv2d(x, p["c1"]["kernel"], p["c1"]["bias"]))
    h = conv2d(h, p["c2"]["kernel"], p["c2"]["bias"])
    return act_last(h) if act_last is not None else h


def _resize_ac(x, h: int, w: int):
    """Bilinear align-corners resize (torch F.interpolate
    align_corners=True) on NHWC."""
    if x.shape[1:3] == (h, w):
        return x
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


def _attractor_apply(p: Dict, x, b_prev, prev_b_embedding):
    """AttractorLayerUnnormed with inv attractor, mean aggregation
    (attractor.py:45-57, 164-208)."""
    h, w = x.shape[1], x.shape[2]
    x = x + _resize_ac(prev_b_embedding, h, w)
    a = _mlp2(p, x, act_last=jax.nn.softplus)        # (B, h, w, nA)
    b_centers = _resize_ac(b_prev, h, w)             # (B, h, w, nbins)
    dx = a[..., :, None] - b_centers[..., None, :]   # (B, h, w, nA, nbins)
    delta = jnp.mean(dx / (1.0 + _ALPHA * dx ** _GAMMA), axis=-2)
    b_new = b_centers + delta
    return b_new, b_new


def _log_binomial(p_prob, t, n_classes: int):
    """LogBinomial over NHWC prob/temperature maps (dist_layers.py:29-69).
    p_prob, t: (B, H, W, 1)."""
    eps = 1e-4
    k = jnp.arange(n_classes, dtype=jnp.float32)[None, None, None, :]
    big_k = float(n_classes - 1)

    def log_binom(n, kk, e=1e-7):
        n = n + e
        kk = kk + e
        return (n * jnp.log(n) - kk * jnp.log(kk)
                - (n - kk) * jnp.log(n - kk + e))

    x = jnp.clip(p_prob, eps, 1.0)
    one_minus = jnp.clip(1.0 - p_prob, eps, 1.0)
    y = (log_binom(jnp.asarray(big_k), k) + k * jnp.log(x)
         + (big_k - k) * jnp.log(one_minus))
    return jax.nn.softmax(y / t, axis=-1)


def _cond_log_binomial(p: Dict, x, cond):
    """ConditionalLogBinomial (dist_layers.py:72-121)."""
    # the CLB MLP uses GELU between its convs (dist_layers.py:91-98)
    pt = _mlp2({"c1": p["c1"], "c2": p["c2"]},
               jnp.concatenate([x, cond], axis=-1),
               act_last=jax.nn.softplus,
               act=lambda h: jax.nn.gelu(h, approximate=False))
    eps = 1e-4
    pp = pt[..., 0:2] + eps
    prob = pp[..., 0:1] / (pp[..., 0:1] + pp[..., 1:2])
    tt = pt[..., 2:4] + eps
    t = tt[..., 0:1] / (tt[..., 0:1] + tt[..., 1:2])
    t = (_MAX_TEMP - _MIN_TEMP) * t + _MIN_TEMP
    return _log_binomial(prob, t, _N_BINS)


def zoe_apply(params: Dict, x):
    """x: (B, H, W, 3) in [0, 1] at the prep (multiple-of-32) size.
    Normalization (0.5/0.5) applied here. Returns metric depth
    (B, H, W)."""
    x = (x - 0.5) / 0.5
    rel_depth, out_act, l4_rn, x_blocks = dpt_beit_apply(params["core"], x)

    zp = params["zoe"]
    x_d0 = conv2d(l4_rn, zp["conv2"]["kernel"], zp["conv2"]["bias"])
    b_prev = _mlp2(zp["seed_bin_regressor"], x_d0,
                   act_last=jax.nn.softplus)        # seed bin centers
    prev_b_embedding = _mlp2(zp["seed_projector"], x_d0)

    for i, feat in enumerate(x_blocks):
        b_embedding = _mlp2(zp["projectors"][i], feat)
        b, b_centers = _attractor_apply(zp["attractors"][i], b_embedding,
                                        b_prev, prev_b_embedding)
        b_prev = b
        prev_b_embedding = b_embedding

    lh, lw = out_act.shape[1], out_act.shape[2]
    rel_cond = _resize_ac(rel_depth[..., None], lh, lw)
    last = jnp.concatenate([out_act, rel_cond], axis=-1)
    b_embedding = _resize_ac(b_embedding, lh, lw)
    probs = _cond_log_binomial(zp["clb"], last, b_embedding)
    b_centers = _resize_ac(b_centers, lh, lw)
    return jnp.sum(probs * b_centers, axis=-1)


# ---------------------------------------------------------------------------
# conversion (ZoeD_M12_N.pt: ckpt['model'], 'module.' stripped)
# ---------------------------------------------------------------------------

def _t(w):
    return jnp.asarray(np.asarray(w).T.copy())


def _cv(sd, key: str) -> Dict:
    return {"kernel": jnp.asarray(np.transpose(
        np.asarray(sd[f"{key}.weight"]), (2, 3, 1, 0)).copy()),
        "bias": jnp.asarray(np.asarray(sd[f"{key}.bias"]))}


def _rcu(sd, prefix: str) -> Dict:
    return {"conv1": _cv(sd, f"{prefix}.conv1"),
            "conv2": _cv(sd, f"{prefix}.conv2")}


def convert_zoedepth(sd: Dict[str, np.ndarray]) -> Dict:
    pm = "core.core.pretrained.model"
    blocks = []
    for i in range(_DEPTH):
        b = f"{pm}.blocks.{i}"
        blocks.append({
            "ln1_scale": jnp.asarray(np.asarray(sd[f"{b}.norm1.weight"])),
            "ln1_bias": jnp.asarray(np.asarray(sd[f"{b}.norm1.bias"])),
            "qkv_w": _t(sd[f"{b}.attn.qkv.weight"]),
            "q_bias": jnp.asarray(np.asarray(sd[f"{b}.attn.q_bias"])),
            "v_bias": jnp.asarray(np.asarray(sd[f"{b}.attn.v_bias"])),
            "rel_pos_table": jnp.asarray(np.asarray(
                sd[f"{b}.attn.relative_position_bias_table"])),
            "proj_w": _t(sd[f"{b}.attn.proj.weight"]),
            "proj_b": jnp.asarray(np.asarray(sd[f"{b}.attn.proj.bias"])),
            "gamma1": jnp.asarray(np.asarray(sd[f"{b}.gamma_1"])),
            "gamma2": jnp.asarray(np.asarray(sd[f"{b}.gamma_2"])),
            "ln2_scale": jnp.asarray(np.asarray(sd[f"{b}.norm2.weight"])),
            "ln2_bias": jnp.asarray(np.asarray(sd[f"{b}.norm2.bias"])),
            "fc1_w": _t(sd[f"{b}.mlp.fc1.weight"]),
            "fc1_b": jnp.asarray(np.asarray(sd[f"{b}.mlp.fc1.bias"])),
            "fc2_w": _t(sd[f"{b}.mlp.fc2.weight"]),
            "fc2_b": jnp.asarray(np.asarray(sd[f"{b}.mlp.fc2.bias"])),
        })
    beit = {
        "patch_w": jnp.asarray(np.transpose(np.asarray(
            sd[f"{pm}.patch_embed.proj.weight"]), (2, 3, 1, 0)).copy()),
        "patch_b": jnp.asarray(np.asarray(
            sd[f"{pm}.patch_embed.proj.bias"])),
        "cls_token": jnp.asarray(np.asarray(sd[f"{pm}.cls_token"])[0]),
        "blocks": blocks,
    }

    pp = "core.core.pretrained"
    core: Dict = {"beit": beit}
    for i, extra in ((1, ("convt", 4)), (2, ("convt", 2)), (3, None),
                     (4, ("conv2", None))):
        post = {
            "readout": {
                "w": _t(sd[f"{pp}.act_postprocess{i}.0.project.0.weight"]),
                "b": jnp.asarray(np.asarray(
                    sd[f"{pp}.act_postprocess{i}.0.project.0.bias"])),
            },
            "conv": _cv(sd, f"{pp}.act_postprocess{i}.3"),
        }
        if extra is not None and extra[0] == "convt":
            post["convt_w"] = jnp.asarray(np.transpose(np.asarray(
                sd[f"{pp}.act_postprocess{i}.4.weight"]),
                (0, 1, 2, 3)).copy())          # keep torch (I, O, k, k)
            post["convt_b"] = jnp.asarray(np.asarray(
                sd[f"{pp}.act_postprocess{i}.4.bias"]))
        if extra is not None and extra[0] == "conv2":
            post["conv2"] = _cv(sd, f"{pp}.act_postprocess{i}.4")
        core[f"post{i}"] = post

    sc = "core.core.scratch"
    for i in range(1, 5):
        core[f"layer{i}_rn"] = jnp.asarray(np.transpose(np.asarray(
            sd[f"{sc}.layer{i}_rn.weight"]), (2, 3, 1, 0)).copy())
        core[f"refinenet{i}"] = {
            "res1": _rcu(sd, f"{sc}.refinenet{i}.resConfUnit1"),
            "res2": _rcu(sd, f"{sc}.refinenet{i}.resConfUnit2"),
            "out_conv": _cv(sd, f"{sc}.refinenet{i}.out_conv"),
        }
    core["head"] = {
        "conv1": _cv(sd, f"{sc}.output_conv.0"),
        "conv2": _cv(sd, f"{sc}.output_conv.2"),
        "conv3": _cv(sd, f"{sc}.output_conv.4"),
    }

    def mlp2(prefix):
        return {"c1": _cv(sd, f"{prefix}.0"), "c2": _cv(sd, f"{prefix}.2")}

    zoe = {
        "conv2": _cv(sd, "conv2"),
        "seed_bin_regressor": mlp2("seed_bin_regressor._net"),
        "seed_projector": mlp2("seed_projector._net"),
        "projectors": [mlp2(f"projectors.{i}._net") for i in range(4)],
        "attractors": [mlp2(f"attractors.{i}._net") for i in range(4)],
        "clb": {"c1": _cv(sd, "conditional_log_binomial.mlp.0"),
                "c2": _cv(sd, "conditional_log_binomial.mlp.2")},
    }
    return {"core": core, "zoe": zoe}


def zoe_init(key, dtype=jnp.float32) -> Dict:
    """Random params with the converted structure (tests / smoke)."""
    depth = _DEPTH

    def rl(k, cin, cout):
        return (jax.random.normal(k, (cin, cout), dtype) / np.sqrt(cin),
                jnp.zeros((cout,), dtype))

    def rcv(k, cin, cout, ksz, bias=True):
        p = {"kernel": jax.random.normal(k, (ksz, ksz, cin, cout), dtype)
             / np.sqrt(cin * ksz * ksz)}
        if bias:
            p["bias"] = jnp.zeros((cout,), dtype)
        return p

    keys = jax.random.split(key, 64)
    ki = iter(keys)
    blocks = []
    nrel = (2 * _ORIG_WINDOW - 1) ** 2 + 3
    for i in range(depth):
        ks = jax.random.split(jax.random.fold_in(keys[0], i), 5)
        qkv_w, _ = rl(ks[0], _DIM, 3 * _DIM)
        proj_w, proj_b = rl(ks[1], _DIM, _DIM)
        fc1_w, fc1_b = rl(ks[2], _DIM, 4 * _DIM)
        fc2_w, fc2_b = rl(ks[3], 4 * _DIM, _DIM)
        blocks.append({
            "ln1_scale": jnp.ones((_DIM,), dtype),
            "ln1_bias": jnp.zeros((_DIM,), dtype),
            "qkv_w": qkv_w,
            "q_bias": jnp.zeros((_DIM,), dtype),
            "v_bias": jnp.zeros((_DIM,), dtype),
            "rel_pos_table": jax.random.normal(ks[4], (nrel, _HEADS),
                                               dtype) * 0.02,
            "proj_w": proj_w, "proj_b": proj_b,
            "gamma1": jnp.full((_DIM,), 0.1, dtype),
            "gamma2": jnp.full((_DIM,), 0.1, dtype),
            "ln2_scale": jnp.ones((_DIM,), dtype),
            "ln2_bias": jnp.zeros((_DIM,), dtype),
            "fc1_w": fc1_w, "fc1_b": fc1_b,
            "fc2_w": fc2_w, "fc2_b": fc2_b,
        })
    core: Dict = {"beit": {
        "patch_w": jax.random.normal(next(ki), (16, 16, 3, _DIM), dtype)
        / 16.0,
        "patch_b": jnp.zeros((_DIM,), dtype),
        "cls_token": jnp.zeros((1, _DIM), dtype),
        "blocks": blocks,
    }}
    for i, (feat, extra) in enumerate(zip(_FEATURES,
                                          ((4,), (2,), None, ("c",))), 1):
        rw, rb = rl(next(ki), 2 * _DIM, _DIM)
        post = {"readout": {"w": rw, "b": rb},
                "conv": rcv(next(ki), _DIM, feat, 1)}
        if extra == (4,) or extra == (2,):
            kk = extra[0]
            post["convt_w"] = jax.random.normal(
                next(ki), (feat, feat, kk, kk), dtype) / np.sqrt(feat)
            post["convt_b"] = jnp.zeros((feat,), dtype)
        elif extra == ("c",):
            post["conv2"] = rcv(next(ki), feat, feat, 3)
        core[f"post{i}"] = post
    for i, feat in enumerate(_FEATURES, 1):
        core[f"layer{i}_rn"] = rcv(next(ki), feat, _SCRATCH, 3,
                                   bias=False)["kernel"]
        core[f"refinenet{i}"] = {
            "res1": {"conv1": rcv(next(ki), _SCRATCH, _SCRATCH, 3),
                     "conv2": rcv(next(ki), _SCRATCH, _SCRATCH, 3)},
            "res2": {"conv1": rcv(next(ki), _SCRATCH, _SCRATCH, 3),
                     "conv2": rcv(next(ki), _SCRATCH, _SCRATCH, 3)},
            "out_conv": rcv(next(ki), _SCRATCH, _SCRATCH, 1),
        }
    core["head"] = {"conv1": rcv(next(ki), _SCRATCH, _SCRATCH // 2, 3),
                    "conv2": rcv(next(ki), _SCRATCH // 2, 32, 3),
                    "conv3": rcv(next(ki), 32, 1, 1)}

    def rmlp2(k, cin, mid, cout):
        k1, k2 = jax.random.split(k)
        return {"c1": rcv(k1, cin, mid, 1), "c2": rcv(k2, mid, cout, 1)}

    zoe = {
        "conv2": rcv(next(ki), _SCRATCH, _SCRATCH, 1),
        "seed_bin_regressor": rmlp2(next(ki), _SCRATCH, 256, _N_BINS),
        "seed_projector": rmlp2(next(ki), _SCRATCH, 128, _BIN_EMBED),
        "projectors": [rmlp2(jax.random.fold_in(keys[1], i), _SCRATCH,
                             128, _BIN_EMBED) for i in range(4)],
        "attractors": [rmlp2(jax.random.fold_in(keys[2], i), _BIN_EMBED,
                             128, _N_ATTRACTORS[i]) for i in range(4)],
        "clb": rmlp2(next(ki), 32 + 1 + _BIN_EMBED,
                     (32 + 1 + _BIN_EMBED) // 2, 4),
    }
    return {"core": core, "zoe": zoe}


# ---------------------------------------------------------------------------
# inference protocol + detector wrapper
# ---------------------------------------------------------------------------

def _prep_size(h: int, w: int, net_h: int = 384,
               net_w: int = 512) -> Tuple[int, int]:
    """Resize target: keep aspect, 'minimal' method, multiples of 32
    (base_models/midas.py:100-172)."""
    scale_h, scale_w = net_h / h, net_w / w
    if abs(1 - scale_w) < abs(1 - scale_h):
        scale_h = scale_w
    else:
        scale_w = scale_h
    return (int(np.round(scale_h * h / 32) * 32),
            int(np.round(scale_w * w / 32) * 32))


class ZoeDetector:
    """zoe/__init__.py call protocol: metric depth -> percentile 2/85
    normalized, inverted uint8 map."""

    def __init__(self, params: Dict):
        self.params = params
        self._apply = jax.jit(zoe_apply)

    @classmethod
    def from_pretrained(cls, weights_path: str) -> "ZoeDetector":
        import torch
        ckpt = torch.load(weights_path, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model", ckpt)
        sd = {k.replace("module.", ""): v.detach().numpy()
              for k, v in sd.items()}
        return cls(convert_zoedepth(sd))

    def infer(self, rgb01: np.ndarray, pad_input: bool = True,
              with_flip_aug: bool = True) -> np.ndarray:
        """DepthModel.infer protocol on a (H, W, 3) [0, 1] image."""
        import cv2

        def run_once(img):
            h, w = img.shape[:2]
            if pad_input:
                pad_h = int(np.sqrt(h / 2) * 3)
                pad_w = int(np.sqrt(w / 2) * 3)
                img = np.pad(img, ((pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                             mode="reflect")
            ph, pw = img.shape[:2]
            nh, nw = _prep_size(ph, pw)
            # torch resizes with bilinear align_corners=True; cv2's
            # INTER_LINEAR (half-pixel) differs at sub-pixel level only
            x = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA
                           if nh < ph else cv2.INTER_LINEAR)
            depth = np.asarray(
                self._apply(self.params,
                            jnp.asarray(x, jnp.float32)[None])[0],
                np.float32)
            depth = cv2.resize(depth, (pw, ph),
                               interpolation=cv2.INTER_CUBIC)
            if pad_input:
                depth = depth[pad_h:ph - pad_h, pad_w:pw - pad_w]
            return depth

        out = run_once(rgb01)
        if with_flip_aug:
            out_flip = run_once(rgb01[:, ::-1])
            out = (out + out_flip[:, ::-1]) / 2.0
        return out

    def __call__(self, input_image, detect_resolution: int = 512,
                 image_resolution: int = 512,
                 gamma_corrected: bool = False):
        import cv2
        img = hwc3(np.asarray(input_image, np.uint8))
        img = resize_to_64(img, detect_resolution)
        depth = self.infer(img.astype(np.float32) / 255.0)

        vmin = np.percentile(depth, 2)
        vmax = np.percentile(depth, 85)
        depth = (depth - vmin) / max(vmax - vmin, 1e-12)
        depth = 1.0 - depth
        if gamma_corrected:
            depth = np.power(depth, 2.2)
        # degenerate (constant / non-finite) depth maps would otherwise
        # warn "invalid value encountered in cast" at the uint8 cast
        depth = np.nan_to_num(depth, nan=0.0, posinf=1.0, neginf=0.0)
        detected = hwc3((depth * 255.0).clip(0, 255).astype(np.uint8))

        out_hw = shape_to_64(*img.shape[:2], image_resolution)
        return cv2.resize(detected, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_LINEAR)
