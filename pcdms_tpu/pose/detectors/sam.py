"""Segment Anything (SAM) model family as JAX NHWC pytrees.

Behavioral equivalent of /root/reference/src/controlnet_aux/
segment_anything/modeling/: the ViTDet-style image encoder (windowed
attention with decomposed relative position bias, global attention at 4
blocks, 2-conv LayerNorm2d neck — image_encoder.py:17-395), the random
-Fourier prompt encoder (prompt_encoder.py:25-214), and the two-way
transformer mask decoder with hypernetwork mask heads and IoU prediction
(transformer.py:15-240, mask_decoder.py:20-176).

Configurations mirror build_sam.py: vit_h (1280/32/16, global blocks
7/15/23/31), vit_l (1024/24/16, 5/11/17/23), vit_b (768/12/12, 2/5/8/11),
all with window 14, 1024px inputs, 256-d prompt/mask space.

The host-side automatic mask generator + detector facade live in
pcdms_tpu.pose.detectors.sam_amg.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.pose.detectors.common import conv

_PROMPT_DIM = 256
_IMG_SIZE = 1024
_WINDOW = 14
_MASK_TOKENS = 4                       # 1 single-mask + 3 multimask


class SamConfig(NamedTuple):
    dim: int = 1280
    depth: int = 32
    heads: int = 16
    global_blocks: Tuple[int, ...] = (7, 15, 23, 31)
    img_size: int = _IMG_SIZE


SAM_CONFIGS = {
    "vit_h": SamConfig(1280, 32, 16, (7, 15, 23, 31)),
    "vit_l": SamConfig(1024, 24, 16, (5, 11, 17, 23)),
    "vit_b": SamConfig(768, 12, 12, (2, 5, 8, 11)),
    # MobileSAM TinyViT-5M: the encoder params carry their own structure
    # (params["encoder"]["tiny"]) — dim/depth here are informational
    "vit_t": SamConfig(320, 10, 10, (), 1024),
}


# ---------------------------------------------------------------------------
# image encoder
# ---------------------------------------------------------------------------

def _layer_norm(x, scale, bias, eps: float = 1e-6):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _decomposed_rel_pos(q, rel_h, rel_w, hw: Tuple[int, int]):
    """add_decomposed_rel_pos for the square q==k case
    (image_encoder.py:323-360). q: (B*, N, hd)."""
    h, w = hw
    assert rel_h.shape[0] == 2 * h - 1 and rel_w.shape[0] == 2 * w - 1, (
        "SAM inputs are padded to the fixed 1024 grid; rel-pos interp "
        "is never exercised")
    idx_h = np.arange(h)[:, None] - np.arange(h)[None, :] + (h - 1)
    idx_w = np.arange(w)[:, None] - np.arange(w)[None, :] + (w - 1)
    rh = rel_h[idx_h.reshape(-1)].reshape(h, h, -1)
    rw = rel_w[idx_w.reshape(-1)].reshape(w, w, -1)
    rq = q.reshape(q.shape[0], h, w, -1)
    bias_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
    bias_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
    return (bias_h[:, :, :, :, None] + bias_w[:, :, :, None, :]).reshape(
        q.shape[0], h * w, h * w)


def _sam_attention(p: Dict, x, heads: int):
    """x: (B, H, W, C) -> same; decomposed rel pos on the (H, W) grid."""
    b, h, w, c = x.shape
    n = h * w
    hd = c // heads
    qkv = x.reshape(b, n, c) @ p["qkv_w"] + p["qkv_b"]
    qkv = qkv.reshape(b, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = (z.reshape(b * heads, n, hd) for z in qkv)
    attn = (q / math.sqrt(hd)) @ k.transpose(0, 2, 1)
    attn = attn + _decomposed_rel_pos(q, p["rel_pos_h"], p["rel_pos_w"],
                                      (h, w))
    attn = jax.nn.softmax(attn, axis=-1)
    o = (attn @ v).reshape(b, heads, n, hd).transpose(0, 2, 1, 3)
    o = o.reshape(b, h, w, c)
    return o @ p["proj_w"] + p["proj_b"]


def _window_partition(x, ws: int):
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c),
            (hp, wp))


def _window_unpartition(wins, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp * wp // ws // ws)
    x = wins.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _encoder_block(p: Dict, x, heads: int, window: int):
    shortcut = x
    h = _layer_norm(x, p["ln1_scale"], p["ln1_bias"])
    if window > 0:
        hw = h.shape[1:3]
        h, pad_hw = _window_partition(h, window)
    h = _sam_attention(p, h, heads)
    if window > 0:
        h = _window_unpartition(h, window, pad_hw, hw)
    x = shortcut + h
    h = _layer_norm(x, p["ln2_scale"], p["ln2_bias"])
    h = jax.nn.gelu(h @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return x + h @ p["fc2_w"] + p["fc2_b"]


def _layer_norm_2d(x, scale, bias, eps: float = 1e-6):
    """LayerNorm2d (common.py:28-43): per-pixel normalization over the
    channel axis."""
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * scale + bias


def image_encoder_apply(p: Dict, x, cfg: SamConfig):
    """x: (B, 1024, 1024, 3) pixel-normalized -> (B, 64, 64, 256)."""
    h = conv(x, p["patch_w"], p["patch_b"], stride=16)
    h = h + p["pos_embed"].astype(h.dtype)
    for i, blk in enumerate(p["blocks"]):
        window = 0 if i in cfg.global_blocks else _WINDOW
        h = _encoder_block(blk, h, cfg.heads, window)
    h = conv(h, p["neck0_w"])
    h = _layer_norm_2d(h, p["neck_ln0_scale"], p["neck_ln0_bias"])
    h = conv(h, p["neck1_w"], padding=1)
    return _layer_norm_2d(h, p["neck_ln1_scale"], p["neck_ln1_bias"])


# ---------------------------------------------------------------------------
# prompt encoder (points + boxes + dense no-mask)
# ---------------------------------------------------------------------------

def _pe_encode(coords01, gauss):
    """PositionEmbeddingRandom._pe_encoding on [0,1] coords."""
    c = (2.0 * coords01 - 1.0) @ gauss
    c = 2.0 * np.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def dense_pe(p: Dict, size: Tuple[int, int] = (64, 64)):
    h, w = size
    ys = (np.arange(h, dtype=np.float32) + 0.5) / h
    xs = (np.arange(w, dtype=np.float32) + 0.5) / w
    grid = np.stack(np.meshgrid(xs, ys), axis=-1)       # (h, w, 2) [x, y]
    return _pe_encode(jnp.asarray(grid), p["pe_gauss"])  # (h, w, 256)


def embed_points(p: Dict, coords, labels,
                 input_size: int = _IMG_SIZE):
    """coords: (B, N, 2) in 1024-input pixel space; labels: (B, N) with
    1=positive, 0=negative, -1=pad. A pad point is appended (the
    boxes=None path, prompt_encoder.py:81-96)."""
    b, n, _ = coords.shape
    coords = jnp.concatenate(
        [coords + 0.5, jnp.zeros((b, 1, 2), coords.dtype)], axis=1)
    labels = jnp.concatenate(
        [labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
    emb = _pe_encode(coords / input_size, p["pe_gauss"])
    lab = labels[..., None]
    emb = jnp.where(lab == -1, p["not_a_point"][None, None], emb + 0.0)
    emb = jnp.where(lab == 0, emb + p["point_neg"][None, None], emb)
    emb = jnp.where(lab == 1, emb + p["point_pos"][None, None], emb)
    return emb


# ---------------------------------------------------------------------------
# two-way transformer + mask decoder
# ---------------------------------------------------------------------------

def _attn(p: Dict, q, k, v, heads: int):
    qq = q @ p["q_w"] + p["q_b"]
    kk = k @ p["k_w"] + p["k_b"]
    vv = v @ p["v_w"] + p["v_b"]
    b, nq, c = qq.shape
    hd = c // heads

    def split(z):
        return z.reshape(b, z.shape[1], heads, hd).transpose(0, 2, 1, 3)

    a = split(qq) @ split(kk).transpose(0, 1, 3, 2) / math.sqrt(hd)
    a = jax.nn.softmax(a, axis=-1)
    o = (a @ split(vv)).transpose(0, 2, 1, 3).reshape(b, nq, c)
    return o @ p["out_w"] + p["out_b"]


def _twoway_block(p: Dict, queries, keys, query_pe, key_pe, heads: int,
                  skip_first_pe: bool):
    if skip_first_pe:
        queries = _attn(p["self_attn"], queries, queries, queries, heads)
    else:
        q = queries + query_pe
        queries = queries + _attn(p["self_attn"], q, q, queries, heads)
    queries = _layer_norm(queries, p["ln1_scale"], p["ln1_bias"], 1e-5)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _attn(p["t2i"], q, k, keys, heads)
    queries = _layer_norm(queries, p["ln2_scale"], p["ln2_bias"], 1e-5)

    h = jax.nn.relu(queries @ p["fc1_w"] + p["fc1_b"])
    queries = queries + h @ p["fc2_w"] + p["fc2_b"]
    queries = _layer_norm(queries, p["ln3_scale"], p["ln3_bias"], 1e-5)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _attn(p["i2t"], k, q, queries, heads)
    keys = _layer_norm(keys, p["ln4_scale"], p["ln4_bias"], 1e-5)
    return queries, keys


def _twoway_transformer(p: Dict, image_emb, image_pe, tokens,
                        heads: int = 8):
    b, h, w, c = image_emb.shape
    keys = image_emb.reshape(b, h * w, c)
    key_pe = image_pe.reshape(1, h * w, c)
    key_pe = jnp.broadcast_to(key_pe, keys.shape)
    queries = tokens
    for i, blk in enumerate(p["layers"]):
        queries, keys = _twoway_block(blk, queries, keys, tokens, key_pe,
                                      heads, skip_first_pe=(i == 0))
    q = queries + tokens
    k = keys + key_pe
    queries = queries + _attn(p["final_attn"], q, k, keys, heads)
    queries = _layer_norm(queries, p["final_ln_scale"],
                          p["final_ln_bias"], 1e-5)
    return queries, keys


def _mlp(p: List, x, relu_last: bool = False):
    for i, layer in enumerate(p):
        x = x @ layer["w"] + layer["b"]
        if i < len(p) - 1 or relu_last:
            x = jax.nn.relu(x)
    return x


def _conv_transpose2(x, w, b):
    """ConvTranspose2d k2 s2; w: torch (I, O, 2, 2)."""
    bb, h, ww, _ = x.shape
    y = jnp.einsum("bhwi,iokl->bhkwlo", x, w.astype(x.dtype))
    return y.reshape(bb, h * 2, ww * 2, -1) + b.astype(x.dtype)


def mask_decoder_apply(p: Dict, image_emb, image_pe, sparse_emb,
                       multimask: bool = True):
    """image_emb: (1, 64, 64, 256), sparse_emb: (B, N, 256) ->
    (masks (B, M, 256, 256) logits, iou (B, M)). Dense prompt = the
    no-mask embedding (the AMG path never passes mask inputs)."""
    b = sparse_emb.shape[0]
    out_tokens = jnp.concatenate([p["iou_token"], p["mask_tokens"]],
                                 axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (b,) + out_tokens.shape),
         sparse_emb], axis=1)

    src = image_emb + p["no_mask"][None, None, None]
    src = jnp.broadcast_to(src, (b,) + src.shape[1:])
    hs, keys = _twoway_transformer(p["transformer"], src, image_pe, tokens)
    iou_tok = hs[:, 0]
    mask_toks = hs[:, 1:1 + _MASK_TOKENS]

    h, w = image_emb.shape[1:3]
    src = keys.reshape(b, h, w, -1)
    up = _conv_transpose2(src, p["up0_w"], p["up0_b"])
    up = jax.nn.gelu(_layer_norm_2d(up, p["up_ln_scale"], p["up_ln_bias"]),
                     approximate=False)
    up = _conv_transpose2(up, p["up1_w"], p["up1_b"])
    up = jax.nn.gelu(up, approximate=False)              # (B, 4h, 4w, 32)

    hyper = jnp.stack([_mlp(p["hyper_mlps"][i], mask_toks[:, i])
                       for i in range(_MASK_TOKENS)], axis=1)  # (B, 4, 32)
    masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
    iou = _mlp(p["iou_head"], iou_tok)
    if multimask:
        return masks[:, 1:], iou[:, 1:]
    return masks[:, :1], iou[:, :1]


# ---------------------------------------------------------------------------
# full predict step (jittable)
# ---------------------------------------------------------------------------

_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def sam_encode_image(params: Dict, x, cfg: SamConfig):
    """x: (1, 1024, 1024, 3) raw 0-255 RGB (padded). Normalization
    applied here (sam.py:28-48)."""
    x = (x - jnp.asarray(_PIXEL_MEAN, x.dtype)) / jnp.asarray(
        _PIXEL_STD, x.dtype)
    if "tiny" in params["encoder"]:
        from pcdms_tpu.pose.detectors.tiny_vit import tiny_vit_apply
        return tiny_vit_apply(params["encoder"]["tiny"], x)
    return image_encoder_apply(params["encoder"], x, cfg)


def sam_predict_points(params: Dict, image_emb, coords, labels,
                       multimask: bool = True,
                       input_size: int = _IMG_SIZE):
    """Batched single-point prediction (the AMG inner call):
    coords (B, N, 2) in model-input pixel space, labels (B, N) ->
    (low-res mask logits (B, M, 4h, 4w), iou (B, M))."""
    pe = dense_pe(params["prompt"], image_emb.shape[1:3])
    sparse = embed_points(params["prompt"], coords, labels,
                          input_size=input_size)
    return mask_decoder_apply(params["decoder"], image_emb, pe, sparse,
                              multimask=multimask)


# ---------------------------------------------------------------------------
# conversion (official SAM checkpoints)
# ---------------------------------------------------------------------------

def _t(w):
    return jnp.asarray(np.asarray(w).T.copy())


def _lin(sd, key):
    return {"w": _t(sd[f"{key}.weight"]),
            "b": jnp.asarray(np.asarray(sd[f"{key}.bias"]))}


def convert_sam(sd: Dict[str, np.ndarray],
                cfg: Optional[SamConfig] = None) -> Tuple[Dict, SamConfig]:
    """Official sam_vit_{h,l,b} state dict -> (params, config)."""
    tiny = "image_encoder.layers.0.blocks.0.conv1.c.weight" in sd
    if cfg is None:
        if tiny:
            cfg = SAM_CONFIGS["vit_t"]
        else:
            dim = np.asarray(
                sd["image_encoder.patch_embed.proj.weight"]).shape[0]
            cfg = {1280: SAM_CONFIGS["vit_h"], 1024: SAM_CONFIGS["vit_l"],
                   768: SAM_CONFIGS["vit_b"]}[dim]
    enc = "image_encoder"
    if tiny:
        from pcdms_tpu.pose.detectors.tiny_vit import convert_tiny_vit
        encoder = {"tiny": convert_tiny_vit(sd)}
        return _convert_sam_heads(sd, encoder, cfg)
    blocks = []
    for i in range(cfg.depth):
        b = f"{enc}.blocks.{i}"
        blocks.append({
            "ln1_scale": jnp.asarray(np.asarray(sd[f"{b}.norm1.weight"])),
            "ln1_bias": jnp.asarray(np.asarray(sd[f"{b}.norm1.bias"])),
            "qkv_w": _t(sd[f"{b}.attn.qkv.weight"]),
            "qkv_b": jnp.asarray(np.asarray(sd[f"{b}.attn.qkv.bias"])),
            "rel_pos_h": jnp.asarray(np.asarray(sd[f"{b}.attn.rel_pos_h"])),
            "rel_pos_w": jnp.asarray(np.asarray(sd[f"{b}.attn.rel_pos_w"])),
            "proj_w": _t(sd[f"{b}.attn.proj.weight"]),
            "proj_b": jnp.asarray(np.asarray(sd[f"{b}.attn.proj.bias"])),
            "ln2_scale": jnp.asarray(np.asarray(sd[f"{b}.norm2.weight"])),
            "ln2_bias": jnp.asarray(np.asarray(sd[f"{b}.norm2.bias"])),
            "fc1_w": _t(sd[f"{b}.mlp.lin1.weight"]),
            "fc1_b": jnp.asarray(np.asarray(sd[f"{b}.mlp.lin1.bias"])),
            "fc2_w": _t(sd[f"{b}.mlp.lin2.weight"]),
            "fc2_b": jnp.asarray(np.asarray(sd[f"{b}.mlp.lin2.bias"])),
        })
    encoder = {
        "patch_w": jnp.asarray(np.transpose(np.asarray(
            sd[f"{enc}.patch_embed.proj.weight"]), (2, 3, 1, 0)).copy()),
        "patch_b": jnp.asarray(np.asarray(
            sd[f"{enc}.patch_embed.proj.bias"])),
        "pos_embed": jnp.asarray(np.asarray(sd[f"{enc}.pos_embed"])[0]),
        "blocks": blocks,
        "neck0_w": jnp.asarray(np.transpose(np.asarray(
            sd[f"{enc}.neck.0.weight"]), (2, 3, 1, 0)).copy()),
        "neck_ln0_scale": jnp.asarray(np.asarray(sd[f"{enc}.neck.1.weight"])),
        "neck_ln0_bias": jnp.asarray(np.asarray(sd[f"{enc}.neck.1.bias"])),
        "neck1_w": jnp.asarray(np.transpose(np.asarray(
            sd[f"{enc}.neck.2.weight"]), (2, 3, 1, 0)).copy()),
        "neck_ln1_scale": jnp.asarray(np.asarray(sd[f"{enc}.neck.3.weight"])),
        "neck_ln1_bias": jnp.asarray(np.asarray(sd[f"{enc}.neck.3.bias"])),
    }

    return _convert_sam_heads(sd, encoder, cfg)


def _convert_sam_heads(sd: Dict[str, np.ndarray], encoder: Dict,
                       cfg: SamConfig) -> Tuple[Dict, SamConfig]:
    pe = "prompt_encoder"
    prompt = {
        "pe_gauss": jnp.asarray(np.asarray(
            sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"])),
        "point_neg": jnp.asarray(np.asarray(
            sd[f"{pe}.point_embeddings.0.weight"])[0]),
        "point_pos": jnp.asarray(np.asarray(
            sd[f"{pe}.point_embeddings.1.weight"])[0]),
        "box_a": jnp.asarray(np.asarray(
            sd[f"{pe}.point_embeddings.2.weight"])[0]),
        "box_b": jnp.asarray(np.asarray(
            sd[f"{pe}.point_embeddings.3.weight"])[0]),
        "not_a_point": jnp.asarray(np.asarray(
            sd[f"{pe}.not_a_point_embed.weight"])[0]),
    }

    md = "mask_decoder"
    layers = []
    for i in range(2):
        lb = f"{md}.transformer.layers.{i}"
        layers.append({
            "self_attn": {k: v for a in ("q", "k", "v", "out")
                          for k, v in zip(
                              (f"{a}_w", f"{a}_b"),
                              (_t(sd[f"{lb}.self_attn.{a}_proj.weight"]),
                               jnp.asarray(np.asarray(
                                   sd[f"{lb}.self_attn.{a}_proj.bias"]))))},
            "t2i": {k: v for a in ("q", "k", "v", "out")
                    for k, v in zip(
                        (f"{a}_w", f"{a}_b"),
                        (_t(sd[f"{lb}.cross_attn_token_to_image."
                               f"{a}_proj.weight"]),
                         jnp.asarray(np.asarray(
                             sd[f"{lb}.cross_attn_token_to_image."
                                f"{a}_proj.bias"]))))},
            "i2t": {k: v for a in ("q", "k", "v", "out")
                    for k, v in zip(
                        (f"{a}_w", f"{a}_b"),
                        (_t(sd[f"{lb}.cross_attn_image_to_token."
                               f"{a}_proj.weight"]),
                         jnp.asarray(np.asarray(
                             sd[f"{lb}.cross_attn_image_to_token."
                                f"{a}_proj.bias"]))))},
            "ln1_scale": jnp.asarray(np.asarray(sd[f"{lb}.norm1.weight"])),
            "ln1_bias": jnp.asarray(np.asarray(sd[f"{lb}.norm1.bias"])),
            "ln2_scale": jnp.asarray(np.asarray(sd[f"{lb}.norm2.weight"])),
            "ln2_bias": jnp.asarray(np.asarray(sd[f"{lb}.norm2.bias"])),
            "ln3_scale": jnp.asarray(np.asarray(sd[f"{lb}.norm3.weight"])),
            "ln3_bias": jnp.asarray(np.asarray(sd[f"{lb}.norm3.bias"])),
            "ln4_scale": jnp.asarray(np.asarray(sd[f"{lb}.norm4.weight"])),
            "ln4_bias": jnp.asarray(np.asarray(sd[f"{lb}.norm4.bias"])),
            "fc1_w": _t(sd[f"{lb}.mlp.lin1.weight"]),
            "fc1_b": jnp.asarray(np.asarray(sd[f"{lb}.mlp.lin1.bias"])),
            "fc2_w": _t(sd[f"{lb}.mlp.lin2.weight"]),
            "fc2_b": jnp.asarray(np.asarray(sd[f"{lb}.mlp.lin2.bias"])),
        })
    transformer = {
        "layers": layers,
        "final_attn": {k: v for a in ("q", "k", "v", "out")
                       for k, v in zip(
                           (f"{a}_w", f"{a}_b"),
                           (_t(sd[f"{md}.transformer."
                                  f"final_attn_token_to_image."
                                  f"{a}_proj.weight"]),
                            jnp.asarray(np.asarray(
                                sd[f"{md}.transformer."
                                   f"final_attn_token_to_image."
                                   f"{a}_proj.bias"]))))},
        "final_ln_scale": jnp.asarray(np.asarray(
            sd[f"{md}.transformer.norm_final_attn.weight"])),
        "final_ln_bias": jnp.asarray(np.asarray(
            sd[f"{md}.transformer.norm_final_attn.bias"])),
    }

    def mlp3(prefix, n):
        return [_lin(sd, f"{prefix}.layers.{i}") for i in range(n)]

    decoder = {
        "transformer": transformer,
        "iou_token": jnp.asarray(np.asarray(
            sd[f"{md}.iou_token.weight"])),
        "mask_tokens": jnp.asarray(np.asarray(
            sd[f"{md}.mask_tokens.weight"])),
        "no_mask": jnp.asarray(np.asarray(
            sd["prompt_encoder.no_mask_embed.weight"])[0]),
        "up0_w": jnp.asarray(np.asarray(
            sd[f"{md}.output_upscaling.0.weight"])),
        "up0_b": jnp.asarray(np.asarray(
            sd[f"{md}.output_upscaling.0.bias"])),
        "up_ln_scale": jnp.asarray(np.asarray(
            sd[f"{md}.output_upscaling.1.weight"])),
        "up_ln_bias": jnp.asarray(np.asarray(
            sd[f"{md}.output_upscaling.1.bias"])),
        "up1_w": jnp.asarray(np.asarray(
            sd[f"{md}.output_upscaling.3.weight"])),
        "up1_b": jnp.asarray(np.asarray(
            sd[f"{md}.output_upscaling.3.bias"])),
        "hyper_mlps": [mlp3(f"{md}.output_hypernetworks_mlps.{i}", 3)
                       for i in range(_MASK_TOKENS)],
        "iou_head": mlp3(f"{md}.iou_prediction_head", 3),
    }
    return ({"encoder": encoder, "prompt": prompt, "decoder": decoder},
            cfg)


# ---------------------------------------------------------------------------
# random init (tests / smoke)
# ---------------------------------------------------------------------------

def sam_init(key, cfg: SamConfig = SAM_CONFIGS["vit_b"],
             dtype=jnp.float32) -> Dict:
    def rl(k, cin, cout):
        return {"w": jax.random.normal(k, (cin, cout), dtype)
                / np.sqrt(cin), "b": jnp.zeros((cout,), dtype)}

    keys = jax.random.split(key, 48)
    ki = iter(keys)
    dim = cfg.dim
    grid = cfg.img_size // 16
    blocks = []
    for i in range(cfg.depth):
        ks = jax.random.split(jax.random.fold_in(keys[0], i), 4)
        rel = grid if i in cfg.global_blocks else _WINDOW
        hd = dim // cfg.heads
        blocks.append({
            "ln1_scale": jnp.ones((dim,), dtype),
            "ln1_bias": jnp.zeros((dim,), dtype),
            **{k: v for k, v in zip(("qkv_w", "qkv_b"),
                                    rl(ks[0], dim, 3 * dim).values())},
            "rel_pos_h": jax.random.normal(ks[3], (2 * rel - 1, hd),
                                           dtype) * 0.02,
            "rel_pos_w": jax.random.normal(
                jax.random.fold_in(ks[3], 1), (2 * rel - 1, hd),
                dtype) * 0.02,
            **{k: v for k, v in zip(("proj_w", "proj_b"),
                                    rl(ks[1], dim, dim).values())},
            "ln2_scale": jnp.ones((dim,), dtype),
            "ln2_bias": jnp.zeros((dim,), dtype),
            **{k: v for k, v in zip(("fc1_w", "fc1_b"),
                                    rl(ks[2], dim, 4 * dim).values())},
            **{k: v for k, v in zip(
                ("fc2_w", "fc2_b"),
                rl(jax.random.fold_in(ks[2], 1), 4 * dim, dim).values())},
        })
    encoder = {
        "patch_w": jax.random.normal(next(ki), (16, 16, 3, dim), dtype)
        / 16.0,
        "patch_b": jnp.zeros((dim,), dtype),
        "pos_embed": jax.random.normal(next(ki), (grid, grid, dim),
                                       dtype) * 0.02,
        "blocks": blocks,
        "neck0_w": jax.random.normal(next(ki), (1, 1, dim, _PROMPT_DIM),
                                     dtype) / np.sqrt(dim),
        "neck_ln0_scale": jnp.ones((_PROMPT_DIM,), dtype),
        "neck_ln0_bias": jnp.zeros((_PROMPT_DIM,), dtype),
        "neck1_w": jax.random.normal(
            next(ki), (3, 3, _PROMPT_DIM, _PROMPT_DIM), dtype)
        / np.sqrt(9 * _PROMPT_DIM),
        "neck_ln1_scale": jnp.ones((_PROMPT_DIM,), dtype),
        "neck_ln1_bias": jnp.zeros((_PROMPT_DIM,), dtype),
    }
    prompt = {
        "pe_gauss": jax.random.normal(next(ki), (2, _PROMPT_DIM // 2),
                                      dtype),
        "point_neg": jax.random.normal(next(ki), (_PROMPT_DIM,), dtype),
        "point_pos": jax.random.normal(next(ki), (_PROMPT_DIM,), dtype),
        "box_a": jax.random.normal(next(ki), (_PROMPT_DIM,), dtype),
        "box_b": jax.random.normal(next(ki), (_PROMPT_DIM,), dtype),
        "not_a_point": jax.random.normal(next(ki), (_PROMPT_DIM,), dtype),
    }

    def attn_p(k, down=1):
        inner = _PROMPT_DIM // down
        ks = jax.random.split(k, 4)
        p = {}
        for a, kk, cout in zip(("q", "k", "v"), ks[:3],
                               (inner, inner, inner)):
            lp = rl(kk, _PROMPT_DIM, cout)
            p[f"{a}_w"], p[f"{a}_b"] = lp["w"], lp["b"]
        lp = rl(ks[3], inner, _PROMPT_DIM)
        p["out_w"], p["out_b"] = lp["w"], lp["b"]
        return p

    layers = []
    for i in range(2):
        ks = jax.random.split(jax.random.fold_in(keys[1], i), 6)
        layers.append({
            "self_attn": attn_p(ks[0]),
            "t2i": attn_p(ks[1], down=2),
            "i2t": attn_p(ks[2], down=2),
            **{f"ln{j}_scale": jnp.ones((_PROMPT_DIM,), dtype)
               for j in (1, 2, 3, 4)},
            **{f"ln{j}_bias": jnp.zeros((_PROMPT_DIM,), dtype)
               for j in (1, 2, 3, 4)},
            **{k: v for k, v in zip(("fc1_w", "fc1_b"),
                                    rl(ks[3], _PROMPT_DIM, 2048).values())},
            **{k: v for k, v in zip(("fc2_w", "fc2_b"),
                                    rl(ks[4], 2048, _PROMPT_DIM).values())},
        })
    decoder = {
        "transformer": {
            "layers": layers,
            "final_attn": attn_p(next(ki), down=2),
            "final_ln_scale": jnp.ones((_PROMPT_DIM,), dtype),
            "final_ln_bias": jnp.zeros((_PROMPT_DIM,), dtype),
        },
        "iou_token": jax.random.normal(next(ki), (1, _PROMPT_DIM), dtype),
        "mask_tokens": jax.random.normal(next(ki),
                                         (_MASK_TOKENS, _PROMPT_DIM),
                                         dtype),
        "no_mask": jnp.zeros((_PROMPT_DIM,), dtype),
        "up0_w": jax.random.normal(next(ki), (_PROMPT_DIM,
                                              _PROMPT_DIM // 4, 2, 2),
                                   dtype) / np.sqrt(_PROMPT_DIM),
        "up0_b": jnp.zeros((_PROMPT_DIM // 4,), dtype),
        "up_ln_scale": jnp.ones((_PROMPT_DIM // 4,), dtype),
        "up_ln_bias": jnp.zeros((_PROMPT_DIM // 4,), dtype),
        "up1_w": jax.random.normal(next(ki), (_PROMPT_DIM // 4,
                                              _PROMPT_DIM // 8, 2, 2),
                                   dtype) / np.sqrt(_PROMPT_DIM // 4),
        "up1_b": jnp.zeros((_PROMPT_DIM // 8,), dtype),
        "hyper_mlps": [[rl(jax.random.fold_in(keys[2], 10 * i + j),
                           _PROMPT_DIM,
                           _PROMPT_DIM // 8 if j == 2 else _PROMPT_DIM)
                        for j in range(3)] for i in range(_MASK_TOKENS)],
        "iou_head": [rl(jax.random.fold_in(keys[3], j), _PROMPT_DIM,
                        _MASK_TOKENS if j == 2 else _PROMPT_DIM)
                     for j in range(3)],
    }
    return {"encoder": encoder, "prompt": prompt, "decoder": decoder}
