"""AutoencoderKL (SD-2.1 VAE), functional NHWC implementation.

The frozen latent codec used by stages 2 and 3
(/root/reference/stage2_train_inpaint_model.py:181,329-334;
 /root/reference/src/pipelines/stage2_inpaint_pipeline.py:443-445,528):
8x spatial downsample to 4 latent channels, scaling factor 0.18215.

Encoder: conv_in -> 4 down blocks (2 resnets each; asymmetric-pad strided
conv downsample after the first three) -> mid (resnet/attn/resnet) ->
GroupNorm/SiLU/conv_out -> 8ch moments -> 1x1 quant_conv.
Decoder mirrors it with 3 resnets per block and nearest-2x upsampling.
VAE GroupNorms use eps=1e-6; the mid attention is single-head over
channel-512 spatial tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from pcdms_tpu.nn.layers import (
    conv2d_apply, conv2d_init, group_norm_1d_apply, group_norm_apply,
    group_norm_init, linear_apply, linear_init, silu, upsample2x_conv3x3,
)
from pcdms_tpu.nn.unet_blocks import PAD1

SD_VAE_SCALING = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = SD_VAE_SCALING


def _resnet_init(key, in_ch, out_ch, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": group_norm_init(in_ch, dtype),
        "conv1": conv2d_init(k1, in_ch, out_ch, 3, dtype=dtype),
        "norm2": group_norm_init(out_ch, dtype),
        "conv2": conv2d_init(k2, out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = conv2d_init(k3, in_ch, out_ch, 1, dtype=dtype)
    return p


def _resnet_apply(p, x, groups=32):
    h = silu(group_norm_apply(p["norm1"], x, groups, 1e-6))
    h = conv2d_apply(p["conv1"], h, padding=PAD1)
    h = silu(group_norm_apply(p["norm2"], h, groups, 1e-6))
    h = conv2d_apply(p["conv2"], h, padding=PAD1)
    if "conv_shortcut" in p:
        x = conv2d_apply(p["conv_shortcut"], x, padding="VALID")
    return x + h


def _attn_init(key, ch, dtype):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "norm": group_norm_init(ch, dtype),
        "to_q": linear_init(kq, ch, ch, dtype=dtype),
        "to_k": linear_init(kk, ch, ch, dtype=dtype),
        "to_v": linear_init(kv, ch, ch, dtype=dtype),
        "to_out": linear_init(ko, ch, ch, dtype=dtype),
    }


def _attn_apply(p, x, groups=32):
    """Single-head spatial self-attention over (H*W) tokens."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    tnorm = group_norm_1d_apply(p["norm"], tokens, groups, 1e-6)
    q = linear_apply(p["to_q"], tnorm)
    k = linear_apply(p["to_k"], tnorm)
    v = linear_apply(p["to_v"], tnorm)
    s = jnp.einsum("bqc,bkc->bqk", q, k,
                   preferred_element_type=jnp.float32) * (c ** -0.5)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", a, v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    o = linear_apply(p["to_out"], o)
    return (tokens + o).reshape(b, h, w, c)


def _mid_init(key, ch, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "resnet1": _resnet_init(k1, ch, ch, dtype),
        "attention": _attn_init(k2, ch, dtype),
        "resnet2": _resnet_init(k3, ch, ch, dtype),
    }


def _mid_apply(p, x, groups):
    x = _resnet_apply(p["resnet1"], x, groups)
    x = _attn_apply(p["attention"], x, groups)
    return _resnet_apply(p["resnet2"], x, groups)


def vae_init(key, cfg: VAEConfig = VAEConfig(), dtype=jnp.float32):
    chans = cfg.block_out_channels
    n = len(chans)
    keys = jax.random.split(key, 64)
    ki = iter(keys)

    # --- encoder ---
    enc = {
        "conv_in": conv2d_init(next(ki), cfg.in_channels, chans[0], 3,
                               dtype=dtype),
        "down_blocks": [],
        "mid": _mid_init(next(ki), chans[-1], dtype),
        "norm_out": group_norm_init(chans[-1], dtype),
        "conv_out": conv2d_init(next(ki), chans[-1],
                                2 * cfg.latent_channels, 3, dtype=dtype),
    }
    in_ch = chans[0]
    for i, out_ch in enumerate(chans):
        block = {"resnets": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(
                _resnet_init(next(ki), in_ch if j == 0 else out_ch, out_ch,
                             dtype))
        if i < n - 1:
            block["downsampler"] = conv2d_init(next(ki), out_ch, out_ch, 3,
                                               dtype=dtype)
        enc["down_blocks"].append(block)
        in_ch = out_ch

    # --- decoder ---
    rev = tuple(reversed(chans))
    dec = {
        "conv_in": conv2d_init(next(ki), cfg.latent_channels, rev[0], 3,
                               dtype=dtype),
        "mid": _mid_init(next(ki), rev[0], dtype),
        "up_blocks": [],
        "norm_out": group_norm_init(rev[-1], dtype),
        "conv_out": conv2d_init(next(ki), rev[-1], cfg.in_channels, 3,
                                dtype=dtype),
    }
    in_ch = rev[0]
    for i, out_ch in enumerate(rev):
        block = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(
                _resnet_init(next(ki), in_ch if j == 0 else out_ch, out_ch,
                             dtype))
        if i < n - 1:
            block["upsampler"] = conv2d_init(next(ki), out_ch, out_ch, 3,
                                             dtype=dtype)
        dec["up_blocks"].append(block)
        in_ch = out_ch

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv2d_init(next(ki), 2 * cfg.latent_channels,
                                  2 * cfg.latent_channels, 1, dtype=dtype),
        "post_quant_conv": conv2d_init(next(ki), cfg.latent_channels,
                                       cfg.latent_channels, 1, dtype=dtype),
    }


def vae_encode_moments(params, x, cfg: VAEConfig = VAEConfig()):
    """x: (B, H, W, 3) in [-1, 1] -> (mean, logvar), each (B, H/8, W/8, 4)."""
    g = cfg.norm_groups
    enc = params["encoder"]
    h = conv2d_apply(enc["conv_in"], x, padding=PAD1)
    for block in enc["down_blocks"]:
        for resnet in block["resnets"]:
            h = _resnet_apply(resnet, h, g)
        if "downsampler" in block:
            # torch Downsample2D(padding=0): F.pad (0,1,0,1) + stride-2 VALID
            h = conv2d_apply(block["downsampler"], h, stride=2,
                             padding=[(0, 1), (0, 1)])
    h = _mid_apply(enc["mid"], h, g)
    h = silu(group_norm_apply(enc["norm_out"], h, g, 1e-6))
    h = conv2d_apply(enc["conv_out"], h, padding=PAD1)
    moments = conv2d_apply(params["quant_conv"], h, padding="VALID")
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean, logvar


def vae_encode(params, x, rng=None, cfg: VAEConfig = VAEConfig(),
               sample: bool = True):
    """Encode to scaled latents. Deterministic (mean) if rng is None."""
    mean, logvar = vae_encode_moments(params, x, cfg)
    if sample and rng is not None:
        std = jnp.exp(0.5 * logvar)
        mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    return mean * cfg.scaling_factor


def vae_decode(params, z, cfg: VAEConfig = VAEConfig()):
    """z: scaled latents (B, h, w, 4) -> image (B, 8h, 8w, 3) in [-1, 1]."""
    g = cfg.norm_groups
    z = z / cfg.scaling_factor
    dec = params["decoder"]
    h = conv2d_apply(params["post_quant_conv"], z, padding="VALID")
    h = conv2d_apply(dec["conv_in"], h, padding=PAD1)
    h = _mid_apply(dec["mid"], h, g)
    for block in dec["up_blocks"]:
        for resnet in block["resnets"]:
            h = _resnet_apply(resnet, h, g)
        if "upsampler" in block:
            # fused nearest-2x + conv3x3 (layers.upsample2x_conv3x3):
            # 16/36 the MACs, no 4x intermediate — big at the decoder's
            # 256x512-and-up shapes
            h = upsample2x_conv3x3(block["upsampler"], h)
    h = silu(group_norm_apply(dec["norm_out"], h, g, 1e-6))
    return conv2d_apply(dec["conv_out"], h, padding=PAD1)
