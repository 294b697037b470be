"""SD-2.1-style UNet building blocks (functional, NHWC).

Behavioral equivalents of the diffusers blocks the reference UNets are made
of (/root/reference/src/models/stage2_inpaint_unet_2d_condition.py:747-820):
ResnetBlock2D, Transformer2DModel (use_linear_projection=True), Down/Up
sample, CrossAttn{Down,Up}Block2D, {Down,Up}Block2D, UNetMidBlock2DCrossAttn.

All convs are NHWC/HWIO; attention runs through the Pallas flash kernel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcdms_tpu.nn.layers import (
    conv2d_apply, conv2d_init, group_norm_1d_apply, group_norm_apply,
    group_norm_init, layer_norm_init, linear_apply, linear_init,
    silu, upsample2x_conv3x3,
)
from pcdms_tpu.nn.transformer import (
    transformer_block_apply, transformer_block_init,
)
from pcdms_tpu.ops.fused_conv import gn_silu_conv3x3

PAD1 = [(1, 1), (1, 1)]


# ---------------------------------------------------------------------------
# ResnetBlock2D
# ---------------------------------------------------------------------------

def resnet_block_init(key, in_ch: int, out_ch: int,
                      temb_dim: Optional[int] = None, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "norm1": group_norm_init(in_ch, dtype),
        "conv1": conv2d_init(k1, in_ch, out_ch, 3, dtype=dtype),
        "norm2": group_norm_init(out_ch, dtype),
        "conv2": conv2d_init(k2, out_ch, out_ch, 3, dtype=dtype),
    }
    if temb_dim is not None:
        params["time_emb_proj"] = linear_init(k3, temb_dim, out_ch, dtype=dtype)
    if in_ch != out_ch:
        params["conv_shortcut"] = conv2d_init(k4, in_ch, out_ch, 1, dtype=dtype)
    return params


def resnet_block_apply(params, x, temb=None, *, num_groups: int = 32,
                       eps: float = 1e-5, fused: bool = False):
    if fused:
        # one Pallas kernel per conv: GN+SiLU+conv3x3 (+temb / +residual)
        t = None
        if temb is not None and "time_emb_proj" in params:
            t = linear_apply(params["time_emb_proj"], silu(temb))
        h = gn_silu_conv3x3(
            x, params["norm1"]["scale"], params["norm1"]["bias"],
            params["conv1"]["kernel"], params["conv1"]["bias"],
            num_groups=num_groups, eps=eps, temb=t)
        shortcut = x
        if "conv_shortcut" in params:
            shortcut = conv2d_apply(params["conv_shortcut"], x,
                                    padding="VALID")
        return gn_silu_conv3x3(
            h, params["norm2"]["scale"], params["norm2"]["bias"],
            params["conv2"]["kernel"], params["conv2"]["bias"],
            num_groups=num_groups, eps=eps, residual=shortcut)
    h = silu(group_norm_apply(params["norm1"], x, num_groups, eps))
    h = conv2d_apply(params["conv1"], h, padding=PAD1)
    if temb is not None and "time_emb_proj" in params:
        t = linear_apply(params["time_emb_proj"], silu(temb))
        h = h + t[:, None, None, :]
    h = silu(group_norm_apply(params["norm2"], h, num_groups, eps))
    h = conv2d_apply(params["conv2"], h, padding=PAD1)
    if "conv_shortcut" in params:
        x = conv2d_apply(params["conv_shortcut"], x, padding="VALID")
    return x + h


# ---------------------------------------------------------------------------
# Transformer2D (spatial transformer, linear projections as in SD-2.1)
# ---------------------------------------------------------------------------

def transformer2d_init(key, ch: int, heads: int, head_dim: int,
                       context_dim: int, depth: int = 1, dtype=jnp.float32):
    keys = jax.random.split(key, depth + 2)
    return {
        "norm": group_norm_init(ch, dtype),
        "proj_in": linear_init(keys[0], ch, ch, dtype=dtype),
        "blocks": [
            transformer_block_init(keys[2 + i], ch, heads, head_dim,
                                   context_dim=context_dim, geglu=True,
                                   dtype=dtype)
            for i in range(depth)
        ],
        "proj_out": linear_init(keys[1], ch, ch, dtype=dtype),
    }


def transformer2d_apply(params, x, context, *, heads: int,
                        use_flash: bool = True, num_groups: int = 32,
                        zero_ctx_prefix: int = 0):
    b, h, w, c = x.shape
    residual = x
    tokens = x.reshape(b, h * w, c)
    tokens = group_norm_1d_apply(params["norm"], tokens, num_groups,
                                 eps=1e-6)
    tokens = linear_apply(params["proj_in"], tokens)
    for block in params["blocks"]:
        tokens = transformer_block_apply(block, tokens, context, heads=heads,
                                         use_flash=use_flash,
                                         zero_ctx_prefix=zero_ctx_prefix)
    tokens = linear_apply(params["proj_out"], tokens)
    return tokens.reshape(b, h, w, c) + residual


# ---------------------------------------------------------------------------
# resolution changes
# ---------------------------------------------------------------------------

def downsample_init(key, ch: int, dtype=jnp.float32):
    return {"conv": conv2d_init(key, ch, ch, 3, dtype=dtype)}


def downsample_apply(params, x):
    return conv2d_apply(params["conv"], x, stride=2, padding=PAD1)


def upsample_init(key, ch: int, dtype=jnp.float32):
    return {"conv": conv2d_init(key, ch, ch, 3, dtype=dtype)}


def upsample_apply(params, x):
    # fused nearest-2x + conv3x3: same math as
    # conv2d_apply(params["conv"], nearest_upsample_2x(x), PAD1) at
    # 16/36 the MACs and no 4x intermediate (layers.upsample2x_conv3x3)
    return upsample2x_conv3x3(params["conv"], x)


# ---------------------------------------------------------------------------
# UNet down / mid / up blocks
# ---------------------------------------------------------------------------

def down_block_init(key, in_ch: int, out_ch: int, temb_dim: int,
                    num_layers: int, *, cross_attn: bool, context_dim: int,
                    head_dim: int, add_downsample: bool, dtype=jnp.float32):
    keys = jax.random.split(key, 2 * num_layers + 1)
    params = {"resnets": []}
    if cross_attn:
        params["attentions"] = []
    for i in range(num_layers):
        rin = in_ch if i == 0 else out_ch
        params["resnets"].append(
            resnet_block_init(keys[2 * i], rin, out_ch, temb_dim, dtype))
        if cross_attn:
            params["attentions"].append(
                transformer2d_init(keys[2 * i + 1], out_ch,
                                   out_ch // head_dim, head_dim,
                                   context_dim, dtype=dtype))
    if add_downsample:
        params["downsampler"] = downsample_init(keys[-1], out_ch, dtype)
    return params


def down_block_apply(params, x, temb, context, *, head_dim: int,
                     use_flash: bool = True, num_groups: int = 32,
                     fused_conv: bool = False, zero_ctx_prefix: int = 0):
    skips = []
    attns = params.get("attentions")
    for i, resnet in enumerate(params["resnets"]):
        x = resnet_block_apply(resnet, x, temb, num_groups=num_groups,
                               fused=fused_conv)
        if attns is not None:
            heads = x.shape[-1] // head_dim
            x = transformer2d_apply(attns[i], x, context, heads=heads,
                                    use_flash=use_flash,
                                    num_groups=num_groups,
                                    zero_ctx_prefix=zero_ctx_prefix)
        skips.append(x)
    if "downsampler" in params:
        x = downsample_apply(params["downsampler"], x)
        skips.append(x)
    return x, skips


def mid_block_init(key, ch: int, temb_dim: int, *, context_dim: int,
                   head_dim: int, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "resnet1": resnet_block_init(k1, ch, ch, temb_dim, dtype),
        "attention": transformer2d_init(k2, ch, ch // head_dim, head_dim,
                                        context_dim, dtype=dtype),
        "resnet2": resnet_block_init(k3, ch, ch, temb_dim, dtype),
    }


def mid_block_apply(params, x, temb, context, *, head_dim: int,
                    use_flash: bool = True, num_groups: int = 32,
                    fused_conv: bool = False, zero_ctx_prefix: int = 0):
    x = resnet_block_apply(params["resnet1"], x, temb, num_groups=num_groups,
                           fused=fused_conv)
    heads = x.shape[-1] // head_dim
    x = transformer2d_apply(params["attention"], x, context, heads=heads,
                            use_flash=use_flash, num_groups=num_groups,
                            zero_ctx_prefix=zero_ctx_prefix)
    x = resnet_block_apply(params["resnet2"], x, temb, num_groups=num_groups,
                           fused=fused_conv)
    return x


def up_block_init(key, in_ch: int, prev_ch: int, out_ch: int, temb_dim: int,
                  num_layers: int, *, cross_attn: bool, context_dim: int,
                  head_dim: int, add_upsample: bool, dtype=jnp.float32):
    """in_ch: channels of the *skip* from the matching down level;
    prev_ch: channels coming up from the level below."""
    keys = jax.random.split(key, 2 * num_layers + 1)
    params = {"resnets": []}
    if cross_attn:
        params["attentions"] = []
    for i in range(num_layers):
        res_skip_ch = in_ch if i == num_layers - 1 else out_ch
        resnet_in = prev_ch if i == 0 else out_ch
        params["resnets"].append(
            resnet_block_init(keys[2 * i], resnet_in + res_skip_ch, out_ch,
                              temb_dim, dtype))
        if cross_attn:
            params["attentions"].append(
                transformer2d_init(keys[2 * i + 1], out_ch,
                                   out_ch // head_dim, head_dim,
                                   context_dim, dtype=dtype))
    if add_upsample:
        params["upsampler"] = upsample_init(keys[-1], out_ch, dtype)
    return params


def fourier_filter(x, threshold: int = 1, scale: float = 1.0):
    """FreeU low-frequency rescaling of skip features (NHWC): scale the
    centered ``2*threshold``-wide frequency box by ``scale``
    (/root/reference/src/pipelines/PCDMs_pipeline.py:744-769 semantics)."""
    dtype = x.dtype
    b, h, w, c = x.shape
    x_freq = jnp.fft.fftshift(jnp.fft.fftn(x.astype(jnp.float32),
                                           axes=(1, 2)), axes=(1, 2))
    mask = jnp.ones((1, h, w, 1), jnp.float32)
    ch, cw = h // 2, w // 2
    mask = mask.at[:, ch - threshold:ch + threshold,
                   cw - threshold:cw + threshold, :].set(scale)
    x_filtered = jnp.fft.ifftn(jnp.fft.ifftshift(x_freq * mask,
                                                 axes=(1, 2)),
                               axes=(1, 2)).real
    return x_filtered.astype(dtype)


def up_block_apply(params, x, skips, temb, context, *, head_dim: int,
                   use_flash: bool = True, num_groups: int = 32,
                   freeu=None, fused_conv: bool = False,
                   zero_ctx_prefix: int = 0):
    attns = params.get("attentions")
    for i, resnet in enumerate(params["resnets"]):
        skip = skips.pop()
        if freeu is not None:
            s, b = freeu
            half = x.shape[-1] // 2
            x = jnp.concatenate([x[..., :half] * b, x[..., half:]], axis=-1)
            skip = fourier_filter(skip, threshold=1, scale=s)
        x = jnp.concatenate([x, skip], axis=-1)
        x = resnet_block_apply(resnet, x, temb, num_groups=num_groups,
                               fused=fused_conv)
        if attns is not None:
            heads = x.shape[-1] // head_dim
            x = transformer2d_apply(attns[i], x, context, heads=heads,
                                    use_flash=use_flash,
                                    num_groups=num_groups,
                                    zero_ctx_prefix=zero_ctx_prefix)
    if "upsampler" in params:
        x = upsample_apply(params["upsampler"], x)
    return x
