"""Conditional 2D UNet (SD-2.1 family), functional NHWC implementation.

One parametric model covers the three reference UNet variants:

  * stage-2 inpainting UNet: in_channels=9 (4 noise + 1 mask + 4 masked
    latents), ``class_embed_proj_dim=1024`` (target CLIP embedding projected
    and added to the time embedding), and a 320-channel pose conditioning
    map added to the conv_in output
    (/root/reference/src/models/stage2_inpaint_unet_2d_condition.py:700-708,742;
     /root/reference/stage2_train_inpaint_model.py:183-185)
  * simplified demo stage-2 UNet: same but without the class embedding
    (/root/reference/pcdms_kaggle_demo.ipynb cell 15)
  * stage-3 refinement UNet: in_channels=8 (4 noise + 4 stage-2 latents),
    stock SD-2.1 otherwise (/root/reference/stage3_train_refined_model.py:165-166)

Architecture constants follow SD-2.1-base: block channels (320, 640, 1280,
1280), 2 layers/block, cross-attention dim 1024, head_dim 64, linear
transformer projections, GroupNorm(32).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcdms_tpu.nn.layers import (
    conv2d_apply, conv2d_init, group_norm_apply, group_norm_init, silu,
    timestep_embedding_apply, timestep_embedding_init,
    timestep_sinusoidal_embedding,
)
from pcdms_tpu.nn.unet_blocks import (
    PAD1, down_block_apply, down_block_init, mid_block_apply, mid_block_init,
    up_block_apply, up_block_init,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 9
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    head_dim: int = 64
    # which down blocks carry cross-attention (SD-2.1: all but the last)
    cross_attn_down: Tuple[bool, ...] = (True, True, True, False)
    class_embed_proj_dim: Optional[int] = None   # 1024 for stage-2
    norm_groups: int = 32
    use_flash: bool = True
    # rematerialize each down/mid/up block under grad (the reference's
    # enable_gradient_checkpointing; XLA recomputes activations in bwd)
    remat: bool = False
    # FreeU (s1, s2, b1, b2) applied to the first two up blocks
    # (PCDMs_pipeline.py enable_freeu equivalent); None = disabled
    freeu: Optional[Tuple[float, float, float, float]] = None
    # LCM-style guidance-scale conditioning projection dim (None = off)
    time_cond_proj_dim: Optional[int] = None
    # fuse GN+SiLU+conv3x3 resnet convs into one Pallas kernel (TPU)
    fused_conv: bool = False

    @property
    def cross_attn_up(self):
        return tuple(reversed(self.cross_attn_down))

    @property
    def time_embed_dim(self):
        return self.block_out_channels[0] * 4


def stage2_unet_config(with_class_embed: bool = True) -> UNetConfig:
    return UNetConfig(in_channels=9,
                      class_embed_proj_dim=1024 if with_class_embed else None)


def stage3_unet_config() -> UNetConfig:
    return UNetConfig(in_channels=8, class_embed_proj_dim=None)


def unet_init(key, cfg: UNetConfig, dtype=jnp.float32):
    ch0 = cfg.block_out_channels[0]
    temb_dim = cfg.time_embed_dim
    n_down = len(cfg.block_out_channels)
    keys = jax.random.split(key, 6 + 2 * n_down)

    params = {
        "time_embedding": timestep_embedding_init(
            keys[0], ch0, temb_dim, cond_proj_dim=cfg.time_cond_proj_dim,
            dtype=dtype),
        "conv_in": conv2d_init(keys[1], cfg.in_channels, ch0, 3, dtype=dtype),
        "conv_norm_out": group_norm_init(ch0, dtype),
        "conv_out": conv2d_init(keys[2], ch0, cfg.out_channels, 3, dtype=dtype),
    }
    if cfg.class_embed_proj_dim is not None:
        params["class_embedding"] = timestep_embedding_init(
            keys[3], cfg.class_embed_proj_dim, temb_dim, dtype=dtype)

    # down
    params["down_blocks"] = []
    in_ch = ch0
    for i, out_ch in enumerate(cfg.block_out_channels):
        is_final = i == n_down - 1
        params["down_blocks"].append(down_block_init(
            keys[4 + i], in_ch, out_ch, temb_dim, cfg.layers_per_block,
            cross_attn=cfg.cross_attn_down[i],
            context_dim=cfg.cross_attention_dim, head_dim=cfg.head_dim,
            add_downsample=not is_final, dtype=dtype))
        in_ch = out_ch

    # mid
    params["mid_block"] = mid_block_init(
        keys[4 + n_down], cfg.block_out_channels[-1], temb_dim,
        context_dim=cfg.cross_attention_dim, head_dim=cfg.head_dim,
        dtype=dtype)

    # up
    params["up_blocks"] = []
    rev = tuple(reversed(cfg.block_out_channels))
    prev_ch = rev[0]
    for i in range(n_down):
        out_ch = rev[i]
        skip_in_ch = rev[min(i + 1, n_down - 1)]
        is_final = i == n_down - 1
        params["up_blocks"].append(up_block_init(
            keys[5 + n_down + i], skip_in_ch, prev_ch, out_ch, temb_dim,
            cfg.layers_per_block + 1, cross_attn=cfg.cross_attn_up[i],
            context_dim=cfg.cross_attention_dim, head_dim=cfg.head_dim,
            add_upsample=not is_final, dtype=dtype))
        prev_ch = out_ch

    return params


def unet_time_embedding(params, cfg: UNetConfig, timesteps,
                        class_labels=None, timestep_cond=None,
                        dtype=jnp.float32):
    """Time (+ optional class-projection) embedding — the per-step scalar
    conditioning shared by the encoder and decoder halves."""
    ch0 = cfg.block_out_channels[0]
    t_emb = timestep_sinusoidal_embedding(timesteps, ch0).astype(dtype)
    emb = timestep_embedding_apply(params["time_embedding"], t_emb,
                                   condition=timestep_cond)
    if "class_embedding" in params:
        if class_labels is None:
            raise ValueError("this UNet requires class_labels")
        if class_labels.ndim == 3:
            class_labels = class_labels[:, 0, :]
        emb = emb + timestep_embedding_apply(params["class_embedding"],
                                             class_labels.astype(dtype))
    return emb


def unet_apply(params, cfg: UNetConfig, sample, timesteps,
               encoder_hidden_states, class_labels=None, pose_cond=None,
               timestep_cond=None, zero_ctx_prefix: int = 0):
    """Predict noise (or v).

    sample: (B, H, W, in_channels) latents, NHWC.
    timesteps: (B,) int/float.
    encoder_hidden_states: (B, L, cross_attention_dim).
    class_labels: (B, class_embed_proj_dim) or (B, 1, D) — stage-2 target
        CLIP embedding, projected and added to the time embedding.
    pose_cond: (B, H, W, ch0) — added to the conv_in output (the reference's
        ``my_pose_cond`` ControlNet-style injection).
    zero_ctx_prefix: first N batch items have an all-zero
        encoder_hidden_states (CFG uncond half) — their cross-attention
        is computed analytically (see nn/transformer.py).

    Composition of ``unet_time_embedding`` -> ``unet_encode`` ->
    ``unet_decode`` (the split exists for encoder-propagation sampling,
    arXiv 2312.09608; calling them in sequence is bit-identical to the
    monolithic forward).
    """
    dtype = sample.dtype
    emb = unet_time_embedding(params, cfg, timesteps,
                              class_labels=class_labels,
                              timestep_cond=timestep_cond, dtype=dtype)
    ctx = encoder_hidden_states.astype(dtype)
    x, skips = unet_encode(params, cfg, sample, emb, ctx,
                           pose_cond=pose_cond,
                           zero_ctx_prefix=zero_ctx_prefix)
    return unet_decode(params, cfg, x, skips, emb, ctx,
                       zero_ctx_prefix=zero_ctx_prefix)


def unet_encode(params, cfg: UNetConfig, sample, emb, ctx,
                pose_cond=None, zero_ctx_prefix: int = 0):
    """conv_in + pose injection + down blocks + mid block.

    Returns ``(x_mid, skips)`` where skips is the tuple of residual
    tensors the decoder consumes (fixed structure — usable as a
    ``lax.scan`` carry for feature caching)."""
    dtype = sample.dtype

    x = conv2d_apply(params["conv_in"], sample, padding=PAD1)
    if pose_cond is not None:
        x = x + pose_cond.astype(dtype)

    def down_fn(block, x, emb, ctx):
        return down_block_apply(block, x, emb, ctx, head_dim=cfg.head_dim,
                                use_flash=cfg.use_flash,
                                num_groups=cfg.norm_groups,
                                fused_conv=cfg.fused_conv,
                                zero_ctx_prefix=zero_ctx_prefix)

    def mid_fn(block, x, emb, ctx):
        return mid_block_apply(block, x, emb, ctx, head_dim=cfg.head_dim,
                               use_flash=cfg.use_flash,
                               num_groups=cfg.norm_groups,
                               fused_conv=cfg.fused_conv,
                               zero_ctx_prefix=zero_ctx_prefix)

    if cfg.remat:
        down_fn = jax.checkpoint(down_fn)
        mid_fn = jax.checkpoint(mid_fn)

    skips = [x]
    for block in params["down_blocks"]:
        x, block_skips = down_fn(block, x, emb, ctx)
        skips.extend(block_skips)

    x = mid_fn(params["mid_block"], x, emb, ctx)
    return x, tuple(skips)


def unet_decode(params, cfg: UNetConfig, x, skips, emb, ctx,
                zero_ctx_prefix: int = 0):
    """Up blocks + output head, consuming ``unet_encode``'s (x, skips)."""

    def up_fn(block, x, block_skips, emb, ctx, freeu=None):
        return up_block_apply(block, x, block_skips, emb, ctx,
                              head_dim=cfg.head_dim,
                              use_flash=cfg.use_flash,
                              num_groups=cfg.norm_groups, freeu=freeu,
                              fused_conv=cfg.fused_conv,
                              zero_ctx_prefix=zero_ctx_prefix)

    if cfg.remat:
        up_fn = jax.checkpoint(up_fn)

    skips = list(skips)
    for bi, block in enumerate(params["up_blocks"]):
        n = len(block["resnets"])
        block_skips = skips[-n:]
        del skips[-n:]
        freeu = None
        if cfg.freeu is not None and bi < 2:
            s1, s2, b1, b2 = cfg.freeu
            freeu = (s1, b1) if bi == 0 else (s2, b2)
        x = up_fn(block, x, block_skips, emb, ctx, freeu)

    x = silu(group_norm_apply(params["conv_norm_out"], x,
                          cfg.norm_groups, 1e-5))
    x = conv2d_apply(params["conv_out"], x, padding=PAD1)
    return x
