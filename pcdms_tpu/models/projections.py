"""Conditioning projection modules.

* ``image_proj_mlp``: the reference's ``ImageProjModel_p`` / ``ImageProjModel_g``
  (/root/reference/stage2_train_inpaint_model.py:36-70): Linear -> GELU ->
  LayerNorm -> Linear, projecting DINOv2 patch features (1536) to the UNet
  cross-attention width (1024). (Dropout is identity at inference; training
  passes deterministic=False upstream if ever enabled — the reference uses
  dropout=0.)

* ``pose_cond_embedding``: ControlNet-style conditioning encoder
  (diffusers ``ControlNetConditioningEmbedding`` with
  conditioning_embedding_channels=320, block_out_channels=(16, 32, 96, 256),
  /root/reference/stage2_train_inpaint_model.py:79-82): maps the rendered
  [source pose | target pose] skeleton image (H, 2W, 3) to a 320-channel
  feature map at 1/8 resolution, added to the UNet conv_in output. The final
  conv is zero-initialized.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pcdms_tpu.nn.layers import (
    conv2d_apply, conv2d_init, gelu, layer_norm_apply, layer_norm_init,
    linear_apply, linear_init, silu,
)
from pcdms_tpu.nn.unet_blocks import PAD1


def image_proj_mlp_init(key, in_dim: int = 1536, hidden_dim: int = 768,
                        out_dim: int = 1024, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, in_dim, hidden_dim, dtype=dtype),
        "norm": layer_norm_init(hidden_dim, dtype),
        "fc2": linear_init(k2, hidden_dim, out_dim, dtype=dtype),
    }


def image_proj_mlp_apply(params, x):
    x = layer_norm_apply(params["norm"], gelu(linear_apply(params["fc1"], x)))
    return linear_apply(params["fc2"], x)


def pose_cond_embedding_init(key, out_channels: int = 320,
                             block_out_channels: Tuple[int, ...] = (16, 32, 96, 256),
                             in_channels: int = 3, dtype=jnp.float32):
    n = len(block_out_channels)
    keys = jax.random.split(key, 2 * n + 1)
    params = {
        "conv_in": conv2d_init(keys[0], in_channels, block_out_channels[0],
                               3, dtype=dtype),
        "blocks": [],
        "conv_out": conv2d_init(keys[-1], block_out_channels[-1],
                                out_channels, 3, dtype=dtype, zero_init=True),
    }
    for i in range(n - 1):
        cin, cout = block_out_channels[i], block_out_channels[i + 1]
        params["blocks"].append(
            conv2d_init(keys[1 + 2 * i], cin, cin, 3, dtype=dtype))
        params["blocks"].append(
            conv2d_init(keys[2 + 2 * i], cin, cout, 3, dtype=dtype))
    return params


def pose_cond_embedding_apply(params, x):
    """x: (B, H, W, 3) skeleton render in [-1, 1] -> (B, H/8, W/8, 320)."""
    h = silu(conv2d_apply(params["conv_in"], x, padding=PAD1))
    for i, block in enumerate(params["blocks"]):
        stride = 2 if i % 2 == 1 else 1
        h = silu(conv2d_apply(block, h, stride=stride, padding=PAD1))
    return conv2d_apply(params["conv_out"], h, padding=PAD1)
