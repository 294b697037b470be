"""Vision transformer encoders for the frozen conditioning models.

One configurable functional ViT covers both frozen encoders the reference
loads from HuggingFace (SURVEY.md §2.2):

  * OpenCLIP ViT-H/14 vision tower (``CLIPVisionModelWithProjection``):
    global 1024-d image embeddings for stages 1 & 2
    (/root/reference/stage1_train_prior_model.py:108;
     /root/reference/stage2_train_inpaint_model.py:179).
    pre-LayerNorm, exact-gelu MLP, projection head on the post-LN CLS token.
  * DINOv2-giant (``Dinov2Model``): 257x1536 patch features of the source
    image for stages 2 & 3 (/root/reference/stage2_train_inpaint_model.py:178).
    LayerScale residual scaling, SwiGLU FFN, no pre-LN, final LayerNorm.

Both run jit-compiled forward-only on device (the reference runs them under
``no_grad`` inside the train loop); position embeddings are bicubic-
interpolated at load time when the input resolution differs from the
pretraining grid (DINOv2: 518 -> 224).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from pcdms_tpu.nn.layers import (
    gelu, layer_norm_apply, layer_norm_init, linear_apply, linear_init,
)
from pcdms_tpu.ops.flash_attention import attention_reference, flash_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-5
    pre_layernorm: bool = True        # CLIP: LN right after embeddings
    use_layer_scale: bool = False     # DINOv2
    use_swiglu: bool = False          # DINOv2-giant
    quick_gelu: bool = False          # some CLIP variants
    projection_dim: Optional[int] = None   # CLIP head: 1024
    patch_bias: bool = True           # CLIP: False, DINOv2: True
    use_flash: bool = True

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def mlp_hidden(self):
        if self.use_swiglu:
            # HF Dinov2SwiGLUFFN: 2/3 * 4 * D rounded up to a multiple of 8
            h = int(self.hidden_size * self.mlp_ratio * 2 / 3)
            return ((h + 7) // 8) * 8
        return int(self.hidden_size * self.mlp_ratio)


def clip_vit_h14_config(use_flash: bool = True) -> ViTConfig:
    return ViTConfig(hidden_size=1280, num_layers=32, num_heads=16,
                     patch_size=14, image_size=224, projection_dim=1024,
                     pre_layernorm=True, patch_bias=False,
                     use_flash=use_flash)


def dinov2_giant_config(image_size: int = 224,
                        use_flash: bool = True) -> ViTConfig:
    return ViTConfig(hidden_size=1536, num_layers=40, num_heads=24,
                     patch_size=14, image_size=image_size,
                     layer_norm_eps=1e-6, pre_layernorm=False,
                     use_layer_scale=True, use_swiglu=True, patch_bias=True,
                     use_flash=use_flash)


def _layer_init(key, cfg: ViTConfig, dtype):
    d, h = cfg.hidden_size, cfg.mlp_hidden
    kq, kk, kv, ko, k1, k2 = jax.random.split(key, 6)
    p = {
        "norm1": layer_norm_init(d, dtype),
        "attn": {
            "to_q": linear_init(kq, d, d, dtype=dtype),
            "to_k": linear_init(kk, d, d, dtype=dtype),
            "to_v": linear_init(kv, d, d, dtype=dtype),
            "to_out": linear_init(ko, d, d, dtype=dtype),
        },
        "norm2": layer_norm_init(d, dtype),
    }
    if cfg.use_swiglu:
        p["mlp"] = {
            "weights_in": linear_init(k1, d, 2 * h, dtype=dtype),
            "weights_out": linear_init(k2, h, d, dtype=dtype),
        }
    else:
        p["mlp"] = {
            "fc1": linear_init(k1, d, h, dtype=dtype),
            "fc2": linear_init(k2, h, d, dtype=dtype),
        }
    if cfg.use_layer_scale:
        p["ls1"] = jnp.ones((d,), dtype)
        p["ls2"] = jnp.ones((d,), dtype)
    return p


def vit_init(key, cfg: ViTConfig, dtype=jnp.float32):
    d = cfg.hidden_size
    keys = jax.random.split(key, cfg.num_layers + 4)
    params = {
        "cls_token": jnp.zeros((1, 1, d), dtype),
        "patch_embed": {
            "kernel": jax.random.normal(
                keys[0], (cfg.patch_size, cfg.patch_size, 3, d), dtype) * 0.02,
        },
        "pos_embed": jax.random.normal(
            keys[1], (1, cfg.num_patches + 1, d), dtype) * 0.02,
        "layers": [_layer_init(keys[3 + i], cfg, dtype)
                   for i in range(cfg.num_layers)],
        "final_norm": layer_norm_init(d, dtype),
    }
    if cfg.patch_bias:
        params["patch_embed"]["bias"] = jnp.zeros((d,), dtype)
    if cfg.pre_layernorm:
        params["pre_norm"] = layer_norm_init(d, dtype)
    if cfg.projection_dim is not None:
        params["projection"] = linear_init(keys[2], d, cfg.projection_dim,
                                           use_bias=False, dtype=dtype)
    return params


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _mlp_apply(p, x, cfg: ViTConfig):
    if cfg.use_swiglu:
        h = linear_apply(p["weights_in"], x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        return linear_apply(p["weights_out"], jax.nn.silu(x1) * x2)
    act = _quick_gelu if cfg.quick_gelu else gelu
    return linear_apply(p["fc2"], act(linear_apply(p["fc1"], x)))


def _attn_apply(p, x, cfg: ViTConfig):
    b, l, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    q = linear_apply(p["to_q"], x).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
    k = linear_apply(p["to_k"], x).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
    v = linear_apply(p["to_v"], x).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
    if cfg.use_flash:
        o = flash_attention(q, k, v)
    else:
        o = attention_reference(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
    return linear_apply(p["to_out"], o)


def vit_apply(params, cfg: ViTConfig, pixels):
    """pixels: (B, H, W, 3), already model-normalized.

    Returns {"last_hidden_state": (B, 1+N, D),
             "pooled": (B, D),               # post-LN CLS token
             "image_embeds": (B, proj_dim)}  # if projection head present
    """
    dtype = pixels.dtype
    b = pixels.shape[0]
    eps = cfg.layer_norm_eps

    patches = jax.lax.conv_general_dilated(
        pixels, params["patch_embed"]["kernel"].astype(dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in params["patch_embed"]:
        patches = patches + params["patch_embed"]["bias"].astype(dtype)
    gh, gw = patches.shape[1], patches.shape[2]
    tokens = patches.reshape(b, gh * gw, cfg.hidden_size)

    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, tokens], axis=1)

    pos = interpolate_pos_embed(params["pos_embed"], gh, gw).astype(dtype)
    x = x + pos

    if "pre_norm" in params:
        x = layer_norm_apply(params["pre_norm"], x, eps)

    for layer in params["layers"]:
        h = _attn_apply(layer["attn"],
                        layer_norm_apply(layer["norm1"], x, eps), cfg)
        if "ls1" in layer:
            h = h * layer["ls1"].astype(dtype)
        x = x + h
        h = _mlp_apply(layer["mlp"],
                       layer_norm_apply(layer["norm2"], x, eps), cfg)
        if "ls2" in layer:
            h = h * layer["ls2"].astype(dtype)
        x = x + h

    out = {}
    if cfg.pre_layernorm:
        # CLIP: final LN applies to the pooled CLS token only
        out["last_hidden_state"] = x
        pooled = layer_norm_apply(params["final_norm"], x[:, 0], eps)
    else:
        # DINOv2: final LN applies to the whole sequence
        x = layer_norm_apply(params["final_norm"], x, eps)
        out["last_hidden_state"] = x
        pooled = x[:, 0]
    out["pooled"] = pooled
    if "projection" in params:
        out["image_embeds"] = linear_apply(params["projection"], pooled)
    return out


def interpolate_pos_embed(pos_embed, grid_h: int, grid_w: int):
    """Bicubic-resize patch position embeddings to a new grid (HF
    ``Dinov2Embeddings.interpolate_pos_encoding`` equivalent)."""
    n = pos_embed.shape[1] - 1
    src = int(round(n ** 0.5))
    if src * src == n and (grid_h, grid_w) == (src, src):
        return pos_embed
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:].reshape(1, src, src, -1)
    resized = jax.image.resize(
        patch_pos.astype(jnp.float32), (1, grid_h, grid_w,
                                        patch_pos.shape[-1]),
        method="bicubic").astype(pos_embed.dtype)
    resized = resized.reshape(1, grid_h * grid_w, -1)
    return jnp.concatenate([cls_pos, resized], axis=1)
