"""Transformer building blocks (functional).

Equivalent in behavior to the diffusers ``BasicTransformerBlock`` stack the
reference builds on (/root/reference/src/models/stage1_prior_transformer.py:108-120
and the SD-2.1 UNet's Transformer2D blocks), re-expressed as param pytrees +
apply fns with the attention inner loop routed through the Pallas flash
attention kernel (pcdms_tpu/ops/flash_attention.py).

Pre-norm layout:  x += attn1(norm1(x));  [x += attn2(norm2(x), ctx)];
                  x += ff(norm3(x))
FF is GEGLU (SD UNet) or plain GELU (prior transformer, activation_fn='gelu').
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcdms_tpu.nn.layers import (
    gelu, layer_norm_apply, layer_norm_init, linear_apply, linear_init,
)
from pcdms_tpu.ops.flash_attention import flash_attention


# ---------------------------------------------------------------------------
# multi-head attention
# ---------------------------------------------------------------------------

def attention_init(key, query_dim: int, heads: int, head_dim: int,
                   context_dim: Optional[int] = None,
                   qkv_bias: bool = False, dtype=jnp.float32):
    inner = heads * head_dim
    ctx = context_dim if context_dim is not None else query_dim
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "to_q": linear_init(kq, query_dim, inner, use_bias=qkv_bias, dtype=dtype),
        "to_k": linear_init(kk, ctx, inner, use_bias=qkv_bias, dtype=dtype),
        "to_v": linear_init(kv, ctx, inner, use_bias=qkv_bias, dtype=dtype),
        "to_out": linear_init(ko, inner, query_dim, use_bias=True, dtype=dtype),
    }


def _fused_proj(plist, x):
    """Apply several Linear layers sharing the same input as ONE matmul.

    The param pytree keeps separate to_q/to_k/to_v entries (checkpoint
    parity with the reference's diffusers layout), but at apply time the
    kernels are concatenated along the output dim — the reference's
    ``fuse_qkv_projections`` (/root/reference/src/pipelines/PCDMs_pipeline.py:771-830)
    done the XLA way: the concat of loop-invariant params is hoisted out
    of the sampling scan, and the single (C, k*inner) matmul fills the
    MXU better than k separate (C, inner) matmuls.
    """
    kernel = jnp.concatenate([p["kernel"] for p in plist], axis=1)
    y = x @ kernel.astype(x.dtype)
    if "bias" in plist[0]:
        bias = jnp.concatenate([p["bias"] for p in plist], axis=0)
        y = y + bias.astype(x.dtype)
    return jnp.split(y, len(plist), axis=-1)


def attention_apply(params, x, context=None, *, heads: int,
                    use_flash: bool = True):
    """x: (B, Lq, C); context: (B, Lk, Cctx) or None for self-attention."""
    ctx = x if context is None else context
    b, lq, _ = x.shape
    lk = ctx.shape[1]

    # fused projections need uniform bias-ness (always true here: q/k/v
    # share the qkv_bias flag at init and in every converted checkpoint)
    fuse = (("bias" in params["to_q"]) == ("bias" in params["to_k"])
            == ("bias" in params["to_v"]))
    if context is None and fuse:
        q, k, v = _fused_proj(
            [params["to_q"], params["to_k"], params["to_v"]], x)
    elif fuse:
        q = linear_apply(params["to_q"], x)
        k, v = _fused_proj([params["to_k"], params["to_v"]], ctx)
    else:
        q = linear_apply(params["to_q"], x)
        k = linear_apply(params["to_k"], ctx)
        v = linear_apply(params["to_v"], ctx)

    if use_flash:
        attn_fn = flash_attention
    else:
        from pcdms_tpu.ops.flash_attention import attention_reference
        attn_fn = attention_reference
    head_dim = q.shape[-1] // heads
    qh = q.reshape(b, lq, heads, head_dim).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, heads, head_dim).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, heads, head_dim).transpose(0, 2, 1, 3)
    o = attn_fn(qh, kh, vh).transpose(0, 2, 1, 3)
    o = o.reshape(b, lq, heads * head_dim)

    return linear_apply(params["to_out"], o)


# ---------------------------------------------------------------------------
# feed-forward (GEGLU / GELU)
# ---------------------------------------------------------------------------

def feed_forward_init(key, dim: int, mult: int = 4, geglu: bool = True,
                      dtype=jnp.float32):
    inner = dim * mult
    k1, k2 = jax.random.split(key)
    proj_dim = inner * 2 if geglu else inner
    return {
        "proj_in": linear_init(k1, dim, proj_dim, dtype=dtype),
        "proj_out": linear_init(k2, inner, dim, dtype=dtype),
    }


def feed_forward_apply(params, x):
    # GEGLU iff proj_in produces twice the FF inner width (static shape check,
    # so the pytree stays arrays-only and jit/optax-friendly).
    geglu = params["proj_in"]["kernel"].shape[1] == \
        2 * params["proj_out"]["kernel"].shape[0]
    h = linear_apply(params["proj_in"], x)
    if geglu:
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * gelu(gate)
    else:
        h = gelu(h)
    return linear_apply(params["proj_out"], h)


# ---------------------------------------------------------------------------
# transformer block
# ---------------------------------------------------------------------------

def transformer_block_init(key, dim: int, heads: int, head_dim: int,
                           context_dim: Optional[int] = None,
                           qkv_bias: bool = False, geglu: bool = True,
                           dtype=jnp.float32):
    """One pre-norm block. context_dim=None -> self-attention only."""
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "norm1": layer_norm_init(dim, dtype),
        "attn1": attention_init(k1, dim, heads, head_dim, qkv_bias=qkv_bias,
                                dtype=dtype),
        "norm3": layer_norm_init(dim, dtype),
        "ff": feed_forward_init(k3, dim, geglu=geglu, dtype=dtype),
    }
    if context_dim is not None:
        params["norm2"] = layer_norm_init(dim, dtype)
        params["attn2"] = attention_init(k2, dim, heads, head_dim,
                                         context_dim=context_dim,
                                         qkv_bias=qkv_bias, dtype=dtype)
    return params


def transformer_block_apply(params, x, context=None, *, heads: int,
                            use_flash: bool = True,
                            zero_ctx_prefix: int = 0):
    """zero_ctx_prefix: the first N batch items are known to carry an
    all-zero cross-attention context (the CFG unconditional half). With
    bias-free k/v projections, attention over a zero context is exactly
    the to_out bias — softmax is uniform and every v row is 0 — so the
    cross-attention compute is skipped for those items."""
    h = layer_norm_apply(params["norm1"], x)
    x = x + attention_apply(params["attn1"], h, heads=heads,
                            use_flash=use_flash)
    if "attn2" in params:
        h = layer_norm_apply(params["norm2"], x)
        attn2 = params["attn2"]
        shortcut = (zero_ctx_prefix > 0 and context is not None
                    and "bias" not in attn2["to_k"]
                    and "bias" not in attn2["to_v"])
        if shortcut:
            u = zero_ctx_prefix
            cond = attention_apply(attn2, h[u:], context[u:], heads=heads,
                                   use_flash=use_flash)
            bias = attn2["to_out"].get("bias")
            if bias is None:
                uncond = jnp.zeros((u,) + x.shape[1:], x.dtype)
            else:
                uncond = jnp.broadcast_to(bias.astype(x.dtype),
                                          (u,) + x.shape[1:])
            x = x + jnp.concatenate([uncond, cond], axis=0)
        else:
            x = x + attention_apply(attn2, h, context, heads=heads,
                                    use_flash=use_flash)
    h = layer_norm_apply(params["norm3"], x)
    x = x + feed_forward_apply(params["ff"], h)
    return x
