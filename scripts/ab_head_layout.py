"""A/B the head-split layout around the flash attention kernel.

The current `attention_apply` (pcdms_tpu/nn/transformer.py) materializes
four explicit head transposes per call: q/k/v `(B,L,H*D)->(B,H,L,D)` and
the output back. At CFG batch 16 / level-0 shape each of those tensors is
~84 MB, so the transposes alone move ~0.7 GB/call of HBM traffic — part
of the non-attention glue flagged by the round-3 MFU analysis.

Candidate: fold the head split INTO the projection contractions —
`einsum('blc,chd->bhld')` with the (C, k*H*D) fused kernel reshaped to
(C, k*H, D) — so the matmul writes head-major directly (XLA fuses the
relayout into the dot's output epilogue), and contract the output
projection straight from head-major (`einsum('bhld,hdc->blc')`).

Times both variants (self + cross attention per UNet level shape) with
the scan-in-one-jit harness; per-iter numbers carry ~2.3 ms of harness
overhead each, identical across variants, so the DELTA is the signal.

Run on the chip:  python scripts/ab_head_layout.py
"""

import functools
import math
import os
import time

import jax
import jax.numpy as jnp

from pcdms_tpu.nn.layers import linear_init
from pcdms_tpu.nn.transformer import attention_apply, attention_init
from pcdms_tpu.ops.flash_attention import flash_attention
from pcdms_tpu.utils.tree import cast_pytree

B = int(os.environ.get("AB_BATCH", "16"))   # CFG batch (8 imgs x 2)
CTX_L = 258
CTX_DIM = 1024


def time_scan(name, f, x, iters):
    @jax.jit
    def run(x0):
        def body(c, _):
            y = f(c)
            return c + jnp.mean(y).astype(c.dtype) * 1e-12, None
        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    t0 = time.perf_counter()
    float(run(x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"  {name}: {dt * 1e3:.2f}ms/iter (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def folded_attention(params, x, context=None, *, heads: int):
    """Head-major einsum variant of attention_apply (numerics-identical
    contraction order; layout differs only in how XLA schedules it)."""
    ctx = x if context is None else context
    b, lq, c = x.shape
    lk = ctx.shape[1]
    d = params["to_q"]["kernel"].shape[1] // heads

    def fold(plist, inp):
        kern = jnp.concatenate([p["kernel"] for p in plist], axis=1)
        k3 = kern.reshape(c if inp is x else ctx.shape[-1],
                          len(plist) * heads, d).astype(inp.dtype)
        y = jnp.einsum("blc,chd->bhld", inp, k3)
        if "bias" in plist[0]:
            bias = jnp.concatenate([p["bias"] for p in plist], axis=0)
            y = y + bias.reshape(len(plist) * heads, 1, d).astype(inp.dtype)
        return jnp.split(y, len(plist), axis=1)

    if context is None:
        q, k, v = fold(
            [params["to_q"], params["to_k"], params["to_v"]], x)
    else:
        (q,) = fold([params["to_q"]], x)
        k, v = fold([params["to_k"], params["to_v"]], ctx)

    o = flash_attention(q, k, v)
    wo = params["to_out"]["kernel"].reshape(heads, d, c)
    out = jnp.einsum("bhld,hdc->blc", o, wo.astype(o.dtype))
    return out + params["to_out"]["bias"].astype(o.dtype)


def main():
    print(f"backend={jax.default_backend()} batch={B}", flush=True)
    key = jax.random.PRNGKey(0)
    levels = [(8192, 320, 5), (2048, 640, 10), (512, 1280, 20)]
    iters = 16

    for lq, c, heads in levels:
        print(f"level L={lq} C={c} H={heads}:", flush=True)
        params = cast_pytree(
            attention_init(key, c, heads, c // heads), jnp.bfloat16)
        xparams = cast_pytree(
            attention_init(key, c, heads, c // heads, context_dim=CTX_DIM),
            jnp.bfloat16)
        x = jax.random.normal(key, (B, lq, c), jnp.bfloat16)
        ctx = jax.random.normal(key, (B, CTX_L, CTX_DIM), jnp.bfloat16)

        # parity first (f32 tolerance on bf16 compute)
        ref = attention_apply(params, x, heads=heads)
        got = folded_attention(params, x, heads=heads)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
        print(f"  self parity max rel err {err / scale:.2e}", flush=True)

        t_cur = time_scan("self current", functools.partial(
            attention_apply, params, heads=heads), x, iters)
        t_new = time_scan("self folded ", functools.partial(
            folded_attention, params, heads=heads), x, iters)
        print(f"  self delta {100 * (t_cur - t_new) / t_cur:+.1f}%",
              flush=True)

        t_cur = time_scan("cross current", lambda x: attention_apply(
            xparams, x, ctx, heads=heads), x, iters)
        t_new = time_scan("cross folded ", lambda x: folded_attention(
            xparams, x, ctx, heads=heads), x, iters)
        print(f"  cross delta {100 * (t_cur - t_new) / t_cur:+.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
