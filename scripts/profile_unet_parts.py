"""Decompose the stage-2 UNet step cost on the real chip.

Times each component family in a lax.scan inside ONE jit (per-call tunnel
overhead ~25ms, so small ops must be looped on device), synchronizing via
a single scalar read (see pcdms_tpu/utils/profiling.py).

Variants (select with PROFILE_PARTS, comma-separated; default all):
  matmul   - bf16 4096^3 sanity (should be ~190 TF/s marginal on v5e)
  conv     - raw 3x3 bf16 convs at the three UNet level shapes
  gn       - GroupNorm+SiLU at level-0 shape
  attn     - one transformer2d block per level shape (self+cross+geglu)
  unet     - full stage-2 UNet eval, CFG batch 8
  noattn   - same with transformer2d stubbed to identity

Prints ms/iteration and implied TF/s where meaningful.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp

from pcdms_tpu.models.unet2d import stage2_unet_config, unet_init, unet_apply
from pcdms_tpu.nn import unet_blocks
from pcdms_tpu.nn.layers import (
    conv2d_init, conv2d_apply, group_norm_init, group_norm_apply, silu,
)
from pcdms_tpu.nn.unet_blocks import transformer2d_init, transformer2d_apply
from pcdms_tpu.utils.tree import cast_pytree

PARTS = os.environ.get(
    "PROFILE_PARTS", "matmul,conv,gn,attn,unet,noattn").split(",")
B = int(os.environ.get("PROFILE_BATCH", "8"))     # CFG batch (4 imgs x 2)


def time_scan(name, f, x, iters, flops=None, bytes_moved=None):
    """Time iters sequential applications of f inside one jit."""

    @jax.jit
    def run(x0):
        def body(c, _):
            y = f(c)
            # serialize iterations through a scalar data dependency
            return c + jnp.mean(y).astype(c.dtype) * 1e-12, None
        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    t0 = time.perf_counter()
    float(run(x))                     # compile + warmup
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / iters
    msg = f"{name}: {dt * 1e3:.2f}ms/iter (compile {compile_s:.0f}s)"
    if flops:
        msg += f"  {flops / dt / 1e12:.1f} TF/s"
    if bytes_moved:
        msg += f"  {bytes_moved / dt / 1e9:.0f} GB/s"
    print(msg, flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()} batch={B}", flush=True)
    key = jax.random.PRNGKey(0)

    if "matmul" in PARTS:
        n = 4096
        a = jax.random.normal(key, (n, n), jnp.bfloat16)

        def mm(x):
            return jax.lax.dot(x, x, precision=None,
                               preferred_element_type=jnp.bfloat16)

        time_scan("matmul 4096^3 bf16", mm, a, 32, flops=2 * n ** 3)

    # UNet level shapes (latent 64x128 for the 512x1024 canvas)
    levels = [(64, 128, 320), (32, 64, 640), (16, 32, 1280)]

    if "noop" in PARTS:
        # measures the timing harness's own carry-chain cost per iter
        h, w, c = levels[0]
        x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)
        time_scan("noop (carry-chain only)", lambda x: x, x, 16,
                  bytes_moved=2 * x.size * 2)

    if "hbm" in PARTS:
        x = jax.random.normal(key, (64 * 1024 * 1024 // 2,), jnp.bfloat16)
        time_scan("hbm copy 64MB", lambda x: x + 1.0, x, 16,
                  bytes_moved=2 * x.size * 2)

    if "conv" in PARTS:
        for h, w, c in levels:
            p = cast_pytree(conv2d_init(key, c, c, 3), jnp.bfloat16)
            x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)
            f = functools.partial(conv2d_apply, p, padding=[(1, 1), (1, 1)])
            fl = 2 * B * h * w * c * c * 9
            time_scan(f"conv3x3 {h}x{w}x{c}", f, x, 16, flops=fl)

    if "fconv" in PARTS:
        from pcdms_tpu.ops.fused_conv import gn_silu_conv3x3
        for h, w, c in levels:
            p = cast_pytree(conv2d_init(key, c, c, 3), jnp.bfloat16)
            gn = group_norm_init(c)
            x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)

            def f(x, p=p, gn=gn):
                return gn_silu_conv3x3(x, gn["scale"], gn["bias"],
                                       p["kernel"], p["bias"],
                                       num_groups=32)

            fl = 2 * B * h * w * c * c * 9
            time_scan(f"fused gn+silu+conv {h}x{w}x{c}", f, x, 16, flops=fl)

    if "gn" in PARTS:
        h, w, c = levels[0]
        p = group_norm_init(c)
        x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)

        def f(x):
            return silu(group_norm_apply(p, x, 32, 1e-5))

        time_scan(f"gn+silu {h}x{w}x{c}", f, x, 16,
                  bytes_moved=2 * x.size * 2)

    if "attnsweep" in PARTS:
        # flash kernel block-size sweep at the level-0 self-attn shape
        from pcdms_tpu.ops.flash_attention import _flash_attention_3d
        bh, l, d = B * 5, 8192, 64
        q = jax.random.normal(key, (bh, l, d), jnp.bfloat16)
        fl = 4 * bh * l * l * d
        # (block_q, block_k, q_unroll, frozen_max)
        for bq, bk, qu, fz in ((1024, 2048, 1, False),
                               (1024, 2048, 2, False),
                               (1024, 2048, 1, True),
                               (1024, 2048, 2, True),
                               (512, 2048, 2, True),
                               (512, 2048, 4, True),
                               (1024, 4096, 1, True),
                               (1024, 4096, 2, True),
                               (2048, 2048, 1, True),
                               (2048, 2048, 2, True),
                               (1024, 1024, 2, True)):
            def f(x, bq=bq, bk=bk, qu=qu, fz=fz):
                return _flash_attention_3d(x, x, x, 0.125, bq, bk, False,
                                           q_unroll=qu, frozen_max=fz)
            tag = (f" qu{qu}" if qu > 1 else "") + (" frozen" if fz else "")
            try:
                time_scan(f"flash bq{bq} bk{bk}{tag}", f, q, 8, flops=fl)
            except Exception as e:  # VMEM overflow etc.
                print(f"flash bq{bq} bk{bk}{tag}: FAILED {type(e).__name__}",
                      flush=True)

    if "resnet" in PARTS:
        from pcdms_tpu.nn.unet_blocks import (
            resnet_block_init, resnet_block_apply,
        )
        temb = jax.random.normal(key, (B, 1280), jnp.bfloat16)
        for h, w, c in levels:
            p = cast_pytree(resnet_block_init(key, c, c, 1280), jnp.bfloat16)
            x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)
            f = functools.partial(resnet_block_apply, p, temb=temb)
            fl = 2 * 2 * B * h * w * c * c * 9
            time_scan(f"resnet {h}x{w}x{c}", f, x, 16, flops=fl)

    if "concat" in PARTS:
        # up-block skip concat: concat(x, skip) -> conv  VS  the
        # mathematically identical split conv_a(x) + conv_b(skip)
        # (avoids materializing the 2c-channel concat tensor in HBM)
        for h, w, c in levels:
            p = cast_pytree(conv2d_init(key, 2 * c, c, 3), jnp.bfloat16)
            ka, kb = jnp.split(p["kernel"], 2, axis=2)
            x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)
            fl = 2 * B * h * w * 2 * c * c * 9

            def f_cat(x, p=p):
                return conv2d_apply(p, jnp.concatenate([x, x], axis=-1),
                                    padding=[(1, 1), (1, 1)])

            def f_split(x, ka=ka, kb=kb, bias=p["bias"]):
                ya = jax.lax.conv_general_dilated(
                    x, ka, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                yb = jax.lax.conv_general_dilated(
                    x, kb, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return ya + yb + bias

            time_scan(f"concat+conv {h}x{w}x{c}", f_cat, x, 16, flops=fl)
            time_scan(f"split-conv  {h}x{w}x{c}", f_split, x, 16, flops=fl)

    if "updown" in PARTS:
        from pcdms_tpu.nn.layers import nearest_upsample_2x
        for h, w, c in levels[1:]:
            p = cast_pytree(conv2d_init(key, c, c, 3), jnp.bfloat16)
            x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)

            def f_up(x, p=p):
                return conv2d_apply(p, nearest_upsample_2x(x),
                                    padding=[(1, 1), (1, 1)])

            def f_down(x, p=p):
                y = conv2d_apply(p, x, stride=2, padding=[(1, 1), (1, 1)])
                return jnp.repeat(jnp.repeat(y, 2, 1), 2, 2)  # keep shape

            fl_up = 2 * B * 4 * h * w * c * c * 9
            time_scan(f"upsample+conv {h}x{w}x{c}", f_up, x, 8, flops=fl_up)
            time_scan(f"downconv(+pad back) {h}x{w}x{c}", f_down, x, 8)

    if "t2dparts" in PARTS:
        # decompose the level-0 transformer2d call: where do the
        # ~5ms/call (B=8) beyond the flash kernel go?
        from pcdms_tpu.nn.layers import (
            layer_norm_apply, layer_norm_init, linear_init,
        )
        from pcdms_tpu.nn.transformer import (
            attention_apply, attention_init, feed_forward_apply,
            feed_forward_init,
        )
        h, w, c = levels[0]
        L = h * w
        tok = jax.random.normal(key, (B, L, c), jnp.bfloat16)

        ap = cast_pytree(attention_init(key, c, c // 64, 64), jnp.bfloat16)
        time_scan(f"attn1 full (proj+flash+out) {L}x{c}",
                  functools.partial(attention_apply, ap, heads=c // 64),
                  tok, 16)

        from pcdms_tpu.ops.flash_attention import flash_attention
        qh = jax.random.normal(key, (B, c // 64, L, 64), jnp.bfloat16)

        def f_flash(q):
            return flash_attention(q, q, q)

        time_scan(f"flash kernel only {L}x{c}", f_flash, qh, 16)

        fp = cast_pytree(feed_forward_init(key, c), jnp.bfloat16)
        fl_ff = 2 * B * L * c * (c * 4) * 3   # proj_in 2x + proj_out
        time_scan(f"geglu ff {L}x{c}",
                  functools.partial(feed_forward_apply, fp), tok, 16,
                  flops=fl_ff)

        lp = cast_pytree(layer_norm_init(c), jnp.bfloat16)
        time_scan(f"layernorm {L}x{c}",
                  functools.partial(layer_norm_apply, lp), tok, 16,
                  bytes_moved=2 * tok.size * 2)

        ctx = jax.random.normal(key, (B, 258, 1024), jnp.bfloat16)
        xp = cast_pytree(attention_init(key, c, c // 64, 64,
                                        context_dim=1024), jnp.bfloat16)

        def f_cross(tok):
            return attention_apply(xp, tok, ctx, heads=c // 64)

        time_scan(f"cross-attn {L}x{c}", f_cross, tok, 16)

    if "headswap" in PARTS:
        # cost of the (B, L, H*D) <-> (B, H, L, D) head transposes around
        # the flash kernel (3 in + 1 out per attention call)
        h, w, c = levels[0]
        L = h * w
        heads = c // 64
        tok = jax.random.normal(key, (B, L, c), jnp.bfloat16)

        def f_swap(x):
            y = x.reshape(B, L, heads, 64).transpose(0, 2, 1, 3)
            return y + 1.0

        def f_swap4(x):
            # the full per-call transpose bill: q,k,v in + out back
            q = x.reshape(B, L, heads, 64).transpose(0, 2, 1, 3)
            k = (x * 2).reshape(B, L, heads, 64).transpose(0, 2, 1, 3)
            v = (x * 3).reshape(B, L, heads, 64).transpose(0, 2, 1, 3)
            o = (q + k + v).transpose(0, 2, 1, 3).reshape(B, L, c)
            return o

        time_scan(f"head-swap x1 {L}x{c}", f_swap, tok, 16,
                  bytes_moved=2 * tok.size * 2)
        time_scan(f"head-swap x4 {L}x{c}", f_swap4, tok, 16,
                  bytes_moved=8 * tok.size * 2)

    if "upfuse" in PARTS:
        # naive nearest-up + conv3x3 VS the phase-decomposed fused op
        # (upsample2x_conv3x3: 16 vs 36 MACs/pixel, no 4x intermediate)
        from pcdms_tpu.nn.layers import nearest_upsample_2x, \
            upsample2x_conv3x3
        # UNet upsamplers (8x16->, 16x32->, 32x64->) + VAE decoder
        # upsamplers for the 512x1024 output (64x128x512 .. 256x512x256)
        shapes = [(8, 16, 1280), (16, 32, 1280), (32, 64, 640),
                  (64, 128, 512), (128, 256, 512), (256, 512, 256)]
        for h, w, c in shapes:
            p = cast_pytree(conv2d_init(key, c, c, 3), jnp.bfloat16)
            x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)

            def f_naive(x, p=p):
                return conv2d_apply(p, nearest_upsample_2x(x),
                                    padding=[(1, 1), (1, 1)])

            def f_fused(x, p=p):
                return upsample2x_conv3x3(p, x)

            fl = 2 * B * 4 * h * w * c * c * 9    # naive-equivalent FLOPs
            iters = max(2, min(16, 2 ** 22 // (h * w)))
            time_scan(f"up naive {h}x{w}x{c}", f_naive, x, iters, flops=fl)
            time_scan(f"up fused {h}x{w}x{c}", f_fused, x, iters, flops=fl)

    if "vaedec" in PARTS:
        from pcdms_tpu.models.vae import VAEConfig, vae_init, vae_decode
        vp = cast_pytree(vae_init(jax.random.PRNGKey(2)), jnp.bfloat16)
        z = jax.random.normal(key, (B, 64, 128, 4), jnp.bfloat16)

        def f(z):
            img = vae_decode(vp, z)
            # reduce back to latent shape to keep the scan carry small
            return z + jnp.mean(img).astype(z.dtype)

        time_scan("vae decode 64x128 latents (512x1024 img)", f, z, 2)

    if "sched" in PARTS:
        # DDIM update glue: everything in the sampler step EXCEPT the
        # UNet call (CFG mix + rescale + scheduler elementwise update)
        lat = jax.random.normal(key, (B, 64, 128, 4), jnp.bfloat16)

        def f(lat):
            eps_pair = jnp.concatenate([lat * 0.9, lat * 1.1], axis=0)
            uncond, cond = jnp.split(eps_pair, 2, axis=0)
            eps = uncond + 2.0 * (cond - uncond)
            a_t, a_prev = jnp.bfloat16(0.9), jnp.bfloat16(0.8)
            x0 = (lat - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps

        time_scan("scheduler glue (CFG mix + DDIM update)", f, lat, 32,
                  bytes_moved=6 * lat.size * 2)

    if "ln" in PARTS:
        from pcdms_tpu.nn.layers import layer_norm_init, layer_norm_apply
        h, w, c = levels[0]
        p = layer_norm_init(c)
        x = jax.random.normal(key, (B, h * w, c), jnp.bfloat16)

        def f(x):
            return layer_norm_apply(p, x)

        time_scan(f"layernorm {h * w}x{c}", f, x, 16,
                  bytes_moved=2 * x.size * 2)

    if "attn" in PARTS:
        ctx = jax.random.normal(key, (B, 258, 1024), jnp.bfloat16)
        for h, w, c in levels:
            p = cast_pytree(
                transformer2d_init(key, c, c // 64, 64, 1024), jnp.bfloat16)
            x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)
            f = functools.partial(transformer2d_apply, p, context=ctx,
                                  heads=c // 64, use_flash=True)
            l = h * w
            fl = (4 * B * l * l * 64 * (c // 64)        # self-attn
                  + 4 * B * l * 258 * 64 * (c // 64)    # cross-attn
                  + 2 * B * l * c * c * 12)             # projections+geglu
            time_scan(f"t2d {h}x{w}x{c}", f, x, 8, flops=fl)

    if "unet" in PARTS or "noattn" in PARTS or "unet_fused" in PARTS:
        cfg = stage2_unet_config()
        params = cast_pytree(unet_init(jax.random.PRNGKey(1), cfg),
                             jnp.bfloat16)
        sample = jax.random.normal(key, (B, 64, 128, 9), jnp.bfloat16)
        ctx = jax.random.normal(key, (B, 258, 1024), jnp.bfloat16)
        cls = jnp.ones((B, 1024), jnp.bfloat16)
        ts = jnp.full((B,), 500, jnp.int32)
        pose = jnp.zeros((B, 64, 128, 320), jnp.bfloat16)

        def f(x):
            out = unet_apply(params, cfg, x, ts, ctx, class_labels=cls,
                             pose_cond=pose)
            return jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, 5)))

        if "unet" in PARTS:
            time_scan("unet full", f, sample, 4)
        if "unet_fused" in PARTS:
            import dataclasses
            fcfg = dataclasses.replace(cfg, fused_conv=True)

            def ff(x):
                out = unet_apply(params, fcfg, x, ts, ctx, class_labels=cls,
                                 pose_cond=pose)
                return jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, 5)))

            time_scan("unet fused-conv", ff, sample, 4)
        if "noattn" in PARTS:
            orig = unet_blocks.transformer2d_apply
            unet_blocks.transformer2d_apply = (
                lambda p, x, context, **kw: x)
            try:
                time_scan("unet no-attn", f, sample, 4)
            finally:
                unet_blocks.transformer2d_apply = orig


if __name__ == "__main__":
    main()
