"""A/B our Pallas flash kernel vs the official JAX TPU attention kernels.

Round-2 concluded our kernel is pinned at ~57-59 TF/s raw by the
unoverlapped MXU+VPU phase structure (PERF.md "Flash-kernel lever A/Bs")
and that closing the gap needs a fundamentally different schedule. The
official `jax.experimental.pallas.ops.tpu` kernels (flash_attention and
splash_attention) implement exactly such schedules (pipelined grid,
fused/blocked softmax) — this is the one unmeasured alternative left.

Shape: the stage-2 level-0 self-attention (b=8, h=5 -> bh=40, L=8192,
d=64, bf16), the single largest slice of the denoise step.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/ab_official_flash.py
"""

import functools
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("AB_B", "8"))
H = int(os.environ.get("AB_H", "5"))
L = int(os.environ.get("AB_L", "8192"))
D = int(os.environ.get("AB_D", "64"))
ITERS = int(os.environ.get("AB_ITERS", "20"))
FLOPS = 4 * B * H * L * L * D          # qk + pv matmuls, fwd only


def time_scan(name, f, q, k, v, check_against=None):
    @jax.jit
    def run(q0):
        def body(c, _):
            y = f(c, k, v)
            return c + jnp.mean(y).astype(c.dtype) * 1e-12, None
        c, _ = jax.lax.scan(body, q0, None, length=ITERS)
        return jnp.sum(c.astype(jnp.float32))

    try:
        t0 = time.perf_counter()
        float(run(q))                      # compile + warmup
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(q))
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    msg = (f"{name}: {dt * 1e3:.2f}ms/iter (compile {compile_s:.0f}s)  "
           f"{FLOPS / dt / 1e12:.1f} TF/s")
    if check_against is not None:
        out = jax.jit(f)(q, k, v)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - check_against)))
        msg += f"  max|err|={err:.3e}"
    print(msg, flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()} b={B} h={H} L={L} d={D} "
          f"iters={ITERS}", flush=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    scale = 1.0 / math.sqrt(D)
    # pre-scale q so every kernel runs with unit scale
    q = (jax.random.normal(ks[0], (B, H, L, D), jnp.bfloat16) * scale
         ).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, L, D), jnp.bfloat16)

    # fp32 reference on a slice for numeric sanity (full ref is fine too)
    from pcdms_tpu.ops.flash_attention import attention_reference
    ref = jax.jit(functools.partial(attention_reference, scale=1.0))(
        q, k, v).astype(jnp.float32)

    # 1. ours
    from pcdms_tpu.ops.flash_attention import flash_attention as ours
    time_scan("ours (1024x2048)",
              functools.partial(ours, scale=1.0), q, k, v,
              check_against=ref)

    # 2. official flash_attention
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes as FBlock, flash_attention as jflash,
        )

        def jf(q_, k_, v_):
            return jflash(q_, k_, v_, causal=False, sm_scale=1.0)
        time_scan("jax flash (default blocks)", jf, q, k, v,
                  check_against=ref)

        for bq, bkmaj, bk in ((512, 1024, 1024), (1024, 2048, 2048),
                              (2048, 4096, 2048)):
            try:
                bs = FBlock(block_q=bq, block_k_major=bkmaj, block_k=bk,
                            block_b=1,
                            block_q_major_dkv=bq, block_k_major_dkv=bkmaj,
                            block_q_dkv=bq, block_k_dkv=bk,
                            block_q_dq=bq, block_k_dq=bk,
                            block_k_major_dq=bkmaj)
            except Exception as e:
                print(f"jax flash bs({bq},{bkmaj},{bk}): {e}", flush=True)
                continue

            def jfb(q_, k_, v_, bs=bs):
                return jflash(q_, k_, v_, causal=False, sm_scale=1.0,
                              block_sizes=bs)
            time_scan(f"jax flash ({bq}x{bkmaj}/{bk})", jfb, q, k, v)
    except ImportError as e:
        print(f"official flash unavailable: {e}", flush=True)

    # 3. splash attention (full mask)
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )
        mask = sm.MultiHeadMask([sm.FullMask((L, L)) for _ in range(H)])
        for blk in (None, 512, 1024, 2048):
            if blk is None:
                bs = None
                label = "splash (default blocks)"
            else:
                try:
                    bs = sk.BlockSizes(
                        block_q=blk, block_kv=blk, block_kv_compute=blk,
                        block_q_dkv=blk, block_kv_dkv=blk,
                        block_kv_dkv_compute=blk,
                        block_q_dq=blk, block_kv_dq=blk)
                except Exception as e:
                    print(f"splash bs({blk}): {e}", flush=True)
                    continue
                label = f"splash ({blk})"
            kernel = sk.make_splash_mha(
                mask=mask, head_shards=1, q_seq_shards=1, block_sizes=bs)

            def sp(q_, k_, v_, kernel=kernel):
                return jax.vmap(kernel)(q_, k_, v_)
            time_scan(label, sp, q, k, v,
                      check_against=ref if blk is None else None)
    except Exception as e:
        print(f"splash unavailable: {type(e).__name__} {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()
