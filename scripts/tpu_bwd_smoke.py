"""Compile + run the Pallas flash-attention backward on the real chip.

Validates Mosaic lowering of flash_fwd_lse (masked resident-block LSE
writes) and the dq/dkv kernels at a realistic level-0 shape, and prints
calibrated timings (see PERF.md on harness overhead).
"""

import time

import jax
import jax.numpy as jnp

from pcdms_tpu.ops.flash_attention_bwd import flash_bwd, flash_fwd_lse

BH, L, D = 16, 8192, 64          # half the bench's level-0 (faster compile)
SCALE = 0.125


def sync(x):
    from pcdms_tpu.utils.profiling import sync
    return sync(x.astype(jnp.float32))


def main():
    print("backend:", jax.default_backend(), flush=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (BH, L, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (BH, L, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (BH, L, D), jnp.bfloat16)
    do = jax.random.normal(ks[3], (BH, L, D), jnp.bfloat16)

    t0 = time.perf_counter()
    out, l2 = flash_fwd_lse(q, k, v, SCALE, 1024, 2048)
    s = sync(out) + sync(l2)
    print(f"fwd+lse compile+run {time.perf_counter() - t0:.1f}s "
          f"checksum {s:.3e}", flush=True)

    t0 = time.perf_counter()
    dq, dk, dv = flash_bwd(q, k, v, out, l2, do, SCALE)
    s = sync(dq) + sync(dk) + sync(dv)
    print(f"bwd compile+run {time.perf_counter() - t0:.1f}s "
          f"checksum {s:.3e}", flush=True)
    for name, g in (("dq", dq), ("dk", dk), ("dv", dv)):
        finite = bool(jnp.isfinite(g.astype(jnp.float32)).all())
        print(f"{name} finite: {finite}", flush=True)

    # steady-state timing (one compiled dispatch each)
    t0 = time.perf_counter()
    out2, l22 = flash_fwd_lse(q, k, v, SCALE, 1024, 2048)
    sync(out2)
    t_fwd = time.perf_counter() - t0
    t0 = time.perf_counter()
    g = flash_bwd(q, k, v, out2, l22, do, SCALE)
    sync(g[0])
    t_bwd = time.perf_counter() - t0
    fl = 4 * BH * L * L * D
    print(f"fwd {t_fwd * 1e3:.1f}ms ({fl / t_fwd / 1e12:.1f} TF/s)  "
          f"bwd {t_bwd * 1e3:.1f}ms ({2.5 * fl / t_bwd / 1e12:.1f} TF/s)",
          flush=True)


if __name__ == "__main__":
    main()
