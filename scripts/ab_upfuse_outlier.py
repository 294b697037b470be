"""Chase the 32x64x640 outlier: fused upsample-conv is 3x SLOWER than
naive there (alone among the 6 shapes measured, PERF.md round 4).
Variants: (a) the shipped single-conv phase kernel, (b) spatial pad to
even dims before the VALID conv, (c) 4 separate 2x2 convs,
(d) channels-last phase order (interleave via reshape, no slicing)."""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pcdms_tpu.nn.layers import (  # noqa: E402
    conv2d_apply, conv2d_init, nearest_upsample_2x, upsample2x_conv3x3,
    _phase_taps,
)
from pcdms_tpu.utils.tree import cast_pytree  # noqa: E402

B = 8
DN = ("NHWC", "HWIO", "NHWC")


def time_scan(name, f, x, iters=16):
    @jax.jit
    def run(x0):
        def body(c, _):
            y = f(c)
            return c + jnp.mean(y).astype(c.dtype) * 1e-12, None
        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:.2f}ms/iter", flush=True)


def phase_kernels(k):
    kr0, kr1 = _phase_taps(k, axis=0)
    out = []
    for kr in (kr0, kr1):
        kc0, kc1 = _phase_taps(kr, axis=1)
        out.extend([kc0, kc1])
    return out


def v_padded_even(p, x):
    k = p["kernel"].astype(x.dtype)
    kern = jnp.concatenate(phase_kernels(k), axis=3)
    b, h, w, _ = x.shape
    co = k.shape[3]
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))   # even spatial
    y = jax.lax.conv_general_dilated(xp, kern, (1, 1), "VALID",
                                     dimension_numbers=DN)
    y = y.reshape(b, h + 2, w + 2, 4, co)
    p00 = y[:, :h, :w, 0]
    p01 = y[:, :h, 1:w + 1, 1]
    p10 = y[:, 1:h + 1, :w, 2]
    p11 = y[:, 1:h + 1, 1:w + 1, 3]
    out = jnp.stack([jnp.stack([p00, p01], axis=3),
                     jnp.stack([p10, p11], axis=3)], axis=2)
    out = out.reshape(b, 2 * h, 2 * w, co)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def v_four_convs(p, x):
    k = p["kernel"].astype(x.dtype)
    ks = phase_kernels(k)
    b, h, w, _ = x.shape
    pads = [((1, 0), (1, 0)), ((1, 0), (0, 1)),
            ((0, 1), (1, 0)), ((0, 1), (0, 1))]
    ys = [jax.lax.conv_general_dilated(x, kk, (1, 1), pad,
                                       dimension_numbers=DN)
          for kk, pad in zip(ks, pads)]
    out = jnp.stack([jnp.stack([ys[0], ys[1]], axis=3),
                     jnp.stack([ys[2], ys[3]], axis=3)], axis=2)
    out = out.reshape(b, 2 * h, 2 * w, k.shape[3])
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def main():
    key = jax.random.PRNGKey(0)
    shapes = [(32, 64, 640), (16, 32, 1280)]
    for h, w, c in shapes:
        print(f"--- {h}x{w}x{c}")
        p = cast_pytree(conv2d_init(key, c, c, 3), jnp.bfloat16)
        x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)

        def f_naive(x, p=p):
            return conv2d_apply(p, nearest_upsample_2x(x),
                                padding=[(1, 1), (1, 1)])

        time_scan("naive", f_naive, x)
        time_scan("fused (shipped)", functools.partial(
            lambda p, x: upsample2x_conv3x3(p, x), p), x)
        time_scan("fused pad-even", functools.partial(v_padded_even, p), x)
        time_scan("fused 4-convs", functools.partial(v_four_convs, p), x)

        # numeric sanity
        import numpy as np
        ref = np.asarray(f_naive(x), np.float32)
        for name, f in [("pad-even", v_padded_even),
                        ("4convs", v_four_convs)]:
            got = np.asarray(f(p, x), np.float32)
            err = np.max(np.abs(ref - got))
            print(f"  {name} maxerr {err:.4f}")


if __name__ == "__main__":
    main()
