"""Pallas TPU fused GroupNorm + SiLU + 3x3-conv resnet kernel.

The reference's hot resnet path (diffusers ResnetBlock2D, used by
/root/reference/src/models/stage2_inpaint_unet_2d_condition.py down/up
blocks) is norm -> silu -> conv3x3 (+ time-embedding or residual add),
executed as separate cuDNN/elementwise kernels. Here the whole chain is
one Pallas kernel:

  y[b] = conv3x3( silu( x[b] * a[b] + c[b] ) ) + bias (+ temb | + residual)

where (a, c) are the GroupNorm scale/shift folded to per-(batch, channel)
coefficients (stats are a cheap XLA reduction over the input — one extra
read — while the kernel itself reads x exactly once and writes y once).

Kernel layout (v5e):
  * grid (B, n_cout_blocks, n_h_blocks); the entire spatially-padded
    activation slab (H+2, W+2, Cin) for one batch item stays resident in
    VMEM across the inner loops (its block index depends only on the
    batch coordinate).
  * each step normalizes+activates its (bh+2, W+2, Cin) window on the VPU
    (recomputed per window — far cheaper than the MXU work) and runs the
    3x3 conv as 9 shifted (bh*W, Cin) x (Cin, CoB) MXU contractions
    accumulated in f32 registers — full-depth (Cin >= 320) contractions,
    unlike an im2col lowering that materializes 9x the activations in HBM.
  * bias, the broadcast time-embedding add (conv1 path) and the residual
    add (conv2 path) are fused into the epilogue.

Slabs that do not fit VMEM (the 960-channel 64x128 up-block conv in
SD-2.1, and all VAE-resolution convs) fall back to the unfused XLA path;
`fits_fused_conv` reports the decision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the resident x-slab (bytes at bf16); the slab is
# double-buffered across batch items by the pipeline.
_SLAB_BUDGET = 6 * 1024 * 1024
_WEIGHT_BUDGET = 3_500_000   # bytes; weight blocks are double-buffered
_ACC_BUDGET = 2 * 1024 * 1024  # f32 accumulator per (h, cout) step


def gn_affine_coeffs(x, scale, shift, num_groups: int, eps: float):
    """Fold GroupNorm into per-(B, C) affine coefficients.

    Returns (a, c) float32 such that gn(x)[b,h,w,ch] = x*a[b,ch] + c[b,ch].
    """
    b, h, w, ch = x.shape
    g = num_groups
    x32 = x.astype(jnp.float32).reshape(b, h * w, g, ch // g)
    mean = jnp.mean(x32, axis=(1, 3))                     # (B, G)
    var = jnp.var(x32, axis=(1, 3))                       # (B, G)
    rstd = jax.lax.rsqrt(var + eps)
    a_g = jnp.repeat(rstd, ch // g, axis=1)               # (B, C)
    m_g = jnp.repeat(mean, ch // g, axis=1)               # (B, C)
    s = scale.astype(jnp.float32)[None]
    t = shift.astype(jnp.float32)[None]
    return a_g * s, t - m_g * a_g * s


def _fused_kernel(x_ref, a_ref, c_ref, w_ref, b_ref, extra_ref, o_ref,
                  *, H: int, W: int, bh: int, extra_mode: int,
                  apply_act: bool):
    """One (batch, cout-block, h-block) grid step.

    x_ref:    (1, H+2, W+2, Cin)  full input slab (resident across steps)
    a_ref/c_ref: (B, Cin)         folded GN affine (whole array; the
                                  kernel row-selects its batch item —
                                  TPU blocks can't be (1, C) slices of
                                  a (B, C) array unless B == 1)
    w_ref:    (3, 3, Cin, CoB)    weight block
    b_ref:    (1, CoB)            bias
    extra_ref: temb (B, CoB) | residual (1, bh, W, CoB) | zeros (1, CoB)
    o_ref:    (1, bh, W, CoB)
    """
    bi = pl.program_id(0)
    hi = pl.program_id(2)
    row0 = hi * bh                              # top padded-row of window

    def take_row(ref):
        # dynamic single-row gathers can't be proven sublane-aligned by
        # Mosaic; select the batch row with a masked reduction instead
        full = ref[:, :].astype(jnp.float32)            # (B, C)
        sel = jax.lax.broadcasted_iota(jnp.int32, full.shape, 0) == bi
        return jnp.sum(jnp.where(sel, full, 0.0), axis=0)

    x = x_ref[0, pl.ds(row0, bh + 2)]           # (bh+2, W+2, Cin)
    xf = x.astype(jnp.float32)
    a = take_row(a_ref)
    c = take_row(c_ref)
    xn = xf * a[None, None, :] + c[None, None, :]
    if apply_act:
        xn = xn * jax.nn.sigmoid(xn)
    # zero the conv-padding border (GN shift would make it nonzero);
    # the mask is built 2D and broadcast so Mosaic doesn't materialize
    # full-window int32 temporaries on the stack
    row = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, W + 2), 0) + row0
    col = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, W + 2), 1)
    interior = ((row > 0) & (row <= H) & (col > 0)
                & (col <= W)).astype(jnp.float32)
    xn = (xn * interior[:, :, None]).astype(x_ref.dtype)

    acc = None
    for dy in range(3):
        for dx in range(3):
            win = xn[dy:dy + bh, dx:dx + W, :]  # (bh, W, Cin)
            wk = w_ref[dy, dx]                  # (Cin, CoB)
            d = jax.lax.dot_general(
                win, wk, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d

    out = acc + b_ref[0].astype(jnp.float32)[None, None, :]
    if extra_mode == 1:        # temb broadcast add
        out = out + take_row(extra_ref)[None, None, :]
    elif extra_mode == 2:      # residual add
        out = out + extra_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def fits_fused_conv(h: int, w: int, cin: int, itemsize: int = 2) -> bool:
    return (h + 2) * (w + 2) * cin * itemsize <= _SLAB_BUDGET


def _pick_co_block(cin: int, cout: int) -> int:
    """Largest cout block whose (3,3,Cin,CoB) bf16 slice fits the weight
    budget; 0 means no aligned block fits (caller falls back to XLA)."""
    for cand in (cout, 512, 384, 320, 256, 128):
        # Mosaic requires lane-dim blocks divisible by 128 or whole
        if cand <= cout and cout % cand == 0 \
                and (cand % 128 == 0 or cand == cout) \
                and 9 * cin * cand * 2 <= _WEIGHT_BUDGET:
            return cand
    return 0


_WINDOW_BUDGET = 4 * 1024 * 1024  # f32 normalize temporaries per step


def _pick_h_block(h: int, w: int, cin: int, co_b: int) -> int:
    """Largest h block DIVIDING h whose f32 accumulator AND per-window
    normalize temporaries fit their budgets (Mosaic allocates the
    elementwise chain's intermediates on the kernel stack). Halving
    alone can land on a non-divisor (e.g. h=14 -> 3), which would leave
    the last h % bh output rows unwritten — only divisors are
    considered."""
    def fits(bh: int) -> bool:
        return (bh * w * co_b * 4 <= _ACC_BUDGET
                and (bh + 2) * (w + 2) * cin * 4 <= _WINDOW_BUDGET)

    best = 1
    for bh in range(1, h + 1):
        if h % bh == 0 and fits(bh):
            best = bh
    return best


@functools.partial(
    jax.jit,
    static_argnames=("extra_mode", "apply_act", "interpret"))
def _fused_gn_silu_conv(x, a, c, kernel, bias, extra,
                        extra_mode: int, apply_act: bool, interpret: bool):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    co_b = _pick_co_block(cin, cout)
    n_co = cout // co_b
    bh = _pick_h_block(h, w, cin, co_b)
    n_h = h // bh

    if extra_mode == 2:
        extra_spec = pl.BlockSpec((1, bh, w, co_b),
                                  lambda i, j, k: (i, k, 0, j),
                                  memory_space=pltpu.VMEM)
    elif extra_mode == 1:
        extra_spec = pl.BlockSpec((b, co_b), lambda i, j, k: (0, j),
                                  memory_space=pltpu.VMEM)
    else:
        extra_spec = pl.BlockSpec((1, co_b), lambda i, j, k: (0, j),
                                  memory_space=pltpu.VMEM)

    kern = functools.partial(_fused_kernel, H=h, W=w, bh=bh,
                             extra_mode=extra_mode, apply_act=apply_act)
    out = pl.pallas_call(
        kern,
        grid=(b, n_co, n_h),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, cin),
                         lambda i, j, k: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, cin), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, cin), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, co_b), lambda i, j, k: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_b), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            extra_spec,
        ],
        out_specs=pl.BlockSpec((1, bh, w, co_b),
                               lambda i, j, k: (i, k, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # the double-buffered level-0 slab pushes slightly past the
            # default 16M scoped-vmem limit; v5e can go higher
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * cin * cout * 9,
            bytes_accessed=(xp.size + b * h * w * cout) * 2,
            transcendentals=b * (h + 2) * (w + 2) * cin * n_co,
        ),
        interpret=interpret,
    )(xp, a, c, kernel, bias.reshape(1, -1), extra)
    return out


def gn_silu_conv3x3(x, gn_scale, gn_shift, kernel, bias, *,
                    num_groups: int = 32, eps: float = 1e-5,
                    temb=None, residual=None, apply_act: bool = True,
                    interpret: bool = False, force_pallas: bool = False):
    """y = conv3x3(silu(groupnorm(x))) + bias [+ temb | + residual].

    x: (B, H, W, Cin); kernel: (3, 3, Cin, Cout) HWIO; bias: (Cout,).
    temb: optional (B, Cout) broadcast add. residual: optional
    (B, H, W, Cout) add. Falls back to the unfused XLA ops off-TPU or when
    the slab exceeds VMEM.
    """
    assert temb is None or residual is None
    b, h, w, cin = x.shape
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = (on_tpu or force_pallas or interpret) \
        and fits_fused_conv(h, w, cin) \
        and _pick_co_block(cin, kernel.shape[-1]) > 0

    if not use_pallas:
        a, c = gn_affine_coeffs(x, gn_scale, gn_shift, num_groups, eps)
        xn = (x.astype(jnp.float32) * a[:, None, None, :]
              + c[:, None, None, :])
        if apply_act:
            xn = jax.nn.silu(xn)
        y = jax.lax.conv_general_dilated(
            xn.astype(x.dtype), kernel.astype(x.dtype),
            window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bias.astype(y.dtype)
        if temb is not None:
            y = y + temb.astype(y.dtype)[:, None, None, :]
        if residual is not None:
            y = y + residual.astype(y.dtype)
        return y

    a, c = gn_affine_coeffs(x, gn_scale, gn_shift, num_groups, eps)
    cout = kernel.shape[-1]
    if temb is not None:
        extra, mode = temb.astype(x.dtype), 1
    elif residual is not None:
        extra, mode = residual.astype(x.dtype), 2
    else:
        extra, mode = jnp.zeros((1, cout), x.dtype), 0
    return _fused_gn_silu_conv(
        x, a.astype(jnp.float32), c.astype(jnp.float32),
        kernel.astype(x.dtype), bias.astype(jnp.float32), extra,
        mode, apply_act, interpret)
