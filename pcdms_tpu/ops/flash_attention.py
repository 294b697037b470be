"""Pallas TPU flash attention.

Replaces the reference stack's xformers / SDPA fused attention
(/root/reference/stage1_train_prior_model.py:125-137,
 /root/reference/src/pipelines/PCDMs_pipeline.py:59-153) with a single
TPU-native kernel: online-softmax attention with float32 accumulation,
bf16 MXU compute, tiled over a (batch*heads, q-blocks, k-blocks) grid.

TPU-specific design points (measured on v5e):
  * Large blocks (default 1024x1024) amortize per-grid-step overhead —
    the dominant cost at head_dim 64.
  * The kv-pad mask is compiled out entirely when kv_len is already a
    block multiple.
  * The softmax scale is folded into the q block (bq x d elements)
    instead of the score matrix (bq x bk).
  * Short-kv cross-attention (the 258-token conditioning path) runs with
    a single k block, degenerating into one-pass softmax.

The kernel assumes full (non-causal) attention — PCDMs' UNet self- and
cross-attention are both non-causal.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

_NEG_INF = -1e30
# short-kv (cross-attention) route: one-pass Pallas kernel vs XLA fused
# softmax; measured a wash on v5e (0.5442 vs 0.5459 img/s/chip on the
# north-star bench), so XLA stays the default. Flip with
# PCDMS_SHORTKV=pallas.
_SHORTKV_PALLAS = os.environ.get("PCDMS_SHORTKV", "xla") == "pallas"
# bf16 softmax lever: the kernel is VPU-bound (row max + subtract + exp2
# over the (block_q, block_k) score tile dominate; the two MXU matmuls
# are ~5us/step vs ~8us of f32 VPU work). Running those elementwise ops
# in bf16 doubles VPU rate and drops the p cast before the PV matmul,
# at the cost of ~2^-8 relative noise in softmax weights (the weights
# are consumed in bf16 by the MXU anyway). A/B via PCDMS_EXP_BF16.
# (Measured a wash on v5e — the VPU runs bf16 elementwise at f32 rate.)
_EXP_BF16 = os.environ.get("PCDMS_EXP_BF16", "0") == "1"
# frozen-max softmax (see _flash_kernel_frozen): strips the cross-lane
# max reduce + running-max/alpha-rescale chain from the VPU-bound inner
# loop. Exact up to fp rounding; kill switch for A/B.
_FROZEN_MAX = os.environ.get("PCDMS_FROZEN_MAX", "1") == "1"
# independent q sub-tiles per kernel step (k/v tile reuse + MXU/VPU
# overlap across chains); measured +3% at (1024, 2048) on v5e.
_Q_UNROLL = int(os.environ.get("PCDMS_Q_UNROLL", "2"))


def attention_reference(q, k, v, scale=None):
    """Plain XLA attention. q: (B, H, Lq, D), k/v: (B, H, Lk, D)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


_LOG2E = 1.4426950408889634


def _flash_kernel(q_ref, k_ref, v_ref, o_ref,
                  m_ref, acc_ref,
                  *, scale: float, kv_len: int, block_k: int,
                  head_dim: int, masked: bool, exp_bf16: bool,
                  q_unroll: int = 1):
    """Online-softmax block step, exp2 domain.

    Two MXU tricks vs the textbook formulation:
      * log2(e) is folded into the softmax scale so the VPU computes
        exp2 directly (exp lowers to exp2 + multiply on TPU).
      * v arrives padded to ``d_aug`` lanes with a ones-column at index
        ``head_dim`` — the PV matmul then produces the softmax row-sum
        in that column for free (the MXU tile is 128 lanes wide whether
        or not d=64 uses them), and the accumulator's alpha-rescale
        carries the denominator with no separate l bookkeeping.

    ``q_unroll`` > 1 processes that many INDEPENDENT q sub-tiles per grid
    step against the same k/v block: their QK->softmax->PV chains share
    no data, so Mosaic can overlap one tile's VPU softmax with another's
    MXU matmuls (the serial chain is what holds the single-tile kernel at
    ~65 of the ~131 TF/s mixed ceiling), and the k/v tile is fetched once
    for all sub-tiles.
    """
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k = k_ref[0]                                     # (bk, d)
    v = v_ref[0]                                     # (bk, d_aug)
    bq = q_ref.shape[1] // q_unroll

    for ui in range(q_unroll):
        rows = slice(ui * bq, (ui + 1) * bq)
        # (bq, d), pre-scaled into the exp2 domain
        q = q_ref[0, rows, :] * jnp.asarray(scale * _LOG2E, q_ref.dtype)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (bq, bk) f32

        if masked:
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + j * block_k)
            s = jnp.where(col < kv_len, s, _NEG_INF)

        m_prev = m_ref[rows, 0:1]                             # (bq, 1)
        if exp_bf16:
            # VPU-bound path in half precision: max/subtract/exp2 over the
            # (bq, bk) tile run at 2x VPU rate, and p lands in bf16 already
            # (it is consumed in bf16 by the PV matmul either way). The
            # running max stays f32 in scratch; only the per-tile
            # elementwise work is demoted. exp2 argument is <= 0 so no
            # overflow.
            sb = s.astype(jnp.bfloat16)                       # (bq, bk)
            m_cur = jnp.max(sb, axis=-1, keepdims=True).astype(jnp.float32)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_new)                  # (bq, 1)
            p = jnp.exp2(sb - m_new.astype(jnp.bfloat16))     # (bq, bk) bf16
        else:
            m_cur = jnp.max(s, axis=-1, keepdims=True)        # (bq, 1)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_new)                  # (bq, 1)
            p = jnp.exp2(s - m_new)                           # (bq, bk)

        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (bq, d_aug)
        acc_ref[rows, :] = acc_ref[rows, :] * alpha + pv
        m_ref[rows, :] = jnp.broadcast_to(m_new, (bq, m_ref.shape[1]))

    @pl.when(j == nk - 1)
    def _finalize():
        l = acc_ref[:, head_dim:head_dim + 1]             # softmax denom
        o = acc_ref[:, :head_dim] / jnp.maximum(l, 1e-30)
        o_ref[0] = o.astype(o_ref.dtype)


def _flash_kernel_frozen(q_ref, m0_ref, k_ref, v_ref, o_ref, acc_ref,
                         *, scale: float, kv_len: int, block_k: int,
                         head_dim: int, masked: bool, q_unroll: int = 1):
    """Frozen-max online softmax: the per-row max estimate m0 arrives as
    an input (computed once by an XLA prepass over the first k columns),
    so the kernel's VPU work per score element is exactly subtract + exp2
    + bf16 cast — no cross-lane max reduduction, no running-max scratch,
    no alpha rescale of the accumulator (the dominant kernel is VPU-bound
    on v5e; see PERF.md).

    Correctness: softmax(s) = exp2(s - m0) / sum(exp2(s - m0)) for ANY
    m0 — the shift cancels in the normalization, and f32's exponent range
    absorbs estimate error: with the +_FROZEN_MARGIN headroom, overflow
    needs a later score to exceed the estimate by ~110 nats, far beyond
    any trained attention's logit range, while underflowed tail weights
    (< 2^-126 of the max) are below softmax noise anyway.
    """
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k = k_ref[0]                                     # (bk, d)
    v = v_ref[0]                                     # (bk, d_aug)
    bq = q_ref.shape[1] // q_unroll

    for ui in range(q_unroll):
        rows = slice(ui * bq, (ui + 1) * bq)
        q = q_ref[0, rows, :] * jnp.asarray(scale * _LOG2E, q_ref.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (bq, bk) f32
        if masked:
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + j * block_k)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        p = jnp.exp2(s - m0_ref[0, rows, 0:1])       # (bq, bk)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (bq, d_aug)
        acc_ref[rows, :] += pv

    @pl.when(j == nk - 1)
    def _finalize():
        l = acc_ref[:, head_dim:head_dim + 1]             # softmax denom
        o = acc_ref[:, :head_dim] / jnp.maximum(l, 1e-30)
        o_ref[0] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# headroom added to the frozen-max estimate: overflow then needs a score
# (126 + 24) / log2(e) ~ 104 nats above the estimate
_FROZEN_MARGIN = 24.0


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret", "exp_bf16",
                                             "q_unroll", "frozen_max"))
def _flash_attention_3d(q, k, v, scale: float,
                        block_q: int, block_k: int, interpret: bool,
                        exp_bf16: bool = False, q_unroll: int = 1,
                        frozen_max: bool = False):
    """q: (BH, Lq, D), k/v: (BH, Lk, D). ``block_q`` is the per-sub-tile
    q rows; the kernel step covers ``block_q * q_unroll`` rows."""
    bh, lq, d = q.shape
    kv_len = k.shape[1]

    lq_pad = _round_up(lq, block_q * q_unroll)
    lk_pad = _round_up(kv_len, block_k)
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != kv_len:
        k = jnp.pad(k, ((0, 0), (0, lk_pad - kv_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_pad - kv_len), (0, 0)))

    # augment v with a ones-column at index d (softmax denominator rides
    # the PV matmul) and pad lanes to the 128 tile the MXU uses anyway;
    # padded kv rows contribute 0 to the denominator because the score
    # mask already zeroes p there
    masked_pad = lk_pad != kv_len
    d_aug = _round_up(d + 1, 128)
    ones = jnp.ones((bh, lk_pad, 1), v.dtype)
    v = jnp.concatenate(
        [v, ones, jnp.zeros((bh, lk_pad, d_aug - d - 1), v.dtype)], axis=2)

    bq_step = block_q * q_unroll
    grid = (bh, lq_pad // bq_step, lk_pad // block_k)
    qspec = pl.BlockSpec((1, bq_step, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((1, bq_step, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq_pad * lk_pad * d,
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=bh * lq_pad * lk_pad,
        ),
        interpret=interpret,
    )
    kvspecs = [
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d_aug), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    if frozen_max:
        # XLA prepass: per-row max estimate over the first 128 k columns
        # (one thin matmul), in the prescaled exp2 domain
        s0 = jax.lax.dot_general(
            q.astype(jnp.float32), k[:, :min(128, lk_pad)].astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (bh, lq_pad, <=128)
        m0 = (jnp.max(s0, axis=-1, keepdims=True)
              * (scale * _LOG2E) + _FROZEN_MARGIN)    # (bh, lq_pad, 1)
        kernel = functools.partial(
            _flash_kernel_frozen, scale=scale, kv_len=kv_len,
            block_k=block_k, head_dim=d, masked=masked_pad,
            q_unroll=q_unroll)
        out = pl.pallas_call(
            kernel,
            in_specs=[
                qspec,
                pl.BlockSpec((1, bq_step, 1), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ] + kvspecs,
            scratch_shapes=[
                pltpu.VMEM((bq_step, d_aug), jnp.float32),  # acc + denom
            ],
            **common,
        )(q, m0, k, v)
    else:
        kernel = functools.partial(_flash_kernel, scale=scale, kv_len=kv_len,
                                   block_k=block_k, head_dim=d,
                                   masked=masked_pad, exp_bf16=exp_bf16,
                                   q_unroll=q_unroll)
        out = pl.pallas_call(
            kernel,
            in_specs=[qspec] + kvspecs,
            scratch_shapes=[
                pltpu.VMEM((bq_step, 128), jnp.float32),  # running max (log2)
                pltpu.VMEM((bq_step, d_aug), jnp.float32),  # out acc + denom
            ],
            **common,
        )(q, k, v)
    if lq_pad != lq:
        out = out[:, :lq, :]
    return out


def _shortkv_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                    kv_len: int, head_dim: int, masked: bool):
    """One-pass softmax for short kv (<= one block): no online rescale,
    no scratch — the whole score row fits, and the denominator rides the
    PV matmul's ones-column like the main kernel."""
    q = q_ref[0] * jnp.asarray(scale * _LOG2E, q_ref.dtype)
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    acc = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    l = jnp.maximum(acc[:, head_dim:head_dim + 1], 1e-30)
    o_ref[0] = (acc[:, :head_dim] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q",
                                             "interpret"))
def _shortkv_attention_3d(q, k, v, scale: float, block_q: int,
                          interpret: bool):
    """Single-k-block attention. q: (BH, Lq, D), k/v: (BH, Lk<=512, D)."""
    bh, lq, d = q.shape
    kv_len = k.shape[1]
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(kv_len, 128)
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != kv_len:
        k = jnp.pad(k, ((0, 0), (0, lk_pad - kv_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_pad - kv_len), (0, 0)))
    d_aug = _round_up(d + 1, 128)
    v = jnp.concatenate(
        [v, jnp.ones((bh, lk_pad, 1), v.dtype),
         jnp.zeros((bh, lk_pad, d_aug - d - 1), v.dtype)], axis=2)

    kernel = functools.partial(_shortkv_kernel, scale=scale, kv_len=kv_len,
                               head_dim=d, masked=lk_pad != kv_len)
    out = pl.pallas_call(
        kernel,
        grid=(bh, lq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_aug), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq_pad * lk_pad * d,
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=bh * lq_pad * lk_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :lq] if lq_pad != lq else out


# ---------------------------------------------------------------------------
# differentiation: Pallas forward + chunked exact-recompute backward
# ---------------------------------------------------------------------------
# pallas_call has no automatic VJP, and materializing the full (Lq, Lk)
# f32 score matrix in the backward pass OOMs at 8192 tokens. The backward
# here recomputes softmax per q-chunk (flash-attention backward written
# in XLA): memory is bounded by the chunk while gradients stay exact.

_BWD_CHUNK = 256


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_3d_diff(q, k, v, scale, block_q, block_k, interpret,
                   exp_bf16=False, q_unroll=1, frozen_max=False):
    return _flash_attention_3d(q, k, v, scale, block_q, block_k, interpret,
                               exp_bf16=exp_bf16, q_unroll=q_unroll,
                               frozen_max=frozen_max)


def _use_pallas_bwd() -> bool:
    return jax.default_backend() == "tpu"


def _flash_3d_fwd(q, k, v, scale, block_q, block_k, interpret, exp_bf16,
                  q_unroll=1, frozen_max=False):
    # training path (forward-with-LSE + Pallas backward) stays f32: the
    # bf16-softmax lever is an inference-throughput trade only
    if _use_pallas_bwd():
        from pcdms_tpu.ops.flash_attention_bwd import flash_fwd_lse
        out, l2 = flash_fwd_lse(q, k, v, scale, block_q, block_k, interpret)
    else:
        out = _flash_attention_3d(q, k, v, scale, block_q, block_k,
                                  interpret)
        l2 = None
    return out, (q, k, v, out, l2)


def _flash_3d_bwd(scale, block_q, block_k, interpret, exp_bf16,
                  q_unroll, frozen_max, res, do):
    q, k, v, out, l2 = res
    if l2 is not None:
        from pcdms_tpu.ops.flash_attention_bwd import flash_bwd
        return flash_bwd(q, k, v, out, l2, do, scale, interpret=interpret)
    return _chunked_xla_bwd(q, k, v, out, do, scale)


def _chunked_xla_bwd(q, k, v, out, do, scale):
    bh, lq, d = q.shape
    cq = min(_BWD_CHUNK, lq)
    pad = (-lq) % cq
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        dop = jnp.pad(do, ((0, 0), (0, pad), (0, 0)))
        outp = jnp.pad(out, ((0, 0), (0, pad), (0, 0)))
    else:
        qp, dop, outp = q, do, out
    n = qp.shape[1] // cq
    qc = qp.reshape(bh, n, cq, d).transpose(1, 0, 2, 3)
    doc = dop.reshape(bh, n, cq, d).transpose(1, 0, 2, 3)
    oc = outp.reshape(bh, n, cq, d).transpose(1, 0, 2, 3)
    f32 = jnp.float32

    def step(carry, per):
        # matmul operands stay bf16 (full-rate MXU) with f32 accumulation
        dk_acc, dv_acc = carry
        q_c, do_c, o_c = per
        s = jnp.einsum("bqd,bkd->bqk", q_c, k,
                       preferred_element_type=f32) * scale
        p = jax.nn.softmax(s, axis=-1)                     # (BH, cq, Lk)
        pb = p.astype(k.dtype)
        dp = jnp.einsum("bqd,bkd->bqk", do_c, v,
                        preferred_element_type=f32)
        dsum = jnp.sum(do_c.astype(f32) * o_c.astype(f32),
                       axis=-1, keepdims=True)             # rowsum(do*o)
        ds = (p * (dp - dsum)).astype(k.dtype)
        dq_c = jnp.einsum("bqk,bkd->bqd", ds, k,
                          preferred_element_type=f32) * scale
        dk_acc = dk_acc + jnp.einsum("bqk,bqd->bkd", ds, q_c,
                                     preferred_element_type=f32) * scale
        dv_acc = dv_acc + jnp.einsum("bqk,bqd->bkd", pb, do_c,
                                     preferred_element_type=f32)
        return (dk_acc, dv_acc), dq_c

    zeros = jnp.zeros(k.shape, jnp.float32)
    (dk, dv), dq = jax.lax.scan(step, (zeros, zeros), (qc, doc, oc))
    dq = dq.transpose(1, 0, 2, 3).reshape(bh, n * cq, d)[:, :lq]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_3d_diff.defvjp(_flash_3d_fwd, _flash_3d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _shortkv_3d_diff(q, k, v, scale, block_q, interpret):
    return _shortkv_attention_3d(q, k, v, scale, block_q, interpret)


def _shortkv_3d_fwd(q, k, v, scale, block_q, interpret):
    out = _shortkv_attention_3d(q, k, v, scale, block_q, interpret)
    return out, (q, k, v, out)


def _shortkv_3d_bwd(scale, block_q, interpret, res, do):
    q, k, v, out = res
    return _chunked_xla_bwd(q, k, v, out, do, scale)


_shortkv_3d_diff.defvjp(_shortkv_3d_fwd, _shortkv_3d_bwd)


def _pick_blocks(lq: int, lk: int, block_q: int, block_k: int):
    # moderately short kv: single k block -> one-pass softmax
    if lk <= 2048:
        block_k = _round_up(lk, 128)
    else:
        block_k = min(block_k, _round_up(lk, 128))
    block_q = min(block_q, _round_up(lq, 128))
    return block_q, block_k


def flash_attention(q, k, v, scale=None, *, block_q: int = 1024,
                    block_k: int = 2048, force_pallas: bool = False,
                    interpret: bool = False):
    """Fused multi-head attention. q: (B, H, Lq, D), k/v: (B, H, Lk, D).

    Uses the Pallas kernel on TPU; falls back to plain XLA attention on
    other backends (tests exercise the kernel via ``interpret=True``).
    Very short kv (the 258-token cross-attention path) routes to plain XLA
    attention even on TPU — at that shape the score matrix is small enough
    that XLA's fused softmax beats the kernel's per-block overheads
    (measured ~3ms vs ~7ms per level-0 call on v5e).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or force_pallas or interpret):
        return attention_reference(q, k, v, scale)

    b, h, lq, d = q.shape
    lk = k.shape[2]
    # 258-token cross-attention path: one-pass short-kv kernel or XLA's
    # fused softmax (PCDMS_SHORTKV=xla), A/B-able via env
    if lk <= 384 and not (force_pallas or interpret):
        if on_tpu and _SHORTKV_PALLAS:
            q3 = q.reshape(b * h, lq, d)
            out = _shortkv_3d_diff(q3, k.reshape(b * h, lk, d),
                                   v.reshape(b * h, lk, d), float(scale),
                                   min(block_q, _round_up(lq, 128)), False)
            return out.reshape(b, h, lq, d)
        return attention_reference(q, k, v, scale)
    block_q, block_k = _pick_blocks(lq, lk, block_q, block_k)
    q3 = q.reshape(b * h, lq, d)
    k3 = k.reshape(b * h, lk, d)
    v3 = v.reshape(b * h, lk, d)
    q_unroll = _Q_UNROLL if lq % (block_q * _Q_UNROLL) == 0 else 1
    out = _flash_3d_diff(q3, k3, v3, float(scale), block_q, block_k,
                         interpret, _EXP_BF16, q_unroll, _FROZEN_MAX)
    return out.reshape(b, h, lq, d)


def flash_attention_packed(q, k, v, heads: int, scale=None, *,
                           block_q: int = 1024, block_k: int = 1024,
                           interpret: bool = False):
    """Fused attention on packed (B, L, H*D) tensors (the layout the
    surrounding Linear projections produce)."""
    b, lq, hd = q.shape
    lk = k.shape[1]
    d = hd // heads
    qh = q.reshape(b, lq, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, heads, d).transpose(0, 2, 1, 3)
    o = flash_attention(qh, kh, vh, scale, block_q=block_q, block_k=block_k,
                        interpret=interpret)
    return o.transpose(0, 2, 1, 3).reshape(b, lq, hd)
