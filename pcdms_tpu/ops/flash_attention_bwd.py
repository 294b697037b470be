"""Pallas TPU flash-attention backward kernels.

Replaces the chunked-XLA gradient for the training path with proper
blockwise kernels (the reference trains its UNets through xformers'
fused attention backward; /root/reference/stage2_train_inpaint_model.py
enables it via enable_xformers_memory_efficient_attention).

Three pieces:
  * ``flash_fwd_lse`` — the forward kernel additionally emitting the
    per-row log-sum-exp L (exp2 domain). The grid is (i, b, j) so the
    (BH, bq) LSE output block stays VMEM-resident while every batch row
    is masked-written into it (Mosaic can't prove dynamic single-row
    stores aligned, and a (1, bq) block of a (BH, Lq) array is not a
    legal TPU block shape).
  * ``_dq_kernel`` — grid (b, i, j): normalized probabilities are
    reconstructed as exp2(s2 - L) (no online rescale needed), then
    dq += (p*(dp - D)) @ k.
  * ``_dkv_kernel`` — grid (b, j, i): dv += p^T @ do and
    dk += (p*(dp - D))^T @ q accumulated over query blocks.

D = rowsum(do * out) is a cheap host-side XLA reduction. All matmul
operands stay bf16 with f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _take_row(ref, row):
    """Select one row of a (B, N) VMEM ref without a dynamic gather."""
    full = ref[:, :].astype(jnp.float32)
    sel = jax.lax.broadcasted_iota(jnp.int32, full.shape, 0) == row
    return jnp.sum(jnp.where(sel, full, 0.0), axis=0)        # (N,)


# ---------------------------------------------------------------------------
# forward with LSE output
# ---------------------------------------------------------------------------

def _fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, l2_ref,
                    m_ref, acc_ref,
                    *, scale: float, kv_len: int, block_k: int,
                    head_dim: int, masked: bool):
    bi = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0] * jnp.asarray(scale * _LOG2E, q_ref.dtype)
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        l = jnp.maximum(acc_ref[:, head_dim:head_dim + 1], 1e-30)
        o_ref[0] = (acc_ref[:, :head_dim] / l).astype(o_ref.dtype)
        # masked write of this batch row into the resident (BH, bq) block
        l2 = (m_ref[:, 0:1] + jnp.log2(l)).reshape(1, -1)    # (1, bq)
        row = jax.lax.broadcasted_iota(jnp.int32, l2_ref.shape, 0)
        l2_ref[:, :] = jnp.where(row == bi,
                                 jnp.broadcast_to(l2, l2_ref.shape),
                                 l2_ref[:, :])


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def flash_fwd_lse(q, k, v, scale: float, block_q: int, block_k: int,
                  interpret: bool = False):
    """Forward + per-row LSE (exp2 domain). q: (BH, Lq, D)."""
    bh, lq, d = q.shape
    kv_len = k.shape[1]
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(kv_len, block_k)
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != kv_len:
        k = jnp.pad(k, ((0, 0), (0, lk_pad - kv_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_pad - kv_len), (0, 0)))
    masked = lk_pad != kv_len
    d_aug = _round_up(d + 1, 128)
    v_aug = jnp.concatenate(
        [v, jnp.ones((bh, lk_pad, 1), v.dtype),
         jnp.zeros((bh, lk_pad, d_aug - d - 1), v.dtype)], axis=2)

    kernel = functools.partial(_fwd_lse_kernel, scale=scale, kv_len=kv_len,
                               block_k=block_k, head_dim=d, masked=masked)
    out, l2 = pl.pallas_call(
        kernel,
        grid=(lq_pad // block_q, bh, lk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, b, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_aug), lambda i, b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, b, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, block_q), lambda i, b, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lq_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_aug), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v_aug)
    return out[:, :lq], l2


# ---------------------------------------------------------------------------
# dq
# ---------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, l2_ref, dsum_ref, dq_ref,
               acc_ref, *, scale: float, kv_len: int, block_k: int,
               masked: bool):
    bi = pl.program_id(0)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0] * jnp.asarray(scale * _LOG2E, q_ref.dtype)
    s2 = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + j * block_k
        s2 = jnp.where(col < kv_len, s2, _NEG_INF)

    ell = _take_row(l2_ref, bi)                              # (bq,)
    dsum = _take_row(dsum_ref, bi)                           # (bq,)
    p = jnp.exp2(s2 - ell[:, None])                          # normalized
    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - dsum[:, None])).astype(k_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(ds, k_ref[0], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# dk / dv
# ---------------------------------------------------------------------------

def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, l2_ref, dsum_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, scale: float, kv_len: int, block_k: int, masked: bool):
    bi = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0] * jnp.asarray(scale * _LOG2E, q_ref.dtype)
    s2 = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + j * block_k
        s2 = jnp.where(col < kv_len, s2, _NEG_INF)

    ell = _take_row(l2_ref, bi)
    dsum = _take_row(dsum_ref, bi)
    p = jnp.exp2(s2 - ell[:, None])
    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - dsum[:, None])).astype(q_ref.dtype)

    dv_acc[:] += jax.lax.dot_general(
        p.astype(q_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (bk, d)
    dk_acc[:] += jax.lax.dot_general(
        ds, q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (bk, d)

    @pl.when(i == ni - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def flash_bwd(q, k, v, out, l2, do, scale: float,
              block_q: int = 512, block_k: int = 1024,
              interpret: bool = False):
    """Gradients (dq, dk, dv). l2 is flash_fwd_lse's padded LSE output."""
    bh, lq, d = q.shape
    kv_len = k.shape[1]
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(kv_len, block_k)

    dsum = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1)                                  # (BH, Lq)
    qpad = ((0, 0), (0, lq_pad - lq), (0, 0))
    kpad = ((0, 0), (0, lk_pad - kv_len), (0, 0))
    qp, dop = jnp.pad(q, qpad), jnp.pad(do, qpad)
    kp, vp = jnp.pad(k, kpad), jnp.pad(v, kpad)
    dsum = jnp.pad(dsum, ((0, 0), (0, lq_pad - lq)))
    if l2.shape[1] != lq_pad:
        # the forward pads lq by ITS block_q (up to 1024), which can
        # exceed or undershoot this kernel's lq_pad — normalize by
        # trimming to lq first (padded rows carry no signal)
        l2 = jnp.pad(l2[:, :lq], ((0, 0), (0, lq_pad - lq)))
    masked = lk_pad != kv_len

    q_spec_i = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    k_spec_j = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                            memory_space=pltpu.VMEM)
    row_spec_i = pl.BlockSpec((bh, block_q), lambda b, i, j: (0, i),
                              memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, kv_len=kv_len,
                          block_k=block_k, masked=masked),
        grid=(bh, lq_pad // block_q, lk_pad // block_k),
        in_specs=[q_spec_i, k_spec_j, k_spec_j, q_spec_i, row_spec_i,
                  row_spec_i],
        out_specs=q_spec_i,
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, l2, dsum)

    q_spec_kv = pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    k_spec_kv = pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                             memory_space=pltpu.VMEM)
    row_spec_kv = pl.BlockSpec((bh, block_q), lambda b, j, i: (0, i),
                               memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, kv_len=kv_len,
                          block_k=block_k, masked=masked),
        grid=(bh, lk_pad // block_k, lq_pad // block_q),
        in_specs=[q_spec_kv, k_spec_kv, k_spec_kv, q_spec_kv, row_spec_kv,
                  row_spec_kv],
        out_specs=[k_spec_kv, k_spec_kv],
        out_shape=[jax.ShapeDtypeStruct((bh, lk_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, lk_pad, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, l2, dsum)

    return dq[:, :lq], dk[:, :kv_len], dv[:, :kv_len]
