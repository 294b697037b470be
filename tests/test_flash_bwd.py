"""Pallas flash-attention backward kernels vs reference autodiff
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdms_tpu.ops.flash_attention import attention_reference
from pcdms_tpu.ops.flash_attention_bwd import flash_bwd, flash_fwd_lse


def _setup(lq, lk, d=16, seed=3):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (2, lq, d))
    k = jax.random.normal(ks[1], (2, lk, d))
    v = jax.random.normal(ks[2], (2, lk, d))
    do = jax.random.normal(ks[3], (2, lq, d))
    return q, k, v, do


def _ref_grads(q, k, v, do, scale):
    def f(q, k, v):
        out = attention_reference(q[:, None], k[:, None], v[:, None],
                                  scale)[:, 0]
        return jnp.sum(out * do)
    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


class TestFwdLSE:
    def test_out_and_lse(self):
        q, k, v, _ = _setup(128, 128)
        out, l2 = flash_fwd_lse(q, k, v, 0.25, 64, 64, interpret=True)
        want = attention_reference(q[:, None], k[:, None], v[:, None],
                                   0.25)[:, 0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
        # LSE in exp2 domain: sum over keys of exp2(s2 - L) == 1
        s2 = jnp.einsum("bqd,bkd->bqk", q, k) * 0.25 * 1.4426950408889634
        ones = jnp.sum(jnp.exp2(s2 - l2[..., None]), axis=-1)
        np.testing.assert_allclose(np.asarray(ones),
                                   np.ones_like(ones), atol=1e-4)


class TestFlashBwdKernels:
    @pytest.mark.parametrize("lq,lk", [(128, 128), (192, 256), (70, 130)])
    def test_grads_match_reference(self, lq, lk):
        scale = 0.25
        q, k, v, do = _setup(lq, lk)
        out, l2 = flash_fwd_lse(q, k, v, scale, 64, 64, interpret=True)
        dq, dk, dv = flash_bwd(q, k, v, out, l2, do, scale,
                               block_q=64, block_k=64, interpret=True)
        rq, rk, rv = _ref_grads(q, k, v, do, scale)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                                   atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                                   atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                                   atol=2e-3, rtol=2e-3)


def test_bwd_accepts_wider_forward_lse_padding():
    """The forward pads lq by ITS block_q (up to 1024); flash_bwd's own
    lq_pad can be smaller (512 default), which used to produce a
    negative jnp.pad width. lq=520 with a fwd 1024-block LSE exercises
    the mismatch."""
    from pcdms_tpu.ops.flash_attention_bwd import flash_bwd

    key = jax.random.PRNGKey(3)
    kq, kk, kv, kd = jax.random.split(key, 4)
    bh, lq, lk, d = 1, 520, 640, 64
    q = jax.random.normal(kq, (bh, lq, d), jnp.float32)
    k = jax.random.normal(kk, (bh, lk, d), jnp.float32)
    v = jax.random.normal(kv, (bh, lk, d), jnp.float32)
    do = jax.random.normal(kd, (bh, lq, d), jnp.float32)
    scale = 0.125
    out = attention_reference(q[:, None], k[:, None], v[:, None],
                              scale)[:, 0]
    # forward-style LSE padded to round_up(520, 1024) = 1024 columns
    s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    l2 = jnp.log2(jnp.sum(jnp.exp2(s * 1.4426950408889634), axis=-1))
    l2 = jnp.pad(l2, ((0, 0), (0, 1024 - lq)))
    dq, dk, dv = flash_bwd(q, k, v, out, l2, do, scale, block_q=512,
                           block_k=1024, interpret=True)
    assert dq.shape == q.shape and dk.shape == k.shape
    assert bool(jnp.isfinite(dq).all() and jnp.isfinite(dk).all()
                and jnp.isfinite(dv).all())
