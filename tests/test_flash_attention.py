"""Pallas flash-attention kernel vs plain XLA attention (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdms_tpu.ops.flash_attention import attention_reference, flash_attention


@pytest.mark.parametrize("lq,lk", [
    (256, 256),     # aligned self-attention
    (512, 512),     # multi-block
    (300, 258),     # ragged (cross-attention over 258 image tokens)
    (64, 77),       # small + ragged
])
def test_kernel_matches_reference(lq, lk):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, d = 2, 3, 64
    q = jax.random.normal(kq, (b, h, lq, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, lk, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, lk, d), jnp.float32)

    expected = attention_reference(q, k, v)
    got = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=2e-5)


def test_kernel_bf16(
):
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, lq, d = 1, 2, 256, 64
    q = jax.random.normal(kq, (b, h, lq, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, lq, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, lq, d), jnp.bfloat16)
    expected = attention_reference(q.astype(jnp.float32),
                                   k.astype(jnp.float32),
                                   v.astype(jnp.float32))
    got = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(expected), atol=3e-2, rtol=3e-2)


def test_exp_bf16_path_matches_reference():
    """The bf16-softmax throughput lever (PCDMS_EXP_BF16) stays within
    bf16 rounding of the exact softmax: the score tile is demoted to
    bf16 before max/exp2, which perturbs attention weights by ~2^-8
    relative — the same order as the bf16 PV matmul input cast."""
    from pcdms_tpu.ops.flash_attention import _flash_3d_diff

    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    bh, lq, lk, d = 4, 256, 256, 64
    q = jax.random.normal(kq, (bh, lq, d), jnp.float32)
    k = jax.random.normal(kk, (bh, lk, d), jnp.float32)
    v = jax.random.normal(kv, (bh, lk, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    expected = attention_reference(q[:, None], k[:, None], v[:, None],
                                   scale)[:, 0]
    got = _flash_3d_diff(q, k, v, float(scale), 128, 128, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-2, rtol=2e-2)
    # masked / ragged kv under bf16 softmax still exact-zero beyond kv_len
    got_ragged = _flash_3d_diff(q, k[:, :200], v[:, :200], float(scale),
                                128, 128, True, True)
    exp_ragged = attention_reference(q[:, None], k[:, None, :200],
                                     v[:, None, :200], scale)[:, 0]
    np.testing.assert_allclose(np.asarray(got_ragged),
                               np.asarray(exp_ragged), atol=2e-2, rtol=2e-2)


def test_softmax_stability_large_logits():
    q = jnp.full((1, 1, 128, 64), 8.0, jnp.float32)
    k = jnp.full((1, 1, 128, 64), 8.0, jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 128, 64))
    got = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    assert np.isfinite(np.asarray(got)).all()
    # uniform attention -> output = mean of v
    np.testing.assert_allclose(
        np.asarray(got[0, 0, 0]), np.asarray(jnp.mean(v[0, 0], axis=0)),
        atol=1e-5)


class TestFlashGradients:
    """custom_vjp: Pallas forward, chunked exact-recompute backward."""

    def _setup(self, lq=96, lk=160, d=16):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(k1, (2, lq, d))
        k = jax.random.normal(k2, (2, lk, d))
        v = jax.random.normal(k3, (2, lk, d))
        return q, k, v

    def test_grads_match_reference(self):
        from pcdms_tpu.ops.flash_attention import (
            _flash_3d_diff, attention_reference,
        )
        q, k, v = self._setup()
        scale = 0.25

        def f_kernel(q, k, v):
            return jnp.sum(jnp.sin(
                _flash_3d_diff(q, k, v, scale, 64, 64, True)))

        def f_ref(q, k, v):
            return jnp.sum(jnp.sin(attention_reference(
                q[:, None], k[:, None], v[:, None], scale)[:, 0]))

        g_kernel = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_kernel, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=2e-3)

    def test_grads_with_chunk_padding(self):
        # lq not a multiple of the backward chunk size
        import importlib
        fa = importlib.import_module("pcdms_tpu.ops.flash_attention")
        q, k, v = self._setup(lq=70, lk=128)
        old = fa._BWD_CHUNK
        fa._BWD_CHUNK = 32
        try:
            def f(q, k, v):
                return jnp.sum(fa._flash_3d_diff(q, k, v, 0.25, 64, 64,
                                                 True) ** 2)

            def f_ref(q, k, v):
                return jnp.sum(fa.attention_reference(
                    q[:, None], k[:, None], v[:, None], 0.25)[:, 0] ** 2)

            g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
            gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
            for a, b in zip(g, gr):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=2e-3, rtol=2e-3)
        finally:
            fa._BWD_CHUNK = old


class TestShortKVKernel:
    def test_matches_reference(self):
        from pcdms_tpu.ops.flash_attention import _shortkv_attention_3d
        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        q = jax.random.normal(ks[0], (3, 100, 16))
        k = jax.random.normal(ks[1], (3, 258, 16))
        v = jax.random.normal(ks[2], (3, 258, 16))
        out = _shortkv_attention_3d(q, k, v, 0.25, 128, True)
        want = attention_reference(q[:, None], k[:, None], v[:, None],
                                   0.25)[:, 0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_gradients(self):
        from pcdms_tpu.ops.flash_attention import _shortkv_3d_diff
        ks = jax.random.split(jax.random.PRNGKey(12), 3)
        q = jax.random.normal(ks[0], (2, 64, 16))
        k = jax.random.normal(ks[1], (2, 130, 16))
        v = jax.random.normal(ks[2], (2, 130, 16))

        def f(q, k, v):
            return jnp.sum(_shortkv_3d_diff(q, k, v, 0.25, 64, True) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(attention_reference(
                q[:, None], k[:, None], v[:, None], 0.25)[:, 0] ** 2)

        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=2e-3)


def test_q_unroll_matches_base_kernel():
    """q_unroll is a pure scheduling change — bit-identical to the
    single-tile path."""
    from pcdms_tpu.ops.flash_attention import _flash_attention_3d

    key = jax.random.PRNGKey(11)
    kq, kk, kv = jax.random.split(key, 3)
    bh, lq, lk, d = 2, 256, 384, 64
    q = jax.random.normal(kq, (bh, lq, d), jnp.float32)
    k = jax.random.normal(kk, (bh, lk, d), jnp.float32)
    v = jax.random.normal(kv, (bh, lk, d), jnp.float32)
    base = _flash_attention_3d(q, k, v, 0.125, 128, 128, True)
    for qu in (2,):
        got = _flash_attention_3d(q, k, v, 0.125, 128, 128, True,
                                  q_unroll=qu)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))
    # ragged lq exercises the padded tail inside an unrolled step
    got = _flash_attention_3d(q[:, :200], k, v, 0.125, 128, 128, True,
                              q_unroll=2)
    np.testing.assert_array_equal(
        np.asarray(got),
        np.asarray(_flash_attention_3d(q[:, :200], k, v, 0.125, 128, 128,
                                       True)))


def test_frozen_max_matches_base_kernel():
    """Frozen-max softmax shifts every row by a constant that cancels in
    normalization — must agree with the online-max path to fp rounding,
    including the masked ragged-kv tail and large uniform logits."""
    from pcdms_tpu.ops.flash_attention import _flash_attention_3d

    key = jax.random.PRNGKey(12)
    kq, kk, kv = jax.random.split(key, 3)
    bh, lq, lk, d = 2, 256, 384, 64
    q = jax.random.normal(kq, (bh, lq, d), jnp.float32)
    k = jax.random.normal(kk, (bh, lk, d), jnp.float32)
    v = jax.random.normal(kv, (bh, lk, d), jnp.float32)
    base = _flash_attention_3d(q, k, v, 0.125, 128, 128, True)
    for qu in (1, 2):
        got = _flash_attention_3d(q, k, v, 0.125, 128, 128, True,
                                  frozen_max=True, q_unroll=qu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=2e-3, rtol=2e-3)
    # ragged kv: the -1e30 pad mask must survive the frozen shift
    got = _flash_attention_3d(q, k[:, :300], v[:, :300], 0.125, 128, 128,
                              True, frozen_max=True)
    exp = _flash_attention_3d(q, k[:, :300], v[:, :300], 0.125, 128, 128,
                              True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               atol=2e-3, rtol=2e-3)
    # uniform large logits: frozen estimate == true max, finite output
    qb = jnp.full((1, 128, 64), 8.0)
    ob = _flash_attention_3d(qb, qb, jnp.ones((1, 128, 64)), 0.125,
                             128, 128, True, frozen_max=True)
    assert bool(jnp.isfinite(ob).all())
    np.testing.assert_allclose(np.asarray(ob), 1.0, atol=1e-5)
