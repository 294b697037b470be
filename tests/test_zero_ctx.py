"""CFG zero-context cross-attention shortcut is exact.

With bias-free k/v projections (SD-2.1 UNet attention), cross-attention
over an all-zero context equals the to_out bias for every query — the
shortcut skips that compute for the unconditional CFG half. These tests
check bit-level-tolerance equality against the full computation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.nn.transformer import (
    transformer_block_apply, transformer_block_init,
)
from pcdms_tpu.nn.unet_blocks import transformer2d_apply, transformer2d_init


class TestZeroCtxShortcut:
    def test_block_matches_full_compute(self):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        p = transformer_block_init(k1, 32, 2, 16, context_dim=24)
        x = jax.random.normal(k2, (4, 10, 32))
        ctx_cond = jax.random.normal(k3, (2, 7, 24))
        ctx = jnp.concatenate([jnp.zeros((2, 7, 24)), ctx_cond], axis=0)

        full = transformer_block_apply(p, x, ctx, heads=2, use_flash=False)
        fast = transformer_block_apply(p, x, ctx, heads=2, use_flash=False,
                                       zero_ctx_prefix=2)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                                   atol=1e-5, rtol=1e-5)

    def test_transformer2d_matches(self):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        p = transformer2d_init(k1, 16, 2, 8, context_dim=24)
        x = jax.random.normal(k2, (4, 8, 8, 16))
        ctx = jnp.concatenate(
            [jnp.zeros((2, 7, 24)), jax.random.normal(k3, (2, 7, 24))], 0)
        full = transformer2d_apply(p, x, ctx, heads=2, use_flash=False,
                                   num_groups=4)
        fast = transformer2d_apply(p, x, ctx, heads=2, use_flash=False,
                                   num_groups=4, zero_ctx_prefix=2)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                                   atol=1e-5, rtol=1e-5)

    def test_biased_kv_falls_back(self):
        # with qkv_bias=True the shortcut must not be taken (output of a
        # zero context is NOT the to_out bias); result must still match
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
        p = transformer_block_init(k1, 32, 2, 16, context_dim=24,
                                   qkv_bias=True)
        x = jax.random.normal(k2, (4, 10, 32))
        ctx = jnp.concatenate(
            [jnp.zeros((2, 7, 24)), jax.random.normal(k3, (2, 7, 24))], 0)
        full = transformer_block_apply(p, x, ctx, heads=2, use_flash=False)
        fast = transformer_block_apply(p, x, ctx, heads=2, use_flash=False,
                                       zero_ctx_prefix=2)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                                   atol=1e-6)
