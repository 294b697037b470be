"""Pytree utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_pytree(tree, dtype):
    """Cast all floating-point leaves to dtype (done once, outside sampling
    loops, so weights aren't re-cast on every denoising step)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree) if hasattr(x, "size"))


def param_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, "size"))
