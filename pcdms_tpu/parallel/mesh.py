"""Device mesh and sharding rules.

Replaces the reference's accelerate/DeepSpeed/NCCL stack (SURVEY.md §2.6)
with a single-controller SPMD program: one 1-D ``('data',)`` mesh over a
v5e slice's ICI, NamedSharding on batch dimensions, XLA-emitted collectives
for gradient reduction, and optional ZeRO-1-style optimizer-state sharding
along the data axis. Multi-host scale-out only changes the device list.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def zero1_shardings(tree, mesh: Mesh, axis_name: str = "data",
                    min_size: int = 2 ** 14):
    """ZeRO-1-equivalent sharding tree for optimizer state: each large leaf
    is sharded along its first axis divisible by the mesh size; small or
    indivisible leaves stay replicated."""
    n = mesh.shape[axis_name]

    def rule(x):
        if not hasattr(x, "shape") or x.size < min_size:
            return NamedSharding(mesh, P())
        for dim, size in enumerate(x.shape):
            if size % n == 0 and size >= n:
                spec = [None] * len(x.shape)
                spec[dim] = axis_name
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch onto the mesh, sharded along the batch axis."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def pad_and_shard(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Pad each array's leading (batch) dim up to a multiple of the mesh
    size — repeating the final element, so padded rows compute valid (if
    redundant) results — and place it on the mesh sharded along the batch
    axis. ``None`` entries pass through unchanged. All non-None arrays must
    share the leading dim.

    This is the SPMD replacement for the reference's one-process-per-GPU
    inference fan-out (stage1_batchtest_prior_model.py:155-177): a ragged
    final chunk still runs on every device. Returns
    ``(*sharded_arrays, padded_n)``.
    """
    import numpy as np

    n_dev = mesh.devices.size
    n = next(a for a in arrays if a is not None).shape[0]
    n_pad = -(-n // n_dev) * n_dev
    sharding = batch_sharding(mesh, axis_name)
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        a = np.asarray(a)
        if n_pad != n:
            a = np.concatenate(
                [a, np.repeat(a[-1:], n_pad - n, axis=0)], axis=0)
        out.append(jax.device_put(a, sharding))
    return (*out, n_pad)
