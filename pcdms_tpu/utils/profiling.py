"""Profiling / observability helpers.

The reference has no tracing beyond wall-clock prints (SURVEY.md §5).
Here: ``jax.profiler`` trace capture, a throughput meter for the
images/sec/chip north-star metric, and a remote-TPU-safe timer (under the
axon tunnel ``block_until_ready`` does not block; only a host read of a
scalar synchronizes — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


_checksum = jax.jit(jnp.sum)


def sync(x) -> float:
    """Force execution and synchronization of a device value by reading a
    single reduced scalar back to the host (tunnel-safe)."""
    return float(_checksum(x))


class ThroughputMeter:
    """Rolling images/sec/chip counter for training/eval loops."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._count = 0

    def update(self, n_examples: int):
        self._count += n_examples

    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._count / max(dt, 1e-9)

    def rate_per_chip(self) -> float:
        return self.rate() / jax.device_count()


def timed(fn, *args, sync_output: bool = True, **kwargs):
    """Time one call of a jitted function (tunnel-safe). Returns
    (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    if sync_output:
        leaf = jax.tree.leaves(out)[0]
        sync(leaf)
    return out, time.perf_counter() - t0
