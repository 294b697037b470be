"""Overlapped multi-worker input pipeline.

TPU-native replacement for the reference's ``torch.utils.data.DataLoader``
with worker processes + ``DistributedSampler``
(/root/reference/stage1_train_prior_model.py:158-173, hardcoded
``num_workers=8``; stage2 ``:238`` uses 2, stage3 ``:218`` uses 8): a
thread pool decodes/composites examples concurrently while the device
steps, and ``prefetch_to_device`` keeps a bounded window of batches
already sharded onto the mesh.

Design notes (why threads, not processes): per-example host work here is
PIL decode/resize/paste and numpy stacking — all of which release the
GIL — so a thread pool reaches the same overlap as torch's fork-per-worker
model without pickling datasets across process boundaries, and it keeps
the single-controller JAX process model intact (a forked child must never
touch the TPU client). Determinism is *stronger* than the reference:
example randomness is keyed by ``(seed, epoch, index)``
(``datasets.fetch``), so the batch stream is byte-identical for any
``num_workers`` — torch's worker RNG streams are worker-count-dependent.
"""

from __future__ import annotations

import collections
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def resolve_num_workers(n: int) -> int:
    """-1 -> auto: min(8, cpu_count). On a single-core host extra worker
    threads only add switching overhead (measured ~10% at 64px,
    PERF.md 'Input pipeline'), so auto picks 0 there; the reference
    hardcodes 8 (stage1_train_prior_model.py:171)."""
    if n >= 0:
        return n
    cpus = os.cpu_count() or 1
    return 0 if cpus == 1 else min(8, cpus)


def _index_batches(n: int, batch_size: int, *, shuffle: bool, seed: int,
                   drop_last: bool, epochs: Optional[int]):
    """Yield (epoch, index-array) batches — the same shuffle stream as
    ``batch_iterator`` (one ``default_rng(seed)`` permutation per epoch)."""
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        end = n - (n % batch_size) if drop_last else n
        for start in range(0, end, batch_size):
            yield epoch, order[start:start + batch_size]
        epoch += 1


def _stack(examples) -> Dict[str, np.ndarray]:
    return {k: np.stack([e[k] for e in examples]) for k in examples[0]}


class DataLoader:
    """Iterable of stacked numpy batches with background workers.

    ``num_workers=0`` fetches inline (still through the stateless
    ``dataset.fetch`` path, so the stream is identical to any worker
    count). ``prefetch_batches`` bounds how many batches may be in
    flight ahead of the consumer.
    """

    def __init__(self, dataset, batch_size: int, *, num_workers: int = 0,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 epochs: Optional[int] = None, prefetch_batches: int = 2):
        n = len(dataset)
        if n == 0 or (drop_last and n < batch_size):
            raise ValueError(
                f"dataset has {n} examples (batch_size {batch_size}, "
                f"drop_last={drop_last}): no batch can ever be formed "
                "(with epochs=None this would spin forever)")
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = resolve_num_workers(num_workers)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epochs = epochs
        self.prefetch_batches = max(1, prefetch_batches)

    def _plan(self):
        return _index_batches(len(self.dataset), self.batch_size,
                              shuffle=self.shuffle, seed=self.seed,
                              drop_last=self.drop_last, epochs=self.epochs)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.num_workers <= 0:
            for epoch, idxs in self._plan():
                yield _stack([self.dataset.fetch(int(i), epoch)
                              for i in idxs])
            return
        yield from self._iter_workers()

    def _iter_workers(self):
        plan = self._plan()
        window: collections.deque = collections.deque()
        with ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix="pcdms-data") as pool:

            def submit_next() -> bool:
                try:
                    epoch, idxs = next(plan)
                except StopIteration:
                    return False
                window.append([pool.submit(self.dataset.fetch, int(i), epoch)
                               for i in idxs])
                return True

            for _ in range(self.prefetch_batches):
                if not submit_next():
                    break
            while window:
                futures = window.popleft()
                submit_next()
                # .result() re-raises worker exceptions on the consumer
                # thread — a failing decode fails the train loop loudly,
                # matching torch DataLoader semantics
                yield _stack([f.result() for f in futures])


def prefetch_to_device(batches, mesh, depth: int = 2,
                       axis_name=None):
    """Shard each host batch onto the mesh ``depth`` batches ahead of the
    consumer. ``device_put`` is asynchronous, so the host→HBM copies for
    batch N+1/N+2 overlap the device step on batch N — the reference gets
    this overlap from torch's pinned-memory ``DataLoader`` + cuda streams;
    under XLA a lookahead window over async transfers is the equivalent.
    """
    from pcdms_tpu.parallel.mesh import shard_batch

    window = collections.deque()
    it = iter(batches)
    exhausted = False
    while True:
        # fill to depth+1 so that AFTER the yield the consumer holds one
        # batch and `depth` sharded batches sit ahead of it (the
        # documented lookahead); peak device residency is depth+2
        # full-size batches (consumed + window) — size device_prefetch
        # accordingly on memory-tight chips
        while not exhausted and len(window) <= depth:
            try:
                window.append(shard_batch(next(it), mesh,
                                          axis_name=axis_name))
            except StopIteration:
                exhausted = True
        if not window:
            return
        yield window.popleft()
