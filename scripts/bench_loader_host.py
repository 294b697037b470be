"""Host input-pipeline feed rate at the training shapes (no TPU needed).

The end-to-end real-vs-synthetic step A/B cannot be measured through the
axon tunnel: a batch-8 256px canvas batch is ~37 MB and the tunnel's
host->device link is ~1 MB/s, so transfer dominates any step timing —
an artifact of the remote-TPU harness (a real v5e host feeds HBM over
PCIe at GB/s). What the host *can* prove locally is the input pipeline's
sustained examples/s at the exact training shapes, against the measured
device demand rates (PERF.md: 26.5 ex/s/chip at 256px, 1.92 at 512px).

Measures Stage2Dataset through DataLoader for several worker counts, in
both cache mode (embed_refs=True: decode + canvases only) and encoder
mode (embed_refs=False: + CLIP preprocessing for the DINOv2/CLIP
branches, the reference's per-step path).

Usage: python scripts/bench_loader_host.py [--px 512] [--pairs 96]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from scripts.bench_loader_ab import build_dataset  # noqa: E402


def measure(dataset, batch, workers, n_batches):
    from pcdms_tpu.data.loader import DataLoader
    loader = DataLoader(dataset, batch, num_workers=workers,
                        prefetch_batches=4, seed=0)
    it = iter(loader)
    next(it)                                  # warm the pool
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    return batch * n_batches / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--px", type=int, default=512)
    ap.add_argument("--pairs", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--root", type=str, default=None)
    args = ap.parse_args()

    from pcdms_tpu.data.datasets import PairList, Stage2Dataset

    root = args.root or tempfile.mkdtemp(prefix="loader_host_")
    jp = build_dataset(root, args.pairs, args.px)
    pairs = PairList(jp, root)

    out = {"px": args.px, "batch": args.batch}
    for mode, embed_refs in (("cache", True), ("encoder", False)):
        for workers in (0, 2, 4, 8, 16):
            ds = Stage2Dataset(pairs, size=(args.px, args.px),
                               imgp_drop_rate=0.1, imgg_drop_rate=0.1,
                               seed=0, embed_refs=embed_refs)
            rate = measure(ds, args.batch, workers, args.batches)
            out[f"{mode}_w{workers}"] = round(rate, 2)
            print(f"{mode} workers={workers}: {rate:.1f} examples/s",
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
