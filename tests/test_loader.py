"""Multi-worker input pipeline (data/loader.py): worker-count-invariant,
seed-deterministic batch streams; device prefetch; train-CLI integration.

The reference trains behind a torch DataLoader with worker processes
(/root/reference/stage1_train_prior_model.py:158-173); these tests pin
the stronger determinism contract of the thread-pool replacement.
"""

import json
import time

import jax
import numpy as np
import pytest
from PIL import Image

from pcdms_tpu.data.datasets import (
    PairList, Stage1Dataset, Stage2Dataset, batch_iterator,
)
from pcdms_tpu.data.loader import DataLoader, prefetch_to_device
from pcdms_tpu.parallel.mesh import make_mesh

NAMES = [f"im{i}.jpg" for i in range(6)]


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("df_loader")
    img_dir = root / "train_all_png"
    txt_dir = root / "normalized_pose_txt"
    pose_dir = root / "openpose_all_img"
    for d in (img_dir, txt_dir, pose_dir):
        d.mkdir()
    rng = np.random.default_rng(0)
    for name in NAMES:
        stem = name.rsplit(".", 1)[0]
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{stem}.png")
        parr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(parr).save(pose_dir / f"{stem}_pose.jpg")
        coords = rng.uniform(0.05, 0.95, (18, 2))
        with open(txt_dir / f"{stem}.txt", "w") as f:
            for x, y in coords:
                f.write(f"{x} {y}\n")
    pairs = [{"source_image": f"train_all_png/{NAMES[i]}",
              "target_image": f"train_all_png/{NAMES[(i + 1) % len(NAMES)]}"}
             for i in range(len(NAMES))]
    json_path = root / "pairs.json"
    json_path.write_text(json.dumps(pairs))
    return str(root), str(json_path)


def _stage2(dataset_dir, seed=3):
    root, jp = dataset_dir
    pairs = PairList(jp, root)
    return Stage2Dataset(pairs, size=(32, 32), imgp_drop_rate=0.5,
                         imgg_drop_rate=0.5, seed=seed, embed_refs=True)


def _collect(loader, n):
    out = []
    for batch in loader:
        out.append(batch)
        if len(out) == n:
            break
    return out


class TestWorkerInvariance:
    @pytest.mark.parametrize("workers", [1, 3, 7])
    def test_stream_identical_to_serial(self, dataset_dir, workers):
        """num_workers=k must produce byte-identical batches to
        num_workers=0 — including the 0.5-rate condition dropout draws."""
        ref = _collect(DataLoader(_stage2(dataset_dir), 2, seed=7), 5)
        got = _collect(DataLoader(_stage2(dataset_dir), 2, seed=7,
                                  num_workers=workers,
                                  prefetch_batches=3), 5)
        assert len(ref) == len(got)
        for a, b in zip(ref, got):
            assert sorted(a) == sorted(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_seed_changes_stream(self, dataset_dir):
        a = _collect(DataLoader(_stage2(dataset_dir, seed=1), 2, seed=1), 3)
        b = _collect(DataLoader(_stage2(dataset_dir, seed=2), 2, seed=2), 3)
        assert any(not np.array_equal(x["st_image"], y["st_image"])
                   for x, y in zip(a, b))

    def test_same_seed_reproduces(self, dataset_dir):
        a = _collect(DataLoader(_stage2(dataset_dir), 2, seed=5,
                                num_workers=4), 4)
        b = _collect(DataLoader(_stage2(dataset_dir), 2, seed=5,
                                num_workers=2), 4)
        for x, y in zip(a, b):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k])

    def test_matches_batch_iterator_shuffle_order(self, dataset_dir):
        """The index plan (shuffle permutation per epoch, drop_last) is the
        same stream batch_iterator uses, so switching the CLIs to the
        worker loader did not change which examples form each batch."""
        root, jp = dataset_dir
        pairs = PairList(jp, root)
        ds_a = Stage1Dataset(pairs, size=(32, 32), seed=0)
        ds_b = Stage1Dataset(pairs, size=(32, 32), seed=0)
        a = _collect(batch_iterator(ds_a, 4, seed=9), 3)
        b = _collect(DataLoader(ds_b, 4, seed=9), 3)
        for x, y in zip(a, b):
            # no dropout configured -> pixel content must match exactly
            np.testing.assert_array_equal(x["clip_s_img"], y["clip_s_img"])
            np.testing.assert_array_equal(x["s_pose"], y["s_pose"])

    def test_epochs_bound_and_drop_last(self, dataset_dir):
        ds = _stage2(dataset_dir)
        batches = list(DataLoader(ds, 4, epochs=2, num_workers=2))
        # 6 examples, batch 4, drop_last -> 1 batch/epoch x 2 epochs
        assert len(batches) == 2
        assert all(b["st_image"].shape[0] == 4 for b in batches)

    def test_too_small_dataset_raises(self, dataset_dir):
        with pytest.raises(ValueError, match="no batch can ever be formed"):
            DataLoader(_stage2(dataset_dir), 16)

    def test_empty_dataset_raises_even_without_drop_last(self):
        # with drop_last=False an empty dataset used to busy-spin forever
        # in _index_batches (epochs=None yields nothing, epoch += 1)
        class Empty:
            def __len__(self):
                return 0

        with pytest.raises(ValueError, match="no batch can ever be formed"):
            DataLoader(Empty(), 4, drop_last=False)

    def test_worker_exception_propagates(self, dataset_dir):
        class Boom:
            def __len__(self):
                return 8

            def fetch(self, idx, epoch=0):
                if idx >= 0:
                    raise RuntimeError("decode failed")

        with pytest.raises(RuntimeError, match="decode failed"):
            next(iter(DataLoader(Boom(), 2, num_workers=2)))


class TestOverlap:
    def test_workers_overlap_slow_fetch(self):
        """With a slow fetch and a consumer that also takes time per batch,
        the pool must hide fetch latency (wall clock well under the serial
        sum)."""
        class Slow:
            def __len__(self):
                return 64

            def fetch(self, idx, epoch=0):
                time.sleep(0.02)
                return {"x": np.full((4,), idx, np.float32)}

        n_batches, bs = 8, 4
        serial = n_batches * bs * 0.02 + n_batches * 0.02
        # serial would be ~0.8s; the pool must cut it at least in half.
        # Wall-clock bound on a shared single-core host: allow a couple
        # of retries so transient CPU contention (e.g. a concurrent
        # compile elsewhere on the box) doesn't flake the assertion.
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in _collect(DataLoader(Slow(), bs, num_workers=8,
                                         prefetch_batches=4), n_batches):
                time.sleep(0.02)       # simulated device step
            t_pool = time.perf_counter() - t0
            times.append(t_pool)
            if t_pool < serial * 0.5:
                break
        assert min(times) < serial * 0.5, (times, serial)


class TestDevicePrefetch:
    def test_prefetch_preserves_stream_and_shards(self):
        mesh = make_mesh()

        def gen():
            for i in range(5):
                yield {"x": np.full((8, 4), i, np.float32)}

        out = list(prefetch_to_device(gen(), mesh, depth=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert isinstance(b["x"], jax.Array)
            assert b["x"].sharding.spec == jax.sharding.PartitionSpec("data")
            np.testing.assert_array_equal(np.asarray(b["x"]),
                                          np.full((8, 4), i, np.float32))

    def test_prefetch_empty_iterator(self):
        mesh = make_mesh()
        assert list(prefetch_to_device(iter(()), mesh)) == []

    def test_prefetch_runs_ahead(self):
        """The window must pull depth batches beyond the one consumed."""
        mesh = make_mesh()
        pulled = []

        def gen():
            for i in range(6):
                pulled.append(i)
                yield {"x": np.zeros((8,), np.float32)}

        it = prefetch_to_device(gen(), mesh, depth=2)
        next(it)
        assert len(pulled) >= 3


class TestTrainCliUsesLoader:
    def test_stage2_make_batches_with_workers(self, dataset_dir):
        """make_batches honors --dataloader_num_workers and yields the
        same batches regardless of the worker count."""
        from pcdms_tpu.cli.common import tiny_configs
        from pcdms_tpu.cli.stage2_train import make_batches, parse_args
        from pcdms_tpu.models.vit import vit_init
        root, jp = dataset_dir
        tiny = tiny_configs()
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        clip, dino = vit_init(ks[0], tiny.clip), vit_init(ks[1], tiny.dino)

        def args(workers):
            return parse_args([
                "--json_path", jp, "--image_root_path", root,
                "--output_dir", "/tmp/unused", "--img_width", "32",
                "--img_height", "32", "--train_batch_size", "4",
                "--imgp_drop_rate", "0.5", "--imgg_drop_rate", "0.5",
                "--random_init",
                "--dataloader_num_workers", str(workers)])

        serial = next(make_batches(args(0), clip, dino, clip_cfg=tiny.clip,
                                   dino_cfg=tiny.dino))
        pooled = next(make_batches(args(4), clip, dino, clip_cfg=tiny.clip,
                                   dino_cfg=tiny.dino))
        for k in serial:
            np.testing.assert_array_equal(np.asarray(serial[k]),
                                          np.asarray(pooled[k]))


class TestAutoWorkers:
    def test_resolve(self, monkeypatch):
        from pcdms_tpu.data import loader
        assert loader.resolve_num_workers(0) == 0
        assert loader.resolve_num_workers(5) == 5
        monkeypatch.setattr(loader.os, "cpu_count", lambda: 1)
        assert loader.resolve_num_workers(-1) == 0
        monkeypatch.setattr(loader.os, "cpu_count", lambda: 4)
        assert loader.resolve_num_workers(-1) == 4
        monkeypatch.setattr(loader.os, "cpu_count", lambda: 64)
        assert loader.resolve_num_workers(-1) == 8

    def test_auto_stream_identical(self, dataset_dir):
        a = _collect(DataLoader(_stage2(dataset_dir), 2, seed=3,
                                num_workers=-1), 3)
        b = _collect(DataLoader(_stage2(dataset_dir), 2, seed=3,
                                num_workers=0), 3)
        for x, y in zip(a, b):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k])
