"""Frozen-encoder embedding cache (train/embed_cache.py): build/lookup
roundtrip, dropout -> zero-image row semantics, and cached-vs-recomputed
equality through the actual train-CLI batch builders
(reference re-encodes every step: stage1_train_prior_model.py:263-270)."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from pcdms_tpu.cli.common import tiny_configs
from pcdms_tpu.models.vit import vit_init
from pcdms_tpu.train.embed_cache import EmbeddingCache, build_or_load

NAMES = ["im0.jpg", "im1.jpg", "im2.jpg", "im3.jpg"]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("df_cache")
    img_dir = root / "train_all_png"
    txt_dir = root / "normalized_pose_txt"
    pose_dir = root / "openpose_all_img"
    for d in (img_dir, txt_dir, pose_dir):
        d.mkdir()
    rng = np.random.default_rng(0)
    for name in NAMES:
        stem = name.rsplit(".", 1)[0]
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{stem}.png")
        parr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(parr).save(pose_dir / f"{stem}_pose.jpg")
        coords = rng.uniform(0.05, 0.95, (18, 2))
        with open(txt_dir / f"{stem}.txt", "w") as f:
            for x, y in coords:
                f.write(f"{x} {y}\n")
    pairs = [{"source_image": f"train_all_png/{NAMES[i]}",
              "target_image": f"train_all_png/{NAMES[(i + 1) % 4]}"}
             for i in range(4)]
    json_path = root / "train_pairs.json"
    json_path.write_text(json.dumps(pairs))
    return str(root), str(json_path)


class TestEmbeddingCache:
    def _paths(self, tmp_path, n=5):
        paths = []
        rng = np.random.default_rng(1)
        for i in range(n):
            p = tmp_path / f"x{i}.png"
            Image.fromarray(rng.integers(0, 255, (8, 8, 3),
                                         dtype=np.uint8)).save(p)
            paths.append(str(p))
        return paths

    def test_roundtrip_and_zero_row(self, tmp_path):
        paths = self._paths(tmp_path)

        def pre(p):
            return np.asarray(Image.open(p), np.float32) / 255.0

        def encode(px):                       # fake encoder: channel means
            return px.mean(axis=(1, 2))

        cache = EmbeddingCache(str(tmp_path / "cache"), "mean")
        cache.build(encode, pre, paths, batch_size=2)

        out = cache.lookup(paths)
        expect = np.stack([encode(pre(p)[None])[0] for p in paths])
        np.testing.assert_allclose(out, expect, atol=1e-6)

        dropped = np.array([1, 0, 1, 0, 0], np.float32)
        out = cache.lookup(paths, dropped)
        np.testing.assert_allclose(out[0], 0.0, atol=1e-6)  # zero-image row
        np.testing.assert_allclose(out[1], expect[1], atol=1e-6)

    def test_build_or_load_reuses(self, tmp_path):
        paths = self._paths(tmp_path)

        def pre(p):
            return np.asarray(Image.open(p), np.float32) / 255.0

        calls = []

        def encode(px):
            calls.append(len(px))
            return px.mean(axis=(1, 2))

        c1 = build_or_load(str(tmp_path / "c"), "m", encode, pre, paths)
        n_calls = len(calls)
        c2 = build_or_load(str(tmp_path / "c"), "m", encode, pre, paths)
        assert len(calls) == n_calls          # no re-encode on reload
        np.testing.assert_allclose(c2.lookup(paths), c1.lookup(paths))


class TestStage1CachedBatches:
    def _args(self, dataset, cache_dir=None, drops=("0.0", "0.0", "0.0")):
        from pcdms_tpu.cli.stage1_train import parse_args
        root, jp = dataset
        argv = ["--json_path", jp, "--image_root_path", root,
                "--output_dir", "/tmp/unused", "--img_width", "64",
                "--img_height", "64", "--train_batch_size", "4",
                "--s_img_drop_rate", drops[0],
                "--s_pose_drop_rate", drops[1],
                "--t_pose_drop_rate", drops[2], "--random_init"]
        if cache_dir:
            argv += ["--cache_embeddings", cache_dir]
        return parse_args(argv)

    def test_cached_matches_recomputed(self, dataset, tmp_path):
        from pcdms_tpu.cli.stage1_train import make_batches
        tiny = tiny_configs()
        clip = vit_init(jax.random.PRNGKey(0), tiny.clip)

        plain = next(make_batches(self._args(dataset), clip,
                                  clip_cfg=tiny.clip))
        cached = next(make_batches(
            self._args(dataset, str(tmp_path / "cache")), clip,
            clip_cfg=tiny.clip))
        for k in ("s_embed", "t_embed"):
            np.testing.assert_allclose(np.asarray(cached[k]),
                                       np.asarray(plain[k]), atol=2e-5)
        for k in ("s_pose", "t_pose"):
            np.testing.assert_array_equal(cached[k], plain[k])

    def test_dropout_hits_zero_image_row(self, dataset, tmp_path):
        from pcdms_tpu.cli.stage1_train import make_batches
        tiny = tiny_configs()
        clip = vit_init(jax.random.PRNGKey(0), tiny.clip)

        drop_all = ("1.0", "0.0", "0.0")
        plain = next(make_batches(self._args(dataset, drops=drop_all),
                                  clip, clip_cfg=tiny.clip))
        cached = next(make_batches(
            self._args(dataset, str(tmp_path / "cache2"), drops=drop_all),
            clip, clip_cfg=tiny.clip))
        # all source images dropped: both paths must produce the
        # zero-image embedding, and all rows must be identical
        np.testing.assert_allclose(np.asarray(cached["s_embed"]),
                                   np.asarray(plain["s_embed"]), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(cached["s_embed"]),
            np.broadcast_to(np.asarray(cached["s_embed"])[0],
                            cached["s_embed"].shape), atol=1e-6)


class TestStage2CachedBatches:
    def test_cached_matches_recomputed(self, dataset, tmp_path):
        from pcdms_tpu.cli.stage2_train import make_batches, parse_args
        root, jp = dataset
        tiny = tiny_configs()
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        clip = vit_init(ks[0], tiny.clip)
        dino = vit_init(ks[1], tiny.dino)

        def args(cache=None):
            argv = ["--json_path", jp, "--image_root_path", root,
                    "--output_dir", "/tmp/unused", "--img_width", "64",
                    "--img_height", "64", "--train_batch_size", "4",
                    "--imgp_drop_rate", "0.0", "--imgg_drop_rate", "0.0",
                    "--random_init"]
            if cache:
                argv += ["--cache_embeddings", cache]
            return parse_args(argv)

        plain = next(make_batches(args(), clip, dino, clip_cfg=tiny.clip,
                                  dino_cfg=tiny.dino))
        cached = next(make_batches(args(str(tmp_path / "c")), clip, dino,
                                   clip_cfg=tiny.clip, dino_cfg=tiny.dino))
        # dino rows are stored fp16
        np.testing.assert_allclose(np.asarray(cached["dino_features"]),
                                   np.asarray(plain["dino_features"]),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(cached["clip_embed"]),
                                   np.asarray(plain["clip_embed"]),
                                   atol=2e-5)
        for k in ("st_image", "masked_image", "pose_image"):
            np.testing.assert_array_equal(cached[k], plain[k])
        assert os.path.exists(os.path.join(str(tmp_path / "c"),
                                           "s2_dino_64x64", "data.npy"))
