"""Data layer tests with a synthetic DeepFashion-layout fixture."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pcdms_tpu.data.datasets import (
    PairList, Stage1Dataset, Stage2Dataset, Stage3Dataset, batch_iterator,
)
from pcdms_tpu.data.preprocess import (
    CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, clip_preprocess, to_neg1_1,
)


@pytest.fixture(scope="module")
def fake_df(tmp_path_factory):
    root = tmp_path_factory.mktemp("df")
    rng = np.random.default_rng(0)
    for d in ("train_all_png", "normalized_pose_txt", "openpose_all_img",
              "gen"):
        (root / d).mkdir()
    names = ["a", "b", "c"]
    for n in names:
        img = (rng.random((64, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "train_all_png" / f"{n}.png")
        coords = rng.random((18, 2))
        with open(root / "normalized_pose_txt" / f"{n}.txt", "w") as f:
            for x, y in coords:
                f.write(f"{x} {y}\n")
        pose = (rng.random((64, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(pose).save(root / "openpose_all_img"
                                   / f"{n}_pose.jpg")
    Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
        root / "gen" / "a_to_b.png")
    Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
        root / "gen" / "b_to_c.png")
    pairs = [
        {"source_image": "train_all_png/a.jpg",
         "target_image": "train_all_png/b.jpg"},
        {"source_image": "train_all_png/b.jpg",
         "target_image": "train_all_png/c.jpg"},
    ]
    json_path = root / "pairs.json"
    json_path.write_text(json.dumps(pairs))
    return root, str(json_path)


class TestPairList:
    def test_paths(self, fake_df):
        root, json_path = fake_df
        pl = PairList(json_path, str(root))
        assert len(pl) == 2
        assert pl.image_path("train_all_png/a.jpg").endswith(
            "train_all_png/a.png")
        assert "/normalized_pose_txt/" in pl.pose_txt_path(
            "train_all_png/a.jpg")
        assert pl.pose_img_path("train_all_png/a.jpg").endswith(
            "a_pose.jpg")

    def test_shard(self, fake_df):
        root, json_path = fake_df
        pl = PairList(json_path, str(root))
        s0, s1 = pl.shard(0, 2), pl.shard(1, 2)
        assert len(s0) == 1 and len(s1) == 1
        assert s0.pairs[0] != s1.pairs[0]


class TestStage1Dataset:
    def test_example(self, fake_df):
        root, json_path = fake_df
        ds = Stage1Dataset(PairList(json_path, str(root)), size=(32, 32))
        ex = ds[0]
        assert ex["clip_s_img"].shape == (224, 224, 3)
        assert ex["s_pose"].shape == (36,)

    def test_dropout_zeroes(self, fake_df):
        root, json_path = fake_df
        ds = Stage1Dataset(PairList(json_path, str(root)), size=(32, 32),
                           s_img_drop_rate=1.0, t_pose_drop_rate=1.0)
        ex = ds[0]
        assert np.all(ex["clip_s_img"] == 0)
        assert np.all(ex["t_pose"] == 0)
        assert not np.all(ex["clip_t_img"] == 0)


class TestStage2Dataset:
    def test_canvases(self, fake_df):
        root, json_path = fake_df
        ds = Stage2Dataset(PairList(json_path, str(root)), size=(32, 32))
        ex = ds[0]
        assert ex["st_image"].shape == (32, 64, 3)
        assert ex["masked_image"].shape == (32, 64, 3)
        assert ex["pose_image"].shape == (32, 64, 3)
        # right half of masked canvas is black (-1 after normalize)
        np.testing.assert_allclose(ex["masked_image"][:, 32:], -1.0)
        # left halves of masked and GT canvases agree (both = source)
        np.testing.assert_allclose(ex["masked_image"][:, :32],
                                   ex["st_image"][:, :32])


class TestStage3Dataset:
    def test_gen_path_layout(self, fake_df):
        root, json_path = fake_df
        ds = Stage3Dataset(PairList(json_path, str(root)),
                           str(root / "gen"), size=(64, 64))
        assert ds.gen_path(ds.pairs.pairs[0]).endswith("a_to_b.png")
        ex = ds[0]
        assert ex["target_image"].shape == (64, 64, 3)
        assert ex["gen_image"].shape == (64, 64, 3)


class TestBatchIterator:
    def test_batching_and_epochs(self, fake_df):
        root, json_path = fake_df
        ds = Stage1Dataset(PairList(json_path, str(root)), size=(32, 32))
        batches = list(batch_iterator(ds, 2, epochs=2, shuffle=True))
        assert len(batches) == 2              # 2 pairs / bs 2 x 2 epochs
        assert batches[0]["s_pose"].shape == (2, 36)


class TestClipPreprocess:
    def test_normalization_range(self, fake_df):
        img = Image.fromarray(np.full((64, 64, 3), 255, np.uint8))
        out = clip_preprocess(img)
        expected = (1.0 - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        np.testing.assert_allclose(out[0, 0], expected, atol=1e-5)

    def test_non_square_center_crop(self):
        img = Image.fromarray(
            (np.random.default_rng(0).random((100, 60, 3)) * 255
             ).astype(np.uint8))
        out = clip_preprocess(img)
        assert out.shape == (224, 224, 3)

    def test_to_neg1_1(self):
        img = np.array([[[0, 128, 255]]], np.uint8)
        out = to_neg1_1(img)
        np.testing.assert_allclose(out[0, 0], [-1, 128 * 2 / 255 - 1, 1],
                                   atol=1e-6)


class TestSyntheticTrainingData:
    """--synthetic_data CLI mode yields correctly-shaped batches."""

    def _args(self, **kw):
        import argparse
        base = dict(seed=0, train_batch_size=2, img_height=64, img_width=64)
        base.update(kw)
        return argparse.Namespace(**base)

    def test_stage1_shapes(self):
        from pcdms_tpu.cli.stage1_train import synthetic_batches
        b = next(synthetic_batches(self._args()))
        assert b["s_embed"].shape == (2, 1024)
        assert b["s_pose"].shape == (2, 36)

    def test_stage2_shapes(self):
        from pcdms_tpu.cli.stage2_train import synthetic_batches
        b = next(synthetic_batches(self._args()))
        assert b["st_image"].shape == (2, 64, 128, 3)
        assert b["dino_features"].shape == (2, 257, 1536)
        assert b["clip_embed"].shape == (2, 1, 1024)

    def test_stage3_shapes(self):
        from pcdms_tpu.cli.stage3_train import synthetic_batches
        b = next(synthetic_batches(self._args()))
        assert b["target_image"].shape == (2, 64, 64, 3)
        assert b["gen_image"].shape == (2, 64, 64, 3)


def test_clip_preprocess_matches_hf_processor():
    """Pixel-exact parity with transformers' CLIPImageProcessor,
    including non-square inputs where the long resize edge is TRUNCATED
    (int), not rounded — rounding shifts the center crop."""
    pytest.importorskip("transformers")
    from PIL import Image
    from transformers import CLIPImageProcessor

    from pcdms_tpu.data.preprocess import clip_preprocess

    proc = CLIPImageProcessor(size={"shortest_edge": 224},
                              crop_size={"height": 224, "width": 224})
    rng = np.random.default_rng(0)
    for shape in ((750, 1101), (640, 480), (224, 224), (333, 500)):
        img = rng.integers(0, 255, (*shape, 3), dtype=np.uint8)
        hf = proc(Image.fromarray(img), return_tensors="np")[
            "pixel_values"][0]
        ours = clip_preprocess(img).transpose(2, 0, 1)
        np.testing.assert_array_equal(ours, hf)
