"""DeepFashion pair datasets (host-side, torch-free).

Behavioral ports of the three reference datasets
(/root/reference/src/dataset/stage{1,2,3}_dataset.py) producing numpy NHWC
batches for the device pipeline:

  * Stage1Dataset: CLIP-preprocessed source/target images + 36-float pose
    coordinate vectors, with independent condition dropout (zeroing the
    *pixel/coordinate inputs*, so the CFG null condition is the zero-image
    embedding — stage1_dataset.py:87-97)
  * Stage2Dataset: [source|black] masked canvas, [source|target] GT canvas,
    [source pose|target pose] skeleton canvas, CLIP-preprocessed source
    (DINOv2 branch) and target (CLIP-global branch) with 0.1 dropout
  * Stage3Dataset: GT target, stage-2 generated target (disk layout
    ``{src}_to_{tgt}.png`` — stage3_dataset.py:79), CLIP-preprocessed source

The pair list JSON format matches the reference: a list of
{"source_image": ..., "target_image": ...} records. Sharding for
multi-host runs is index-strided by (process_index, process_count), the
SPMD replacement for DistributedSampler.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from pcdms_tpu.data.preprocess import (
    black_like, clip_preprocess, load_image, make_side_by_side, to_neg1_1,
)
from pcdms_tpu.pose.keypoints import read_pose_txt


class _StatelessDropout:
    """Mixin giving datasets a worker-order-independent RNG path.

    ``__getitem__`` draws condition-dropout randomness from a *stateful*
    per-dataset stream (matching the reference's torch-Dataset semantics,
    /root/reference/src/dataset/stage1_dataset.py:87-97, where draw order
    follows DataLoader fetch order). ``fetch(idx, epoch)`` instead derives
    an rng from ``(seed, epoch, idx)`` so a parallel worker pool produces
    byte-identical batches for any worker count — the determinism the
    reference's worker processes do not have.
    """

    def fetch(self, idx: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx]))
        return self._example(int(idx), rng)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        return self._example(int(idx), self.rng)


class PairList:
    """The DeepFashion (source, target) pair list."""

    def __init__(self, json_path_or_list, image_root: str = ""):
        if isinstance(json_path_or_list, str):
            with open(json_path_or_list) as f:
                self.pairs: List[Dict] = json.load(f)
        else:
            self.pairs = list(json_path_or_list)
        self.image_root = image_root

    def __len__(self):
        return len(self.pairs)

    def image_path(self, name: str) -> str:
        return os.path.join(self.image_root,
                            name.replace(".jpg", ".png"))

    def pose_txt_path(self, name: str) -> str:
        # reference layout: /train_all_png/ -> /normalized_pose_txt/
        return os.path.join(self.image_root, name).replace(
            "/train_all_png/", "/normalized_pose_txt/").replace(
            ".jpg", ".txt")

    def pose_img_path(self, name: str) -> str:
        # reference layout: /train_all_png/ -> /openpose_all_img/*_pose.jpg
        return os.path.join(self.image_root,
                            name.replace(".jpg", ".png")).replace(
            "/train_all_png/", "/openpose_all_img/").replace(
            ".png", "_pose.jpg")

    def shard(self, process_index: int, process_count: int) -> "PairList":
        sub = self.pairs[process_index::process_count]
        out = PairList(sub, self.image_root)
        return out


class Stage1Dataset(_StatelessDropout):
    def __init__(self, pairs: PairList, size=(512, 512),
                 s_img_drop_rate=0.0, t_img_drop_rate=0.0,
                 s_pose_drop_rate=0.0, t_pose_drop_rate=0.0, seed=0,
                 embed_refs: bool = False):
        """embed_refs=True: yield image *paths* + dropout flags instead of
        preprocessed pixels (for the frozen-encoder embedding cache,
        train/embed_cache.py) — skips image decode entirely. Dropout RNG
        draw order is identical in both modes."""
        self.pairs = pairs
        self.size = size
        self.drop = (s_img_drop_rate, t_img_drop_rate,
                     s_pose_drop_rate, t_pose_drop_rate)
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.embed_refs = embed_refs

    def __len__(self):
        return len(self.pairs)

    def _example(self, idx, rng) -> Dict[str, np.ndarray]:
        item = self.pairs.pairs[idx]
        s_pose = read_pose_txt(self.pairs.pose_txt_path(item["source_image"]))
        t_pose = read_pose_txt(self.pairs.pose_txt_path(item["target_image"]))

        dr = self.drop
        s_drop = rng.random() < dr[0]
        t_drop = rng.random() < dr[1]
        if rng.random() < dr[2]:
            s_pose = np.zeros_like(s_pose)
        if rng.random() < dr[3]:
            t_pose = np.zeros_like(t_pose)

        if self.embed_refs:
            return {"s_ref": self.pairs.image_path(item["source_image"]),
                    "t_ref": self.pairs.image_path(item["target_image"]),
                    "s_drop": np.float32(s_drop),
                    "t_drop": np.float32(t_drop),
                    "s_pose": s_pose, "t_pose": t_pose}

        s_img = load_image(self.pairs.image_path(item["source_image"]),
                           self.size)
        t_img = load_image(self.pairs.image_path(item["target_image"]),
                           self.size)
        clip_s = clip_preprocess(s_img)
        clip_t = clip_preprocess(t_img)
        if s_drop:
            clip_s = np.zeros_like(clip_s)
        if t_drop:
            clip_t = np.zeros_like(clip_t)

        return {"clip_s_img": clip_s, "clip_t_img": clip_t,
                "s_pose": s_pose, "t_pose": t_pose}


class Stage2Dataset(_StatelessDropout):
    def __init__(self, pairs: PairList, size=(512, 512),
                 imgp_drop_rate=0.0, imgg_drop_rate=0.0, seed=0,
                 embed_refs: bool = False):
        """embed_refs=True: yield the DINOv2/CLIP branch inputs as image
        *paths* + dropout flags (for train/embed_cache.py) instead of
        preprocessed pixels; the canvases are still built. Dropout RNG
        draw order is identical in both modes."""
        self.pairs = pairs
        self.size = size
        self.imgp_drop_rate = imgp_drop_rate
        self.imgg_drop_rate = imgg_drop_rate
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.embed_refs = embed_refs

    def __len__(self):
        return len(self.pairs)

    def _example(self, idx, rng) -> Dict[str, np.ndarray]:
        item = self.pairs.pairs[idx]
        s_img = load_image(self.pairs.image_path(item["source_image"]),
                           self.size)
        t_img = load_image(self.pairs.image_path(item["target_image"]),
                           self.size)
        s_pose = load_image(self.pairs.pose_img_path(item["source_image"]),
                            self.size)
        t_pose = load_image(self.pairs.pose_img_path(item["target_image"]),
                            self.size)

        masked = make_side_by_side(s_img, black_like(s_img))
        st_img = make_side_by_side(s_img, t_img)
        st_pose = make_side_by_side(s_pose, t_pose)

        out = {
            "st_image": to_neg1_1(st_img),
            "masked_image": to_neg1_1(masked),
            "pose_image": to_neg1_1(st_pose),
        }

        s_drop = rng.random() < self.imgp_drop_rate
        t_drop = rng.random() < self.imgg_drop_rate
        if self.embed_refs:
            out.update({
                "s_ref": self.pairs.image_path(item["source_image"]),
                "t_ref": self.pairs.image_path(item["target_image"]),
                "s_drop": np.float32(s_drop),
                "t_drop": np.float32(t_drop),
            })
            return out

        clip_s = clip_preprocess(s_img)   # DINOv2 branch
        clip_t = clip_preprocess(t_img)   # CLIP-global branch
        if s_drop:
            clip_s = np.zeros_like(clip_s)
        if t_drop:
            clip_t = np.zeros_like(clip_t)
        out.update({"clip_s_img": clip_s, "clip_t_img": clip_t})
        return out


class Stage3Dataset(_StatelessDropout):
    def __init__(self, pairs: PairList, gen_dir: str, size=(512, 512),
                 gen_drop_rate=0.0, seed=0, embed_refs: bool = False):
        self.pairs = pairs
        self.gen_dir = gen_dir
        self.size = size
        self.gen_drop_rate = gen_drop_rate
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.embed_refs = embed_refs

    def __len__(self):
        return len(self.pairs)

    def gen_path(self, item) -> str:
        s = os.path.basename(item["source_image"]).rsplit(".", 1)[0]
        t = os.path.basename(item["target_image"]).rsplit(".", 1)[0]
        return os.path.join(self.gen_dir, f"{s}_to_{t}.png")

    def _example(self, idx, rng) -> Dict[str, np.ndarray]:
        item = self.pairs.pairs[idx]
        s_img = load_image(self.pairs.image_path(item["source_image"]),
                           self.size)
        t_img = load_image(self.pairs.image_path(item["target_image"]),
                           self.size)
        gen_img = load_image(self.gen_path(item), self.size)

        gen = to_neg1_1(gen_img)
        if rng.random() < self.gen_drop_rate:
            gen = np.zeros_like(gen)

        out = {"target_image": to_neg1_1(t_img), "gen_image": gen}
        if self.embed_refs:
            out["s_ref"] = self.pairs.image_path(item["source_image"])
        else:
            out["clip_s_img"] = clip_preprocess(s_img)
        return out


def batch_iterator(dataset, batch_size: int, *, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True,
                   epochs: Optional[int] = None) -> Iterator[Dict]:
    """Yield stacked numpy batches. epochs=None -> loop forever."""
    rng = np.random.default_rng(seed)
    epoch = 0
    n = len(dataset)
    if drop_last and n < batch_size:
        raise ValueError(
            f"dataset has {n} examples < batch_size {batch_size} with "
            "drop_last=True: no batch can ever be formed (with "
            "epochs=None this would spin forever)")
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        end = n - (n % batch_size) if drop_last else n
        for start in range(0, end, batch_size):
            idxs = order[start:start + batch_size]
            examples = [dataset[int(i)] for i in idxs]
            yield {k: np.stack([e[k] for e in examples])
                   for k in examples[0]}
        epoch += 1
