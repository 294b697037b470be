"""OpenPose family: random-weight torch parity + decode numerics.

Same strategy as test_detectors_parity.py: torch is installed but the
pretrained checkpoints are not, so the tests hand-build the published
CMU/pytorch-openpose architectures (body/hand/face CPMs —
/root/reference/src/controlnet_aux/open_pose/model.py, face.py) from the
same layer tables the JAX port uses, random-initialize, and assert the
converted JAX forward matches the torch forward. The decode stack
(peaks, PAF assembly, crop boxes) is tested on synthetic heatmaps and
against the reference's own box geometry code (open_pose/util.py, which
imports torch-free once .body's torch import is satisfied — torch is
installed here).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pcdms_tpu.pose.detectors.openpose import (  # noqa: E402
    _BODY_STEM, _FACE_HEAD, _FACE_STEM, _HAND_HEAD, _HAND_STEM,
    _body_stage1, _body_stageN, _face_stageN, _hand_stageN,
    body_apply, convert_body, convert_face, convert_hand, face_apply,
    hand_apply, OpenposeDetector, bilinear_align_corners, pad_right_down,
)

pytestmark = pytest.mark.slow

TOL = dict(atol=2e-4, rtol=2e-4)


class _TorchStack(nn.Module):
    """Sequential conv(+relu) stack with reference state-dict names."""

    def __init__(self, table, final_relu):
        super().__init__()
        self.table = table
        self.final_relu = final_relu
        for row in table:
            if row[0] == "pool":
                continue
            name, cin, cout, k = row
            self.add_module(name, nn.Conv2d(cin, cout, k, 1, (k - 1) // 2))

    def forward(self, x):
        convs = [r for r in self.table if r[0] != "pool"]
        for row in self.table:
            if row[0] == "pool":
                x = F.max_pool2d(x, 2, 2)
                continue
            x = getattr(self, row[0])(x)
            if self.final_relu or row is not convs[-1]:
                x = F.relu(x)
        return x


def _nchw(x_np):
    return torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)).copy())


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_body_parity():
    torch.manual_seed(0)

    class TorchBody(nn.Module):
        def __init__(self):
            super().__init__()
            self.model0 = _TorchStack(_BODY_STEM, final_relu=True)
            for n in range(1, 7):
                for bi, (br, oc) in enumerate((("L1", 38), ("L2", 19))):
                    table = (_body_stage1(br, oc) if n == 1
                             else _body_stageN(n, br, oc))
                    # reference quirk: stage-6 L2 head keeps its relu
                    # (model.py:28-32 lists Mconv7_stage6_L1 twice and
                    # never Mconv7_stage6_L2)
                    self.add_module(f"model{n}_{bi + 1}",
                                    _TorchStack(table,
                                                final_relu=(n == 6
                                                            and br == "L2")))

        def forward(self, x):
            feat = self.model0(x)
            o1 = self.model1_1(feat)
            o2 = self.model1_2(feat)
            for n in range(2, 7):
                h = torch.cat([o1, o2, feat], 1)
                o1 = getattr(self, f"model{n}_1")(h)
                o2 = getattr(self, f"model{n}_2")(h)
            return o1, o2

    tmodel = TorchBody().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_body(sd)

    x = np.random.default_rng(0).normal(size=(1, 64, 48, 3)).astype(
        np.float32) * 0.5
    with torch.no_grad():
        tp, th = tmodel(_nchw(x))
    jp, jh = body_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jp), _to_nhwc(tp), **TOL)
    np.testing.assert_allclose(np.asarray(jh), _to_nhwc(th), **TOL)


def test_hand_parity():
    torch.manual_seed(1)

    class TorchHand(nn.Module):
        def __init__(self):
            super().__init__()
            self.model1_0 = _TorchStack(_HAND_STEM, final_relu=True)
            self.model1_1 = _TorchStack(_HAND_HEAD, final_relu=False)
            for n in range(2, 7):
                self.add_module(f"model{n}",
                                _TorchStack(_hand_stageN(n),
                                            final_relu=False))

        def forward(self, x):
            feat = self.model1_0(x)
            out = self.model1_1(feat)
            for n in range(2, 7):
                out = getattr(self, f"model{n}")(torch.cat([out, feat], 1))
            return out

    tmodel = TorchHand().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_hand(sd)

    x = np.random.default_rng(1).normal(size=(1, 48, 48, 3)).astype(
        np.float32) * 0.5
    with torch.no_grad():
        th = tmodel(_nchw(x))
    jh = hand_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jh), _to_nhwc(th), **TOL)


def test_face_parity():
    torch.manual_seed(2)

    class TorchFace(nn.Module):
        """FaceNet keeps convs as direct attributes (face.py:96-190)."""

        def __init__(self):
            super().__init__()
            self.tables = ([_FACE_STEM, _FACE_HEAD]
                           + [_face_stageN(n) for n in range(2, 7)])
            for table in self.tables:
                for row in table:
                    if row[0] == "pool":
                        continue
                    name, cin, cout, k = row
                    self.add_module(name,
                                    nn.Conv2d(cin, cout, k, 1, (k - 1) // 2))

        def _run(self, table, x, final_relu):
            convs = [r for r in table if r[0] != "pool"]
            for row in table:
                if row[0] == "pool":
                    x = F.max_pool2d(x, 2, 2)
                    continue
                x = getattr(self, row[0])(x)
                if final_relu or row is not convs[-1]:
                    x = F.relu(x)
            return x

        def forward(self, x):
            feat = self._run(_FACE_STEM, x, True)
            out = self._run(_FACE_HEAD, feat, False)
            for n in range(2, 7):
                out = self._run(_face_stageN(n),
                                torch.cat([out, feat], 1), False)
            return out

    tmodel = TorchFace().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_face(sd)

    x = np.random.default_rng(2).normal(size=(1, 48, 48, 3)).astype(
        np.float32) * 0.5
    with torch.no_grad():
        th = tmodel(_nchw(x))
    jh = face_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jh), _to_nhwc(th), **TOL)


# ---------------------------------------------------------------------------
# decode numerics (synthetic heatmaps / PAFs)
# ---------------------------------------------------------------------------

def _gauss_bump(h, w, cy, cx, sigma=2.0, amp=1.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    return amp * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sigma ** 2))


def _synthetic_scene(h=96, w=96):
    """Two synthetic people: full 18-joint skeletons offset horizontally."""
    from pcdms_tpu.pose.detectors.openpose_decode import _LIMBS, _PAF_IDX

    base = np.array([
        [48, 12], [48, 24], [38, 24], [34, 40], [32, 56],   # nose..rwrist
        [58, 24], [62, 40], [64, 56],                       # lshoulder..lwrist
        [42, 52], [40, 70], [40, 86],                       # rhip..rankle
        [54, 52], [56, 70], [56, 86],                       # lhip..lankle
        [44, 8], [52, 8], [40, 10], [56, 10],               # eyes, ears
    ], np.float64)  # (18, 2) as (x, y)
    # snap to integer pixels + 0.21 so no joint sits on a half-pixel,
    # where the (reference-faithful) >= peak comparison reports plateau
    # pairs instead of a single maximum
    p0 = np.round(base * 0.45) + 0.21
    people = [p0, p0 + np.array([44.0, 4.0])]

    heat = np.zeros((h, w, 19), np.float64)
    paf = np.zeros((h, w, 38), np.float64)
    for kpts in people:
        for j, (x, y) in enumerate(kpts):
            heat[:, :, j] += _gauss_bump(h, w, y, x)
        for (ja, jb), (ca, cb) in zip(_LIMBS, _PAF_IDX):
            a, b = kpts[ja], kpts[jb]
            vec = b - a
            norm = math.hypot(*vec)
            if norm < 1e-6:
                continue
            u = vec / norm
            n_samples = max(2, int(norm))
            for t in np.linspace(0, 1, n_samples):
                px, py = a + t * vec
                yy, xx = int(round(py)), int(round(px))
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        y2, x2 = yy + dy, xx + dx
                        if 0 <= y2 < h and 0 <= x2 < w:
                            paf[y2, x2, ca] = u[0]
                            paf[y2, x2, cb] = u[1]
    return heat, paf, people


def test_find_peaks_and_assembly():
    from pcdms_tpu.pose.detectors.openpose_decode import (
        assemble_people, find_peaks, people_from_subset,
    )
    heat, paf, people = _synthetic_scene()
    peaks = find_peaks(heat, thresh=0.1)
    assert len(peaks) == 18
    assert all(len(p) == 2 for p in peaks)          # 2 people per part

    candidate, subset = assemble_people(peaks, paf, img_h=96)
    persons = people_from_subset(candidate, subset)
    assert len(persons) == 2
    for person in persons:
        assert person.visible.all()
        truth = min(people,
                    key=lambda t: np.abs(t - person.keypoints).sum())
        np.testing.assert_allclose(person.keypoints, truth, atol=1.5)


def test_hand_peaks_from_heatmaps():
    from pcdms_tpu.pose.detectors.openpose_decode import (
        hand_peaks_from_heatmaps,
    )
    h = np.zeros((64, 64, 22), np.float64)
    locs = [(10 + i, 20 + i) for i in range(21)]
    for j, (y, x) in enumerate(locs):
        h[:, :, j] = _gauss_bump(64, 64, y, x)
    peaks = hand_peaks_from_heatmaps(h, thresh=0.05)
    assert peaks.shape == (21, 2)
    for j, (y, x) in enumerate(locs):
        assert abs(peaks[j, 0] - x) <= 1 and abs(peaks[j, 1] - y) <= 1
    # below-threshold part -> [0, 0]
    h[:, :, 5] = 0.0
    peaks = hand_peaks_from_heatmaps(h, thresh=0.05)
    assert tuple(peaks[5]) == (0, 0)


def test_face_peaks_from_heatmaps():
    from pcdms_tpu.pose.detectors.openpose_decode import (
        face_peaks_from_heatmaps,
    )
    h = np.zeros((48, 48, 71), np.float64)
    h[:, :, 0] = _gauss_bump(48, 48, 30, 12)
    h[:, :, 3] = _gauss_bump(48, 48, 7, 40)
    peaks = face_peaks_from_heatmaps(h, thresh=0.05)
    assert peaks.shape == (2, 2)                 # only found landmarks kept
    np.testing.assert_allclose(peaks[0], [12, 30], atol=1)
    np.testing.assert_allclose(peaks[1], [40, 7], atol=1)


# ---------------------------------------------------------------------------
# crop-box geometry parity vs the reference's own code
# ---------------------------------------------------------------------------

def _ref_body(person, body_mod):
    """Wrap a decode Person as the reference's BodyResult."""
    kpts = [body_mod.Keypoint(x=float(x), y=float(y)) if v else None
            for (x, y), v in zip(person.keypoints, person.visible)]
    return body_mod.BodyResult(keypoints=kpts,
                               total_score=person.total_score,
                               total_parts=person.total_parts)


@pytest.mark.filterwarnings("ignore::DeprecationWarning")
def test_hand_face_boxes_match_reference():
    # (filterwarnings: the reference's own body.py imports the deprecated
    # scipy.ndimage.filters namespace — not ours to fix)
    # import the reference's open_pose/util.py as a standalone package —
    # going through src.controlnet_aux.__init__ would pull all 25
    # detectors (torchvision, skimage, mediapipe... absent here); util
    # itself needs only numpy/cv2/torch + its sibling body.py types
    import importlib
    import sys
    import types
    pkg = types.ModuleType("_refop")
    pkg.__path__ = ["/root/reference/src/controlnet_aux/open_pose"]
    sys.modules.setdefault("_refop", pkg)
    try:
        ref_util = importlib.import_module("_refop.util")
    except Exception as e:  # pragma: no cover - env guard
        pytest.skip(f"reference util unimportable: {e}")
    body_mod = importlib.import_module("_refop.body")

    from pcdms_tpu.pose.detectors.openpose_decode import (
        Person, face_box, hand_boxes,
    )
    rng = np.random.default_rng(3)
    img = np.zeros((240, 180, 3), np.uint8)
    for trial in range(20):
        kpts = rng.uniform([5, 5], [175, 235], size=(18, 2))
        vis = rng.uniform(size=18) > 0.25
        person = Person(keypoints=np.where(vis[:, None], kpts, -1.0),
                        visible=vis, scores=np.ones(18), total_score=10.0,
                        total_parts=int(vis.sum()))
        ours = hand_boxes(person, img.shape[0], img.shape[1])
        ref = ref_util.handDetect(_ref_body(person, body_mod), img)
        assert [tuple(b) for b in ours] == [tuple(b) for b in ref], trial

        ours_f = face_box(person, img.shape[0], img.shape[1])
        ref_f = ref_util.faceDetect(_ref_body(person, body_mod), img)
        assert (ours_f is None) == (ref_f is None), trial
        if ours_f is not None:
            assert tuple(ours_f) == tuple(ref_f), trial


# ---------------------------------------------------------------------------
# protocol helpers + end-to-end smoke
# ---------------------------------------------------------------------------

def test_pad_right_down():
    img = np.ones((13, 21, 3), np.uint8) * 7
    out, (pd, pr) = pad_right_down(img, 8, 128)
    assert out.shape == (16, 24, 3) and (pd, pr) == (3, 3)
    assert (out[:13, :21] == 7).all()
    assert (out[13:, :] == 128).all() and (out[:, 21:] == 128).all()


def test_bilinear_align_corners_matches_torch():
    x = np.random.default_rng(4).normal(size=(6, 5, 3)).astype(np.float32)
    got = bilinear_align_corners(x, 17, 13)
    want = F.interpolate(
        torch.from_numpy(np.transpose(x, (2, 0, 1))[None]),
        (17, 13), mode="bilinear", align_corners=True,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_detector_call_smoke():
    import jax
    det = OpenposeDetector(
        body_params=__import__(
            "pcdms_tpu.pose.detectors.openpose", fromlist=["body_init"]
        ).body_init(jax.random.PRNGKey(0)))
    img = (np.random.default_rng(5).uniform(0, 255, (80, 64, 3))
           .astype(np.uint8))
    out = det(img, detect_resolution=64, image_resolution=64)
    assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3
    assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0


# ---------------------------------------------------------------------------
# openpose_face facade end-to-end (random weights through checkpoint files)
# ---------------------------------------------------------------------------

def _rand_sd_from_tables(tables_with_prefix, g):
    sd = {}
    for prefix, table in tables_with_prefix:
        for row in table:
            if row[0] == "pool":
                continue
            name, cin, cout, k = row
            sd[f"{prefix}{name}.weight"] = 0.05 * torch.randn(
                cout, cin, k, k, generator=g)
            sd[f"{prefix}{name}.bias"] = 0.05 * torch.randn(
                cout, generator=g)
    return sd


def test_openpose_face_facade_end_to_end(tmp_path):
    """Drive Processor('openpose_face') through real checkpoint files:
    body CPM + face CPM random state dicts saved as .pth, loaded via
    from_pretrained, full detect->decode->render path
    (/root/reference/src/controlnet_aux/processor.py:33-63 +
    open_pose/__init__.py include_face protocol)."""
    from PIL import Image

    from pcdms_tpu.pose.processors import Processor

    g = torch.Generator().manual_seed(11)
    body_tables = [("model0.", _BODY_STEM)]
    for n in range(1, 7):
        for bi, (br, oc) in enumerate((("L1", 38), ("L2", 19))):
            table = (_body_stage1(br, oc) if n == 1
                     else _body_stageN(n, br, oc))
            body_tables.append((f"model{n}_{bi + 1}.", table))
    face_tables = ([("", _FACE_STEM), ("", _FACE_HEAD)]
                   + [("", _face_stageN(n)) for n in range(2, 7)])

    body_p = tmp_path / "body_pose_model.pth"
    face_p = tmp_path / "facenet.pth"
    torch.save(_rand_sd_from_tables(body_tables, g), body_p)
    torch.save(_rand_sd_from_tables(face_tables, g), face_p)

    proc = Processor("openpose_face",
                     params={"weights": str(body_p),
                             "face_weights": str(face_p),
                             "detect_resolution": 64,
                             "image_resolution": 64})
    rng = np.random.default_rng(4)
    img = Image.fromarray(rng.integers(0, 255, (96, 80, 3),
                                       dtype=np.uint8))
    out = proc(img, to_pil=True)
    assert isinstance(out, Image.Image)
    arr = np.asarray(out)
    assert arr.ndim == 3 and arr.shape[2] == 3
    assert arr.dtype == np.uint8


def test_openpose_facade_requires_weights():
    from pcdms_tpu.pose.processors import Processor
    with pytest.raises(NotImplementedError, match="pretrained checkpoint"):
        Processor("openpose_face")
