"""Generate examples/demo.ipynb — the notebook form of the single-image
demo (`examples/demo.py`), mirroring what the reference ships as
`pcdms_kaggle_demo.ipynb` (cells: load monolithic ckpt -> build
[source|black] canvas + pose render -> DINOv2 features -> 50-step DDIM
stage-2 sampling -> show the right half).

The notebook is a committed artifact; re-run this generator after
editing the cell sources below (keeps the .ipynb reproducible and
diff-reviewable). CI executes the notebook's code cells in-process at
tiny geometry (tests/test_demo.py::test_notebook_cells_execute).
"""

import nbformat as nbf

MD_INTRO = """\
# PCDMs-TPU — single-image pose-transfer demo

The notebook equivalent of the reference's `pcdms_kaggle_demo.ipynb`
(simplified stage-2-only release) on the TPU-native stack: one
monolithic `pcdms_ckpt.pt` (9-channel inpainting UNet without class
embedding + pose/image projections), DDIM sampling on a
`[source | black]` 512x1024 canvas conditioned on a rendered target
pose skeleton and DINOv2-giant source features.

Without checkpoints on disk the notebook falls back to random weights
(`TINY=1` additionally shrinks every model) so the full path runs
anywhere — the output is noise, but every stage executes for real.
"""

CELL_SETUP = """\
import os

# --- knobs -----------------------------------------------------------
TINY = os.environ.get("PCDMS_DEMO_TINY", "0") == "1"  # CI / CPU smoke
SIZE = 64 if TINY else 512
STEPS = 2 if TINY else 50
GUIDANCE = 2.0
SEED = 42

SOURCE = "person.png"           # source person image
TARGET_POSE = "target_pose.txt" # 18-kpt normalized .txt OR skeleton img
SOURCE_POSE = None              # optional; None -> black left pose half
CKPT = "pcdms_ckpt.pt"          # monolithic stage-2 release checkpoint
SD = "ckpts/sd21"               # SD-2.1 dir (VAE weights)
DINOV2 = "ckpts/dinov2-giant"

import jax, jax.numpy as jnp
import numpy as np
print(jax.devices())
"""

MD_WEIGHTS = """\
## Weights

With the released `pcdms_ckpt.pt` + SD-2.1 + DINOv2-giant on disk this
loads them through `pcdms_tpu.compat` (torch -> JAX/NHWC conversion);
otherwise it random-initializes the same architectures so the notebook
stays executable end to end.
"""

CELL_WEIGHTS = """\
from pcdms_tpu.models.unet2d import stage2_unet_config, unet_init
from pcdms_tpu.models.vae import vae_init
from pcdms_tpu.models.vit import dinov2_giant_config, vit_init
from pcdms_tpu.models.projections import (
    image_proj_mlp_init, pose_cond_embedding_init,
)

have_ckpts = all(os.path.exists(p) for p in (CKPT, SD, DINOV2))
key = jax.random.PRNGKey(SEED)

if TINY:
    from pcdms_tpu.cli.common import tiny_configs
    tiny = tiny_configs()
    unet_cfg, vae_cfg, dino_cfg = tiny.unet2(False), tiny.vae, tiny.dino
    proj_kw = dict(image=tiny.image_proj_kwargs,
                   pose=tiny.pose_proj_kwargs)
else:
    tiny = None
    unet_cfg = stage2_unet_config(with_class_embed=False)  # demo variant
    vae_cfg, dino_cfg = None, dinov2_giant_config()
    proj_kw = dict(image={}, pose={})

if have_ckpts and not TINY:
    from pcdms_tpu.compat.load import (
        load_dinov2, load_pcdms_stage2_checkpoint, load_sd_vae,
    )
    params = load_pcdms_stage2_checkpoint(CKPT)
    params["vae"] = load_sd_vae(SD)
    dino = load_dinov2(DINOV2)
else:
    print("checkpoints not found -> random weights (smoke mode)")
    ks = jax.random.split(key, 4)
    params = {
        "unet": unet_init(ks[0], unet_cfg),
        "image_proj": image_proj_mlp_init(ks[1], **proj_kw["image"]),
        "pose_proj": pose_cond_embedding_init(ks[2], **proj_kw["pose"]),
        "vae": vae_init(ks[3], *([tiny.vae] if tiny else [])),
    }
    dino = vit_init(key, dino_cfg)
"""

MD_INPUTS = """\
## Inputs

The stage-2 conditioning protocol (reference
`pcdms_kaggle_demo.ipynb` / `PCDMs_pipeline.py`): a `[source | black]`
image canvas, a `[source-pose | target-pose]` skeleton canvas rendered
with the OpenPose limb palette the model was trained on, and
DINOv2 patch features of the source crop.
"""

CELL_INPUTS = """\
from pcdms_tpu.data.preprocess import clip_preprocess, load_image, to_neg1_1
from pcdms_tpu.pose.keypoints import read_pose_txt
from pcdms_tpu.pose.skeleton import render_pose
from pcdms_tpu.train.encoders import dino_features


def pose_canvas_half(path):
    if path is None:
        return np.full((SIZE, SIZE, 3), -1.0, np.float32)
    if path.endswith(".txt"):
        coords = read_pose_txt(path).reshape(18, 2)
        return render_pose(coords, SIZE, SIZE).astype(np.float32) / 127.5 - 1.0
    return to_neg1_1(load_image(path, (SIZE, SIZE)))


if not os.path.exists(SOURCE):      # smoke mode: synthesize the inputs
    print("no source image -> synthetic gradient + standing pose")
    from PIL import Image
    g = np.linspace(0, 255, SIZE, dtype=np.uint8)
    Image.fromarray(np.stack([np.tile(g, (SIZE, 1))] * 3, -1)).save("person.png")
    SOURCE = "person.png"
    kpts = np.array([[.5,.1],[.5,.22],[.38,.22],[.34,.4],[.32,.55],
                     [.62,.22],[.66,.4],[.68,.55],[.44,.52],[.43,.72],
                     [.42,.9],[.56,.52],[.57,.72],[.58,.9],[.47,.08],
                     [.53,.08],[.44,.1],[.56,.1]], np.float32)
    np.savetxt("target_pose.txt", kpts)   # one "x y" line per keypoint
    TARGET_POSE = "target_pose.txt"

s_img = load_image(SOURCE, (SIZE, SIZE))
canvas = np.concatenate(
    [to_neg1_1(s_img), np.full((SIZE, SIZE, 3), -1.0, np.float32)], axis=1)
pose_canvas = np.concatenate(
    [pose_canvas_half(SOURCE_POSE), pose_canvas_half(TARGET_POSE)], axis=1)
feats = dino_features(dino, jnp.asarray(clip_preprocess(s_img))[None],
                      cfg=dino_cfg)
print("canvas", canvas.shape, "pose", pose_canvas.shape,
      "dino feats", feats.shape)
"""

CELL_SHOW_INPUTS = """\
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, axes = plt.subplots(1, 2, figsize=(10, 3))
axes[0].imshow((canvas + 1) / 2); axes[0].set_title("image canvas")
axes[1].imshow((pose_canvas + 1) / 2); axes[1].set_title("pose canvas")
for ax in axes:
    ax.axis("off")
plt.show()
"""

MD_SAMPLE = """\
## Sample

One jitted call: VAE-encode the canvas, 50-step DDIM with CFG over the
9-channel inpainting UNet, VAE-decode. `encoder_cache_interval=2`
switches on encoder propagation (~+20% throughput, approximate —
PERF.md) — the default is the exact sampler.
"""

CELL_SAMPLE = """\
from pcdms_tpu.pipelines.stage2_inpaint import stage2_generate

gen_kwargs = {} if tiny is None else {"vae_cfg": tiny.vae}
images = stage2_generate(
    params, jnp.asarray(canvas)[None], jnp.asarray(pose_canvas)[None],
    feats, None, jax.random.PRNGKey(SEED), unet_cfg=unet_cfg,
    num_steps=STEPS, guidance_scale=GUIDANCE, scheduler="ddim",
    **gen_kwargs)
result = np.asarray(images)[0, :, SIZE:, :]      # right half = target
assert np.isfinite(result).all()
print("generated", result.shape)
"""

CELL_SHOW_RESULT = """\
from PIL import Image

out8 = ((np.clip(result, -1, 1) + 1) * 127.5).astype(np.uint8)
Image.fromarray(out8).save("result.png")
plt.figure(figsize=(4, 4))
plt.imshow(out8); plt.axis("off"); plt.title("generated target")
plt.show()
print("wrote result.png")
"""


def build():
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    nb.cells = [
        nbf.v4.new_markdown_cell(MD_INTRO),
        nbf.v4.new_code_cell(CELL_SETUP),
        nbf.v4.new_markdown_cell(MD_WEIGHTS),
        nbf.v4.new_code_cell(CELL_WEIGHTS),
        nbf.v4.new_markdown_cell(MD_INPUTS),
        nbf.v4.new_code_cell(CELL_INPUTS),
        nbf.v4.new_code_cell(CELL_SHOW_INPUTS),
        nbf.v4.new_markdown_cell(MD_SAMPLE),
        nbf.v4.new_code_cell(CELL_SAMPLE),
        nbf.v4.new_code_cell(CELL_SHOW_RESULT),
    ]
    # deterministic cell ids -> stable diffs across regenerations
    for i, c in enumerate(nb.cells):
        c["id"] = f"cell-{i}"
    return nb


if __name__ == "__main__":
    import os.path
    path = os.path.join(os.path.dirname(__file__), "demo.ipynb")
    with open(path, "w") as f:
        nbf.write(build(), f)
    print(f"wrote {path}")
