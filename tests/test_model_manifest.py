"""Structural manifests of the full-size model configs.

Pins the exact parameter geometry of the production configs against the
published SD-2.1 / Kandinsky-2.2 numbers, so an up-block skip-channel or
projection-dim mistake that tiny test configs hide fails loudly:

* SD-2.1 UNet total = 865,910,724 (stabilityai/stable-diffusion-2-1,
  unet/config.json geometry; reference re-implementation at
  /root/reference/src/models/stage2_inpaint_unet_2d_condition.py:61-117)
  - stage-2 adds a 9-channel conv_in (+320*5*9 = +14,400 over 4ch) and a
    'projection' class embedding TimestepEmbedding(1024->1280->1280)
    (+1024*1280+1280 + 1280*1280+1280 = +2,951,680)
  - stage-3 adds an 8-channel conv_in (+320*4*9 = +11,520)
* SD VAE total = 83,653,863 (stabilityai/sd-vae, shared by SD-1.x/2.x)
* Kandinsky-2.2 PriorTransformer: 20 layers, width 2048, 32 heads
  (+ PCDMs' two pose MLPs and the second hidden-states projection,
  reference src/models/stage1_prior_transformers.py).

Counts are taken with jax.eval_shape — no full-size init required.
"""

import functools

import jax
import pytest

from pcdms_tpu.models.prior_transformer import PriorConfig, prior_init
from pcdms_tpu.models.unet2d import (
    stage2_unet_config, stage3_unet_config, unet_init,
)
from pcdms_tpu.models.vae import VAEConfig, vae_init

SD21_UNET_TOTAL = 865_910_724
SD_VAE_TOTAL = 83_653_863

CONV_IN_9CH_DELTA = 320 * (9 - 4) * 9           # 3x3 kernel rows
CONV_IN_8CH_DELTA = 320 * (8 - 4) * 9
CLASS_EMBED_PROJ = (1024 * 1280 + 1280) + (1280 * 1280 + 1280)


def _shapes(key, init, cfg):
    return jax.eval_shape(functools.partial(init, cfg=cfg),
                          jax.random.PRNGKey(0))


def _count(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def stage2():
    return _shapes(0, unet_init, stage2_unet_config())


class TestUNetManifest:
    def test_stage2_total(self, stage2):
        expected = SD21_UNET_TOTAL + CONV_IN_9CH_DELTA + CLASS_EMBED_PROJ
        assert _count(stage2) == expected == 868_876_804

    def test_stage3_total(self):
        t = _shapes(0, unet_init, stage3_unet_config())
        assert _count(t) == SD21_UNET_TOTAL + CONV_IN_8CH_DELTA \
            == 865_922_244

    def test_stage2_group_counts(self, stage2):
        groups = {k: _count(v) for k, v in stage2.items()}
        assert groups == {
            "class_embedding": 2_951_680,
            "conv_in": 26_240,            # (3,3,9,320) + bias
            "conv_norm_out": 640,
            "conv_out": 11_524,           # (3,3,320,4) + bias
            "down_blocks": 251_906_240,
            "mid_block": 97_693_440,
            "time_embedding": 2_050_560,  # 320->1280->1280
            "up_blocks": 514_236_480,
        }

    def test_stage2_io_shapes(self, stage2):
        assert stage2["conv_in"]["kernel"].shape == (3, 3, 9, 320)
        assert stage2["conv_out"]["kernel"].shape == (3, 3, 320, 4)

    def test_up_blocks_carry_skip_channels(self, stage2):
        """Up blocks consume resnet inputs of (block + skip) channels —
        the arithmetic that a channel mistake corrupts first. SD-2.1
        channel map: down (320,640,1280,1280), 2 layers/block."""
        up = stage2["up_blocks"]
        first_resnet_in = [
            b["resnets"][0]["conv1"]["kernel"].shape[2] for b in up]
        # up block i at channel up_ch[i], first skip comes from the
        # previous level: in = up_ch[i] + skip_ch[i]
        assert first_resnet_in == [1280 + 1280, 1280 + 1280, 640 + 1280,
                                   320 + 640]
        last_resnet_in = [
            b["resnets"][-1]["conv1"]["kernel"].shape[2] for b in up]
        assert last_resnet_in == [1280 + 1280, 1280 + 640, 640 + 320,
                                  320 + 320]


class TestVAEManifest:
    def test_total_and_groups(self):
        t = _shapes(0, vae_init, VAEConfig())
        assert _count(t) == SD_VAE_TOTAL
        groups = {k: _count(v) for k, v in t.items()}
        assert groups == {
            "encoder": 34_163_592,
            "decoder": 49_490_179,
            "quant_conv": 72,             # 1x1 (8 -> 8)
            "post_quant_conv": 20,        # 1x1 (4 -> 4)
        }


class TestPriorManifest:
    def test_total_and_groups(self):
        t = _shapes(0, prior_init, PriorConfig())
        assert _count(t) == 1_027_166_208
        groups = {k: _count(v) for k, v in t.items()}
        d = 2048
        # 20 transformer blocks at width 2048: qkv/out 4*d^2(+biases),
        # LN(2d)x2, mlp d->4d->d
        per_block = (4 * (d * d + d)) + 2 * (2 * d) + \
            (d * 4 * d + 4 * d) + (4 * d * d + d)
        assert groups["blocks"] == 20 * per_block == 1_007_165_440
        assert groups["proj_in"] == 1024 * d + d
        assert groups["embedding_proj"] == 1024 * d + d
        assert groups["encoder_hidden_states_proj"] == 1024 * d + d
        assert groups["encoder_hidden_states_proj1"] == 1024 * d + d
        assert groups["proj_to_clip_embeddings"] == d * 1024 + 1024
        assert groups["positional_embedding"] == 6 * d   # 6-token sequence
        assert groups["prd_embedding"] == d
        # pose MLP (reference stage1_prior_transformer.py:25-31,91-92):
        # Linear(36,512) + LN(512) + Linear(512,1024) + LN(1024)
        pose = (36 * 512 + 512) + 2 * 512 + (512 * 1024 + 1024) + 2 * 1024
        assert groups["pose_encoder"] == pose
        assert groups["pose_encoder1"] == pose
        # TimestepEmbedding(in=inner_dim, time_embed_dim=inner_dim):
        # two square 2048x2048 linears
        assert groups["time_embedding"] == 2 * (d * d + d)
