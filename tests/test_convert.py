"""Converter structural tests: synthetic torch-style state dicts (diffusers
/ reference key naming) must convert into trees that exactly match the
corresponding ``*_init`` structures (keys + shapes), and linear/conv
semantics must match torch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcdms_tpu.compat.torch_convert import (
    convert_image_proj, convert_pose_proj, convert_prior, convert_unet,
    convert_vae, split_reference_checkpoint,
)
from pcdms_tpu.models.prior_transformer import PriorConfig, prior_init
from pcdms_tpu.models.projections import (
    image_proj_mlp_init, pose_cond_embedding_init,
)
from pcdms_tpu.models.unet2d import UNetConfig, unet_apply, unet_init
from pcdms_tpu.models.vae import VAEConfig, vae_decode, vae_encode, vae_init


def tree_spec(tree):
    return {jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _linear_sd(rng, prefix, in_dim, out_dim, bias=True):
    sd = {f"{prefix}.weight": rng.normal(size=(out_dim, in_dim)).astype(
        np.float32)}
    if bias:
        sd[f"{prefix}.bias"] = rng.normal(size=(out_dim,)).astype(np.float32)
    return sd


def _conv_sd(rng, prefix, cin, cout, k):
    return {
        f"{prefix}.weight": rng.normal(size=(cout, cin, k, k)).astype(
            np.float32),
        f"{prefix}.bias": rng.normal(size=(cout,)).astype(np.float32),
    }


def _norm_sd(rng, prefix, dim):
    return {f"{prefix}.weight": rng.normal(size=(dim,)).astype(np.float32),
            f"{prefix}.bias": rng.normal(size=(dim,)).astype(np.float32)}


def _attn_sd(rng, prefix, dim, ctx=None):
    ctx = ctx or dim
    sd = {}
    sd.update(_linear_sd(rng, f"{prefix}.to_q", dim, dim, bias=False))
    sd.update(_linear_sd(rng, f"{prefix}.to_k", ctx, dim, bias=False))
    sd.update(_linear_sd(rng, f"{prefix}.to_v", ctx, dim, bias=False))
    sd.update(_linear_sd(rng, f"{prefix}.to_out.0", dim, dim))
    return sd


def _tblock_sd(rng, prefix, dim, ctx_dim, geglu=True):
    sd = {}
    sd.update(_norm_sd(rng, f"{prefix}.norm1", dim))
    sd.update(_attn_sd(rng, f"{prefix}.attn1", dim))
    if ctx_dim is not None:
        sd.update(_norm_sd(rng, f"{prefix}.norm2", dim))
        sd.update(_attn_sd(rng, f"{prefix}.attn2", dim, ctx_dim))
    sd.update(_norm_sd(rng, f"{prefix}.norm3", dim))
    inner = dim * 4
    proj = inner * 2 if geglu else inner
    sd.update(_linear_sd(rng, f"{prefix}.ff.net.0.proj", dim, proj))
    sd.update(_linear_sd(rng, f"{prefix}.ff.net.2", inner, dim))
    return sd


def _resnet_sd(rng, prefix, cin, cout, temb=None):
    sd = {}
    sd.update(_norm_sd(rng, f"{prefix}.norm1", cin))
    sd.update(_conv_sd(rng, f"{prefix}.conv1", cin, cout, 3))
    sd.update(_norm_sd(rng, f"{prefix}.norm2", cout))
    sd.update(_conv_sd(rng, f"{prefix}.conv2", cout, cout, 3))
    if temb:
        sd.update(_linear_sd(rng, f"{prefix}.time_emb_proj", temb, cout))
    if cin != cout:
        sd.update(_conv_sd(rng, f"{prefix}.conv_shortcut", cin, cout, 1))
    return sd


def _t2d_sd(rng, prefix, ch, ctx_dim):
    sd = {}
    sd.update(_norm_sd(rng, f"{prefix}.norm", ch))
    sd.update(_linear_sd(rng, f"{prefix}.proj_in", ch, ch))
    sd.update(_tblock_sd(rng, f"{prefix}.transformer_blocks.0", ch, ctx_dim))
    sd.update(_linear_sd(rng, f"{prefix}.proj_out", ch, ch))
    return sd


UNET_CFG = UNetConfig(in_channels=9, block_out_channels=(8, 16, 16, 16),
                      layers_per_block=2, cross_attention_dim=12, head_dim=8,
                      class_embed_proj_dim=20, norm_groups=4, use_flash=False)


def synth_unet_sd(cfg: UNetConfig, seed=0):
    """Diffusers-naming state dict for our UNet layout."""
    rng = np.random.default_rng(seed)
    chans = cfg.block_out_channels
    temb = cfg.time_embed_dim
    ctx = cfg.cross_attention_dim
    sd = {}
    sd.update(_linear_sd(rng, "time_embedding.linear_1", chans[0], temb))
    sd.update(_linear_sd(rng, "time_embedding.linear_2", temb, temb))
    sd.update(_linear_sd(rng, "class_embedding.linear_1",
                         cfg.class_embed_proj_dim, temb))
    sd.update(_linear_sd(rng, "class_embedding.linear_2", temb, temb))
    sd.update(_conv_sd(rng, "conv_in", cfg.in_channels, chans[0], 3))
    sd.update(_norm_sd(rng, "conv_norm_out", chans[0]))
    sd.update(_conv_sd(rng, "conv_out", chans[0], cfg.out_channels, 3))

    in_ch = chans[0]
    for i, out_ch in enumerate(chans):
        pre = f"down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            sd.update(_resnet_sd(rng, f"{pre}.resnets.{j}",
                                 in_ch if j == 0 else out_ch, out_ch, temb))
            if cfg.cross_attn_down[i]:
                sd.update(_t2d_sd(rng, f"{pre}.attentions.{j}", out_ch, ctx))
        if i < len(chans) - 1:
            sd.update(_conv_sd(rng, f"{pre}.downsamplers.0.conv", out_ch,
                               out_ch, 3))
        in_ch = out_ch

    sd.update(_resnet_sd(rng, "mid_block.resnets.0", chans[-1], chans[-1],
                         temb))
    sd.update(_t2d_sd(rng, "mid_block.attentions.0", chans[-1], ctx))
    sd.update(_resnet_sd(rng, "mid_block.resnets.1", chans[-1], chans[-1],
                         temb))

    rev = tuple(reversed(chans))
    prev = rev[0]
    for i in range(len(chans)):
        out_ch = rev[i]
        skip_in = rev[min(i + 1, len(chans) - 1)]
        pre = f"up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            res_skip = skip_in if j == cfg.layers_per_block else out_ch
            rin = prev if j == 0 else out_ch
            sd.update(_resnet_sd(rng, f"{pre}.resnets.{j}", rin + res_skip,
                                 out_ch, temb))
            if cfg.cross_attn_up[i]:
                sd.update(_t2d_sd(rng, f"{pre}.attentions.{j}", out_ch, ctx))
        if i < len(chans) - 1:
            sd.update(_conv_sd(rng, f"{pre}.upsamplers.0.conv", out_ch,
                               out_ch, 3))
        prev = out_ch
    return sd


class TestUNetConverter:
    def test_structure_matches_init(self):
        sd = synth_unet_sd(UNET_CFG)
        converted = convert_unet(sd)
        expected = unet_init(jax.random.PRNGKey(0), UNET_CFG)
        assert tree_spec(converted) == tree_spec(expected)

    @pytest.mark.slow
    def test_converted_forward_runs(self):
        converted = convert_unet(synth_unet_sd(UNET_CFG))
        out = unet_apply(converted, UNET_CFG, jnp.zeros((1, 64, 64, 9)),
                         jnp.array([5]), jnp.zeros((1, 4, 12)),
                         class_labels=jnp.zeros((1, 20)))
        assert out.shape == (1, 64, 64, 4)
        assert np.isfinite(np.asarray(out)).all()


VAE_CFG = VAEConfig(block_out_channels=(4, 8, 8, 8), layers_per_block=1,
                    norm_groups=2)


def synth_vae_sd(cfg: VAEConfig, seed=0):
    rng = np.random.default_rng(seed)
    chans = cfg.block_out_channels
    sd = {}
    sd.update(_conv_sd(rng, "encoder.conv_in", 3, chans[0], 3))
    in_ch = chans[0]
    for i, out_ch in enumerate(chans):
        pre = f"encoder.down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            sd.update(_resnet_sd(rng, f"{pre}.resnets.{j}",
                                 in_ch if j == 0 else out_ch, out_ch))
        if i < len(chans) - 1:
            sd.update(_conv_sd(rng, f"{pre}.downsamplers.0.conv", out_ch,
                               out_ch, 3))
        in_ch = out_ch
    for blk in ("encoder.mid_block", "decoder.mid_block"):
        ch = chans[-1]
        sd.update(_resnet_sd(rng, f"{blk}.resnets.0", ch, ch))
        sd.update(_norm_sd(rng, f"{blk}.attentions.0.group_norm", ch))
        for name in ("to_q", "to_k", "to_v"):
            sd.update(_linear_sd(rng, f"{blk}.attentions.0.{name}", ch, ch))
        sd.update(_linear_sd(rng, f"{blk}.attentions.0.to_out.0", ch, ch))
        sd.update(_resnet_sd(rng, f"{blk}.resnets.1", ch, ch))
    sd.update(_norm_sd(rng, "encoder.conv_norm_out", chans[-1]))
    sd.update(_conv_sd(rng, "encoder.conv_out", chans[-1],
                       2 * cfg.latent_channels, 3))
    sd.update(_conv_sd(rng, "decoder.conv_in", cfg.latent_channels,
                       chans[-1], 3))
    rev = tuple(reversed(chans))
    in_ch = rev[0]
    for i, out_ch in enumerate(rev):
        pre = f"decoder.up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            sd.update(_resnet_sd(rng, f"{pre}.resnets.{j}",
                                 in_ch if j == 0 else out_ch, out_ch))
        if i < len(chans) - 1:
            sd.update(_conv_sd(rng, f"{pre}.upsamplers.0.conv", out_ch,
                               out_ch, 3))
        in_ch = out_ch
    sd.update(_norm_sd(rng, "decoder.conv_norm_out", rev[-1]))
    sd.update(_conv_sd(rng, "decoder.conv_out", rev[-1], 3, 3))
    sd.update(_conv_sd(rng, "quant_conv", 8, 8, 1))
    sd.update(_conv_sd(rng, "post_quant_conv", 4, 4, 1))
    return sd


class TestVAEConverter:
    def test_structure_matches_init(self):
        converted = convert_vae(synth_vae_sd(VAE_CFG))
        expected = vae_init(jax.random.PRNGKey(0), VAE_CFG)
        assert tree_spec(converted) == tree_spec(expected)

    def test_old_attention_naming(self):
        sd = synth_vae_sd(VAE_CFG)
        renames = {"to_q": "query", "to_k": "key", "to_v": "value",
                   "to_out.0": "proj_attn"}
        old_sd = {}
        for k, v in sd.items():
            for new, old in renames.items():
                marker = f"attentions.0.{new}."
                if marker in k:
                    k = k.replace(f"attentions.0.{new}.",
                                  f"attentions.0.{old}.")
                    break
            old_sd[k] = v
        converted = convert_vae(old_sd)
        expected = vae_init(jax.random.PRNGKey(0), VAE_CFG)
        assert tree_spec(converted) == tree_spec(expected)

    def test_converted_roundtrip_runs(self):
        converted = convert_vae(synth_vae_sd(VAE_CFG))
        x = jnp.zeros((1, 32, 32, 3))
        z = vae_encode(converted, x, cfg=VAE_CFG)
        y = vae_decode(converted, z, cfg=VAE_CFG)
        assert y.shape == x.shape


PRIOR_CFG = PriorConfig(num_heads=2, head_dim=8, num_layers=2,
                        embedding_dim=12, pose_hidden=10)


def synth_prior_sd(cfg: PriorConfig, seed=0):
    rng = np.random.default_rng(seed)
    d, e = cfg.inner_dim, cfg.embedding_dim
    sd = {}
    for name in ("pose_encoder", "pose_encoder1"):
        sd.update(_linear_sd(rng, f"{name}.net.0", cfg.pose_dim,
                             cfg.pose_hidden))
        sd.update(_norm_sd(rng, f"{name}.net.3", cfg.pose_hidden))
        sd.update(_linear_sd(rng, f"{name}.net.4", cfg.pose_hidden, e))
        sd.update(_norm_sd(rng, f"{name}.net.6", e))
    sd.update(_linear_sd(rng, "time_embedding.linear_1", d, d))
    sd.update(_linear_sd(rng, "time_embedding.linear_2", d, d))
    for name in ("proj_in", "embedding_proj", "encoder_hidden_states_proj",
                 "encoder_hidden_states_proj1"):
        sd.update(_linear_sd(rng, name, e, d))
    sd["positional_embedding"] = rng.normal(
        size=(1, cfg.num_tokens, d)).astype(np.float32)
    sd["prd_embedding"] = rng.normal(size=(1, 1, d)).astype(np.float32)
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        sd.update(_norm_sd(rng, f"{pre}.norm1", d))
        # prior blocks use biased qkv
        sd.update(_linear_sd(rng, f"{pre}.attn1.to_q", d, d))
        sd.update(_linear_sd(rng, f"{pre}.attn1.to_k", d, d))
        sd.update(_linear_sd(rng, f"{pre}.attn1.to_v", d, d))
        sd.update(_linear_sd(rng, f"{pre}.attn1.to_out.0", d, d))
        sd.update(_norm_sd(rng, f"{pre}.norm3", d))
        sd.update(_linear_sd(rng, f"{pre}.ff.net.0.proj", d, 4 * d))
        sd.update(_linear_sd(rng, f"{pre}.ff.net.2", 4 * d, d))
    sd.update(_norm_sd(rng, "norm_out", d))
    sd.update(_linear_sd(rng, "proj_to_clip_embeddings", d, e))
    return sd


class TestPriorConverter:
    def test_structure_matches_init(self):
        converted = convert_prior(synth_prior_sd(PRIOR_CFG))
        expected = prior_init(jax.random.PRNGKey(0), PRIOR_CFG)
        assert tree_spec(converted) == tree_spec(expected)


class TestProjectionConverters:
    def test_image_proj(self):
        rng = np.random.default_rng(0)
        sd = {}
        sd.update(_linear_sd(rng, "net.0", 24, 12))
        sd.update(_norm_sd(rng, "net.3", 12))
        sd.update(_linear_sd(rng, "net.4", 12, 16))
        converted = convert_image_proj(sd)
        expected = image_proj_mlp_init(jax.random.PRNGKey(0), 24, 12, 16)
        assert tree_spec(converted) == tree_spec(expected)

    def test_pose_proj(self):
        rng = np.random.default_rng(0)
        sd = {}
        sd.update(_conv_sd(rng, "conv_in", 3, 4, 3))
        chans = (4, 8, 8, 8)
        idx = 0
        for i in range(3):
            sd.update(_conv_sd(rng, f"blocks.{idx}", chans[i], chans[i], 3))
            idx += 1
            sd.update(_conv_sd(rng, f"blocks.{idx}", chans[i], chans[i + 1],
                               3))
            idx += 1
        sd.update(_conv_sd(rng, "conv_out", 8, 16, 3))
        converted = convert_pose_proj(sd)
        expected = pose_cond_embedding_init(
            jax.random.PRNGKey(0), out_channels=16,
            block_out_channels=chans)
        assert tree_spec(converted) == tree_spec(expected)


class TestCheckpointSplit:
    def test_prefix_split(self):
        sd = {
            "module.unet.conv_in.weight": np.zeros(1),
            "module.pose_proj.conv_in.weight": np.zeros(1),
            "module.image_proj_model_p.net.0.weight": np.zeros(1),
            "image_proj_model.net.0.weight": np.zeros(1),
        }
        groups = split_reference_checkpoint(sd)
        assert set(groups) == {"unet", "pose_proj", "image_proj_model_p",
                               "image_proj_model"}
        assert "conv_in.weight" in groups["unet"]
