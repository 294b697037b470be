"""torch -> JAX weight conversion.

Maps the released PCDMs / SD-2.1 / HF-encoder checkpoints onto this
framework's param pytrees (layout: pcdms_tpu/nn, pcdms_tpu/models):

  * Linear:  torch (out, in) -> kernel (in, out)
  * Conv2d:  torch OIHW     -> kernel HWIO
  * Norms:   weight/bias    -> scale/bias

Checkpoint key layouts handled (all verified against the reference):
  * SD-2.1 UNet + the stage-2 9ch / stage-3 8ch variants (diffusers naming)
  * SD-2.1 VAE (both old ``query/key/value/proj_attn`` and new ``to_*``
    mid-attention names)
  * Stage-1 prior transformer
    (/root/reference/src/models/stage1_prior_transformer.py param names)
  * ImageProjModel_p / pose_proj ControlNet embedding
    (/root/reference/stage2_train_inpaint_model.py:36-95)
  * transformers CLIPVisionModelWithProjection / Dinov2Model
  * the monolithic training checkpoints whose keys are prefixed
    ``unet. / pose_proj. / image_proj_model_p.`` (split helper;
    /root/reference/stage2_batchtest_inpaint_model.py:106-121, demo ckpt
    uses ``image_proj_model.``)
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np
import jax.numpy as jnp


Array = np.ndarray
StateDict = Dict[str, Array]


def state_dict_to_numpy(state_dict) -> StateDict:
    """torch state_dict -> {name: float32 numpy array}."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().to("cpu").float().numpy()
        out[k] = np.asarray(v)
    return out


def _j(x):
    return jnp.asarray(x, jnp.float32)


def convert_linear(sd: StateDict, prefix: str):
    p = {"kernel": _j(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = _j(sd[f"{prefix}.bias"])
    return p


def convert_conv(sd: StateDict, prefix: str):
    p = {"kernel": _j(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = _j(sd[f"{prefix}.bias"])
    return p


def convert_norm(sd: StateDict, prefix: str):
    return {"scale": _j(sd[f"{prefix}.weight"]),
            "bias": _j(sd[f"{prefix}.bias"])}


def _convert_timestep_embedding(sd, prefix):
    p = {"linear_1": convert_linear(sd, f"{prefix}.linear_1"),
         "linear_2": convert_linear(sd, f"{prefix}.linear_2")}
    if f"{prefix}.cond_proj.weight" in sd:      # LCM guidance conditioning
        p["cond_proj"] = convert_linear(sd, f"{prefix}.cond_proj")
    return p


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def _convert_resnet(sd, prefix):
    p = {
        "norm1": convert_norm(sd, f"{prefix}.norm1"),
        "conv1": convert_conv(sd, f"{prefix}.conv1"),
        "norm2": convert_norm(sd, f"{prefix}.norm2"),
        "conv2": convert_conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = convert_linear(sd, f"{prefix}.time_emb_proj")
    if f"{prefix}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = convert_conv(sd, f"{prefix}.conv_shortcut")
    return p


def _convert_attention(sd, prefix):
    return {
        "to_q": convert_linear(sd, f"{prefix}.to_q"),
        "to_k": convert_linear(sd, f"{prefix}.to_k"),
        "to_v": convert_linear(sd, f"{prefix}.to_v"),
        "to_out": convert_linear(sd, f"{prefix}.to_out.0"),
    }


def _convert_tblock(sd, prefix):
    p = {
        "norm1": convert_norm(sd, f"{prefix}.norm1"),
        "attn1": _convert_attention(sd, f"{prefix}.attn1"),
        "norm3": convert_norm(sd, f"{prefix}.norm3"),
        "ff": {
            "proj_in": convert_linear(sd, f"{prefix}.ff.net.0.proj"),
            "proj_out": convert_linear(sd, f"{prefix}.ff.net.2"),
        },
    }
    if f"{prefix}.attn2.to_q.weight" in sd:
        p["norm2"] = convert_norm(sd, f"{prefix}.norm2")
        p["attn2"] = _convert_attention(sd, f"{prefix}.attn2")
    return p


def _convert_transformer2d(sd, prefix):
    depth = _count(sd, rf"{re.escape(prefix)}\.transformer_blocks\.(\d+)\.")
    return {
        "norm": convert_norm(sd, f"{prefix}.norm"),
        "proj_in": convert_linear(sd, f"{prefix}.proj_in"),
        "blocks": [_convert_tblock(sd, f"{prefix}.transformer_blocks.{i}")
                   for i in range(depth)],
        "proj_out": convert_linear(sd, f"{prefix}.proj_out"),
    }


def _count(sd, pattern):
    idx = set()
    rx = re.compile(pattern)
    for k in sd:
        m = rx.match(k)
        if m:
            idx.add(int(m.group(1)))
    return len(idx)


def convert_unet(sd: StateDict):
    """diffusers UNet2DConditionModel state dict -> unet_init() layout."""
    p = {
        "time_embedding": _convert_timestep_embedding(sd, "time_embedding"),
        "conv_in": convert_conv(sd, "conv_in"),
        "conv_norm_out": convert_norm(sd, "conv_norm_out"),
        "conv_out": convert_conv(sd, "conv_out"),
    }
    if "class_embedding.linear_1.weight" in sd:
        p["class_embedding"] = _convert_timestep_embedding(
            sd, "class_embedding")

    n_down = _count(sd, r"down_blocks\.(\d+)\.")
    p["down_blocks"] = []
    for i in range(n_down):
        pre = f"down_blocks.{i}"
        block = {"resnets": [
            _convert_resnet(sd, f"{pre}.resnets.{j}")
            for j in range(_count(sd, rf"down_blocks\.{i}\.resnets\.(\d+)\."))
        ]}
        n_attn = _count(sd, rf"down_blocks\.{i}\.attentions\.(\d+)\.")
        if n_attn:
            block["attentions"] = [
                _convert_transformer2d(sd, f"{pre}.attentions.{j}")
                for j in range(n_attn)]
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            block["downsampler"] = {
                "conv": convert_conv(sd, f"{pre}.downsamplers.0.conv")}
        p["down_blocks"].append(block)

    p["mid_block"] = {
        "resnet1": _convert_resnet(sd, "mid_block.resnets.0"),
        "attention": _convert_transformer2d(sd, "mid_block.attentions.0"),
        "resnet2": _convert_resnet(sd, "mid_block.resnets.1"),
    }

    n_up = _count(sd, r"up_blocks\.(\d+)\.")
    p["up_blocks"] = []
    for i in range(n_up):
        pre = f"up_blocks.{i}"
        block = {"resnets": [
            _convert_resnet(sd, f"{pre}.resnets.{j}")
            for j in range(_count(sd, rf"up_blocks\.{i}\.resnets\.(\d+)\."))
        ]}
        n_attn = _count(sd, rf"up_blocks\.{i}\.attentions\.(\d+)\.")
        if n_attn:
            block["attentions"] = [
                _convert_transformer2d(sd, f"{pre}.attentions.{j}")
                for j in range(n_attn)]
        if f"{pre}.upsamplers.0.conv.weight" in sd:
            block["upsampler"] = {
                "conv": convert_conv(sd, f"{pre}.upsamplers.0.conv")}
        p["up_blocks"].append(block)
    return p


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _convert_vae_attn(sd, prefix):
    if f"{prefix}.to_q.weight" in sd:           # new diffusers naming
        names = {"norm": "group_norm", "to_q": "to_q", "to_k": "to_k",
                 "to_v": "to_v", "to_out": "to_out.0"}
    else:                                        # old naming
        names = {"norm": "group_norm", "to_q": "query", "to_k": "key",
                 "to_v": "value", "to_out": "proj_attn"}
    return {
        "norm": convert_norm(sd, f"{prefix}.{names['norm']}"),
        "to_q": convert_linear(sd, f"{prefix}.{names['to_q']}"),
        "to_k": convert_linear(sd, f"{prefix}.{names['to_k']}"),
        "to_v": convert_linear(sd, f"{prefix}.{names['to_v']}"),
        "to_out": convert_linear(sd, f"{prefix}.{names['to_out']}"),
    }


def _convert_vae_mid(sd, prefix):
    return {
        "resnet1": _convert_resnet(sd, f"{prefix}.resnets.0"),
        "attention": _convert_vae_attn(sd, f"{prefix}.attentions.0"),
        "resnet2": _convert_resnet(sd, f"{prefix}.resnets.1"),
    }


def convert_vae(sd: StateDict):
    enc = {
        "conv_in": convert_conv(sd, "encoder.conv_in"),
        "down_blocks": [],
        "mid": _convert_vae_mid(sd, "encoder.mid_block"),
        "norm_out": convert_norm(sd, "encoder.conv_norm_out"),
        "conv_out": convert_conv(sd, "encoder.conv_out"),
    }
    for i in range(_count(sd, r"encoder\.down_blocks\.(\d+)\.")):
        pre = f"encoder.down_blocks.{i}"
        block = {"resnets": [
            _convert_resnet(sd, f"{pre}.resnets.{j}")
            for j in range(_count(
                sd, rf"encoder\.down_blocks\.{i}\.resnets\.(\d+)\."))]}
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            block["downsampler"] = convert_conv(sd,
                                                f"{pre}.downsamplers.0.conv")
        enc["down_blocks"].append(block)

    dec = {
        "conv_in": convert_conv(sd, "decoder.conv_in"),
        "mid": _convert_vae_mid(sd, "decoder.mid_block"),
        "up_blocks": [],
        "norm_out": convert_norm(sd, "decoder.conv_norm_out"),
        "conv_out": convert_conv(sd, "decoder.conv_out"),
    }
    for i in range(_count(sd, r"decoder\.up_blocks\.(\d+)\.")):
        pre = f"decoder.up_blocks.{i}"
        block = {"resnets": [
            _convert_resnet(sd, f"{pre}.resnets.{j}")
            for j in range(_count(
                sd, rf"decoder\.up_blocks\.{i}\.resnets\.(\d+)\."))]}
        if f"{pre}.upsamplers.0.conv.weight" in sd:
            block["upsampler"] = convert_conv(sd, f"{pre}.upsamplers.0.conv")
        dec["up_blocks"].append(block)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": convert_conv(sd, "quant_conv"),
        "post_quant_conv": convert_conv(sd, "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# stage-1 prior
# ---------------------------------------------------------------------------

def _convert_ref_mlp(sd, prefix, with_final_norm: bool):
    """reference MLP: Sequential(Linear, GELU, Dropout, LayerNorm, Linear,
    Dropout[, LayerNorm])."""
    p = {
        "fc1": convert_linear(sd, f"{prefix}.net.0"),
        "norm1" if with_final_norm else "norm":
            convert_norm(sd, f"{prefix}.net.3"),
        "fc2": convert_linear(sd, f"{prefix}.net.4"),
    }
    if with_final_norm:
        p["norm2"] = convert_norm(sd, f"{prefix}.net.6")
    return p


def convert_prior(sd: StateDict):
    n_layers = _count(sd, r"transformer_blocks\.(\d+)\.")
    return {
        "pose_encoder": _convert_ref_mlp(sd, "pose_encoder", True),
        "pose_encoder1": _convert_ref_mlp(sd, "pose_encoder1", True),
        "time_embedding": _convert_timestep_embedding(sd, "time_embedding"),
        "proj_in": convert_linear(sd, "proj_in"),
        "embedding_proj": convert_linear(sd, "embedding_proj"),
        "encoder_hidden_states_proj": convert_linear(
            sd, "encoder_hidden_states_proj"),
        "encoder_hidden_states_proj1": convert_linear(
            sd, "encoder_hidden_states_proj1"),
        "positional_embedding": _j(sd["positional_embedding"]),
        "prd_embedding": _j(sd["prd_embedding"]),
        "blocks": [_convert_tblock(sd, f"transformer_blocks.{i}")
                   for i in range(n_layers)],
        "norm_out": convert_norm(sd, "norm_out"),
        "proj_to_clip_embeddings": convert_linear(
            sd, "proj_to_clip_embeddings"),
    }


# ---------------------------------------------------------------------------
# projection modules
# ---------------------------------------------------------------------------

def convert_image_proj(sd: StateDict, prefix: str = ""):
    pre = prefix + "net" if prefix else "net"
    return {
        "fc1": convert_linear(sd, f"{pre}.0"),
        "norm": convert_norm(sd, f"{pre}.3"),
        "fc2": convert_linear(sd, f"{pre}.4"),
    }


def convert_pose_proj(sd: StateDict, prefix: str = ""):
    n = _count(sd, rf"{re.escape(prefix)}blocks\.(\d+)\.")
    return {
        "conv_in": convert_conv(sd, f"{prefix}conv_in"),
        "blocks": [convert_conv(sd, f"{prefix}blocks.{i}") for i in range(n)],
        "conv_out": convert_conv(sd, f"{prefix}conv_out"),
    }


# ---------------------------------------------------------------------------
# frozen encoders (transformers naming)
# ---------------------------------------------------------------------------

def convert_clip_vision(sd: StateDict):
    """transformers CLIPVisionModelWithProjection -> vit_init() layout."""
    pre = "vision_model"
    n = _count(sd, rf"{pre}\.encoder\.layers\.(\d+)\.")
    layers = []
    for i in range(n):
        lp = f"{pre}.encoder.layers.{i}"
        layers.append({
            "norm1": convert_norm(sd, f"{lp}.layer_norm1"),
            "attn": {
                "to_q": convert_linear(sd, f"{lp}.self_attn.q_proj"),
                "to_k": convert_linear(sd, f"{lp}.self_attn.k_proj"),
                "to_v": convert_linear(sd, f"{lp}.self_attn.v_proj"),
                "to_out": convert_linear(sd, f"{lp}.self_attn.out_proj"),
            },
            "norm2": convert_norm(sd, f"{lp}.layer_norm2"),
            "mlp": {
                "fc1": convert_linear(sd, f"{lp}.mlp.fc1"),
                "fc2": convert_linear(sd, f"{lp}.mlp.fc2"),
            },
        })
    p = {
        "cls_token": _j(sd[f"{pre}.embeddings.class_embedding"]).reshape(
            1, 1, -1),
        "patch_embed": {"kernel": _j(
            sd[f"{pre}.embeddings.patch_embedding.weight"].transpose(
                2, 3, 1, 0))},
        "pos_embed": _j(
            sd[f"{pre}.embeddings.position_embedding.weight"])[None],
        "pre_norm": convert_norm(sd, f"{pre}.pre_layrnorm"),
        "layers": layers,
        "final_norm": convert_norm(sd, f"{pre}.post_layernorm"),
    }
    if "visual_projection.weight" in sd:
        p["projection"] = convert_linear(sd, "visual_projection")
    return p


def convert_dinov2(sd: StateDict, target_grid=None):
    """transformers Dinov2Model -> vit_init() layout. target_grid: (gh, gw)
    to pre-interpolate position embeddings (e.g. (16, 16) for 224px)."""
    from pcdms_tpu.models.vit import interpolate_pos_embed

    n = _count(sd, r"encoder\.layer\.(\d+)\.")
    layers = []
    for i in range(n):
        lp = f"encoder.layer.{i}"
        layer = {
            "norm1": convert_norm(sd, f"{lp}.norm1"),
            "attn": {
                "to_q": convert_linear(sd, f"{lp}.attention.attention.query"),
                "to_k": convert_linear(sd, f"{lp}.attention.attention.key"),
                "to_v": convert_linear(sd, f"{lp}.attention.attention.value"),
                "to_out": convert_linear(sd, f"{lp}.attention.output.dense"),
            },
            "norm2": convert_norm(sd, f"{lp}.norm2"),
            "ls1": _j(sd[f"{lp}.layer_scale1.lambda1"]),
            "ls2": _j(sd[f"{lp}.layer_scale2.lambda1"]),
        }
        if f"{lp}.mlp.weights_in.weight" in sd:       # SwiGLU (giant)
            layer["mlp"] = {
                "weights_in": convert_linear(sd, f"{lp}.mlp.weights_in"),
                "weights_out": convert_linear(sd, f"{lp}.mlp.weights_out"),
            }
        else:
            layer["mlp"] = {
                "fc1": convert_linear(sd, f"{lp}.mlp.fc1"),
                "fc2": convert_linear(sd, f"{lp}.mlp.fc2"),
            }
        layers.append(layer)

    pos = _j(sd["embeddings.position_embeddings"])
    if target_grid is not None:
        pos = interpolate_pos_embed(pos, *target_grid)
    return {
        "cls_token": _j(sd["embeddings.cls_token"]),
        "patch_embed": {
            "kernel": _j(
                sd["embeddings.patch_embeddings.projection.weight"].transpose(
                    2, 3, 1, 0)),
            "bias": _j(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "pos_embed": pos,
        "layers": layers,
        "final_norm": convert_norm(sd, "layernorm"),
    }


# ---------------------------------------------------------------------------
# monolithic reference training checkpoints
# ---------------------------------------------------------------------------

def split_reference_checkpoint(sd: StateDict):
    """Split a reference stage-2/3 training checkpoint (keys prefixed
    unet. / pose_proj. / image_proj_model_p. / image_proj_model.) into
    per-module state dicts (stage2_batchtest_inpaint_model.py:106-121)."""
    groups: Dict[str, StateDict] = {}
    for key, value in sd.items():
        key = key.removeprefix("module.")
        for prefix in ("unet.", "pose_proj.", "image_proj_model_p.",
                       "image_proj_model_g.", "image_proj_model."):
            if key.startswith(prefix):
                groups.setdefault(prefix[:-1], {})[
                    key[len(prefix):]] = value
                break
    return groups
