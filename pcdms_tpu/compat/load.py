"""Checkpoint loading: local torch / safetensors files -> JAX params.

Handles the checkpoint formats the reference ecosystem produces:
  * HF diffusers model directories (``diffusion_pytorch_model.bin`` or
    ``.safetensors`` under ``unet/`` / ``vae/`` / ``prior/`` subfolders)
  * transformers encoder directories (``pytorch_model.bin`` /
    ``model.safetensors``)
  * the monolithic PCDMs training checkpoints
    (``mp_rank_00_model_states.pt`` with a ``module`` dict, or the demo
    ``pcdms_ckpt.pt`` — /root/reference/stage2_batchtest_inpaint_model.py:103-121,
    pcdms_kaggle_demo.ipynb cell 13)

This environment has no network egress; all loaders take local paths.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from pcdms_tpu.compat.torch_convert import (
    StateDict, convert_clip_vision, convert_dinov2, convert_image_proj,
    convert_pose_proj, convert_prior, convert_unet, convert_vae,
    split_reference_checkpoint, state_dict_to_numpy,
)

_WEIGHT_FILES = (
    "diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin",
    "model.safetensors", "pytorch_model.bin",
)


def load_state_dict(path: str) -> StateDict:
    """Load a single torch/safetensors weight file -> numpy state dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return {k: np.asarray(v, np.float32)
                for k, v in load_file(path).items()}
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "module" in obj:     # DeepSpeed-style
        obj = obj["module"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return state_dict_to_numpy(obj)


def load_model_dir(path: str, subfolder: Optional[str] = None) -> StateDict:
    """Find and load the weight file in an HF-style model directory."""
    directory = os.path.join(path, subfolder) if subfolder else path
    if os.path.isfile(directory):
        return load_state_dict(directory)
    for name in _WEIGHT_FILES:
        candidate = os.path.join(directory, name)
        if os.path.isfile(candidate):
            return load_state_dict(candidate)
    raise FileNotFoundError(f"no weight file found under {directory}")


# convenience wrappers --------------------------------------------------------

def load_sd_vae(pretrained_dir: str):
    return convert_vae(load_model_dir(pretrained_dir, "vae"))


def load_sd_unet(pretrained_dir: str, subfolder: str = "unet"):
    return convert_unet(load_model_dir(pretrained_dir, subfolder))


def load_prior(path: str):
    return convert_prior(load_model_dir(path))


def load_clip_vision(path: str):
    return convert_clip_vision(load_model_dir(path))


def load_dinov2(path: str, target_grid=(16, 16)):
    return convert_dinov2(load_model_dir(path), target_grid=target_grid)


def load_pcdms_stage2_checkpoint(path: str):
    """Load a monolithic stage-2 training checkpoint and split it into
    {"unet", "pose_proj", "image_proj"} JAX param trees."""
    sd = load_state_dict(path)
    groups = split_reference_checkpoint(sd)
    out = {}
    if "unet" in groups:
        out["unet"] = convert_unet(groups["unet"])
    if "pose_proj" in groups:
        out["pose_proj"] = convert_pose_proj(groups["pose_proj"])
    for key in ("image_proj_model_p", "image_proj_model"):
        if key in groups:
            out["image_proj"] = convert_image_proj(groups[key])
            break
    return out


def load_pcdms_stage3_checkpoint(path: str):
    sd = load_state_dict(path)
    groups = split_reference_checkpoint(sd)
    out = {}
    if "unet" in groups:
        out["unet"] = convert_unet(groups["unet"])
    for key in ("image_proj_model_p", "image_proj_model"):
        if key in groups:
            out["image_proj"] = convert_image_proj(groups[key])
            break
    return out
