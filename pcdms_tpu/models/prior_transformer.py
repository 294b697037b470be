"""Stage-1 prior transformer: diffuses the target image's global CLIP
embedding (1024-d) conditioned on the source CLIP embedding and the
source/target pose keypoint coordinates (36 floats each).

Behavioral equivalent of the reference's ``Stage1_PriorTransformer``
(/root/reference/src/models/stage1_prior_transformer.py:49-301): a 20-layer,
32-head, d=2048 pre-norm transformer over a 6-token sequence

    [src_pose, tgt_pose, ref_img_embed, time, noisy_embed, prd]

with learned positional embeddings, two 36->512->1024 pose MLPs
(Linear/GELU/LayerNorm/Linear/LayerNorm), gelu (non-gated) feed-forwards,
biased QKV projections, and a final LayerNorm + 2048->1024 projection read
off the ``prd`` token. ``post_process`` un-normalizes by the CLIP embedding
statistics (mean -0.016, std 0.415).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from pcdms_tpu.nn.layers import (
    gelu, layer_norm_apply, layer_norm_init, linear_apply, linear_init,
    timestep_embedding_apply, timestep_embedding_init,
    timestep_sinusoidal_embedding,
)
from pcdms_tpu.nn.transformer import (
    transformer_block_apply, transformer_block_init,
)

CLIP_MEAN = -0.016
CLIP_STD = 0.415


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    num_heads: int = 32
    head_dim: int = 64
    num_layers: int = 20
    embedding_dim: int = 1024      # CLIP image embedding dim
    num_tokens: int = 6            # s_pose, t_pose, ref, time, noisy, prd
    pose_dim: int = 36             # 18 joints x (x, y)
    pose_hidden: int = 512
    use_flash: bool = False        # 6-token sequences: XLA attention is fine

    @property
    def inner_dim(self):
        return self.num_heads * self.head_dim


def _pose_mlp_init(key, cfg: PriorConfig, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, cfg.pose_dim, cfg.pose_hidden, dtype=dtype),
        "norm1": layer_norm_init(cfg.pose_hidden, dtype),
        "fc2": linear_init(k2, cfg.pose_hidden, cfg.embedding_dim, dtype=dtype),
        "norm2": layer_norm_init(cfg.embedding_dim, dtype),
    }


def _pose_mlp_apply(params, x):
    x = layer_norm_apply(params["norm1"], gelu(linear_apply(params["fc1"], x)))
    x = layer_norm_apply(params["norm2"], linear_apply(params["fc2"], x))
    return x


def prior_init(key, cfg: PriorConfig, dtype=jnp.float32):
    d = cfg.inner_dim
    e = cfg.embedding_dim
    keys = jax.random.split(key, cfg.num_layers + 9)
    return {
        "pose_encoder": _pose_mlp_init(keys[0], cfg, dtype),
        "pose_encoder1": _pose_mlp_init(keys[1], cfg, dtype),
        "time_embedding": timestep_embedding_init(keys[2], d, d, dtype=dtype),
        "proj_in": linear_init(keys[3], e, d, dtype=dtype),
        "embedding_proj": linear_init(keys[4], e, d, dtype=dtype),
        "encoder_hidden_states_proj": linear_init(keys[5], e, d, dtype=dtype),
        "encoder_hidden_states_proj1": linear_init(keys[6], e, d, dtype=dtype),
        "positional_embedding": jnp.zeros((1, cfg.num_tokens, d), dtype),
        "prd_embedding": jnp.zeros((1, 1, d), dtype),
        "blocks": [
            transformer_block_init(keys[7 + i], d, cfg.num_heads,
                                   cfg.head_dim, qkv_bias=True, geglu=False,
                                   dtype=dtype)
            for i in range(cfg.num_layers)
        ],
        "norm_out": layer_norm_init(d, dtype),
        "proj_to_clip_embeddings": linear_init(keys[-1], d, e, dtype=dtype),
    }


def prior_apply(params, cfg: PriorConfig, noisy_embed, timesteps,
                proj_embedding, s_pose, t_pose, *, cfg_zero_cond: bool = False):
    """Predict the clean (normalized) target CLIP embedding.

    noisy_embed: (B, embedding_dim) — x_t.
    timesteps: (B,).
    proj_embedding: (B, embedding_dim) — source image CLIP embedding.
    s_pose / t_pose: (B, 36) pose keypoint coordinates.
    cfg_zero_cond: classifier-free-guidance path — doubles the batch with
      zeroed *pose-feature* conditions, matching the reference's
      ``test_flag`` branch (stage1_prior_transformer.py:259-262). Callers
      must pass already-doubled noisy/proj/time inputs.
    """
    dtype = noisy_embed.dtype
    b = noisy_embed.shape[0]
    d = cfg.inner_dim

    t_feat = timestep_sinusoidal_embedding(timesteps, d).astype(dtype)
    time_token = timestep_embedding_apply(params["time_embedding"], t_feat)

    proj_token = linear_apply(params["embedding_proj"], proj_embedding)

    s_tok = linear_apply(params["encoder_hidden_states_proj"],
                         _pose_mlp_apply(params["pose_encoder"], s_pose))
    t_tok = linear_apply(params["encoder_hidden_states_proj1"],
                         _pose_mlp_apply(params["pose_encoder1"], t_pose))

    if cfg_zero_cond:
        zeros = jnp.zeros_like(s_tok)
        s_tok = jnp.concatenate([zeros, s_tok], axis=0)
        t_tok = jnp.concatenate([zeros, t_tok], axis=0)

    noisy_token = linear_apply(params["proj_in"], noisy_embed)
    prd = jnp.broadcast_to(params["prd_embedding"].astype(dtype), (b, 1, d))

    h = jnp.stack([s_tok, t_tok, proj_token, time_token, noisy_token], axis=1)
    h = jnp.concatenate([h, prd], axis=1)
    h = h + params["positional_embedding"].astype(dtype)

    for block in params["blocks"]:
        h = transformer_block_apply(block, h, heads=cfg.num_heads,
                                    use_flash=cfg.use_flash)

    h = layer_norm_apply(params["norm_out"], h)
    return linear_apply(params["proj_to_clip_embeddings"], h[:, -1])


def prior_post_process_latents(latents):
    """Un-normalize predicted embeddings by the dataset CLIP stats."""
    return latents * CLIP_STD + CLIP_MEAN


def prior_normalize_embeds(embeds):
    """Normalize GT CLIP embeddings for training targets
    (stage1_train_prior_model.py:285)."""
    return (embeds - CLIP_MEAN) / CLIP_STD
