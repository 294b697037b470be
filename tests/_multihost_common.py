"""Shared harness for the multi-host simulation test: tiny stage-2
training setup + deterministic per-pair synthetic data, used identically
by the 2-process workers (tests/_multihost_worker.py) and the
single-process 8-device reference run (tests/test_multihost.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.models.projections import (
    image_proj_mlp_init, pose_cond_embedding_init,
)
from pcdms_tpu.models.unet2d import UNetConfig, unet_init
from pcdms_tpu.models.vae import VAEConfig, vae_init
from pcdms_tpu.train.common import TrainConfig, init_train_state, \
    make_train_step
from pcdms_tpu.train.stage2 import stage2_loss_fn

GLOBAL_BATCH = 8
STEPS = 10
H, W = 64, 128

UNET_CFG = UNetConfig(in_channels=9, block_out_channels=(8, 16, 16, 16),
                      layers_per_block=1, cross_attention_dim=16,
                      head_dim=8, class_embed_proj_dim=16, norm_groups=4,
                      use_flash=False)
VAE_CFG = VAEConfig(block_out_channels=(4, 8, 8, 8), layers_per_block=1,
                    norm_groups=2)
TCFG = TrainConfig(learning_rate=1e-3, lr_warmup_steps=1,
                   max_train_steps=100, zero1=True)


def make_params():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params = {
        "unet": unet_init(ks[0], UNET_CFG),
        "image_proj": image_proj_mlp_init(ks[1], 24, 16, 16),
        "pose_proj": pose_cond_embedding_init(
            ks[2], out_channels=8, block_out_channels=(4, 4, 4, 4)),
    }
    vae = vae_init(ks[3], VAE_CFG)
    return params, vae


def make_step(mesh=None):
    """Returns (initial state, jitted step fn). The step program is
    identical for the 2-process and 1-process topologies; only the mesh
    the inputs live on differs — so loss curves must match."""
    params, vae = make_params()
    loss_fn = stage2_loss_fn(UNET_CFG, vae, vae_cfg=VAE_CFG,
                             compute_dtype=jnp.float32, noise_offset=0.0)
    state = init_train_state(params, TCFG)
    step_fn = make_train_step(loss_fn, TCFG, mesh=mesh)
    return state, step_fn


def pair_example(pair_idx: int, step: int):
    """Deterministic synthetic stage-2 example for one (pair, step)."""
    rng = np.random.default_rng(pair_idx * 7919 + step)
    return {
        "st_image": rng.uniform(-1, 1, (H, W, 3)).astype(np.float32),
        "masked_image": rng.uniform(-1, 1, (H, W, 3)).astype(np.float32),
        "pose_image": rng.uniform(-1, 1, (H, W, 3)).astype(np.float32),
        "dino_features": rng.normal(size=(5, 24)).astype(np.float32),
        "clip_embed": rng.normal(size=(1, 16)).astype(np.float32),
    }


def pair_batch(pair_indices, step: int):
    """Stack examples for the given pair ids (a process-local batch when
    called with a PairList.shard slice; the global batch when called with
    the full shard-ordered id list)."""
    examples = [pair_example(i, step) for i in pair_indices]
    return {k: np.stack([e[k] for e in examples]) for k in examples[0]}


def global_pair_order(n: int, nproc: int):
    """Device order of pairs on the global mesh when each process loads
    ``PairList.shard(pid, nproc)`` (stride slicing) and shard_batch
    assembles the global array process-major: process 0's rows first."""
    order = []
    for pid in range(nproc):
        order.extend(range(pid, n, nproc))
    return order


def params_fingerprint(params) -> float:
    """Topology-independent scalar over the trained params."""
    total = 0.0
    for leaf in jax.tree.leaves(params):
        total += float(jax.jit(lambda x: jnp.sum(jnp.abs(
            x.astype(jnp.float32))))(leaf))
    return total
