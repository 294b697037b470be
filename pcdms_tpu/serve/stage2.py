"""Model services: request packing for the dynamic-batching engine.

These wrap the jitted pipelines (pipelines/stage2_inpaint.py,
pipelines/cascade.py) behind a per-request submit() API. The reference
has no online inference path at all (its closest surface is the offline
batch-test scripts, /root/reference/stage2_batchtest_inpaint_model.py);
this is the deployment layer a production pose-transfer service needs.

Determinism contract (Stage2Service): a request's output is a pure
function of its inputs and its ``seed`` — independent of which other
requests share its device batch. That holds because (a) the initial
latents are derived per-request from the seed on the host, (b) the VAE
canvas encode runs at the posterior mean (``deterministic_vae=True``),
and (c) UniPC / eta=0 DDIM sampling injects no further noise. Padding
rows (the engine repeats the last request to fill a bucket) therefore
compute valid-but-discarded results and cannot perturb real rows.
(Outputs are bit-exact within a bucket size; across bucket sizes they
agree up to fp rounding, since XLA tiles each batch shape differently.)

CascadeService holds the same contract through all three stages: each
request carries a ``seed``, and ``cascade_generate(seeds=...)`` derives
every noise draw (stage-1 ancestral noise, stage-2/3 initial latents)
per row from that seed with posterior-mean VAE encodes — so the full
prior -> inpaint -> refine output is a pure function of the request,
independent of which other requests share its device batch.

The contract requires a noise-free sampler, so both services accept
only ``scheduler in {"unipc", "ddim"}`` (eta=0 DDIM; the constructors
reject anything else — e.g. ``lcm``, whose ancestral noise is drawn
from the batch rng, not the request seed).

Seeds are PORTABLE across services: both derive the stage-2 initial
latents host-side from the request seed with the same numpy Philox
stream (``_request_latents(seed)``; CascadeService passes them into
``cascade_generate(s2_latents=...)``, stage-3 uses the ``[seed, 3]``
stream). So a request seed means one thing in the deployment: feeding
a cascade's predicted embedding to a ``--model stage2`` service with
the same seed reproduces the cascade's stage-2 image (up to the fp
rounding of its batch bucket) — tested in tests/test_serve.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.models.prior_transformer import PriorConfig
from pcdms_tpu.models.unet2d import UNetConfig
from pcdms_tpu.models.vae import VAEConfig
from pcdms_tpu.pipelines.cascade import cascade_generate
from pcdms_tpu.pipelines.stage2_inpaint import stage2_generate
from pcdms_tpu.serve.engine import InferenceEngine


# samplers that inject no noise beyond the request-seeded initial
# latents — the only ones compatible with the per-request determinism
# contract (module docstring)
DETERMINISTIC_SCHEDULERS = ("unipc", "ddim")


def _check_scheduler(scheduler: str) -> str:
    if scheduler not in DETERMINISTIC_SCHEDULERS:
        raise ValueError(
            f"scheduler={scheduler!r} breaks the per-request determinism "
            f"contract (draws batch-shaped noise from the batch rng); "
            f"serving supports {DETERMINISTIC_SCHEDULERS}")
    return scheduler


def _request_latents(seed: int, lh: int, lw: int,
                     stage: int = 2) -> np.ndarray:
    """Per-request initial noise from the request seed (host-side numpy
    Philox — stable across processes, independent of batching). This is
    THE seed->latents derivation for every service: stage 2 is the
    plain ``default_rng(seed)`` stream (so seeds are portable between
    Stage2Service and CascadeService), other stages get the
    ``[seed, stage]`` substream."""
    rng = (np.random.default_rng(int(seed)) if stage == 2
           else np.random.default_rng([int(seed), int(stage)]))
    return rng.standard_normal((lh, lw, 4), dtype=np.float32)


def _check(name, arr, shape):
    arr = np.asarray(arr, np.float32)
    if arr.shape != shape:
        raise ValueError(f"{name}: expected shape {shape}, got {arr.shape}")
    return arr


def _mesh_wrap(batch_fn, mesh, buckets):
    """Multi-chip serving: shard each device batch over the mesh's batch
    axis (pure DP — same recipe as the batchtest CLIs,
    tests/test_sharded_inference.py). Every bucket must fill the mesh
    evenly. mesh=None returns batch_fn unchanged."""
    if mesh is None:
        return batch_fn
    bad = [b for b in buckets if b % mesh.devices.size]
    if bad:
        raise ValueError(f"buckets {bad} not divisible by the mesh's "
                         f"{mesh.devices.size} devices")

    def sharded_batch_fn(batch):
        from pcdms_tpu.parallel.mesh import shard_batch
        return batch_fn(shard_batch(batch, mesh))

    return sharded_batch_fn


class Stage2Service:
    """Dynamic-batched stage-2 pose-transfer serving.

    One request = (source canvas, pose canvas, DINOv2 features, optional
    prior embedding, seed) -> the generated (H, 2W, 3) canvas in [-1, 1]
    (right half is the synthesized target). Results are per-request
    deterministic regardless of batch composition (module docstring).
    """

    def __init__(self, params, *, unet_cfg: UNetConfig,
                 vae_cfg: VAEConfig = VAEConfig(),
                 height: int = 512, width: int = 512,
                 num_steps: int = 20,
                 guidance_scale: float = 2.0,
                 scheduler: str = "unipc",
                 compute_dtype=jnp.bfloat16,
                 encoder_cache_interval: int = 1,
                 simple_variant: bool = False,
                 dino_tokens: int = 257, dino_dim: int = 1536,
                 embed_dim: int = 1024,
                 buckets: Sequence[int] = (1, 2, 4, 8),
                 max_delay_ms: float = 5.0,
                 queue_size: int = 256,
                 mesh=None,
                 warmup: bool = False):
        scheduler = _check_scheduler(scheduler)
        self.height, self.width = height, width
        self.lh, self.lw = height // 8, (2 * width) // 8
        self.simple_variant = simple_variant
        self._dino_shape = (dino_tokens, dino_dim)
        self._embed_dim = embed_dim
        self._params = params

        def batch_fn(batch):
            embed = None if simple_variant else batch["embed"][:, None, :]
            return stage2_generate(
                self._params, batch["vae_image"], batch["st_pose"],
                batch["dino"], embed, jax.random.PRNGKey(0),
                latents=batch["latents"], unet_cfg=unet_cfg,
                vae_cfg=vae_cfg, num_steps=num_steps,
                guidance_scale=guidance_scale, scheduler=scheduler,
                num_samples=1, compute_dtype=compute_dtype,
                encoder_cache_interval=encoder_cache_interval,
                deterministic_vae=True)

        self.engine = InferenceEngine(_mesh_wrap(batch_fn, mesh, buckets),
                                      buckets=buckets,
                                      max_delay_ms=max_delay_ms,
                                      queue_size=queue_size,
                                      name="stage2")
        if warmup:
            self.engine.warmup(self._example())

    def _example(self):
        ex = {
            "vae_image": np.zeros((self.height, 2 * self.width, 3),
                                  np.float32),
            "st_pose": np.zeros((self.height, 2 * self.width, 3),
                                np.float32),
            "dino": np.zeros(self._dino_shape, np.float32),
            "latents": _request_latents(0, self.lh, self.lw),
        }
        if not self.simple_variant:
            ex["embed"] = np.zeros((self._embed_dim,), np.float32)
        return ex

    def submit(self, *, vae_image, st_pose, dino_features,
               embed: Optional[np.ndarray] = None, seed: int = 0,
               timeout: Optional[float] = None):
        """Enqueue one request; returns a Future of the (H, 2W, 3) image."""
        h, w2 = self.height, 2 * self.width
        inputs = {
            "vae_image": _check("vae_image", vae_image, (h, w2, 3)),
            "st_pose": _check("st_pose", st_pose, (h, w2, 3)),
            "dino": _check("dino_features", dino_features,
                           self._dino_shape),
            "latents": _request_latents(seed, self.lh, self.lw),
        }
        if self.simple_variant:
            if embed is not None:
                raise ValueError("simple_variant service takes no prior "
                                 "embedding")
        else:
            if embed is None:
                raise ValueError(
                    f"embed ({self._embed_dim},) required — stage-1 "
                    "prediction or GT CLIP embedding")
            inputs["embed"] = _check("embed", np.ravel(embed),
                                     (self._embed_dim,))
        return self.engine.submit(inputs, timeout=timeout)

    def stats(self) -> dict:
        return self.engine.stats()

    def close(self, drain: bool = True):
        self.engine.close(drain=drain)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class CascadeService:
    """Dynamic-batched full 3-stage cascade serving.

    One request = (source CLIP embedding, source/target keypoints,
    canvases, DINOv2 features, seed) -> {"refined": (H, W, 3),
    "inpainted": (H, 2W, 3), "embeds": (1024,)}. Per-request
    deterministic regardless of batch composition (module docstring).
    """

    def __init__(self, stage1_params, stage2_params, stage3_params, *,
                 prior_cfg: PriorConfig = PriorConfig(),
                 stage2_cfg: UNetConfig, stage3_cfg: UNetConfig,
                 vae_cfg: VAEConfig = VAEConfig(),
                 height: int = 512, width: int = 512,
                 steps: int = 20, guidance_scale: float = 2.0,
                 scheduler: str = "unipc",
                 compute_dtype=jnp.bfloat16,
                 encoder_cache_interval: int = 1,
                 dino_tokens: int = 257, dino_dim: int = 1536,
                 embed_dim: int = 1024,
                 buckets: Sequence[int] = (1, 2, 4, 8),
                 max_delay_ms: float = 5.0,
                 queue_size: int = 256,
                 mesh=None,
                 warmup: bool = False):
        scheduler = _check_scheduler(scheduler)
        self.height, self.width = height, width
        self._dino_shape = (dino_tokens, dino_dim)
        self._embed_dim = embed_dim

        lh, lw2 = height // 8, (2 * width) // 8

        def batch_fn(batch):
            # host-Philox initial latents from the per-row seeds — the
            # SAME derivation Stage2Service uses, so seeds are portable
            # across --model flavors (module docstring)
            seeds = np.asarray(batch["seed"]).reshape(-1)
            s2_lat = np.stack(
                [_request_latents(s, lh, lw2) for s in seeds])
            s3_lat = np.stack(
                [_request_latents(s, lh, lw2 // 2, stage=3)
                 for s in seeds])
            out = cascade_generate(
                stage1_params, stage2_params, stage3_params,
                batch["s_embed"], batch["s_pose"], batch["t_pose"],
                batch["vae_image"], batch["st_pose"], batch["dino"],
                jax.random.PRNGKey(0), seeds=batch["seed"],
                s2_latents=s2_lat, s3_latents=s3_lat,
                prior_cfg=prior_cfg,
                stage2_cfg=stage2_cfg, stage3_cfg=stage3_cfg,
                vae_cfg=vae_cfg, prior_steps=steps, inpaint_steps=steps,
                refine_steps=steps, guidance_scale=guidance_scale,
                scheduler=scheduler, compute_dtype=compute_dtype,
                encoder_cache_interval=encoder_cache_interval)
            return out

        self.engine = InferenceEngine(_mesh_wrap(batch_fn, mesh, buckets),
                                      buckets=buckets,
                                      max_delay_ms=max_delay_ms,
                                      queue_size=queue_size,
                                      name="cascade")
        if warmup:
            self.engine.warmup(self._example())

    def _example(self):
        h, w2 = self.height, 2 * self.width
        return {
            "s_embed": np.zeros((self._embed_dim,), np.float32),
            "s_pose": np.zeros((36,), np.float32),
            "t_pose": np.zeros((36,), np.float32),
            "vae_image": np.zeros((h, w2, 3), np.float32),
            "st_pose": np.zeros((h, w2, 3), np.float32),
            "dino": np.zeros(self._dino_shape, np.float32),
            "seed": np.int32(0),
        }

    def submit(self, *, s_embed, s_pose, t_pose, vae_image, st_pose,
               dino_features, seed: int = 0,
               timeout: Optional[float] = None):
        h, w2 = self.height, 2 * self.width
        inputs = {
            "s_embed": _check("s_embed", np.ravel(s_embed),
                              (self._embed_dim,)),
            "s_pose": _check("s_pose", np.ravel(s_pose), (36,)),
            "t_pose": _check("t_pose", np.ravel(t_pose), (36,)),
            "vae_image": _check("vae_image", vae_image, (h, w2, 3)),
            "st_pose": _check("st_pose", st_pose, (h, w2, 3)),
            "dino": _check("dino_features", dino_features,
                           self._dino_shape),
            "seed": np.asarray(seed, np.int32),
        }
        return self.engine.submit(inputs, timeout=timeout)

    def stats(self) -> dict:
        return self.engine.stats()

    def close(self, drain: bool = True):
        self.engine.close(drain=drain)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
