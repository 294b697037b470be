"""PCDMs-TPU: a TPU-native (JAX / XLA / Pallas / pjit) framework for
progressive conditional diffusion pose-guided image synthesis.

Re-designed from scratch with the capabilities of tencent-ailab/PCDMs
(ICLR 2024, arXiv 2310.06313). The reference is CUDA/PyTorch/diffusers;
this framework is built TPU-first:

  * pure-functional models (param pytrees + apply fns) that jit/pjit cleanly
  * NHWC conv layout (TPU-native), bf16 compute with fp32 params/norms
  * denoising loops as `lax.scan` inside a single jit
  * Pallas flash-attention for the UNet/transformer hot path
  * SPMD data-parallel training via `jax.sharding.Mesh` + NamedSharding
"""

__version__ = "0.1.0"
