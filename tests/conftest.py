"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests emulate a v5e-8 slice without TPU hardware (SURVEY.md §4)."""

import os

# Hard override: the environment's sitecustomize pins JAX_PLATFORMS=axon
# (remote TPU tunnel); tests must run on the local CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
