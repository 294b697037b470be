"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests emulate a v5e-8 slice without TPU hardware (SURVEY.md §4)."""

import os

# Hard override: the environment's sitecustomize pins JAX_PLATFORMS=axon
# (remote TPU tunnel). Setting the env var alone is NOT enough under
# pytest — a plugin may import jax before this conftest runs, capturing
# the env value — so also update the live jax config (works as long as no
# backend has been initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; a jax backend was initialized before conftest "
    f"could force it (got {jax.default_backend()})")
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()}")
