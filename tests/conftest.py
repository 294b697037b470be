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

# The suite is XLA-compile-dominated (hundreds of tiny-model jits), so a
# persistent compilation cache cuts warm reruns several-fold. Keyed by
# backend+topology+graph, so the 8-device CPU mesh caches consistently.
# Opt out with PCDMS_TEST_COMPILE_CACHE=off (e.g. when bisecting XLA).
_cache_dir = os.environ.get(
    "PCDMS_TEST_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_cache"))
if _cache_dir != "off":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
