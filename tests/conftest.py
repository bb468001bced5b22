"""Test configuration: force an 8-device virtual CPU platform.

Tests must exercise multi-chip sharding logic without TPU hardware, so we
pin JAX to the CPU backend with 8 virtual devices (the driver separately
dry-run-compiles the multi-chip path). Must run before any jax import.
"""

import os

# Force (not setdefault): the session env/sitecustomize may pin jax to a
# TPU backend plugin, but tests must run on the virtual 8-device CPU
# platform. The plugin sets jax.config at interpreter start, so overriding
# the env var is not enough — override the config itself before any
# backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
# The suite is compile-dominated (large jitted SLAM/BA programs): persist
# compiled executables across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/pre3_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
