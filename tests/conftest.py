"""Test environment: 8 fake CPU devices so shard_map/mesh paths run without
a TPU slice (SURVEY.md §4.6). Must set flags before jax initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after flags)

# The environment's TPU plugin ignores JAX_PLATFORMS; force the default
# platform through the config API so jax.devices() really is 8 fake CPUs.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: this host is single-core, so avoiding
# recompiles across test runs dominates suite wall-clock.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
