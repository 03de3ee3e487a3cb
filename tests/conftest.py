"""Test env: run everything on CPU with 8 virtual devices so sharding tests
exercise a real multi-device mesh without TPU hardware (SURVEY.md §4)."""

import os

# force CPU even when the shell env points JAX at a TPU platform
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) forces jax_platforms="axon,cpu" at
# interpreter start; push it back to pure CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles many near-identical train
# steps (fit/CLI/DP tests) on one CPU core; caching them across tests AND
# runs cuts suite wall time several-fold (VERDICT r1 weak #6). Keyed by HLO
# hash, so stale entries are impossible.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
