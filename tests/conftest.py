"""Test config: run everything on a virtual 8-device CPU mesh.

This is the TPU-world substitute for "multi-node without a cluster"
(SURVEY.md section 4): sharding/collective logic is validated on
8 XLA host devices; numerics are backend-independent.

Must run before jax initializes, hence environment mutation at import time.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin registers itself at interpreter start and wins over
# the JAX_PLATFORMS env var; the config knob is the reliable override.
jax.config.update("jax_platforms", "cpu")

# Amortize XLA-CPU compiles across test runs (this box has 1 core; every
# first-use primitive costs a multi-second compile otherwise).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
