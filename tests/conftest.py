"""Test configuration: run the suite on CPU with 8 virtual devices so
sharding tests exercise real multi-device code paths without TPUs
(SURVEY.md §4 implication)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# This JAX build demotes fp32 matmuls by default (~1e-3 error) even on CPU;
# oracle and finite-difference comparisons need true fp32.
jax.config.update("jax_default_matmul_precision", "highest")
# Single-core box: persistent compilation cache makes repeated runs fast,
# and tests must ALWAYS jit (eager dispatch is ~1000x slower here).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
