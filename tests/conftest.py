"""Test configuration: run the suite on CPU with 8 virtual devices so
sharding tests exercise real multi-device code paths without TPUs
(SURVEY.md §4 implication)."""

import os

# The image presets JAX_PLATFORMS=axon (the TPU tunnel) — must OVERWRITE,
# not setdefault, or the whole suite silently runs on the shared TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_NUM_CPU_DEVICES"] = "8"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and overrides the
# env var at config level — config.update wins by coming later.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# This JAX build demotes fp32 matmuls by default (~1e-3 error) even on CPU;
# oracle and finite-difference comparisons need true fp32.
jax.config.update("jax_default_matmul_precision", "highest")
# Single-core box: persistent compilation cache makes repeated runs fast,
# and tests must ALWAYS jit (eager dispatch is ~1000x slower here).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
