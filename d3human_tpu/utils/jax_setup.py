"""Process-level JAX setup: persistent compilation cache + profiling knobs.

The single-core host makes XLA compiles expensive; the persistent cache
amortizes them across runs (tests, bench, training restarts alike).
"""

from __future__ import annotations

import os

import jax


def setup(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get(
        "D3H_JAX_CACHE", os.path.join(os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def enable_debug_nans(enable: bool = True) -> None:
    """Sanitizer mode (SURVEY §5: the reference's anomaly-detect analogue)."""
    jax.config.update("jax_debug_nans", enable)
