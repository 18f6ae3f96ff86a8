"""Process-level JAX setup: persistent compilation cache + profiling knobs.

The single-core host makes XLA compiles expensive; the persistent cache
amortizes them across runs (tests, bench, training restarts alike).
"""

from __future__ import annotations

import os

import jax


def _axon_tunnel_dead(port: int = 8082, timeout_s: float = 3.0) -> bool:
    """True only when this IS an axon image (the TPU plugin is importable)
    and the tunnel's host relay port refuses connections — the state in
    which the first jax backend init hangs forever."""
    import socket

    try:
        socket.create_connection(("127.0.0.1", port), timeout=timeout_s
                                 ).close()
        return False
    except OSError:
        pass
    try:
        import axon.register  # noqa: F401
    except Exception:
        return False        # not an axon image: nothing to guard
    return True


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
    # D3H_PLATFORM=cpu forces the CPU backend for dev/CI runs. The axon
    # image's sitecustomize overrides the JAX_PLATFORMS env var at config
    # level, so this must go through jax.config (and before backend init).
    platform = os.environ.get("D3H_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
            n = os.environ.get("D3H_NUM_CPU_DEVICES")
            if n:
                jax.config.update("jax_num_cpu_devices", int(n))
        except RuntimeError as e:
            print(f"[jax_setup] platform override failed: {e}")
    elif _axon_tunnel_dead():
        # Observed twice in round 3: the axon TPU tunnel's host relay dies
        # and the FIRST backend init then blocks forever in a futex wait.
        # `import jax` is safe; jax.devices() is not. Falling back to CPU
        # (loudly) keeps compile checks and host tooling alive instead of
        # hanging the calling process.
        print("[jax_setup] WARNING: axon TPU relay (:8082) is dead; "
              "forcing the CPU backend so backend init cannot hang. "
              "Unset nothing — this clears itself when the tunnel returns.")
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError as e:
            print(f"[jax_setup] cpu fallback failed: {e}")
    # PRNG impl: threefry (the JAX default) costs real time on TPU for the
    # per-pixel jitter noise (PERF.md key-dependent ~225 ms bucket); rbg
    # lowers to the hardware RNG. Opt-in via D3H_PRNG=rbg — jitter noise
    # has no statistical-quality requirement, but golden-loss tests pin
    # threefry so CPU/TPU stay comparable by default.
    prng = os.environ.get("D3H_PRNG")
    if prng:
        try:
            jax.config.update("jax_default_prng_impl", prng)
        except Exception as e:
            print(f"[jax_setup] prng override failed: {e}")


def enable_debug_nans(enable: bool = True) -> None:
    """Sanitizer mode (SURVEY §5: the reference's anomaly-detect analogue)."""
    jax.config.update("jax_debug_nans", enable)
