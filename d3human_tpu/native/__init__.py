"""Native (C++) runtime components.

Built on demand with the system toolchain; every consumer has a pure-python
fallback so the framework degrades gracefully where no compiler exists.

Components:
  * framecache — mmap'd decode-once frame store with async prefetch
    (data/frame_cache.py).
  * meshsdf — BVH + pseudonormal signed-distance queries, the host-side
    pysdf equivalent (native/meshsdf.py).
"""

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def build_lib(name: str, force: bool = False) -> str:
    """Compile lib<name>.so from <name>.cpp if stale; returns the path."""
    src = os.path.join(_DIR, f"{name}.cpp")
    lib = os.path.join(_DIR, f"lib{name}.so")
    if not force and os.path.exists(lib) and (
            os.path.getmtime(lib) >= os.path.getmtime(src)):
        return lib
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           src, "-o", lib]
    subprocess.run(cmd, check=True)
    return lib


def build_framecache(force: bool = False) -> str:
    """Compile libframecache.so if needed; returns the library path."""
    return build_lib("framecache", force=force)
