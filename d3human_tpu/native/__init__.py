"""Native (C++) runtime components.

Built on demand with the system toolchain; every consumer has a pure-python
fallback so the framework degrades gracefully where no compiler exists.
"""

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libframecache.so")
_SRC = os.path.join(_DIR, "framecache.cpp")


def build_framecache(force: bool = False) -> str:
    """Compile libframecache.so if needed; returns the library path."""
    if not force and os.path.exists(_LIB) and (
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True)
    return _LIB
