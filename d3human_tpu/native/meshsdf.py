"""ctypes binding for the native mesh-SDF engine (meshsdf.cpp).

Host-side pysdf replacement (ref geometry/hmsdf.py:236-241 links pysdf):
exact BVH closest-point + angle-weighted pseudonormal sign. The device
path stays in ops/mesh_sdf.py (KNN-pruned JAX, approximate); pipeline
mesh surgery uses THIS so it runs off-TPU at full host speed.

    sdf = MeshSDF(verts, faces)
    d = sdf(points)                       # negative inside
    d = sdf(points, sign_convention="pos_inside")
    d, cp, face = sdf.query(points, return_closest=True)
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from d3human_tpu.native import build_lib

_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_lib("meshsdf"))
        lib.msdf_build.restype = ctypes.c_void_p
        lib.msdf_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.msdf_free.argtypes = [ctypes.c_void_p]
        lib.msdf_query.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32]
        _lib = lib
    return _lib


_SIGN_MODE = {"neg_inside": 0, "pos_inside": 1, "unsigned": 2}


class MeshSDF:
    """BVH over a triangle soup; thread-parallel signed-distance queries."""

    def __init__(self, verts: np.ndarray, faces: np.ndarray):
        lib = _load()
        self._v = np.ascontiguousarray(verts, dtype=np.float32)
        self._f = np.ascontiguousarray(faces, dtype=np.int32)
        if self._v.ndim != 2 or self._v.shape[1] != 3:
            raise ValueError(f"verts must be [V,3], got {self._v.shape}")
        if self._f.ndim != 2 or self._f.shape[1] != 3:
            raise ValueError(f"faces must be [F,3], got {self._f.shape}")
        self._h = lib.msdf_build(
            self._v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._v.shape[0],
            self._f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._f.shape[0])
        if not self._h:
            raise RuntimeError("msdf_build failed (empty mesh?)")

    def query(self, points: np.ndarray, sign_convention: str = "neg_inside",
              return_closest: bool = False, n_threads: int = 0
              ) -> "np.ndarray | Tuple[np.ndarray, np.ndarray, np.ndarray]":
        lib = _load()
        pts = np.ascontiguousarray(points, dtype=np.float32)
        if pts.ndim != 2 or pts.shape[1] != 3:
            raise ValueError(f"points must be [P,3], got {pts.shape}")
        n = pts.shape[0]
        out = np.empty((n,), dtype=np.float32)
        cp = np.empty((n, 3), dtype=np.float32) if return_closest else None
        face = np.empty((n,), dtype=np.int32) if return_closest else None
        fptr = ctypes.POINTER(ctypes.c_float)
        iptr = ctypes.POINTER(ctypes.c_int32)
        lib.msdf_query(
            self._h, pts.ctypes.data_as(fptr), n,
            out.ctypes.data_as(fptr),
            cp.ctypes.data_as(fptr) if cp is not None else None,
            face.ctypes.data_as(iptr) if face is not None else None,
            _SIGN_MODE[sign_convention], n_threads)
        if return_closest:
            return out, cp, face
        return out

    def __call__(self, points: np.ndarray, **kw) -> np.ndarray:
        return self.query(points, **kw)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h and _lib is not None:
            _lib.msdf_free(h)
            self._h = None


def mesh_sdf_host(points: np.ndarray, verts: np.ndarray, faces: np.ndarray,
                  sign_convention: str = "neg_inside") -> np.ndarray:
    """One-shot convenience matching ops.mesh_sdf's signature (numpy)."""
    return MeshSDF(verts, faces).query(points, sign_convention)


def available() -> bool:
    """True when the toolchain can produce (or has produced) the library."""
    try:
        _load()
        return True
    except Exception:
        return False
