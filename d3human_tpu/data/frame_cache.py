"""Decode-once frame cache: python writer + ctypes bindings to the native
async loader (d3human_tpu/native/framecache.cpp).

Pipeline: ``build_cache`` decodes a capture once (FrameDataset conventions)
into a packed fp16 binary; ``FrameCacheReader`` serves frames through the
C++ mmap/prefetch library (falling back to numpy memmap when the toolchain
is unavailable). Per-frame payload layout (train_res = (H, W)):

    all_img   H*W*4 f16    (rgb premultiplied, sign alpha)
    cloth_a   H*W*1 f16
    body_a    H*W*1 f16
    normal    H*W*3 f16
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import Dict, Optional

import numpy as np

_MAGIC = 0xD3DA7ACAFE


def frame_bytes(res) -> int:
    H, W = res
    return H * W * (4 + 1 + 1 + 3) * 2


def build_cache(dataset, cache_path: str) -> str:
    """Decode every frame of a FrameDataset into the packed cache."""
    H, W = dataset.train_res
    fb = frame_bytes((H, W))
    n = len(dataset)
    with open(cache_path, "wb") as f:
        f.write(struct.pack("<QQQQ", _MAGIC, n, fb, 0))
        for i in range(n):
            t = dataset.frame_target(i)
            rec = np.concatenate([
                t["all_img"].reshape(H * W, 4),
                t["cloth_img"][..., 3:].reshape(H * W, 1),
                t["body_img"][..., 3:].reshape(H * W, 1),
                t["all_normal"].reshape(H * W, 3),
            ], axis=1).astype(np.float16)
            f.write(rec.tobytes())
    return cache_path


class FrameCacheReader:
    def __init__(self, cache_path: str, res, ring: int = 4):
        self.res = tuple(res)
        self.fb = frame_bytes(self.res)
        self._native = None
        self._handle = None
        try:
            from d3human_tpu.native import build_framecache

            lib = ctypes.CDLL(build_framecache())
            lib.fc_open.restype = ctypes.c_void_p
            lib.fc_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.fc_get_frame.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                         ctypes.c_char_p]
            lib.fc_n_frames.restype = ctypes.c_uint64
            lib.fc_n_frames.argtypes = [ctypes.c_void_p]
            lib.fc_frame_bytes.restype = ctypes.c_uint64
            lib.fc_frame_bytes.argtypes = [ctypes.c_void_p]
            lib.fc_close.argtypes = [ctypes.c_void_p]
            h = lib.fc_open(cache_path.encode(), ring)
            if h:
                self._native = lib
                self._handle = h
                self.n_frames = int(lib.fc_n_frames(h))
                assert int(lib.fc_frame_bytes(h)) == self.fb
        except Exception:
            self._native = None
        if self._native is None:
            with open(cache_path, "rb") as f:
                magic, n, fb, _ = struct.unpack("<QQQQ", f.read(32))
            assert magic == _MAGIC and fb == self.fb
            self.n_frames = n
            self._mm = np.memmap(cache_path, np.uint8, "r", offset=32)

    def close(self):
        if self._native is not None and self._handle:
            self._native.fc_close(self._handle)
            self._handle = None

    def frame(self, idx: int) -> Dict[str, np.ndarray]:
        H, W = self.res
        buf = np.empty(self.fb, np.uint8)
        if self._native is not None:
            rc = self._native.fc_get_frame(
                self._handle, idx, buf.ctypes.data_as(ctypes.c_char_p))
            assert rc == 0
        else:
            off = idx * self.fb
            buf[:] = self._mm[off:off + self.fb]
        rec = buf.view(np.float16).reshape(H * W, 9).astype(np.float32)
        all_img = rec[:, 0:4].reshape(H, W, 4)
        cloth_a = rec[:, 4:5].reshape(H, W, 1)
        body_a = rec[:, 5:6].reshape(H, W, 1)
        normal = rec[:, 6:9].reshape(H, W, 3)
        rgb = all_img[..., :3]
        return {
            "all_img": all_img,
            "cloth_img": np.concatenate([rgb * cloth_a, cloth_a], -1),
            "body_img": np.concatenate([rgb * body_a, body_a], -1),
            "all_normal": normal,
            "cloth_normal": normal * cloth_a,
            "body_normal": normal * body_a,
        }
