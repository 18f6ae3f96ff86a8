"""Native frame-cache loader: build the C++ library, write a cache, verify
roundtrip through both the native and the memmap fallback paths."""

import os
import struct

import numpy as np
import pytest


class FakeDataset:
    train_res = (16, 16)

    def __len__(self):
        return 3

    def frame_target(self, i):
        H, W = self.train_res
        rng = np.random.default_rng(i)
        rgb = rng.random((H, W, 3), np.float32)
        a = (rng.random((H, W, 1)) > 0.5).astype(np.float32)
        ca = a * (rng.random((H, W, 1)) > 0.5)
        ba = a - ca
        nrm = rng.random((H, W, 3), np.float32) * 2 - 1
        return {
            "all_img": np.concatenate([rgb * a, a], -1),
            "cloth_img": np.concatenate([rgb * ca, ca], -1),
            "body_img": np.concatenate([rgb * ba, ba], -1),
            "all_normal": (nrm * a).astype(np.float32),
        }


def test_native_library_builds():
    from d3human_tpu.native import build_framecache

    lib = build_framecache()
    assert os.path.exists(lib)


def test_cache_roundtrip(tmp_path):
    from d3human_tpu.data.frame_cache import FrameCacheReader, build_cache

    ds = FakeDataset()
    path = str(tmp_path / "frames.bin")
    build_cache(ds, path)

    reader = FrameCacheReader(path, ds.train_res)
    assert reader.n_frames == 3
    assert reader._native is not None, "native path should be active"
    for i in range(3):
        got = reader.frame(i)
        ref = ds.frame_target(i)
        np.testing.assert_allclose(got["all_img"], ref["all_img"], atol=2e-3)
        np.testing.assert_allclose(got["all_normal"], ref["all_normal"],
                                   atol=2e-3)
        np.testing.assert_allclose(got["cloth_img"][..., 3:],
                                   ref["cloth_img"][..., 3:], atol=1e-3)
    reader.close()


def test_memmap_fallback(tmp_path, monkeypatch):
    from d3human_tpu.data import frame_cache as fc

    ds = FakeDataset()
    path = str(tmp_path / "frames.bin")
    fc.build_cache(ds, path)

    # force the fallback by breaking the native import
    import d3human_tpu.native as native

    monkeypatch.setattr(native, "build_framecache",
                        lambda *a, **k: (_ for _ in ()).throw(OSError()))
    reader = fc.FrameCacheReader(path, ds.train_res)
    assert reader._native is None
    got = reader.frame(1)
    ref = ds.frame_target(1)
    np.testing.assert_allclose(got["all_img"], ref["all_img"], atol=2e-3)
