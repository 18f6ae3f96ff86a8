"""Real-capture loader coverage: a fabricated reference-layout fixture
(ref /root/reference/dataset/dataset_split.py:109-283's on-disk schema) run
through FrameDataset end to end — shapes, conventions (sRGB, binarized
masks, [-1,1] masked normals, (H, W) ordering on non-square frames),
SMPL-X param parsing, and background compositing."""

import json
import os

import numpy as np
import pytest

from d3human_tpu.data.dataset import (
    FrameDataset, composite_background, load_smplx_params,
)

H_SRC, W_SRC = 40, 32          # deliberately non-square
N_FRAMES = 3


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, arr.astype(np.uint8))


@pytest.fixture()
def capture_dir(tmp_path):
    base = tmp_path / "f3c"
    for sub in ("images", "all", "all_cloth_mask", "all_body_mask",
                "normal", "smplx", "smplx_optimized"):
        os.makedirs(base / sub)

    rng = np.random.default_rng(0)
    for i in range(N_FRAMES):
        rgb = rng.integers(0, 255, (H_SRC, W_SRC, 3))
        _write_png(base / "images" / f"{i:04d}.png", rgb)
        # masks: a centered box; grayscale values 0/255 (binarize on load)
        m = np.zeros((H_SRC, W_SRC), np.uint8)
        m[8:32, 6:26] = 255
        _write_png(base / "all" / f"{i:04d}.png", m)
        cloth = np.zeros_like(m)
        cloth[8:20, 6:26] = 200          # non-255 foreground still counts
        _write_png(base / "all_cloth_mask" / f"{i:04d}.png", cloth)
        body = np.where((m > 0) & (cloth == 0), 255, 0).astype(np.uint8)
        _write_png(base / "all_body_mask" / f"{i:04d}.png", body)
        nrm = rng.integers(0, 255, (H_SRC, W_SRC, 3))
        _write_png(base / "normal" / f"{i:04d}.png", nrm)

    (base / "key.list").write_text("0\n2\n")

    np.savez(base / "smplx" / "merged_smplx.npz",
             trans=rng.normal(size=(N_FRAMES, 3)),
             rhand_pose=rng.normal(size=(N_FRAMES, 45)),
             lhand_pose=rng.normal(size=(N_FRAMES, 45)),
             jaw_pose=rng.normal(size=(N_FRAMES, 3)),
             reye_pose=rng.normal(size=(N_FRAMES, 3)),
             leye_pose=rng.normal(size=(N_FRAMES, 3)),
             expr=rng.normal(size=(N_FRAMES, 50)),
             body_pose=rng.normal(size=(N_FRAMES, 63)),
             root_pose=rng.normal(size=(N_FRAMES, 3)))

    K = np.asarray([[800.0, 0, W_SRC], [0, 800.0, H_SRC], [0, 0, 1]])
    ext = np.eye(4, dtype=np.float32)
    ext[2, 3] = 2.5
    np.savez(base / "smplx" / "cameras.npz", intrinsic=K, extrinsic=ext,
             height=np.int64(2 * H_SRC), width=np.int64(2 * W_SRC))

    for name, n in (("face_offset", 5), ("joint_offset", 55),
                    ("locator_offset", 4)):
        with open(base / "smplx_optimized" / f"{name}.json", "w") as f:
            json.dump(np.zeros((n, 3)).tolist(), f)
    with open(base / "smplx_optimized" / "shape_param.json", "w") as f:
        json.dump(np.linspace(0, 1, 100).tolist(), f)

    return str(base)


def test_frame_target_schema_and_conventions(capture_dir):
    res = (24, 16)                 # (H, W), non-square
    ds = FrameDataset(capture_dir, res)
    assert ds.n_images == 2 and len(ds) == 2

    t = ds.frame_target(0)
    H, W = res
    for k in ("all_img", "cloth_img", "body_img"):
        assert t[k].shape == (H, W, 4), (k, t[k].shape)
        a = t[k][..., 3]
        assert set(np.unique(a)).issubset({0.0, 1.0})   # sign()'d alpha
        # rgb premultiplied by mask
        assert np.all(t[k][..., :3][a == 0] == 0)
    for k in ("all_normal", "cloth_normal", "body_normal"):
        assert t[k].shape == (H, W, 3)
        assert t[k].min() >= -1.0 and t[k].max() <= 1.0
        assert np.all(t[k][t["all_img"][..., 3] == 0] == 0)
    # linear rgb (sRGB decoded): every value in [0,1]
    assert t["all_img"][..., :3].max() <= 1.0
    # mask geometry survives resize in (H, W) orientation: foreground rows
    # are the middle band of the image, not the middle band of the width
    fg_rows = np.nonzero(t["all_img"][..., 3].sum(axis=1))[0]
    assert 0 < fg_rows[0] and fg_rows[-1] < H - 1
    assert t["mvp"].shape == (4, 4) and t["campos"].shape == (3,)

    # cloth/body decompose the full mask (edge pixels are fractional after
    # the reference's binarize-then-resize order, so compare coverage areas)
    a_all = t["all_img"][..., 3].sum()
    a_cb = t["cloth_img"][..., 3].sum() + t["body_img"][..., 3].sum()
    assert abs(a_cb - a_all) / a_all < 0.15


def test_smplx_param_parsing(capture_dir):
    p = load_smplx_params(os.path.join(capture_dir, "smplx"))
    assert p["body_pose"].shape == (N_FRAMES, 63)
    assert p["expr"].shape == (N_FRAMES, 50)
    assert p["shape"].shape == (1, 100)
    assert p["joint_offset"].shape[-2:] == (55, 3)


def test_composite_background(capture_dir):
    ds = FrameDataset(capture_dir, (16, 16))
    t = ds.frame_target(1)
    rng = np.random.default_rng(1)
    out = composite_background(t, "random", rng)
    a = t["all_img"][..., 3:]
    expect = out["background"] + (t["all_img"][..., :3]
                                  - out["background"]) * a
    np.testing.assert_allclose(out["all_img"][..., :3], expect, atol=1e-6)
    for bg in ("black", "white", "checker"):
        out = composite_background(t, bg)
        assert out["background"].shape == (16, 16, 3)
