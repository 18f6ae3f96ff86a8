"""Dress rehearsal for the real-capture execution path: write the built-in
synthetic scene to disk in the reference's exact on-disk capture layout
(ref dataset/dataset_split.py:109-283 + load_smplx_param :82-107), so
``train_d3h.py`` can run WITHOUT ``--synthetic`` — exercising FrameDataset,
cameras.npz intrinsics, merged_smplx.npz, offset jsons, gender inference and
the official SMPLX_{GENDER}.npz loader end-to-end with no licensed data.

Layout written under <out>/<folder>:
    images/*.png  all/*.png  all_body_mask/*.png  all_cloth_mask/*.png
    normal/*.png  key.list
    smplx/merged_smplx.npz  smplx/cameras.npz
    smplx_optimized/{face,joint,locator}_offset.json + shape_param.json
plus <out>/smplx/SMPLX_<GENDER>.npz (official npz layout, padded to the
300-shape/50-expr column convention so load_smplx_npz reads it unchanged).

Usage:
    python scripts/export_reference_layout.py --out /tmp/ref_layout \
        --folder neutral-synth --res 256 --frames 8
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup_jax  # noqa: E402

_setup_jax()

import jax.numpy as jnp  # noqa: E402

from d3human_tpu.data.synthetic import make_scene  # noqa: E402
from d3human_tpu.render.camera import FLIP_YZ, camera_matrices, look_at  # noqa: E402
from d3human_tpu.utils.io import save_image  # noqa: E402


def _linear_to_srgb(x):
    return np.where(x <= 0.0031308, x * 12.92,
                    1.055 * np.clip(x, 0.0031308, None) ** (1 / 2.4) - 0.055)


def _save_png(path, arr01):
    save_image(path, np.clip(arr01, 0.0, 1.0))


def export_model_npz(model, path):
    """Official SMPLX npz layout: shapedirs [V,3,300+expr] (shape cols then
    expression cols at 300+), posedirs [V,3,P], kintree_table [2,J]."""
    V = model.num_verts
    nb, ne = model.num_betas, model.num_expr
    sd_syn = np.asarray(model.shapedirs)          # [V, 3, nb+ne]
    shapedirs = np.zeros((V, 3, 300 + 50), np.float32)
    shapedirs[:, :, :nb] = sd_syn[:, :, :nb]
    shapedirs[:, :, 300:300 + ne] = sd_syn[:, :, nb:]
    pd = np.asarray(model.posedirs)               # [(J-1)*9, V*3]
    posedirs = pd.T.reshape(V, 3, pd.shape[0])
    parents = np.asarray(model.parents, np.int64)
    kintree = np.stack([parents, np.arange(len(parents))], 0)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path,
             v_template=np.asarray(model.v_template, np.float32),
             shapedirs=shapedirs, posedirs=posedirs,
             J_regressor=np.asarray(model.J_regressor, np.float32),
             weights=np.asarray(model.lbs_weights, np.float32),
             f=np.asarray(model.faces, np.int64),
             kintree_table=kintree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--folder", default="neutral-synth")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    H = W = args.res
    base = os.path.join(args.out, args.folder)
    for sub in ("images", "all", "all_body_mask", "all_cloth_mask",
                "normal", "smplx", "smplx_optimized"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    scene = make_scene(resolution=(H, W), n_frames=args.frames)

    # camera in the capture format: full-res intrinsics that integer-halve
    # (ref dataset_split.py:170-176) to a pinhole matching the synthetic
    # perspective (fovy=0.9); extrinsic stored as w2c with the y/z flip
    # folded OUT (the loader re-applies FLIP_YZ)
    f_half = (H / 2.0) / np.tan(0.45)
    K = np.array([[2 * f_half, 0, W], [0, 2 * f_half, H], [0, 0, 1]],
                 np.float32)
    w2c = (FLIP_YZ @ look_at(eye=(0.0, 0.0, 2.2),
                             center=(0.0, 0.0, 0.0))).astype(np.float32)
    np.savez(os.path.join(base, "smplx", "cameras.npz"),
             intrinsic=K, extrinsic=w2c,
             height=np.int64(2 * H), width=np.int64(2 * W))

    # render GT through the SAME matrices the loader will reconstruct
    mv, mvp, campos = camera_matrices(K, w2c, 2 * H, 2 * W, half=True)
    scene = dataclasses.replace(scene, mv=jnp.asarray(mv),
                                mvp=jnp.asarray(mvp),
                                campos=jnp.asarray(campos))

    for i in range(args.frames):
        t = {k: np.asarray(v) for k, v in scene.frame_target(i).items()}
        rgb = _linear_to_srgb(t["all_img"][..., :3])
        _save_png(os.path.join(base, "images", f"{i:06d}.png"), rgb)
        for name, arr in (("all", t["all_img"][..., 3]),
                          ("all_body_mask", t["body_img"][..., 3]),
                          ("all_cloth_mask", t["cloth_img"][..., 3])):
            m = (arr > 0.5).astype(np.float32)
            _save_png(os.path.join(base, name, f"{i:06d}.png"),
                      np.repeat(m[..., None], 3, -1))
        nrm = (t["all_normal"][..., :3] + 1.0) / 2.0
        _save_png(os.path.join(base, "normal", f"{i:06d}.png"), nrm)

    with open(os.path.join(base, "key.list"), "w") as fh:
        fh.write(f"0\n{args.frames}\n")

    pp = {k: np.asarray(v) for k, v in scene.pose_params.items()}
    expr = np.zeros((args.frames, 50), np.float32)
    expr[:, :pp["expr"].shape[1]] = pp["expr"]
    np.savez(os.path.join(base, "smplx", "merged_smplx.npz"),
             trans=pp["trans"], root_pose=pp["root_pose"],
             body_pose=pp["body_pose"], jaw_pose=pp["jaw_pose"],
             leye_pose=pp["leye_pose"], reye_pose=pp["reye_pose"],
             lhand_pose=pp["lhand_pose"], rhand_pose=pp["rhand_pose"],
             expr=expr)

    J = len(scene.model.parents)
    V = scene.model.num_verts
    opt = os.path.join(base, "smplx_optimized")
    json.dump(np.zeros((V, 3)).tolist(),
              open(os.path.join(opt, "face_offset.json"), "w"))
    json.dump(np.zeros((J, 3)).tolist(),
              open(os.path.join(opt, "joint_offset.json"), "w"))
    json.dump(np.zeros((J, 3)).tolist(),
              open(os.path.join(opt, "locator_offset.json"), "w"))
    json.dump(np.zeros((100,)).tolist(),
              open(os.path.join(opt, "shape_param.json"), "w"))

    gender = args.folder.split("-")[0] or "neutral"
    export_model_npz(scene.model,
                     os.path.join(args.out, "smplx",
                                  f"SMPLX_{gender.upper()}.npz"))
    print(f"[export] wrote reference-layout capture to {base}")


if __name__ == "__main__":
    main()
