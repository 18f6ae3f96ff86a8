"""Connected-component cleanup of the split meshes (host-side, numpy).

Replaces /root/reference/script/connet_face_head.py:152-261
(process_close_hole): after the split stage, the extracted body and cloth
meshes can contain stray islands (a sleeve fragment labeled body, etc.).
The reference reassigns components with openmesh + hand rules and computes a
head bounding box. Here:

  * union-find over face connectivity labels components;
  * components are reassigned by majority proximity: a small cloth island
    whose vertices sit closer to the body surface than to the main cloth
    component migrates to the body (and vice versa);
  * the head bbox comes from the top fraction of the body's height span
    (used later for optional subdivision, ref bbox.npz).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from d3human_tpu.ops.mesh_ops import connected_components
from d3human_tpu.utils import io as mesh_io


def split_components(verts: np.ndarray, faces: np.ndarray):
    """Returns a list of (vert_idx, face_idx) per connected component,
    largest first."""
    labels = connected_components(faces, len(verts))
    face_label = labels[faces[:, 0]]
    comps = []
    for lbl in np.unique(face_label):
        fidx = np.nonzero(face_label == lbl)[0]
        vidx = np.unique(faces[fidx])
        comps.append((vidx, fidx))
    comps.sort(key=lambda c: -len(c[1]))
    return comps


def _nearest_dist(src: np.ndarray, dst: np.ndarray, block=4096) -> np.ndarray:
    """Min distance from each src point to the dst point set (host numpy)."""
    out = np.empty(len(src), np.float32)
    for i in range(0, len(src), block):
        s = src[i:i + block]
        d = np.sqrt(
            ((s[:, None, :] - dst[None, :, :]) ** 2).sum(-1)).min(axis=1)
        out[i:i + block] = d
    return out


def reassign_components(
    body_v: np.ndarray, body_f: np.ndarray,
    cloth_v: np.ndarray, cloth_f: np.ndarray,
    min_keep_faces: int = 50,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Move stray islands to the mesh whose main component they hug
    (ref connet_face_head.py's component surgery). Tiny floaters (< a few
    faces) are dropped."""
    b_comps = split_components(body_v, body_f)
    c_comps = split_components(cloth_v, cloth_f)
    main_b = body_v[b_comps[0][0]] if b_comps else np.zeros((1, 3))
    main_c = cloth_v[c_comps[0][0]] if c_comps else np.zeros((1, 3))

    keep_b, keep_c = [], []   # lists of (verts, faces) in their own indexing

    def route(comps, verts, own_main, other_main, keep_own, keep_other):
        for i, (vidx, fidx) in enumerate(comps):
            tri = verts[np.asarray(
                [vidx[0]])] if len(vidx) == 0 else verts[vidx]
            if i == 0:
                keep_own.append((verts, fidx))
                continue
            if len(fidx) < min_keep_faces:
                continue   # drop floater
            d_own = _nearest_dist(tri, own_main).mean()
            d_other = _nearest_dist(tri, other_main).mean()
            (keep_own if d_own <= d_other else keep_other).append(
                (verts, fidx))

    route(b_comps, body_v, main_b, main_c, keep_b, keep_c)
    route(c_comps, cloth_v, main_c, main_b, keep_c, keep_b)

    def concat(parts, base_faces_of):
        vs, fs = [], []
        off = 0
        for verts, fidx in parts:
            faces = base_faces_of(verts)[fidx]
            used, inv = np.unique(faces.reshape(-1), return_inverse=True)
            vs.append(verts[used])
            fs.append(inv.reshape(-1, 3) + off)
            off += len(used)
        if not vs:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
        return np.concatenate(vs), np.concatenate(fs)

    def faces_of(verts):
        return body_f if verts is body_v else cloth_f

    new_bv, new_bf = concat(keep_b, faces_of)
    new_cv, new_cf = concat(keep_c, faces_of)
    return new_bv, new_bf, new_cv, new_cf


def head_bbox(body_v: np.ndarray, top_fraction: float = 0.18) -> np.ndarray:
    """Axis-aligned bbox of the top `top_fraction` of the body's y-span
    (ref writes bbox.npz for head-region subdivision). An empty body mesh
    (under-trained smoke runs where the mSDF split never separated a body
    half) degrades to an empty bbox instead of crashing — downstream
    head-subdivision simply selects no faces."""
    if len(body_v) == 0:
        print("[components] WARNING: empty body mesh, head bbox is empty "
              "(under-trained split?)", flush=True)
        return np.zeros((2, 3), np.float32)
    y0, y1 = body_v[:, 1].min(), body_v[:, 1].max()
    cut = y1 - (y1 - y0) * top_fraction
    head = body_v[body_v[:, 1] >= cut]
    if len(head) == 0:
        head = body_v
    return np.stack([head.min(axis=0), head.max(axis=0)])


def process_close_hole(out_dir: str, body_obj: str, cloth_obj: str) -> Dict[str, str]:
    """Full pass (ref script/connet_face_head.py:152-261): load split
    meshes, reassign components, write body_concat/cloth_concat + bbox."""
    os.makedirs(out_dir, exist_ok=True)
    bv, bf = mesh_io.load_obj(body_obj)
    cv, cf = mesh_io.load_obj(cloth_obj)
    nbv, nbf, ncv, ncf = reassign_components(bv, bf, cv, cf)
    body_path = os.path.join(out_dir, "body_concat.obj")
    cloth_path = os.path.join(out_dir, "cloth_concat.obj")
    mesh_io.write_obj(body_path, nbv, nbf)
    mesh_io.write_obj(cloth_path, ncv, ncf)
    bbox = head_bbox(nbv)
    bbox_path = os.path.join(out_dir, "bbox.npz")
    np.savez(bbox_path, bbox=bbox)
    return {"body": body_path, "cloth": cloth_path, "bbox": bbox_path}
