"""Watertight animatable template construction (between split and seq).

Replaces /root/reference/script/process_body_cloth_head_msdfcut.py:613-951
(process_body_msdf_distance_bodyedge) and its meshlabserver subprocesses
(ref :318-323 — Poisson watertighting / midpoint subdivision / isotropic
remesh). The reference builds `merge_body_cloth.npz` = the merged template
whose faces carry body/cloth labels plus inside/outside body vertex index
sets. TPU-first replacement, no external binaries:

  * watertight body  — instead of screened Poisson, the body mesh is
    re-extracted through the framework's OWN grid pipeline: signed distance
    of the body soup on a lattice (ops.mesh_sdf, device) -> marching tets
    (msdf == 1) -> guaranteed-closed 2-manifold at controllable resolution.
    This simultaneously replaces meshlab's remesh (uniform tet-grid
    triangles) and watertight scripts. Documented deviation: triangulation
    differs from meshlab's output; topology/metrics match.
  * collision push-in (ref deform_body_collision:331) — body vertices that
    poke through the cloth move inward along their normal.
  * merge + labels + inside/outside indices (ref :720-748) — inside = body
    vertices within `cover_eps` of the cloth (covered), outside = the rest.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.ops import mesh_ops
from d3human_tpu.ops.marching_tets import gshell_extract
from d3human_tpu.ops.mesh_sdf import mesh_sdf
from d3human_tpu.ops.tet_grid import make_tet_grid
from d3human_tpu.utils import io as mesh_io


def rewatertight(verts: np.ndarray, faces: np.ndarray, grid_res: int = 96,
                 margin: float = 0.06,
                 max_verts: int = 2 ** 17, max_tets: int = 2 ** 17
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Closed remesh of a (possibly holey) surface via SDF + marching tets."""
    lo = verts.min(axis=0) - margin
    hi = verts.max(axis=0) + margin
    grid = make_tet_grid(res=grid_res, bounds=(tuple(lo), tuple(hi)),
                         y_offset=0.0, scale=1.0)
    v = jnp.asarray(verts, jnp.float32)
    f = jnp.asarray(faces, jnp.int32)

    def extract(mv, mt):
        sdf = mesh_sdf(grid.verts, v, f, k=8, sign_convention="pos_inside")
        msdf = jnp.ones((grid.n_verts,))
        return gshell_extract(grid, grid.verts, sdf, msdf, mv, mt)

    # capacity overflow silently drops faces (-> holes); retry doubled
    mv, mt = max_verts, max_tets
    for _ in range(4):
        mesh = jax.jit(extract, static_argnums=(0, 1))(mv, mt)
        if int(mesh.n_cross) <= mv and int(mesh.n_valid_tets) <= mt:
            break
        mv, mt = mv * 2, mt * 2
    wv, wf = mesh_io.compact_mesh(mesh.verts_wt, mesh.faces_wt,
                                  mesh.face_wt_valid)
    return mesh_io.weld_mesh(wv, wf)


def push_body_inside_cloth(body_v: np.ndarray, body_f: np.ndarray,
                           cloth_v: np.ndarray, cloth_f: np.ndarray,
                           push_eps: float = 0.004,
                           influence: float = 0.03) -> np.ndarray:
    """Move body vertices that poke through nearby cloth inward along their
    vertex normal (ref deform_body_collision, script...:331). Only vertices
    within `influence` of the cloth are touched."""
    bv = jnp.asarray(body_v, jnp.float32)
    bf = jnp.asarray(body_f, jnp.int32)
    cv = jnp.asarray(cloth_v, jnp.float32)
    cf = jnp.asarray(cloth_f, jnp.int32)

    @jax.jit
    def run():
        n_body = mesh_ops.auto_normals(bv, bf)
        centers = cv[cf].mean(axis=1)
        n_cloth = mesh_ops.face_normals(cv, cf)
        from d3human_tpu.ops.knn import knn
        sq, idx = knn(bv, centers, k=1)
        d = jnp.sqrt(sq[:, 0] + 1e-12)
        nn_n = n_cloth[idx[:, 0]]
        nn_c = centers[idx[:, 0]]
        # signed: positive = body vertex outside the cloth surface
        signed = jnp.sum((bv - nn_c) * nn_n, axis=-1)
        need = (d < influence) & (signed > -push_eps)
        shift = jnp.where(need, signed + push_eps, 0.0)
        return bv - n_body * shift[:, None]

    return np.asarray(run())


def merge_body_cloth(
    out_dir: str,
    body_obj: str,
    cloth_obj: str,
    grid_res: int = 96,
    cover_eps: float = 0.02,
) -> Dict[str, str]:
    """Build merge_body_cloth.npz {v, f, face_labels} +
    inside_body_index.npz {inside_body_index, outside_body_index}
    (ref :720-748)."""
    os.makedirs(out_dir, exist_ok=True)
    bv, bf = mesh_io.load_obj(body_obj)
    cv, cf = mesh_io.load_obj(cloth_obj)

    # 1. watertight/remeshed body
    wbv, wbf = rewatertight(bv, bf, grid_res=grid_res)
    # 2. push the body under the cloth
    wbv = push_body_inside_cloth(wbv, wbf, cv, cf)

    # 3. merge
    v = np.concatenate([wbv, cv]).astype(np.float32)
    f = np.concatenate([wbf, cf + len(wbv)]).astype(np.int64)
    face_labels = np.concatenate([
        np.zeros(len(wbf), np.int64), np.ones(len(cf), np.int64)])

    # 4. inside/outside body vertex sets: body verts covered by cloth
    from d3human_tpu.ops.knn import knn as jknn

    @jax.jit
    def cover_dist():
        centers = jnp.asarray(cv, jnp.float32)[jnp.asarray(cf, jnp.int32)]
        centers = centers.mean(axis=1)
        sq, _ = jknn(jnp.asarray(wbv), centers, k=1)
        return jnp.sqrt(sq[:, 0] + 1e-12)

    d = np.asarray(cover_dist())
    inside = np.nonzero(d < cover_eps)[0]
    outside = np.nonzero(d >= cover_eps)[0]

    mesh_path = os.path.join(out_dir, "merge_body_cloth.npz")
    np.savez(mesh_path, v=v, f=f, face_labels=face_labels)
    mesh_io.write_obj(os.path.join(out_dir, "merge_body_cloth.obj"), v, f)
    idx_path = os.path.join(out_dir, "inside_body_index.npz")
    np.savez(idx_path, inside_body_index=inside, outside_body_index=outside)
    return {"mesh": mesh_path, "indices": idx_path}


def build_seq_template(process_dir: str):
    """Load merge artifacts into a SeqTemplate (ref train.py:1865-1918:
    vertex labels by face majority vote, connected faces, per-label index
    sets)."""
    from d3human_tpu.models.geometry import SeqTemplate
    from d3human_tpu.ops.mesh_ops import find_connected_faces

    z = np.load(os.path.join(process_dir, "merge_body_cloth.npz"))
    v = z["v"].astype(np.float32)
    f = z["f"].astype(np.int64)
    face_labels = z["face_labels"].astype(np.int64)

    # per-vertex label by face-majority vote (ref train.py:1889-1897)
    counts = np.zeros((len(v), 2), np.int64)
    for lbl in (0, 1):
        np.add.at(counts[:, lbl], f[face_labels == lbl].reshape(-1), 1)
    v_labels = counts.argmax(axis=1)

    connected, _ = find_connected_faces(f)
    return SeqTemplate(
        v=jnp.asarray(v),
        f=jnp.asarray(f, jnp.int32),
        v_labels=jnp.asarray(v_labels),
        face_labels=jnp.asarray(face_labels, jnp.int32),
        body_vidx=jnp.asarray(np.nonzero(v_labels == 0)[0], jnp.int32),
        cloth_vidx=jnp.asarray(np.nonzero(v_labels == 1)[0], jnp.int32),
        body_f=jnp.asarray(f[face_labels == 0], jnp.int32),
        connected_faces=jnp.asarray(connected, jnp.int32),
    )
