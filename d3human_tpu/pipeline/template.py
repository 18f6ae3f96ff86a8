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
from d3human_tpu.ops.mesh_sdf import mesh_sdf_host
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
    # SDF on the host engine, ONCE — it doesn't depend on the capacity
    # retries below (the old device path recomputed it per retry).
    sdf = jnp.asarray(mesh_sdf_host(np.asarray(grid.verts), verts, faces,
                                    sign_convention="pos_inside"))

    # grid + sdf enter the jit as ARGUMENTS: closing over them bakes the
    # 96^3 lattice into the HLO as constants and the axon remote-compile
    # rejects the payload (HTTP 413 — killed the first full-scale merge)
    def extract(g, s, mv, mt):
        msdf = jnp.ones_like(s)
        return gshell_extract(g, g.verts, s, msdf, mv, mt)

    extract_j = jax.jit(extract, static_argnums=(2, 3))
    # capacity overflow silently drops faces (-> holes); retry doubled
    mv, mt = max_verts, max_tets
    for _ in range(4):
        mesh = extract_j(grid, sdf, mv, mt)
        if int(mesh.n_cross) <= mv and int(mesh.n_valid_tets) <= mt:
            break
        mv, mt = mv * 2, mt * 2
    wv, wf = mesh_io.compact_mesh(mesh.verts_wt, mesh.faces_wt,
                                  mesh.face_wt_valid)
    return mesh_io.weld_mesh(wv, wf)


def cluster_decimate(v: np.ndarray, f: np.ndarray, n_cells: int = 512,
                     target_faces: int | None = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Vertex-clustering decimation: snap vertices to a uniform grid over
    the mesh bbox, collapse each cell's vertices to their mean, drop
    degenerate and duplicate faces.

    This is the density-control role of the reference's meshlabserver
    isotropic remesh (script/process_body_cloth_head_msdfcut.py:318-323):
    marching tets over the body-tight 96^3 lattice emits ~1.6M faces —
    ~10x more than the seq stage can rasterize (20-bit packed face ids,
    ops/rasterizer.py:198) or KNN-skin per iteration. With
    ``target_faces`` the grid is coarsened (x0.75) until the result fits.
    Documented deviation: clustering may leave isolated non-manifold
    edges where meshlab's remesh would not; the seq consumers (render,
    LBS, laplacian/normal losses via connected_faces) are agnostic."""
    v = np.asarray(v, np.float64)
    f = np.asarray(f)
    while True:
        lo = v.min(axis=0)
        span = float((v.max(axis=0) - lo).max()) or 1.0
        h = span / n_cells
        key = np.minimum((np.floor((v - lo) / h)).astype(np.int64),
                         n_cells - 1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        nv = np.zeros((len(uniq), 3), np.float64)
        cnt = np.zeros(len(uniq), np.int64)
        np.add.at(nv, inv, v)
        np.add.at(cnt, inv, 1)
        nv = nv / cnt[:, None]
        nf = inv[f]
        nf = nf[(nf[:, 0] != nf[:, 1]) & (nf[:, 1] != nf[:, 2])
                & (nf[:, 0] != nf[:, 2])]
        _, ui = np.unique(np.sort(nf, axis=1), axis=0, return_index=True)
        nf = nf[np.sort(ui)]
        if target_faces is None or len(nf) <= target_faces or n_cells <= 16:
            return nv.astype(np.float32), nf.astype(np.int64)
        n_cells = max(16, int(n_cells * 0.75))


def push_body_inside_cloth(body_v: np.ndarray, body_f: np.ndarray,
                           cloth_v: np.ndarray, cloth_f: np.ndarray,
                           push_eps: float = 0.004,
                           influence: float = 0.03) -> np.ndarray:
    """Move body vertices that poke through nearby cloth inward along their
    vertex normal (ref deform_body_collision, script...:331). Only vertices
    within `influence` of the cloth are touched."""
    @jax.jit
    def run(bv, bf, cv, cf):
        # meshes as arguments, not closure constants (axon 413 guard)
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

    return np.asarray(run(jnp.asarray(body_v, jnp.float32),
                          jnp.asarray(body_f, jnp.int32),
                          jnp.asarray(cloth_v, jnp.float32),
                          jnp.asarray(cloth_f, jnp.int32)))


def find_open_edges(faces: np.ndarray):
    """Vertices incident to boundary (count==1) edges
    (ref find_open_edges, script...:92-102)."""
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    edges = np.sort(edges, axis=1)
    uniq, counts = np.unique(edges, axis=0, return_counts=True)
    open_edges = uniq[counts == 1]
    return np.unique(open_edges)


def trim_open_edges(faces: np.ndarray, iters: int = 2) -> np.ndarray:
    """Iteratively drop faces touching boundary vertices — peels the ragged
    rim the split extraction leaves (ref body trim 2x at script...:692-696,
    smpl-piece trim 1x at :672-676)."""
    f = np.asarray(faces)
    for _ in range(iters):
        open_v = find_open_edges(f)
        if len(open_v) == 0:
            break
        keep = ~np.isin(f, open_v).any(axis=1)
        f = f[keep]
    return f


def _face_components(n_verts: int, faces: np.ndarray) -> np.ndarray:
    """Union-find face components via shared vertices; returns a per-face
    component id."""
    parent = np.arange(n_verts)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b, c in faces:
        ra, rb, rc = find(a), find(b), find(c)
        parent[rb] = ra
        parent[rc] = ra
    roots = np.fromiter((find(v) for v in faces[:, 0]), np.int64,
                        len(faces))
    _, comp = np.unique(roots, return_inverse=True)
    return comp


def distance_cut(src_v: np.ndarray, src_f: np.ndarray, ref_v: np.ndarray,
                 thresh: float = 0.02) -> np.ndarray:
    """Cut `src` to the region within `thresh` of `ref` and keep the largest
    connected piece (ref compute_distance_map + segment_mesh_by_distance +
    component filtering, script...:434-456, :631-650) — used to carve the
    SMPL template piece that lies under the cloth."""
    from d3human_tpu.ops.knn import knn

    @jax.jit
    def dists(sv, rv):
        # meshes as arguments, not closure constants (axon 413 guard)
        sq, _ = knn(sv, rv, k=1)
        return jnp.sqrt(sq[:, 0] + 1e-12)

    d = np.asarray(dists(jnp.asarray(src_v, jnp.float32),
                         jnp.asarray(ref_v, jnp.float32)))
    keep_v = d <= thresh
    valid = src_f[keep_v[src_f].all(axis=1)]
    if len(valid) == 0:
        return valid
    comp = _face_components(len(src_v), valid)
    largest = np.bincount(comp).argmax()
    return valid[comp == largest]


def midpoint_subdivide_in_bbox(v: np.ndarray, f: np.ndarray,
                               bbox: np.ndarray, pad: float = 0.01):
    """1->4 midpoint subdivision of the faces fully inside the (head) bbox
    (ref process_subdivide, script...:404-431 + meshlab midpoint_head.mlx);
    edge midpoints are deduplicated so the result stays manifold across the
    subdivided region. Faces outside the bbox are kept as-is (T-junctions at
    the region border match the reference's behavior of subdividing only
    the in-bbox submesh)."""
    lo, hi = np.asarray(bbox[0]) - pad, np.asarray(bbox[1]) + pad
    in_bbox = np.all((v >= lo) & (v <= hi), axis=1)
    sub = in_bbox[f].all(axis=1)
    f_in, f_out = f[sub], f[~sub]
    if len(f_in) == 0:
        return v, f
    # dedup edge midpoints
    edges = np.concatenate(
        [f_in[:, [0, 1]], f_in[:, [1, 2]], f_in[:, [2, 0]]], axis=0)
    edges_s = np.sort(edges, axis=1)
    uniq, inv = np.unique(edges_s, axis=0, return_inverse=True)
    mid = 0.5 * (v[uniq[:, 0]] + v[uniq[:, 1]])
    mid_idx = len(v) + inv.reshape(3, -1).T          # [Fin, 3]: m01, m12, m20
    v_out = np.concatenate([v, mid])
    a, b, c = f_in[:, 0], f_in[:, 1], f_in[:, 2]
    m01, m12, m20 = mid_idx[:, 0], mid_idx[:, 1], mid_idx[:, 2]
    f_new = np.concatenate([
        np.stack([a, m01, m20], 1), np.stack([m01, b, m12], 1),
        np.stack([m20, m12, c], 1), np.stack([m01, m12, m20], 1),
    ])
    return v_out.astype(np.float32), np.concatenate([f_new, f_out])


def merge_body_cloth(
    out_dir: str,
    body_obj: str,
    cloth_obj: str,
    grid_res: int = 96,
    cover_eps: float = 0.02,
    smpl_obj: str | None = None,
    bbox_npz: str | None = None,
    smpl_cut_thresh: float = 0.02,
    trim_iters: int = 2,
) -> Dict[str, str]:
    """Build merge_body_cloth.npz {v, f, face_labels} +
    inside_body_index.npz {inside_body_index, outside_body_index}
    (ref process_body_msdf_distance_bodyedge, script...:613-748):

      1. open-edge trim the optimized split body (ref :692-696);
      2. (if smpl_obj) distance-cut the SMPL template to the cloth-covered
         region, trim its rim, push it under the cloth — the under-cloth
         body patch the optimized body can't reconstruct (ref :631-690);
      3. union -> SDF-remesh watertighting (replaces Poisson+meshlab remesh,
         ref :713-718);
      4. (if bbox_npz) midpoint-subdivide the head bbox (ref :720);
      5. push the body under the cloth, merge with labels, and classify
         body vertices inside/outside the watertight cloth (ref :731-748).
    """
    os.makedirs(out_dir, exist_ok=True)
    bv, bf = mesh_io.load_obj(body_obj)
    cv, cf = mesh_io.load_obj(cloth_obj)

    # 1. trim the split body's ragged rim
    bf = trim_open_edges(bf, iters=trim_iters)

    # 2. SMPL under-cloth patch
    soup_v, soup_f = bv, bf
    if smpl_obj is not None:
        sv, sf = mesh_io.load_obj(smpl_obj)
        sf_cut = distance_cut(sv, sf, cv, thresh=smpl_cut_thresh)
        if len(sf_cut):
            sf_cut = trim_open_edges(sf_cut, iters=1)
        if len(sf_cut):
            sv = push_body_inside_cloth(sv, sf_cut, cv, cf)
            soup_v = np.concatenate([soup_v, sv]).astype(np.float32)
            soup_f = np.concatenate([soup_f, sf_cut + len(bv)])

    # 3. watertight/remeshed body; clustering brings the marching-tets
    # density down to the reference template's remeshed scale BEFORE head
    # subdivision (x4 in-bbox) and the per-iteration seq KNN skinning —
    # without it the full-scale merge emits 1.58M body faces, which blows
    # the rasterizer's 20-bit face-id pack in the first seq step
    wbv, wbf = rewatertight(soup_v, soup_f, grid_res=grid_res)
    wbv, wbf = cluster_decimate(wbv, wbf, n_cells=512,
                                target_faces=300_000)

    # 4. head subdivision
    if bbox_npz is not None and os.path.exists(bbox_npz):
        bb = np.load(bbox_npz)["bbox"]
        wbv, wbf = midpoint_subdivide_in_bbox(wbv, wbf, bb)

    # 5. push the body under the cloth
    wbv = push_body_inside_cloth(wbv, wbf, cv, cf)

    # merge
    v = np.concatenate([wbv, cv]).astype(np.float32)
    f = np.concatenate([wbf, cf + len(wbv)]).astype(np.int64)
    face_labels = np.concatenate([
        np.zeros(len(wbf), np.int64), np.ones(len(cf), np.int64)])
    # the seq rasterizer packs face ids into 20 bits (ops/rasterizer.py:198)
    assert len(f) < (1 << 20), (
        f"merged template has {len(f)} faces; lower cluster_decimate's "
        f"target_faces or the merge grid_res")

    # inside/outside body vertex sets: inside the WATERTIGHT cloth (ref
    # find_inside_point on a pysdf of the Poisson'd cloth, :744-747);
    # fallback to distance cover when the cloth is too degenerate to remesh
    try:
        wcv, wcf = rewatertight(cv, cf, grid_res=min(64, grid_res))
        sd = mesh_sdf_host(wbv, wcv, wcf, sign_convention="pos_inside")
        inside = np.nonzero(sd > 0)[0]
        outside = np.nonzero(sd <= 0)[0]
    except Exception:
        from d3human_tpu.ops.knn import knn as jknn

        @jax.jit
        def cover_dist(b, v, f):
            # meshes as arguments, not closure constants (axon 413 guard)
            centers = v[f].mean(axis=1)
            sq, _ = jknn(b, centers, k=1)
            return jnp.sqrt(sq[:, 0] + 1e-12)

        d = np.asarray(cover_dist(jnp.asarray(wbv, jnp.float32),
                                  jnp.asarray(cv, jnp.float32),
                                  jnp.asarray(cf, jnp.int32)))
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
