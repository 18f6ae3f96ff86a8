"""xatlas-equivalent UV parametrization (pipeline/uv_unwrap.py).

Reference behavior being reproduced: /root/reference/train.py:197-246
(xatlas.parametrize -> per-corner UV index buffer -> texture bake)."""

import numpy as np
import pytest

from d3human_tpu.pipeline.uv_unwrap import (
    face_adjacency, grow_charts, lscm_chart, shelf_pack, unwrap,
)


def grid_mesh(n=8, scale=1.0, warp=0.0):
    """Planar (or warped) triangulated n x n grid."""
    xs, ys = np.meshgrid(np.linspace(0, scale, n), np.linspace(0, scale, n))
    z = warp * np.sin(xs * 3.0) * np.cos(ys * 2.0)
    verts = np.stack([xs, ys, z], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    return verts, np.asarray(faces, np.int64)


def sphere_mesh(n=16):
    th = np.linspace(0.15, np.pi - 0.15, n)
    ph = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([np.sin(T) * np.cos(P), np.cos(T),
                  np.sin(T) * np.sin(P)], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(2 * n):
            a = i * 2 * n + j
            b = i * 2 * n + (j + 1) % (2 * n)
            faces += [[a, b, a + 2 * n], [b, b + 2 * n, a + 2 * n]]
    return v, np.asarray(faces, np.int64)


def uv_face_areas(uvs, idx):
    a, b, c = uvs[idx[:, 0]], uvs[idx[:, 1]], uvs[idx[:, 2]]
    e1, e2 = b - a, c - a
    return 0.5 * (e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])


def test_adjacency_grid():
    _, faces = grid_mesh(4)
    adj = face_adjacency(faces)
    counts = np.asarray([len(a) for a in adj])
    assert counts.max() == 3 and counts.min() >= 1
    # each adjacency is symmetric
    for f, ns in enumerate(adj):
        for g in ns:
            assert f in adj[g]


def test_lscm_planar_is_isometry():
    """On a flat chart a conformal map is an isometry up to one global
    scale+rotation: every 3D edge length maps to UV length * same ratio."""
    verts, faces = grid_mesh(7)
    uv = lscm_chart(verts, faces)
    e3, e2 = [], []
    for tri in faces:
        for u, v in ((0, 1), (1, 2), (2, 0)):
            e3.append(np.linalg.norm(verts[tri[u]] - verts[tri[v]]))
            e2.append(np.linalg.norm(uv[tri[u]] - uv[tri[v]]))
    ratio = np.asarray(e2) / np.asarray(e3)
    assert ratio.std() / ratio.mean() < 1e-4
    # no flipped triangles: consistent UV orientation
    ar = uv_face_areas(uv, faces)
    assert (ar > 0).all() or (ar < 0).all()


def test_lscm_curved_chart_low_distortion():
    """Gently warped surface: conformal distortion stays small (edge-length
    ratio spread within ~15%) and no triangle flips."""
    verts, faces = grid_mesh(9, warp=0.15)
    uv = lscm_chart(verts, faces)
    e3, e2 = [], []
    for tri in faces:
        for u, v in ((0, 1), (1, 2), (2, 0)):
            e3.append(np.linalg.norm(verts[tri[u]] - verts[tri[v]]))
            e2.append(np.linalg.norm(uv[tri[u]] - uv[tri[v]]))
    ratio = np.asarray(e2) / np.asarray(e3)
    assert ratio.std() / ratio.mean() < 0.15
    ar = uv_face_areas(uv, faces)
    assert (ar > 0).all() or (ar < 0).all()


def test_charts_partition_sphere():
    verts, faces = sphere_mesh()
    chart = grow_charts(verts, faces, max_angle_deg=50.0)
    assert (chart >= 0).all()
    n_charts = chart.max() + 1
    # a sphere at 50 deg cannot be one chart, nor should it shatter
    assert 2 <= n_charts <= len(faces) // 4
    # charts are edge-connected: every face has a same-chart neighbor
    # (unless it is a singleton chart)
    adj = face_adjacency(faces)
    sizes = np.bincount(chart)
    for f in range(len(faces)):
        if sizes[chart[f]] > 1:
            assert any(chart[g] == chart[f] for g in adj[f])


def test_shelf_pack_no_overlap():
    rng = np.random.RandomState(0)
    sizes = rng.uniform(0.05, 0.4, (20, 2))
    off, side = shelf_pack(sizes, margin=0.01)
    lo = off / side
    hi = (off + sizes) / side
    assert (lo >= 0).all() and (hi <= 1 + 1e-9).all()
    for i in range(len(sizes)):
        for j in range(i + 1, len(sizes)):
            sep = (hi[i] <= lo[j] + 1e-12) | (hi[j] <= lo[i] + 1e-12)
            assert sep.any(), f"boxes {i},{j} overlap"


def test_unwrap_sphere_end_to_end():
    verts, faces = sphere_mesh()
    uvs, t_idx, chart = unwrap(verts, faces, max_angle_deg=50.0)
    assert t_idx.shape == faces.shape
    assert uvs.min() >= 0 and uvs.max() <= 1.0 + 1e-6
    # every face has positive UV area (no degenerate/flipped mappings)
    ar = np.abs(uv_face_areas(uvs, t_idx))
    assert (ar > 1e-12).all()
    # uniform texel density: per-chart UV/3D area ratios agree across charts
    from d3human_tpu.pipeline.uv_unwrap import face_areas_np
    a3 = face_areas_np(verts, faces)
    ratios = []
    for c in range(chart.max() + 1):
        m = chart == c
        ratios.append(ar[m].sum() / a3[m].sum())
    ratios = np.asarray(ratios)
    assert ratios.std() / ratios.mean() < 0.05
    # seams duplicate UV verts but the mapping stays face-consistent:
    # within a chart, shared 3D vertices share UV indices
    for c in range(chart.max() + 1):
        m = chart == c
        pairs = {}
        for f3, f2 in zip(faces[m], t_idx[m]):
            for v3, v2 in zip(f3, f2):
                assert pairs.setdefault(v3, v2) == v2
