"""Masked mesh operations on fixed-capacity buffers.

Replaces the reference's mesh utilities (/root/reference/render/mesh.py:
auto_normals ~420, laplacian 32-82, normal_consistency ~275,
find_connected_faces 105-133; /root/reference/lap_loss.py:40-104;
kaolin.ops.mesh.sample_points used at /root/reference/geometry/hmsdf.py:714)
with XLA-native segment ops over padded vertex/face buffers. Every function
takes a face validity mask; invalid faces contribute nothing.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps))


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray,
                 normalize: bool = True) -> jnp.ndarray:
    # ONE fused corner gather whose custom-VJP backward is the Pallas
    # sorted-COO scatter. The previous plain indexing (verts[faces[:, k]]
    # x3) left its transpose to XLA scatter — 3 scatters of F rows per
    # call, ~6 x 786k rows/step across the two compact-path calls at f3c
    # scale (~90 ns/row: the dominant unattributed backward cost).
    from d3human_tpu.ops.scatter import default_use_pallas, gather_rows

    tri = gather_rows(verts, faces, default_use_pallas())      # [F, 3, 3]
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    n = jnp.cross(v1 - v0, v2 - v0)
    return safe_normalize(n) if normalize else n


def auto_normals(verts: jnp.ndarray, faces: jnp.ndarray,
                 face_valid: Optional[jnp.ndarray] = None,
                 fn_raw: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Area-weighted vertex normals via scatter-add
    (ref gshell_tets.py:9-34 / mesh.auto_normals). Degenerate normals fall
    back to +z like the reference. ``fn_raw`` passes precomputed
    UNNORMALIZED face normals so callers that also need them (the render
    hot path) pay the 3F-row corner gather once (TRACE_r05: each such
    gather is ~12 ms/step at f3c scale)."""
    from d3human_tpu.ops.scatter import default_use_pallas, segment_add_rows

    fn = face_normals(verts, faces, normalize=False) if fn_raw is None \
        else fn_raw
    if face_valid is not None:
        fn = jnp.where(face_valid[:, None], fn, 0.0)
    # ONE fused sorted-COO scatter for all 3 corners (3 XLA scatters of F
    # rows each were a dominant forward cost at f3c scale)
    v_nrm = segment_add_rows(
        jnp.tile(fn, (3, 1)), faces.T.reshape(-1), verts.shape[0],
        default_use_pallas())
    bad = jnp.sum(v_nrm * v_nrm, axis=-1, keepdims=True) <= 1e-20
    v_nrm = jnp.where(bad, jnp.asarray([0.0, 0.0, 1.0]), v_nrm)
    return safe_normalize(v_nrm)


def laplacian_uniform_loss(verts: jnp.ndarray, faces: jnp.ndarray,
                           face_valid: Optional[jnp.ndarray] = None,
                           vert_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """mean ||L V||^2 with the uniform (umbrella) Laplacian
    L = D^{-1} A - I built from face edges (ref lap_loss.py:40-47 /
    mesh.compute_laplacian_uniform:32-82).

    Computed matrix-free: for each vertex, (sum of neighbors)/deg - self,
    via scatter-adds over the 3 face edges (each direction). Valid faces
    double-count shared edges exactly like the reference's sparse build from
    edge list would not — the reference dedups edges; we approximate with
    face-edge multiplicity 2 on interior edges which cancels in the
    normalized umbrella (neighbor sums and degrees scale together).
    """
    from d3human_tpu.ops.scatter import default_use_pallas, segment_add_rows

    V = verts.shape[0]
    fv = (jnp.ones(faces.shape[0], bool) if face_valid is None else face_valid)
    w = fv.astype(verts.dtype)
    # fused [nbr(3) | deg(1)] rows, all 6 edge directions in ONE scatter
    idx_parts, val_parts = [], []
    for a, b in ((0, 1), (1, 2), (2, 0)):
        ia, ib = faces[:, a], faces[:, b]
        idx_parts += [ia, ib]
        val_parts += [jnp.concatenate([verts[ib] * w[:, None], w[:, None]],
                                      axis=-1),
                      jnp.concatenate([verts[ia] * w[:, None], w[:, None]],
                                      axis=-1)]
    acc = segment_add_rows(jnp.concatenate(val_parts),
                           jnp.concatenate(idx_parts), V,
                           default_use_pallas())
    nbr_sum, deg = acc[:, :3], acc[:, 3]
    lap = nbr_sum / jnp.maximum(deg, 1.0)[:, None] - verts
    ok = deg > 0
    if vert_valid is not None:
        ok = ok & vert_valid
    sq = jnp.sum(lap * lap, axis=-1)
    return jnp.sum(jnp.where(ok, sq, 0.0)) / jnp.maximum(jnp.sum(ok), 1)


def normal_consistency_loss(verts: jnp.ndarray, faces: jnp.ndarray,
                            connected_faces: jnp.ndarray,
                            pair_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """mean (1 - cos(n_i, n_j))^2 over adjacent face pairs
    (ref mesh.normal_consistency / lap_loss.body_normal_loss:50-55).

    connected_faces: [P, 2] precomputed adjacent-face index pairs (static for
    the seq-stage template mesh, ref train.py:1899)."""
    fn = face_normals(verts, faces)
    n0 = fn[connected_faces[:, 0]]
    n1 = fn[connected_faces[:, 1]]
    cos = jnp.clip(jnp.sum(n0 * n1, axis=-1), -1.0, 1.0)
    term = (1.0 - cos) ** 2
    if pair_valid is not None:
        return jnp.sum(jnp.where(pair_valid, term, 0.0)) / jnp.maximum(
            jnp.sum(pair_valid), 1)
    return jnp.mean(term)


def edge_normal_consistency_loss(verts: jnp.ndarray, faces: jnp.ndarray,
                                 face_valid: jnp.ndarray) -> jnp.ndarray:
    """Normal-consistency for *dynamic-topology* meshes where adjacency can't
    be precomputed: penalizes the variance of face normals accumulated at
    shared vertices — a smoothness proxy with the same minimizer (all
    neighboring normals equal)."""
    from d3human_tpu.ops.scatter import default_use_pallas, segment_add_rows

    fn = face_normals(verts, faces)
    w = face_valid.astype(verts.dtype)
    V = verts.shape[0]
    fw = jnp.concatenate([fn * w[:, None], w[:, None]], axis=-1)
    acc = segment_add_rows(jnp.tile(fw, (3, 1)), faces.T.reshape(-1), V,
                           default_use_pallas())
    mean_n, cnt = acc[:, :3], acc[:, 3]
    mean_n = safe_normalize(mean_n / jnp.maximum(cnt, 1.0)[:, None])
    # deviation of each face normal from its vertices' mean normal
    dev = 0.0
    for k in range(3):
        cos = jnp.clip(jnp.sum(fn * mean_n[faces[:, k]], axis=-1), -1, 1)
        dev = dev + (1.0 - cos) * 0.5
    dev = dev / 3.0
    return jnp.sum(dev * w) / jnp.maximum(jnp.sum(w), 1.0)


def sample_points_on_mesh(
    key: jax.Array,
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    n_samples: int,
    face_valid: Optional[jnp.ndarray] = None,
    fn_raw: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Area-weighted surface sampling (kaolin sample_points replacement,
    used for eikonal points at ref hmsdf.py:714): categorical over face areas
    then uniform barycentric. ``fn_raw`` = precomputed unnormalized face
    normals (|fn|/2 = area) to share the corner gather with the render."""
    fn = face_normals(verts, faces, normalize=False) if fn_raw is None \
        else fn_raw
    area = 0.5 * jnp.sqrt(jnp.maximum(jnp.sum(fn * fn, axis=-1), 1e-20))
    if face_valid is not None:
        area = jnp.where(face_valid, area, 0.0)
    k1, k2 = jax.random.split(key)
    # inverse-CDF sampling: O(F + S log F). (jax.random.categorical would
    # materialize an S x F Gumbel argmax — 26G elements at production size.)
    cdf = jnp.cumsum(area)
    u = jax.random.uniform(k1, (n_samples,)) * cdf[-1]
    fidx = jnp.clip(jnp.searchsorted(cdf, u), 0, area.shape[0] - 1)
    uv = jax.random.uniform(k2, (n_samples, 2))
    su = jnp.sqrt(uv[:, 0:1])
    b0 = 1.0 - su
    b1 = su * (1.0 - uv[:, 1:2])
    b2 = su * uv[:, 1:2]
    tri = verts[faces[fidx]]                       # [S, 3, 3]
    return b0 * tri[:, 0] + b1 * tri[:, 1] + b2 * tri[:, 2]


def find_connected_faces(faces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side adjacency precompute for a static mesh
    (ref lap_loss.py:76-104): returns (connected_faces [P,2], edges [E,2])
    for manifold edges shared by exactly 2 faces."""
    f = np.asarray(faces)
    e = np.sort(f[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2), axis=1)
    face_ids = np.repeat(np.arange(len(f)), 3)
    key = e[:, 0].astype(np.int64) << 32 | e[:, 1].astype(np.int64)
    order = np.argsort(key, kind="stable")
    ks, fs = key[order], face_ids[order]
    uniq, start, counts = np.unique(ks, return_index=True, return_counts=True)
    two = counts == 2
    pairs = np.stack([fs[start[two]], fs[start[two] + 1]], axis=1)
    edges = np.stack([uniq >> 32, uniq & 0xFFFFFFFF], axis=1).astype(np.int64)
    return pairs.astype(np.int64), edges


def connected_components(faces: np.ndarray, n_verts: int) -> np.ndarray:
    """Host-side union-find over face connectivity
    (ref script/connet_face_head.py:152-261 uses openmesh components).
    Returns per-vertex component labels."""
    parent = np.arange(n_verts)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for tri in np.asarray(faces):
        a = find(tri[0])
        for v in tri[1:]:
            b = find(v)
            parent[b] = a
    return np.fromiter((find(i) for i in range(n_verts)), np.int64, n_verts)
