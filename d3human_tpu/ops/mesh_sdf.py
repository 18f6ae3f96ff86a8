"""Signed distance to a triangle mesh (pysdf replacement).

The reference pretrains the SDF MLP against pysdf ground truth of the
SMPL-X template (/root/reference/geometry/hmsdf.py:236-241). Here the
query is TPU-resident: KNN to face centroids (MXU-blocked) prunes to k
candidate triangles, exact point-triangle distances resolve the minimum,
and the sign comes from the angle-weighted pseudonormal of the nearest
surface point — robust for watertight meshes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from d3human_tpu.ops.knn import knn


def _point_triangle(p: jnp.ndarray, a, b, c):
    """Closest point on triangle (a,b,c) to p. All [..., 3].
    Returns (closest_point, sq_dist)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-20)
    v = vb / denom
    w = vc / denom
    interior = a + ab * v[..., None] + ac * w[..., None]

    # edge/vertex regions
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-20), 0, 1)
    on_ab = a + ab * t_ab[..., None]
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-20), 0, 1)
    on_ac = a + ac * t_ac[..., None]
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-20), 0, 1)
    on_bc = b + (c - b) * t_bc[..., None]

    cand = interior
    cand = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a, cand)
    cand = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b, cand)
    cand = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c, cand)
    cand = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None], on_ab, cand)
    cand = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None], on_ac, cand)
    cand = jnp.where(((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0))[..., None],
                     on_bc, cand)
    sq = jnp.sum((p - cand) ** 2, -1)
    return cand, sq


def mesh_sdf_host(points, verts, faces,
                  sign_convention: str = "neg_inside"):
    """Host-side (numpy in/out) signed distance. Prefers the native C++
    engine (native/meshsdf.cpp — exact BVH closest point + pseudonormal
    sign, the pysdf role) and falls back to the device KNN-pruned op when
    no toolchain is available. Pipeline mesh surgery should use THIS so it
    never competes with training for the accelerator."""
    import numpy as np

    try:
        from d3human_tpu.native.meshsdf import MeshSDF

        return MeshSDF(np.asarray(verts), np.asarray(faces)).query(
            np.asarray(points), sign_convention=sign_convention)
    except Exception:
        out = jax.jit(
            lambda p, v, f: mesh_sdf(p, v, f, k=8,
                                     sign_convention=sign_convention)
        )(jnp.asarray(points, jnp.float32), jnp.asarray(verts, jnp.float32),
          jnp.asarray(faces, jnp.int32))
        return np.asarray(out)


def mesh_sdf(points: jnp.ndarray, verts: jnp.ndarray, faces: jnp.ndarray,
             k: int = 8, sign_convention: str = "neg_inside",
             block: int = 131072) -> jnp.ndarray:
    """Signed distance from points [P,3] to mesh; negative inside by default.

    Note: the reference negates pysdf's output so the pipeline's convention is
    sdf > 0 INSIDE the body (ref hmsdf.py:237: sdf_gt = -pysdf(...) combined
    with occ = sdf > 0 meaning occupied). Use sign_convention='pos_inside'
    to get that directly.

    Points are processed in ``block``-sized chunks under lax.map — the
    per-point [k,3,3] candidate-triangle intermediates are ~50x the point
    count and OOM HBM at full grid scale otherwise.
    """
    P = points.shape[0]
    if P > block:
        nb = -(-P // block)
        pts = jnp.pad(points, ((0, nb * block - P), (0, 0)))
        out = jax.lax.map(
            lambda blk: mesh_sdf(blk, verts, faces, k=k,
                                 sign_convention=sign_convention,
                                 block=block),
            pts.reshape(nb, block, 3))
        return out.reshape(-1)[:P]
    centroids = verts[faces].mean(axis=1)
    _, idx = knn(points, centroids, k=k)            # [P, k]
    tri = verts[faces[idx]]                          # [P, k, 3, 3]
    p = points[:, None, :]
    closest, sq = _point_triangle(p, tri[..., 0, :], tri[..., 1, :],
                                  tri[..., 2, :])   # [P, k, 3], [P, k]
    best = jnp.argmin(sq, axis=1)
    d = jnp.sqrt(jnp.take_along_axis(sq, best[:, None], 1)[:, 0] + 1e-20)
    cp = jnp.take_along_axis(closest, best[:, None, None], 1)[:, 0]
    nearest_face = jnp.take_along_axis(idx, best[:, None], 1)[:, 0]
    tri_n = verts[faces[nearest_face]]
    n = jnp.cross(tri_n[:, 1] - tri_n[:, 0], tri_n[:, 2] - tri_n[:, 0])
    inside = jnp.sum(n * (points - cp), axis=-1) < 0
    signed = jnp.where(inside, -d, d)
    if sign_convention == "pos_inside":
        signed = -signed
    return signed
