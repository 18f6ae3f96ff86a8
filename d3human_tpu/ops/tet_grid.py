"""Tetrahedral grid generation and static topology precompute.

The reference loads a quartet-generated tet grid from ``data/tets/tet_grid.npz``
(/root/reference/geometry/hmsdf.py:203-213) and re-derives its unique edge
list with torch.unique on the GPU (hmsdf.py:382-388).

TPU-first design: the grid is a Freudenthal/Kuhn lattice (6 tets per cube,
all sharing the cube's main diagonal), whose topology is *fully structured*:

  * the unique edge set decomposes into exactly 7 direction classes
    d in {100, 010, 001, 110, 011, 101, 111} — every edge connects lattice
    vertex v to v+d. Stored class-major, an edge's id is pure arithmetic.
  * each tet's 6 edge ids likewise follow from its cell coordinate.

This structure is what makes the in-jit marching-tets pass gather-free:
SDF-crossing detection and sign-mixed-tet detection become shifted-slice
comparisons of the occupancy volume (see ops/marching_tets.py), instead of
multi-million-element gathers over index tables. The (large) index tables
are still precomputed for the *compacted* stage, where only ~1e5 entries are
touched.

Supports anisotropic lattices (a human fits a tall thin box — spending
cells only where the surface can be beats the reference's full cube).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# The 6 edges of a tet over vertex pairs, in the reference's order
# (ref gshell_tets.py:187 base_tet_edges = [0,1, 0,2, 0,3, 1,2, 1,3, 2,3]).
TET_EDGES_LOCAL = np.asarray(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)

# Kuhn subdivision: 6 tets per cube, all sharing the main diagonal c000-c111.
# Corner keys are (dx, dy, dz) bits; the 6 permutation paths 000->111.
KUHN_PATHS = (
    ((0, 0, 0), (1, 0, 0), (1, 1, 0), (1, 1, 1)),
    ((0, 0, 0), (1, 0, 0), (1, 0, 1), (1, 1, 1)),
    ((0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 1, 1)),
    ((0, 0, 0), (0, 1, 0), (0, 1, 1), (1, 1, 1)),
    ((0, 0, 0), (0, 0, 1), (1, 0, 1), (1, 1, 1)),
    ((0, 0, 0), (0, 0, 1), (0, 1, 1), (1, 1, 1)),
)

# Unique-edge direction classes of the Kuhn lattice, fixed global order.
EDGE_CLASSES = ((1, 0, 0), (0, 1, 0), (0, 0, 1),
                (1, 1, 0), (0, 1, 1), (1, 0, 1), (1, 1, 1))


@dataclasses.dataclass(frozen=True)
class TetGrid:
    """Static tet-grid topology. Pytree-registered so the (large) index
    arrays are jit *arguments*, never HLO constants. ``dims`` (cells per
    axis) is static aux; when present, marching tets uses the gather-free
    structured fast path."""

    verts: jnp.ndarray       # [N, 3] f32 lattice positions (transformed)
    tets: jnp.ndarray        # [T, 4] i32 (cell-major, 6 consecutive per cell)
    edges: jnp.ndarray       # [E+1, 2] i32 class-major edges; row E = (0,0)
    tet_edges: jnp.ndarray   # [T, 6] i32 edge ids per tet
    dims: Optional[Tuple[int, int, int]] = None   # cells per axis (static)

    @property
    def n_verts(self) -> int:
        return self.verts.shape[0]

    @property
    def n_tets(self) -> int:
        return self.tets.shape[0]

    @property
    def n_edges(self) -> int:
        return self.edges.shape[0] - 1

    @property
    def vert_dims(self) -> Optional[Tuple[int, int, int]]:
        if self.dims is None:
            return None
        return tuple(d + 1 for d in self.dims)


jax.tree_util.register_pytree_node(
    TetGrid,
    lambda g: ((g.verts, g.tets, g.edges, g.tet_edges), g.dims),
    lambda aux, ch: TetGrid(*ch, dims=aux),
)


def _class_shapes(dims):
    """Per-class base-grid shapes (number of edges of each class)."""
    vx, vy, vz = dims[0] + 1, dims[1] + 1, dims[2] + 1
    return [(vx - d[0], vy - d[1], vz - d[2]) for d in EDGE_CLASSES]


def class_offsets(dims):
    shapes = _class_shapes(dims)
    sizes = [int(np.prod(s)) for s in shapes]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    return offsets, shapes, sizes


def _structured_topology(dims):
    """Host precompute: verts ids, tets, class-major edges, tet edge ids —
    all by pure index arithmetic (no sorting / unique)."""
    rx, ry, rz = dims
    vx, vy, vz = rx + 1, ry + 1, rz + 1

    def vid(ix, iy, iz):
        return (ix * vy + iy) * vz + iz

    # --- edges, class-major
    offsets, shapes, sizes = class_offsets(dims)
    E = offsets[-1]
    edges = np.empty((E, 2), np.int64)
    for c, (d, shape) in enumerate(zip(EDGE_CLASSES, shapes)):
        bx, by, bz = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]),
                                 np.arange(shape[2]), indexing="ij")
        e0 = vid(bx, by, bz).ravel()
        e1 = vid(bx + d[0], by + d[1], bz + d[2]).ravel()
        edges[offsets[c]:offsets[c + 1], 0] = e0
        edges[offsets[c]:offsets[c + 1], 1] = e1

    # --- tets, cell-major (6 per cell) + their edge ids
    cx, cy, cz = np.meshgrid(np.arange(rx), np.arange(ry), np.arange(rz),
                             indexing="ij")
    cx, cy, cz = cx.ravel(), cy.ravel(), cz.ravel()
    NC = len(cx)
    tets = np.empty((NC * 6, 4), np.int64)
    tet_edges = np.empty((NC * 6, 6), np.int64)
    class_index = {d: i for i, d in enumerate(EDGE_CLASSES)}
    for k, path in enumerate(KUHN_PATHS):
        corners = [(cx + p[0], cy + p[1], cz + p[2]) for p in path]
        for ci, (ix, iy, iz) in enumerate(corners):
            tets[k::6, ci] = vid(ix, iy, iz)
        for ei, (a, b) in enumerate(TET_EDGES_LOCAL):
            u, v = path[a], path[b]
            d = (v[0] - u[0], v[1] - u[1], v[2] - u[2])
            c = class_index[d]
            shape = _class_shapes(dims)[c]
            base = ((cx + u[0]) * shape[1] + (cy + u[1])) * shape[2] + (cz + u[2])
            tet_edges[k::6, ei] = offsets[c] + base
    return edges, tets, tet_edges


def tet_type_corner_offsets():
    """Static corner offsets of the 6 tet types (for sliced validity)."""
    return KUHN_PATHS


def _lattice_verts(res, bounds) -> np.ndarray:
    rx, ry, rz = res
    (x0, y0, z0), (x1, y1, z1) = bounds
    xs = np.linspace(x0, x1, rx + 1, dtype=np.float32)
    ys = np.linspace(y0, y1, ry + 1, dtype=np.float32)
    zs = np.linspace(z0, z1, rz + 1, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def crop_window(res3, bounds, y_offset, scale, crop_box):
    """Per-axis vertex-index windows [i0, i1] of the full lattice covering
    ``crop_box`` (given in FINAL world coords, i.e. after the y_offset/scale
    transforms). The window is the smallest index range whose world extent
    contains the box, clamped to the lattice."""
    lo, hi = np.asarray(crop_box[0], np.float64), np.asarray(
        crop_box[1], np.float64)
    windows = []
    for ax in range(3):
        n = res3[ax] + 1
        w = np.linspace(bounds[0][ax], bounds[1][ax], n, dtype=np.float32
                        ).astype(np.float64)
        if ax == 1:
            w = w + y_offset
        w = w * scale
        i0 = int(np.searchsorted(w, lo[ax], side="right") - 1)
        i1 = int(np.searchsorted(w, hi[ax], side="left"))
        i0, i1 = max(0, i0), min(n - 1, i1)
        if i1 - i0 < 1:
            raise ValueError(f"crop_box axis {ax} covers no lattice cell")
        windows.append((i0, i1))
    return windows


def make_tet_grid(
    res=128,
    bounds=((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5)),
    y_offset: float = -0.1919,
    scale: float = 1.2,
    cache_path: Optional[str] = None,
    crop_box=None,
) -> TetGrid:
    """Build (or load from cache) the tet grid with reference transforms
    applied (ref hmsdf.py:210-211: verts[:,1] += y_offset; verts *= scale).

    ``res`` may be an int (isotropic) or an (rx, ry, rz) tuple.

    ``crop_box``: optional ((lo3), (hi3)) in final world coords — keep only
    the lattice cells covering the box. The kept vertices are an exact
    (bitwise) subset of the uncropped lattice: the per-axis linspaces are
    *sliced*, never recomputed, so a surface contained in the box extracts
    identically on the cropped and full grids (test-locked). This is the
    TPU-first answer to the reference's full-cube quartet grid
    (hmsdf.py:203-213): a human occupies ~20-40%% of each horizontal axis,
    and every per-iteration cost that scales with the lattice (full-grid SDF
    query, occupancy slicing, level-1 compaction) shrinks with the crop.
    """
    res3 = (res, res, res) if isinstance(res, int) else tuple(res)
    # Everything the lattice contents depend on beyond the filename: the
    # crop_box is subject-dependent (canonical-template bbox), and
    # bounds/y_offset/scale are config levers — a cache hit keyed only by
    # (res, crop margin) could silently load another subject's lattice
    # when runs share an out_dir. Stored in the npz and validated on load;
    # mismatch (or a pre-r4 cache without the key) rebuilds.
    cb = ([np.nan] * 6 if crop_box is None
          else list(crop_box[0]) + list(crop_box[1]))
    meta = np.asarray(
        [y_offset, scale, *np.asarray(bounds, np.float64).ravel(), *cb,
         *res3], np.float64)
    cached = None
    if cache_path is not None and os.path.exists(cache_path):
        z = np.load(cache_path)
        if "meta" in z and z["meta"].shape == meta.shape and np.array_equal(
                z["meta"], meta, equal_nan=True):
            cached = z
        else:
            print(f"[tet_grid] stale cache {cache_path} "
                  f"(meta mismatch) — rebuilding", flush=True)
    if cached is not None:
        z = cached
        verts, tets, edges, tet_edges = (
            z["verts"], z["tets"], z["edges"], z["tet_edges"])
        dims = tuple(int(d) for d in z["dims"])
    else:
        if crop_box is not None:
            win = crop_window(res3, bounds, y_offset, scale, crop_box)
            axes = []
            for ax, (i0, i1) in enumerate(win):
                full = np.linspace(bounds[0][ax], bounds[1][ax],
                                   res3[ax] + 1, dtype=np.float32)
                axes.append(full[i0:i1 + 1])
            gx, gy, gz = np.meshgrid(*axes, indexing="ij")
            verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
            res3 = tuple(i1 - i0 for i0, i1 in win)
        else:
            verts = _lattice_verts(res3, bounds)
        verts[:, 1] += y_offset
        verts *= scale
        edges, tets, tet_edges = _structured_topology(res3)
        dims = res3
        if cache_path is not None:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            np.savez_compressed(cache_path, verts=verts, tets=tets,
                                edges=edges, tet_edges=tet_edges,
                                dims=np.asarray(res3), meta=meta)
    edges_padded = np.concatenate([edges, np.zeros((1, 2), edges.dtype)], axis=0)
    return TetGrid(
        verts=jnp.asarray(verts, jnp.float32),
        tets=jnp.asarray(tets, jnp.int32),
        edges=jnp.asarray(edges_padded, jnp.int32),
        tet_edges=jnp.asarray(tet_edges, jnp.int32),
        dims=dims,
    )


def _unique_edges_generic(tets: np.ndarray):
    """Sort-based unique edges for unstructured (reference-format) grids."""
    e = tets[:, TET_EDGES_LOCAL]
    e = np.sort(e, axis=-1).reshape(-1, 2)
    key = e[:, 0].astype(np.int64) << 32 | e[:, 1].astype(np.int64)
    uniq, inv = np.unique(key, return_inverse=True)
    edges = np.stack([uniq >> 32, uniq & 0xFFFFFFFF], axis=-1)
    return edges.astype(np.int64), inv.reshape(-1, 6)


def load_reference_tet_grid(npz_path: str) -> TetGrid:
    """Load a reference-format tet grid npz ({vertices, indices}); topology
    is unstructured so marching tets falls back to the gather path."""
    z = np.load(npz_path)
    verts = np.asarray(z["vertices"], np.float32)
    verts[:, 1] += -0.1919
    verts *= 1.2
    tets = np.asarray(z["indices"], np.int64)
    edges, tet_edges = _unique_edges_generic(tets)
    edges_padded = np.concatenate([edges, np.zeros((1, 2), edges.dtype)], axis=0)
    return TetGrid(
        verts=jnp.asarray(verts, jnp.float32),
        tets=jnp.asarray(tets, jnp.int32),
        edges=jnp.asarray(edges_padded, jnp.int32),
        tet_edges=jnp.asarray(tet_edges, jnp.int32),
        dims=None,
    )
