"""Tetrahedral grid generation and static topology precompute.

The reference loads a quartet-generated tet grid from ``data/tets/tet_grid.npz``
(/root/reference/geometry/hmsdf.py:203-213) and re-derives its unique edge
list on the GPU every construction (hmsdf.py:382-388 ``generate_edges``).

Here the grid is generated on the host (Freudenthal/Kuhn 6-tets-per-cube
subdivision of an axis-aligned lattice) and — the key TPU design point — its
*entire topology is precomputed statically*: the unique edge list and each
tet's 6 edge ids. Because the grid never changes during optimization, the
in-jit marching-tets pass needs no ``torch.unique``-style dynamic dedup at
all: vertex identity IS edge identity.

Supports anisotropic lattices (a human fits a tall thin box; a tight
(rx, ry, rz) lattice spends tets where the surface can actually be instead of
the reference's full cube).
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
_KUHN_PATHS = (
    ((0, 0, 0), (1, 0, 0), (1, 1, 0), (1, 1, 1)),
    ((0, 0, 0), (1, 0, 0), (1, 0, 1), (1, 1, 1)),
    ((0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 1, 1)),
    ((0, 0, 0), (0, 1, 0), (0, 1, 1), (1, 1, 1)),
    ((0, 0, 0), (0, 0, 1), (1, 0, 1), (1, 1, 1)),
    ((0, 0, 0), (0, 0, 1), (0, 1, 1), (1, 1, 1)),
)


@dataclasses.dataclass(frozen=True)
class TetGrid:
    """Static tet-grid topology (device arrays; host ``faces`` not needed).

    Registered as a JAX pytree so the (large) topology arrays are passed to
    jitted steps as *arguments*, never baked into the HLO as constants —
    at 128^3 the tets/edge tables are hundreds of MB and would otherwise
    bloat every compile (and overflow remote-compile transports)."""

    verts: jnp.ndarray       # [N, 3] f32 lattice positions (transformed)
    tets: jnp.ndarray        # [T, 4] i32
    edges: jnp.ndarray       # [E+1, 2] i32 unique sorted edges; row E = (0,0) pad
    tet_edges: jnp.ndarray   # [T, 6] i32 edge ids per tet (base_tet_edges order)

    @property
    def n_verts(self) -> int:
        return self.verts.shape[0]

    @property
    def n_tets(self) -> int:
        return self.tets.shape[0]

    @property
    def n_edges(self) -> int:
        return self.edges.shape[0] - 1


jax.tree_util.register_pytree_node(
    TetGrid,
    lambda g: ((g.verts, g.tets, g.edges, g.tet_edges), None),
    lambda aux, ch: TetGrid(*ch),
)


def _lattice(res: Tuple[int, int, int], bounds) -> Tuple[np.ndarray, np.ndarray]:
    rx, ry, rz = res
    (x0, y0, z0), (x1, y1, z1) = bounds
    xs = np.linspace(x0, x1, rx + 1, dtype=np.float32)
    ys = np.linspace(y0, y1, ry + 1, dtype=np.float32)
    zs = np.linspace(z0, z1, rz + 1, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    def vid(ix, iy, iz):
        return (ix * (ry + 1) + iy) * (rz + 1) + iz

    cx, cy, cz = np.meshgrid(np.arange(rx), np.arange(ry), np.arange(rz),
                             indexing="ij")
    cx, cy, cz = cx.ravel(), cy.ravel(), cz.ravel()
    tets = np.empty((len(cx) * 6, 4), np.int64)
    for t, path in enumerate(_KUHN_PATHS):
        ids = [vid(cx + dx, cy + dy, cz + dz) for (dx, dy, dz) in path]
        tets[t::6] = np.stack(ids, axis=-1)
    return verts, tets


def _unique_edges(tets: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Return (edges [E,2] sorted-unique, tet_edges [T,6] edge ids)."""
    e = tets[:, TET_EDGES_LOCAL]             # [T, 6, 2]
    e = np.sort(e, axis=-1).reshape(-1, 2)
    # pack two int32 vertex ids into one int64 key for fast unique
    key = e[:, 0].astype(np.int64) << 32 | e[:, 1].astype(np.int64)
    uniq, inv = np.unique(key, return_inverse=True)
    edges = np.stack([uniq >> 32, uniq & 0xFFFFFFFF], axis=-1)
    return edges.astype(np.int64), inv.reshape(-1, 6)


def make_tet_grid(
    res=128,
    bounds=((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5)),
    y_offset: float = -0.1919,
    scale: float = 1.2,
    cache_path: Optional[str] = None,
) -> TetGrid:
    """Build (or load from cache) the tet grid with reference transforms
    applied (ref hmsdf.py:210-211: verts[:,1] += y_offset; verts *= scale).

    ``res`` may be an int (isotropic) or an (rx, ry, rz) tuple.
    """
    res3 = (res, res, res) if isinstance(res, int) else tuple(res)
    if cache_path is not None and os.path.exists(cache_path):
        z = np.load(cache_path)
        verts, tets, edges, tet_edges = (
            z["verts"], z["tets"], z["edges"], z["tet_edges"])
    else:
        verts, tets = _lattice(res3, bounds)
        verts[:, 1] += y_offset
        verts *= scale
        edges, tet_edges = _unique_edges(tets)
        if cache_path is not None:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            np.savez_compressed(cache_path, verts=verts, tets=tets,
                                edges=edges, tet_edges=tet_edges)
    edges_padded = np.concatenate([edges, np.zeros((1, 2), edges.dtype)], axis=0)
    return TetGrid(
        verts=jnp.asarray(verts, jnp.float32),
        tets=jnp.asarray(tets, jnp.int32),
        edges=jnp.asarray(edges_padded, jnp.int32),
        tet_edges=jnp.asarray(tet_edges, jnp.int32),
    )


def load_reference_tet_grid(npz_path: str) -> TetGrid:
    """Load a reference-format tet grid npz ({vertices, indices}) and
    precompute static topology (drop-in for data/tets/tet_grid.npz)."""
    z = np.load(npz_path)
    verts = np.asarray(z["vertices"], np.float32)
    verts[:, 1] += -0.1919
    verts *= 1.2
    tets = np.asarray(z["indices"], np.int64)
    edges, tet_edges = _unique_edges(tets)
    edges_padded = np.concatenate([edges, np.zeros((1, 2), edges.dtype)], axis=0)
    return TetGrid(
        verts=jnp.asarray(verts, jnp.float32),
        tets=jnp.asarray(tets, jnp.int32),
        edges=jnp.asarray(edges_padded, jnp.int32),
        tet_edges=jnp.asarray(tet_edges, jnp.int32),
    )
