"""Body-fitted tetrahedral mesh from a surface (tetgen replacement).

The reference tetrahedralizes the SMPL-X template with TetGen
(/root/reference/script/get_tet_smpl.py:9-27, feeding smpl_msdf /
sdf_tet_gt in geometry/hmsdf.py:239-249). External TetGen is unavailable;
instead the body interior is meshed as a *crust* of the regular Kuhn
lattice: keep every tet whose circumsphere intersects the (inflated) body —
i.e. any corner within `band` of the surface or inside it. Structured crust
tets serve the same role (a volume discretization carrying per-vertex
fields) with TPU-friendlier regularity.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from d3human_tpu.ops.mesh_sdf import mesh_sdf_host
from d3human_tpu.ops.tet_grid import make_tet_grid


def tetrahedralize_interior(
    verts: np.ndarray, faces: np.ndarray,
    grid_res: int = 48, band: float = 0.02, margin: float = 0.05,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (tet_verts [N,3], tets [T,4]) covering the interior + band."""
    lo = verts.min(axis=0) - margin
    hi = verts.max(axis=0) + margin
    grid = make_tet_grid(res=grid_res, bounds=(tuple(lo), tuple(hi)),
                         y_offset=0.0, scale=1.0)
    sdf = mesh_sdf_host(np.asarray(grid.verts), verts, faces,
                        sign_convention="pos_inside")

    keep_vert = sdf > -band          # inside or within the band
    tets = np.asarray(grid.tets)
    keep_tet = keep_vert[tets].any(axis=1)
    tets = tets[keep_tet]

    used, inv = np.unique(tets.reshape(-1), return_inverse=True)
    tet_verts = np.asarray(grid.verts)[used]
    return tet_verts.astype(np.float32), inv.reshape(-1, 4).astype(np.int64)
