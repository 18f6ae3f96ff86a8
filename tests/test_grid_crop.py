"""Body-tight lattice crop (GeometryConfig.grid_crop / BENCH_GRID_CROP).

The crop keeps an exact bitwise subset of the full lattice's vertices at
identical cell positions (ops/tet_grid.py:make_tet_grid crop_box), so any
surface contained in the cropped box must extract to the identical vertex
set on both grids. This is the parity argument for the perf lever — the
reference always marches the full quartet cube (hmsdf.py:203-213).
"""

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.ops.marching_tets import gshell_extract
from d3human_tpu.ops.tet_grid import crop_window, make_tet_grid

MV = MT = 8192
BOUNDS = ((-0.5,) * 3, (0.5,) * 3)


def _grids(res=16, y_offset=-0.1, scale=1.5,
           crop=((-0.55, -0.8, -0.55), (0.55, 0.35, 0.55))):
    full = make_tet_grid(res=res, bounds=BOUNDS, y_offset=y_offset,
                         scale=scale)
    sub = make_tet_grid(res=res, bounds=BOUNDS, y_offset=y_offset,
                        scale=scale, crop_box=crop)
    return full, sub


def test_crop_verts_exact_subset():
    full, sub = _grids()
    fv = {tuple(v) for v in np.asarray(full.verts)}
    sv = [tuple(v) for v in np.asarray(sub.verts)]
    assert len(sv) < full.n_verts
    assert all(v in fv for v in sv)          # bitwise membership
    assert sub.n_tets < full.n_tets


def test_crop_window_covers_box():
    win = crop_window((16, 16, 16), BOUNDS, -0.1, 1.5,
                      ((-0.2, -0.3, -0.1), (0.2, 0.1, 0.15)))
    for ax, (i0, i1) in enumerate(win):
        w = (np.linspace(-0.5, 0.5, 17)
             + (-0.1 if ax == 1 else 0.0)) * 1.5
        assert w[i0] <= (-0.2, -0.3, -0.1)[ax] + 1e-6
        assert w[i1] >= (0.2, 0.1, 0.15)[ax] - 1e-6


def test_crop_extraction_identical():
    """A sphere inside the crop extracts to the same welded vertex set and
    total area on full vs cropped grids."""
    full, sub = _grids()

    def sphere(pos):
        return 0.45 - jnp.linalg.norm(pos - jnp.asarray([0.0, -0.2, 0.0]),
                                      axis=-1)

    def run(grid):
        sdf = sphere(grid.verts)
        msdf = jnp.ones((grid.n_verts,))
        mesh = jax.jit(lambda s, m: gshell_extract(
            grid, grid.verts, s, m, MV, MT))(sdf, msdf)
        v = np.asarray(mesh.verts)
        f = np.asarray(mesh.faces)[np.asarray(mesh.face_valid)]
        used = np.unique(f)
        pts = {tuple(p) for p in v[used]}
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
        return pts, area, len(f)

    pf, area_f, nf = run(full)
    ps, area_s, ns = run(sub)
    assert nf == ns
    assert pf == ps                          # bitwise-identical vertex sets
    np.testing.assert_allclose(area_f, area_s, rtol=1e-6)


def test_crop_rejects_empty_axis():
    import pytest
    with pytest.raises(ValueError):
        make_tet_grid(res=8, bounds=BOUNDS, y_offset=0.0, scale=1.0,
                      crop_box=((2.0, 2.0, 2.0), (2.1, 2.1, 2.1)))
