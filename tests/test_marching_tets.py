import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3human_tpu.ops.marching_tets import gshell_extract, sdf_reg_loss
from d3human_tpu.ops.tet_grid import make_tet_grid

MV = MT = 8192


@pytest.fixture(scope="module")
def grid():
    return make_tet_grid(res=12, bounds=((-0.5,) * 3, (0.5,) * 3),
                         y_offset=0.0, scale=2.0)


@pytest.fixture(scope="module")
def extract(grid):
    @jax.jit
    def f(sdf, msdf, sign):
        return gshell_extract(grid, grid.verts, sdf, msdf, MV, MT,
                              msdf_sign=sign)
    return lambda sdf, msdf, sign=1.0: f(sdf, msdf, sign)


def sphere_sdf(pos, r=0.7):
    return r - jnp.linalg.norm(pos, axis=-1)   # >0 inside


def _valid_faces(mesh):
    return np.asarray(mesh.faces)[np.asarray(mesh.face_valid)]


def _face_areas(verts, faces):
    v = np.asarray(verts)
    a, b, c = v[faces[:, 0]], v[faces[:, 1]], v[faces[:, 2]]
    return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)


def test_grid_topology(grid):
    assert grid.n_tets == 12 ** 3 * 6
    assert grid.n_verts == 13 ** 3
    te = np.asarray(grid.tet_edges[:10])
    tets = np.asarray(grid.tets[:10])
    edges = np.asarray(grid.edges)
    from itertools import combinations
    for t in range(10):
        got = {tuple(sorted(edges[e])) for e in te[t]}
        expect = {tuple(sorted(p)) for p in combinations(tets[t], 2)}
        assert got == expect


def test_sphere_extraction_watertight(grid, extract):
    sdf = sphere_sdf(grid.verts)
    msdf = jnp.ones(grid.n_verts)   # keep everything -> aug == watertight
    mesh = extract(sdf, msdf)

    faces = _valid_faces(mesh)
    assert faces.shape[0] > 100
    used = np.unique(faces)
    r = np.linalg.norm(np.asarray(mesh.verts)[used], axis=-1)
    assert np.abs(r - 0.7).max() < 0.08
    # closed surface: every edge shared by exactly 2 faces
    e = np.sort(faces[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2), axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).all()
    area = _face_areas(mesh.verts, faces).sum()
    assert abs(area - 4 * np.pi * 0.7 ** 2) / (4 * np.pi * 0.7 ** 2) < 0.05


def test_msdf_plane_cut(grid, extract):
    sdf = sphere_sdf(grid.verts)
    msdf = grid.verts[:, 0]        # keep x>0 hemisphere
    mesh = extract(sdf, msdf)
    faces = _valid_faces(mesh)
    verts = np.asarray(mesh.verts)
    centers = verts[faces].mean(axis=1)
    assert centers[:, 0].min() > -0.05
    area = _face_areas(mesh.verts, faces).sum()
    assert abs(area - 2 * np.pi * 0.7 ** 2) / (2 * np.pi * 0.7 ** 2) < 0.08
    used = np.unique(faces)
    bnd = used[used >= mesh.n_verts_watertight]
    assert bnd.size > 0
    assert np.abs(verts[bnd][:, 0]).max() < 0.06


def test_split_body_is_complement(grid, extract):
    sdf = sphere_sdf(grid.verts)
    msdf = grid.verts[:, 0]
    cloth = extract(sdf, msdf, 1.0)
    body = extract(sdf, msdf, -1.0)
    a_c = _face_areas(cloth.verts, _valid_faces(cloth)).sum()
    a_b = _face_areas(body.verts, _valid_faces(body)).sum()
    a_full = 4 * np.pi * 0.7 ** 2
    assert abs((a_c + a_b) - a_full) / a_full < 0.06


def test_gradients_reach_sdf(grid):
    """Inflating the SDF must move vertices outward with d(radius)/d(offset)
    == 1 for a unit-gradient SDF — the gradient path that drives learning."""
    msdf = jnp.ones(grid.n_verts)

    @jax.jit
    def mean_radius(offset):
        sdf = sphere_sdf(grid.verts) + offset
        mesh = gshell_extract(grid, grid.verts, sdf, msdf, MV, MT)
        r = jnp.linalg.norm(mesh.verts_wt, axis=-1)
        ok = mesh.vert_valid[: MV]
        return jnp.sum(jnp.where(ok, r, 0.0)) / jnp.sum(ok)

    g = jax.jit(jax.grad(mean_radius))(0.0)
    eps = 1e-3
    fd = (mean_radius(eps) - mean_radius(-eps)) / (2 * eps)
    assert 0.9 < float(g) < 1.1
    np.testing.assert_allclose(float(g), float(fd), rtol=0.05)


def test_gradients_reach_msdf_through_boundary(grid):
    """Boundary vertex positions must carry gradients into the mSDF field
    (level-2 weights NOT detached for positions, ref gshell_tets.py:373)."""
    sdf = sphere_sdf(grid.verts)

    @jax.jit
    def boundary_x(shift):
        msdf = grid.verts[:, 0] + shift
        mesh = gshell_extract(grid, grid.verts, sdf, msdf, MV, MT)
        bx = mesh.verts[MV:, 0]
        ok = mesh.vert_valid[MV:]
        return jnp.sum(jnp.where(ok, bx, 0.0)) / jnp.maximum(jnp.sum(ok), 1)

    g = jax.jit(jax.grad(boundary_x))(0.0)
    eps = 1e-3
    fd = (boundary_x(eps) - boundary_x(-eps)) / (2 * eps)
    assert abs(float(g)) > 0.1
    np.testing.assert_allclose(float(g), float(fd), rtol=0.1)


def test_msdf_values_coefficient_gradients_stopped(grid):
    """msdf carried values use gradient-stopped interpolation coefficients
    (ref gshell_tets.py:303,388): constant msdf => zero grad w.r.t. sdf."""
    msdf = jnp.ones(grid.n_verts) * 0.5

    @jax.jit
    def mean_msdf(offset):
        sdf = sphere_sdf(grid.verts) + offset
        mesh = gshell_extract(grid, grid.verts, sdf, msdf, MV, MT)
        return jnp.mean(mesh.msdf_wt)

    g = jax.jit(jax.grad(mean_msdf))(0.0)
    assert abs(float(g)) < 1e-6


def test_sdf_reg_loss(grid):
    f = jax.jit(lambda s: sdf_reg_loss(s, grid))
    assert float(f(sphere_sdf(grid.verts))) > 0
    assert float(f(jnp.ones(grid.n_verts))) == 0.0


def test_structured_topology_matches_generic_unique():
    """The class-major structured edge list must contain exactly the unique
    sorted edges a torch.unique-style pass would produce, and per-tet edge
    ids must dereference to the tet's own vertex pairs."""
    from d3human_tpu.ops.tet_grid import _unique_edges_generic

    g = make_tet_grid(res=(3, 4, 2), bounds=((-0.5,) * 3, (0.5,) * 3),
                      y_offset=0.0, scale=1.0)
    assert g.dims == (3, 4, 2)
    edges = np.asarray(g.edges[:-1])
    gen_edges, _ = _unique_edges_generic(np.asarray(g.tets, np.int64))
    a = {tuple(sorted(e)) for e in edges}
    b = {tuple(sorted(e)) for e in gen_edges}
    assert a == b
    assert len(edges) == len(gen_edges)
    te = np.asarray(g.tet_edges)
    tets = np.asarray(g.tets)
    from itertools import combinations
    for t in range(0, g.n_tets, 7):
        got = {tuple(sorted(edges[e])) for e in te[t]}
        expect = {tuple(sorted(p)) for p in combinations(tets[t], 2)}
        assert got == expect


def test_structured_crossing_matches_gather(grid):
    """Slice-based crossing/valid flags == gather-based ones."""
    from d3human_tpu.ops.marching_tets import (
        _structured_crossing, _structured_valid_tets,
    )
    sdf = sphere_sdf(grid.verts)
    occ = np.asarray(sdf) > 0
    E = grid.n_edges
    edges = np.asarray(grid.edges[:E])
    expect_cross = occ[edges[:, 0]] != occ[edges[:, 1]]
    got_cross = np.asarray(jax.jit(_structured_crossing)(
        jnp.asarray(occ).reshape(grid.vert_dims)))
    np.testing.assert_array_equal(got_cross, expect_cross)

    occ4 = occ[np.asarray(grid.tets)]
    s = occ4.sum(1)
    expect_valid = (s > 0) & (s < 4)
    got_valid = np.asarray(jax.jit(_structured_valid_tets)(
        jnp.asarray(occ).reshape(grid.vert_dims)))
    np.testing.assert_array_equal(got_valid, expect_valid)


def test_extract_pair_matches_single(grid):
    """gshell_extract_pair must be BIT-identical to two independent
    gshell_extract calls (values and gradients): the split stage relies on
    this to share level-1 work between the cloth/body halves."""
    from d3human_tpu.ops.marching_tets import gshell_extract_pair

    key = jax.random.PRNGKey(0)
    sdf = sphere_sdf(grid.verts) + 0.02 * jax.random.normal(
        key, (grid.n_verts,))
    msdf = jnp.sin(7.0 * grid.verts[:, 0]) + 0.3 * jnp.cos(
        5.0 * grid.verts[:, 1])

    @jax.jit
    def pair(sdf, msdf):
        c, b, _ = gshell_extract_pair(grid, grid.verts, sdf, msdf, MV, MT)
        return c, b

    @jax.jit
    def single(sdf, msdf, sign):
        return gshell_extract(grid, grid.verts, sdf, msdf, MV, MT,
                              msdf_sign=sign)

    c, b = pair(sdf, msdf)
    c_ref = single(sdf, msdf, 1.0)
    b_ref = single(sdf, msdf, -1.0)
    for got, ref, tag in ((c, c_ref, "cloth"), (b, b_ref, "body")):
        for name in got._fields:
            g, r = np.asarray(getattr(got, name)), np.asarray(
                getattr(ref, name))
            assert np.array_equal(g, r), f"{tag}.{name} diverged"
    # the halves genuinely differ (the msdf cut is sign-mixed)
    assert not np.array_equal(np.asarray(c.face_valid),
                              np.asarray(b.face_valid))
    assert np.asarray(c.face_valid).sum() > 0
    assert np.asarray(b.face_valid).sum() > 0

    # gradients through verts + msdf_aug of both halves, pair vs single
    wv = jax.random.normal(jax.random.fold_in(key, 1), c.verts.shape)
    wm = jax.random.normal(jax.random.fold_in(key, 2), c.msdf_aug.shape)

    def scal(mesh):
        return (jnp.sum(mesh.verts * wv) + jnp.sum(mesh.msdf_aug * wm))

    def loss_pair(sdf, msdf):
        cc, bb, _ = gshell_extract_pair(grid, grid.verts, sdf, msdf, MV, MT)
        return scal(cc) + 2.0 * scal(bb)

    def loss_single(sdf, msdf):
        cc = gshell_extract(grid, grid.verts, sdf, msdf, MV, MT, 1.0)
        bb = gshell_extract(grid, grid.verts, sdf, msdf, MV, MT, -1.0)
        return scal(cc) + 2.0 * scal(bb)

    # gradients are mathematically identical; bits differ only by f32
    # accumulation order (shared-subexpression cotangents merge earlier in
    # the pair path), so compare with a reassociation-sized tolerance
    gp = jax.jit(jax.grad(loss_pair, argnums=(0, 1)))(sdf, msdf)
    gs = jax.jit(jax.grad(loss_single, argnums=(0, 1)))(sdf, msdf)
    for a, r, tag in ((gp[0], gs[0], "d/dsdf"), (gp[1], gs[1], "d/dmsdf")):
        a, r = np.asarray(a), np.asarray(r)
        scale = np.abs(r).max()
        np.testing.assert_allclose(a / scale, r / scale,
                                   rtol=0, atol=1e-5, err_msg=tag)
