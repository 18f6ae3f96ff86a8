"""Oracle tests: render_mesh_compact vs render_mesh_full.

The compact path is the TPU training hot path; the full path is the
reference implementation (the reference repo's own use_python= oracle
pattern, ref renderutils/ops.py:104-111)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3human_tpu.render.pipeline import render_mesh_compact, render_mesh_full


class IdentityTex:
    """Texture module stub: kd = template position (wrapped), ks = 0.3."""

    def sample(self, params, pts):
        kd = jnp.abs(jnp.sin(pts * 3.0))
        ks = jnp.full_like(pts, 0.3)
        return jnp.concatenate([kd, ks], axis=-1)


def sphere_mesh(n=12, r=0.6):
    """Lat-long sphere (interior edges + outer silhouette)."""
    th = np.linspace(0.2, np.pi - 0.2, n)
    ph = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([r * np.sin(T) * np.cos(P), r * np.cos(T),
                  r * np.sin(T) * np.sin(P)], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(2 * n):
            a = i * 2 * n + j
            b = i * 2 * n + (j + 1) % (2 * n)
            c = a + 2 * n
            d = b + 2 * n
            faces += [[a, b, c], [b, d, c]]
    return (jnp.asarray(v, jnp.float32),
            jnp.asarray(np.asarray(faces), jnp.int32))


def _render_pair(verts, faces, res=(64, 64), msdf=None, labels=None,
                 max_cov=0.9, z=2.0):
    from d3human_tpu.render.camera import look_at, perspective

    mv = look_at(eye=(0.0, 0.0, z), center=(0.0, 0.0, 0.0))
    proj = perspective(fovy=1.0, aspect=1.0)
    mvp = jnp.asarray(proj @ mv)
    campos = jnp.asarray(np.linalg.inv(mv)[:3, 3])
    fv = jnp.ones((faces.shape[0],), bool)
    bg = jnp.full((*res, 3), 0.25)
    tex = IdentityTex()
    kw = dict(
        verts=verts, verts_original=verts * 0.9, faces=faces, face_valid=fv,
        mvp=mvp, campos=campos, resolution=res, tex_module=tex,
        tex_params=None, background=bg, msdf_attr=msdf, face_labels=labels,
        raster_opts=dict(tile=(8, 16), max_faces_per_tile=256, bin_expand=8,
                         max_global=256),
    )
    key = jax.random.PRNGKey(0)
    full = jax.jit(lambda: render_mesh_full(key, max_covered_frac=0.0, **kw))()
    comp = jax.jit(lambda: render_mesh_compact(
        key, max_covered_frac=max_cov, aa_max_pairs=4096, **kw))()
    return full, comp


def test_compact_matches_full_single_triangle():
    """With one face every differing pair is a coverage edge: the compact
    path must match the full path EXACTLY on all AA'd buffers."""
    verts = jnp.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.6, 0.0]])
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    msdf = jnp.array([0.5, -0.2, 0.8])
    full, comp = _render_pair(verts, faces, msdf=msdf)
    np.testing.assert_allclose(np.asarray(comp.shaded),
                               np.asarray(full.shaded), atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp.geometric_normal),
                               np.asarray(full.geometric_normal), atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp.msdf_image),
                               np.asarray(full.msdf_image), atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp.alpha),
                               np.asarray(full.alpha), atol=0)


def test_compact_matches_full_sphere():
    """On a closed mesh the compact AA skips interior (depth-continuous)
    edges — exactly nvdiffrast's silhouette rule — so color buffers agree
    except tiny blends at interior edges; the ALPHA channel (where mask-loss
    silhouette gradients live) must agree exactly."""
    verts, faces = sphere_mesh()
    labels = (jnp.arange(faces.shape[0]) % 2).astype(jnp.int32)
    msdf = jnp.ones((verts.shape[0],)) * 0.3
    full, comp = _render_pair(verts, faces, msdf=msdf, labels=labels)
    # alpha: first-order identical. The full path's all-pairs sequential
    # blending adds SECOND-order transfers at rim pixels (an interior pair
    # touching an already-blended silhouette pixel re-distributes its
    # alpha); nvdiffrast's single silhouette pass has no such term, so the
    # compact path is the closer reference. Bound the residual.
    da = np.abs(np.asarray(comp.shaded[..., 3])
                - np.asarray(full.shaded[..., 3]))
    assert (da > 1e-4).mean() < 0.02
    assert da.max() < 0.2
    # mesh_id buffer identical (never antialiased)
    np.testing.assert_allclose(np.asarray(comp.mesh_id),
                               np.asarray(full.mesh_id), atol=1e-6)
    # color/normal/msdf: the full path color-blends at EVERY id boundary
    # (interior facet edges included); the compact path only at silhouette
    # edges. All disagreement must therefore sit ON id-boundary pixels and
    # stay bounded by the per-pair blend magnitude.
    tri = np.asarray(full.rast.tri_id)
    bnd = np.zeros_like(tri, bool)
    bnd[:, :-1] |= tri[:, :-1] != tri[:, 1:]
    bnd[:, 1:] |= tri[:, :-1] != tri[:, 1:]
    bnd[:-1, :] |= tri[:-1, :] != tri[1:, :]
    bnd[1:, :] |= tri[:-1, :] != tri[1:, :]
    for a, b in ((comp.shaded[..., :3], full.shaded[..., :3]),
                 (comp.geometric_normal[..., :3],
                  full.geometric_normal[..., :3]),
                 (comp.msdf_image, full.msdf_image)):
        d = np.abs(np.asarray(a) - np.asarray(b)).max(axis=-1)
        assert (d[~bnd] < 1e-4).all(), "diff off id boundaries"
        assert d.max() < 0.6

    # the kd buffer (chroma input) matches exactly (no AA on either path)
    np.testing.assert_allclose(np.asarray(comp.kd), np.asarray(full.kd),
                               atol=1e-5)


def test_compact_silhouette_gradient_direction():
    """Finite-difference check through the COMPACT path: growing a triangle
    must increase the AA'd alpha sum, and the analytic gradient wrt vertex
    position must agree with FD (the mask-loss -> SDF gradient mechanism)."""
    faces = jnp.array([[0, 1, 2]], jnp.int32)

    def alpha_sum(s):
        verts = s * jnp.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0],
                               [0.0, 0.6, 0.0]])
        from d3human_tpu.render.camera import look_at, perspective

        mv = look_at(eye=(0.0, 0.0, 2.0), center=(0.0, 0.0, 0.0))
        proj = perspective(fovy=1.0, aspect=1.0)
        out = render_mesh_compact(
            jax.random.PRNGKey(0), verts, verts, faces,
            jnp.ones((1,), bool), jnp.asarray(proj @ mv),
            jnp.asarray(np.linalg.inv(mv)[:3, 3]), (64, 64),
            IdentityTex(), None, jnp.zeros((64, 64, 3)),
            max_covered_frac=0.9, aa_max_pairs=1024)
        return jnp.sum(out.shaded[..., 3])

    g = float(jax.grad(alpha_sum)(jnp.float32(1.0)))
    eps = 1e-3
    fd = (float(alpha_sum(jnp.float32(1.0 + eps)))
          - float(alpha_sum(jnp.float32(1.0 - eps)))) / (2 * eps)
    assert g > 0 and fd > 0
    np.testing.assert_allclose(g, fd, rtol=0.15)


def test_compact_capacity_counters():
    verts, faces = sphere_mesh()
    full, comp = _render_pair(verts, faces)
    st = comp.stats
    assert int(st["n_cov"]) > 0
    assert int(st["n_cov"]) <= int(st["cov_capacity"])
    assert int(st["aa_pairs_x"]) > 0
    assert int(comp.rast.n_max_tile) >= 1


def test_layered_composite_matches_single_layer():
    """Depth peeling with OPAQUE geometry (per-layer alpha == coverage == 1):
    every nearer layer fully overwrites the farther ones, so the composites
    agree everywhere EXCEPT silhouette-rim pixels, where the reference
    semantics (ref render/render.py:375-383 composite_buffer) antialias
    each layer in turn — the far layer's AA legitimately spills its color
    into uncovered rim pixels before the near layer composites over it.
    Also checks the peel actually produced a second surface (the sphere's
    back hemisphere)."""
    from d3human_tpu.render.camera import look_at, perspective
    from d3human_tpu.ops.rasterizer import rasterize_bruteforce

    verts, faces = sphere_mesh()
    mv = look_at(eye=(0.0, 0.0, 2.0), center=(0.0, 0.0, 0.0))
    proj = perspective(fovy=1.0, aspect=1.0)
    mvp = jnp.asarray(proj @ mv)
    campos = jnp.asarray(np.linalg.inv(mv)[:3, 3])
    fv = jnp.ones((faces.shape[0],), bool)
    res = (64, 64)
    kw = dict(
        verts=verts, verts_original=verts * 0.9, faces=faces, face_valid=fv,
        mvp=mvp, campos=campos, resolution=res, tex_module=IdentityTex(),
        tex_params=None, background=jnp.full((*res, 3), 0.25),
        max_covered_frac=0.0, use_bruteforce_raster=True,
    )
    key = jax.random.PRNGKey(0)
    one = jax.jit(lambda: render_mesh_full(key, layers=1, **kw))()
    two = jax.jit(lambda: render_mesh_full(key, layers=2, **kw))()
    d = np.abs(np.asarray(two.shaded) - np.asarray(one.shaded)).max(-1)
    # differences confined to the AA rim (a thin silhouette band), bounded
    # by the per-pair blend magnitude
    assert (d > 1e-5).mean() < 0.02, f"{(d > 1e-5).mean():.3f} px differ"
    assert d.max() <= 0.5 + 1e-6
    # interior (non-rim): exact
    alpha1 = np.asarray(one.shaded[..., 3])
    interior = (alpha1 == 1.0)
    assert interior.sum() > 100
    assert d[interior].max() < 1e-5
    # non-shaded buffers always come from the nearest layer
    np.testing.assert_allclose(np.asarray(two.normal),
                               np.asarray(one.normal), atol=1e-6)
    # the second layer exists: peeling a closed sphere exposes back faces
    from d3human_tpu.ops.rasterizer import xfm_points
    v_clip = xfm_points(verts, mvp)
    l0, l1 = rasterize_bruteforce(v_clip, faces, fv, res, layers=2)
    cov0 = np.asarray(l0.tri_id) > 0
    cov1 = np.asarray(l1.tri_id) > 0
    assert cov1.sum() > 0.8 * cov0.sum()
    assert (np.asarray(l1.zbuf)[cov1] >= np.asarray(l0.zbuf)[cov1]).all()
