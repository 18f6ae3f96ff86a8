"""Native mesh-SDF engine (native/meshsdf.cpp): exactness against a brute
force oracle, sign correctness on a watertight mesh, agreement with the
device (JAX) implementation, and the host dispatch wrapper."""

import jax.numpy as jnp
import numpy as np
import pytest

from d3human_tpu.ops.mesh_sdf import mesh_sdf, mesh_sdf_host


def icosphere(sub=3):
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                  [0, -1, 0], [0, 0, 1], [0, 0, -1]], float)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    for _ in range(sub):
        mid = {}
        verts = list(v)
        for tri in f:
            for a, b in [(tri[0], tri[1]), (tri[1], tri[2]),
                         (tri[2], tri[0])]:
                k = tuple(sorted((a, b)))
                if k not in mid:
                    mid[k] = len(verts)
                    verts.append((v[k[0]] + v[k[1]]) / 2)
        v2 = np.asarray(verts)
        nf = []
        for a, b, c in f:
            ab = mid[tuple(sorted((a, b)))]
            bc = mid[tuple(sorted((b, c)))]
            ca = mid[tuple(sorted((c, a)))]
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v, f = v2, np.asarray(nf)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32), f.astype(np.int32)


@pytest.fixture(scope="module")
def sphere():
    return icosphere(3)


@pytest.fixture(scope="module")
def native_sphere(sphere):
    from d3human_tpu.native.meshsdf import MeshSDF

    return MeshSDF(*sphere)


def test_sign_and_distance_on_sphere(native_sphere):
    rng = np.random.default_rng(0)
    p = rng.uniform(-1.5, 1.5, (5000, 3)).astype(np.float32)
    d = native_sphere.query(p)
    r = np.linalg.norm(p, axis=1)
    # mesh deviates from the unit sphere by the chord sag only
    assert np.abs(d - (r - 1)).max() < 0.02
    assert (d[r < 0.97] < 0).all()
    assert (d[r > 1.03] > 0).all()


def test_sign_conventions_and_unsigned(native_sphere):
    rng = np.random.default_rng(1)
    p = rng.uniform(-1.2, 1.2, (512, 3)).astype(np.float32)
    neg = native_sphere.query(p, sign_convention="neg_inside")
    pos = native_sphere.query(p, sign_convention="pos_inside")
    uns = native_sphere.query(p, sign_convention="unsigned")
    np.testing.assert_allclose(neg, -pos)
    np.testing.assert_allclose(np.abs(neg), uns)


def test_exact_vs_bruteforce_soup():
    """Unsigned distance to a random (open, non-manifold) soup must equal
    the brute-force min over all triangles."""
    from d3human_tpu.native.meshsdf import MeshSDF

    rng = np.random.default_rng(2)
    v = rng.standard_normal((60, 3)).astype(np.float32)
    f = rng.integers(0, 60, (40, 3)).astype(np.int32)
    f = f[(f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])]
    p = rng.standard_normal((200, 3)).astype(np.float32) * 1.5

    d = MeshSDF(v, f).query(p, sign_convention="unsigned")

    # oracle: dense point-triangle via the JAX helper (itself FD-tested)
    from d3human_tpu.ops.mesh_sdf import _point_triangle

    tri = jnp.asarray(v)[jnp.asarray(f)]          # [F,3,3]
    _, sq = _point_triangle(jnp.asarray(p)[:, None],
                            tri[None, :, 0], tri[None, :, 1],
                            tri[None, :, 2])      # [P,F]
    ref = np.sqrt(np.asarray(sq).min(axis=1))
    np.testing.assert_allclose(d, ref, atol=2e-5)


def test_closest_point_and_face(native_sphere, sphere):
    v, f = sphere
    rng = np.random.default_rng(3)
    p = rng.uniform(-1.4, 1.4, (256, 3)).astype(np.float32)
    d, cp, face = native_sphere.query(p, return_closest=True)
    # closest points lie on the mesh (radius within chord sag of 1)
    r = np.linalg.norm(cp, axis=1)
    assert (np.abs(r - 1) < 0.02).all()
    assert (face >= 0).all() and (face < len(f)).all()
    # |p - cp| equals the unsigned distance
    np.testing.assert_allclose(np.linalg.norm(p - cp, axis=1), np.abs(d),
                               atol=2e-5)


def test_agrees_with_device_op(sphere):
    v, f = sphere
    rng = np.random.default_rng(4)
    p = rng.uniform(-1.3, 1.3, (1024, 3)).astype(np.float32)
    host = mesh_sdf_host(p, v, f)
    dev = np.asarray(mesh_sdf(jnp.asarray(p), jnp.asarray(v),
                              jnp.asarray(f), k=8))
    # device op is KNN-pruned (approximate); agreement must be tight on a
    # smooth watertight mesh
    assert np.abs(host - dev).max() < 5e-3
    far = np.abs(host) > 0.01
    assert (np.sign(host[far]) == np.sign(dev[far])).all()


def test_multithreaded_matches_single(native_sphere):
    rng = np.random.default_rng(5)
    p = rng.uniform(-1.3, 1.3, (2048, 3)).astype(np.float32)
    a = native_sphere.query(p, n_threads=1)
    b = native_sphere.query(p, n_threads=4)
    np.testing.assert_array_equal(a, b)
