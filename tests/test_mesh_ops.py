import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.ops import mesh_ops
from d3human_tpu.ops.image_loss import image_loss, make_loss_fn, rgb_to_srgb, srgb_to_rgb, ssim
from d3human_tpu.ops.mesh_sdf import mesh_sdf


def unit_tetra():
    v = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    f = jnp.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], jnp.int32)
    return v, f


def test_auto_normals_outward():
    v, f = unit_tetra()
    n = jax.jit(mesh_ops.auto_normals)(v, f)
    # vertex 0's normal points away from the centroid
    centroid = v.mean(0)
    assert float(jnp.dot(n[0], v[0] - centroid)) > 0


def test_laplacian_zero_for_flat_and_positive_for_noise():
    # flat grid strip: interior vertices are averages of neighbors
    xs, ys = np.meshgrid(np.arange(6, dtype=np.float32),
                         np.arange(6, dtype=np.float32))
    v = np.stack([xs.ravel(), ys.ravel(), np.zeros(36, np.float32)], -1)
    faces = []
    for i in range(5):
        for j in range(5):
            a = i * 6 + j
            faces.append([a, a + 1, a + 6])
            faces.append([a + 1, a + 7, a + 6])
    f = jnp.asarray(faces, jnp.int32)
    # interior vertices only (the umbrella operator is nonzero on the open
    # boundary even for a flat sheet)
    interior = ((xs.ravel() > 0) & (xs.ravel() < 5)
                & (ys.ravel() > 0) & (ys.ravel() < 5))
    loss = jax.jit(lambda v: mesh_ops.laplacian_uniform_loss(
        v, f, vert_valid=jnp.asarray(interior)))
    flat = float(loss(jnp.asarray(v)))
    noisy = np.array(v)
    noisy[:, 2] += np.random.default_rng(0).normal(size=36) * 0.1
    rough = float(loss(jnp.asarray(noisy, jnp.float32)))
    assert flat < 1e-4   # interior of a flat sheet is exactly smooth
    assert rough > 10 * flat + 1e-5


def test_normal_consistency():
    v, f = unit_tetra()
    pairs, _ = mesh_ops.find_connected_faces(np.asarray(f))
    assert pairs.shape == (6, 2)
    loss = float(jax.jit(mesh_ops.normal_consistency_loss)(
        v, f, jnp.asarray(pairs, jnp.int32)))
    assert loss > 0  # a tetra has sharp edges


def test_sample_points_on_surface():
    v, f = unit_tetra()
    pts = jax.jit(lambda k: mesh_ops.sample_points_on_mesh(k, v, f, 256))(
        jax.random.PRNGKey(0))
    assert pts.shape == (256, 3)
    d = np.abs(np.asarray(mesh_sdf(pts, v, f)))
    assert d.max() < 1e-3  # samples lie on the surface


def test_mesh_sdf_sign_and_distance():
    v, f = unit_tetra()
    q = jnp.array([[0.2, 0.2, 0.2],     # inside
                   [2.0, 2.0, 2.0],     # outside
                   [0.1, 0.1, -0.5]])   # outside below
    d = np.asarray(jax.jit(lambda q: mesh_sdf(q, v, f, k=4))(q))
    assert d[0] < 0 and d[1] > 0 and d[2] > 0
    np.testing.assert_allclose(d[2], 0.5, atol=0.02)


def test_connected_components():
    f = np.array([[0, 1, 2], [2, 1, 3], [4, 5, 6]])
    labels = mesh_ops.connected_components(f, 7)
    assert labels[0] == labels[3]
    assert labels[0] != labels[4]


def test_image_losses_and_srgb():
    x = jnp.linspace(0, 1, 16).reshape(1, 4, 4, 1).repeat(3, -1)
    np.testing.assert_allclose(
        np.asarray(srgb_to_rgb(rgb_to_srgb(x))), np.asarray(x), atol=1e-5)
    assert float(image_loss(x, x, "l1", "log_srgb")) == 0.0
    for name in ("logl1", "logl2", "mse", "smape", "relmse"):
        fn = make_loss_fn(name)
        assert float(fn(x, x * 0.9)) > 0


def test_ssim_identity():
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3))
    s = float(jax.jit(ssim)(img, img))
    assert abs(s - 1.0) < 1e-4
    s2 = float(jax.jit(ssim)(img, 1.0 - img))
    assert s2 < 0.5


def test_face_normals_gradient_matches_plain_indexing():
    """face_normals now gathers corners via gather_rows (custom VJP ->
    sorted-COO backward); its vertex gradient must equal the plain-indexing
    formulation exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from d3human_tpu.ops.mesh_ops import face_normals, safe_normalize

    key = jax.random.PRNGKey(11)
    v = jax.random.normal(key, (40, 3))
    f = jax.random.randint(jax.random.fold_in(key, 1), (25, 3), 0, 40)
    # degenerate faces (repeated vertex -> zero-area cross product) have
    # ill-conditioned normalize gradients where fusion-order rounding
    # dominates; real valid faces are non-degenerate (padded faces are
    # masked by face_valid before any normal is consumed)
    f = np.asarray(f)
    f = jnp.asarray(f[[len(set(r)) == 3 for r in f.tolist()]])

    def loss_new(v):
        return jnp.sum(jnp.sin(face_normals(v, f)))

    def loss_ref(v):
        v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        n = safe_normalize(jnp.cross(v1 - v0, v2 - v0))
        return jnp.sum(jnp.sin(n))

    g_new = jax.grad(loss_new)(v)
    g_ref = jax.grad(loss_ref)(v)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_gather_rows_pallas_backward_interpret_matches_xla():
    """The TPU production backward of gather_rows is the Pallas sorted-COO
    scatter (use_pallas_bwd=True); the CPU suite otherwise only exercises
    the XLA fallback (ADVICE r4). 'interpret' runs the actual Pallas kernel
    in interpret mode so its gradient is covered on CPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from d3human_tpu.ops.scatter import gather_rows

    key = jax.random.PRNGKey(3)
    table = jax.random.normal(key, (67, 5))
    # duplicate + out-of-order indices exercise accumulation ordering
    idx = jax.random.randint(jax.random.fold_in(key, 1), (31, 3), 0, 67)

    def loss(t, mode):
        return jnp.sum(jnp.cos(gather_rows(t, idx, mode)) * 0.5)

    g_xla = jax.grad(lambda t: loss(t, False))(table)
    g_pallas = jax.grad(lambda t: loss(t, "interpret"))(table)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-6, atol=1e-6)
