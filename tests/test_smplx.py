import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.models.smplx import (
    SMPLXDeformer, batch_rigid_transform, batch_rodrigues, synthetic_body_model,
)
from d3human_tpu.ops.knn import knn


def test_rodrigues_identity_and_known_rotation():
    R = batch_rodrigues(jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(R), np.tile(np.eye(3), (2, 1, 1)),
                               atol=1e-5)
    # 90 deg about z
    R = batch_rodrigues(jnp.array([[0.0, 0.0, np.pi / 2]]))
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(np.asarray(R[0]), expect, atol=1e-5)


def test_rigid_transform_chain_translation():
    # 3-joint chain along x; rotating root 90deg about z swings children.
    parents = (-1, 0, 1)
    joints = jnp.array([[[0, 0, 0], [1, 0, 0], [2, 0, 0]]], jnp.float32)
    rots = batch_rodrigues(
        jnp.array([[0, 0, np.pi / 2], [0, 0, 0], [0, 0, 0]], jnp.float32)
    )[None]
    posed, A = batch_rigid_transform(rots, joints, parents)
    np.testing.assert_allclose(np.asarray(posed[0, 1]), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(posed[0, 2]), [0, 2, 0], atol=1e-5)
    # A applied to a rest-pose point reproduces the posed point
    p = jnp.array([2.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(A[0, 2] @ p)[:3], [0, 2, 0], atol=1e-5)


def test_model_forward_shapes_and_translation():
    model = synthetic_body_model()
    B = 2
    betas = jnp.zeros((B, model.num_betas))
    v0, j0, A0 = model.forward(
        betas, root_pose=jnp.zeros((B, 3)), body_pose=jnp.zeros((B, 63)))
    assert v0.shape == (B, model.num_verts, 3)
    assert A0.shape == (B, model.num_joints, 4, 4)
    t = jnp.array([[1.0, 2.0, 3.0]] * B)
    v1, j1, _ = model.forward(
        betas, root_pose=jnp.zeros((B, 3)), body_pose=jnp.zeros((B, 63)),
        transl=t)
    np.testing.assert_allclose(np.asarray(v1 - v0),
                               np.broadcast_to([1, 2, 3], v0.shape), atol=1e-5)


def test_zero_pose_keeps_template():
    model = synthetic_body_model()
    betas = jnp.zeros((1, model.num_betas))
    v, _, A = model.forward(
        betas, root_pose=jnp.zeros((1, 3)), body_pose=jnp.zeros((1, 63)))
    np.testing.assert_allclose(np.asarray(v[0]),
                               np.asarray(model.v_template), atol=1e-4)
    # A at rest pose = identity transforms
    np.testing.assert_allclose(
        np.asarray(A[0]), np.tile(np.eye(4), (model.num_joints, 1, 1)),
        atol=1e-4)


def test_knn_matches_bruteforce():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (50, 3))
    r = jax.random.normal(jax.random.PRNGKey(1), (201, 3))
    sq, idx = knn(q, r, k=3, block=64)
    d_full = np.linalg.norm(
        np.asarray(q)[:, None] - np.asarray(r)[None], axis=-1) ** 2
    expect_idx = np.argsort(d_full, axis=1)[:, :3]
    expect_d = np.take_along_axis(d_full, expect_idx, axis=1)
    np.testing.assert_allclose(np.sort(np.asarray(sq), axis=1),
                               np.sort(expect_d, axis=1), rtol=1e-4, atol=1e-5)
    assert set(map(tuple, np.sort(np.asarray(idx), 1))) == \
        set(map(tuple, np.sort(expect_idx, 1)))


def test_knn_grad_flows():
    q = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
    r = jax.random.normal(jax.random.PRNGKey(1), (30, 3))

    def loss(q):
        sq, _ = knn(q, r, k=1)
        return jnp.sum(sq)

    g = jax.grad(loss)(q)
    assert float(jnp.abs(g).sum()) > 0


def test_deformer_roundtrip_at_canonical_pose():
    """lbs_forward with the canonical pose must reproduce the input points."""
    model = synthetic_body_model()
    deformer = SMPLXDeformer(model, k=1)
    betas = jnp.zeros((1, model.num_betas))
    canon = deformer.initialize(betas)

    import math
    body_pose = jnp.zeros((1, 63)).at[0, 2].set(math.pi / 36).at[0, 5].set(
        -math.pi / 36)
    params = {
        "shape": betas,
        "trans": jnp.zeros((3, 3)),
        "root_pose": jnp.zeros((3, 3)),
        "body_pose": jnp.tile(body_pose, (3, 1)),
        "jaw_pose": jnp.zeros((3, 3)),
        "leye_pose": jnp.zeros((3, 3)),
        "reye_pose": jnp.zeros((3, 3)),
        "lhand_pose": jnp.zeros((3, 45)),
        "rhand_pose": jnp.zeros((3, 45)),
        "expr": jnp.zeros((3, model.num_expr)),
    }
    pts = canon.vs_template[0, ::7]
    out = deformer.lbs_forward(canon, pts, params, jnp.int32(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=2e-3)


def test_deformer_follows_pose_change():
    model = synthetic_body_model()
    deformer = SMPLXDeformer(model, k=1)
    betas = jnp.zeros((1, model.num_betas))
    canon = deformer.initialize(betas)
    pose = jax.random.normal(jax.random.PRNGKey(2), (1, 63)) * 0.2
    params = {
        "shape": betas,
        "trans": jnp.array([[0.1, 0.0, -0.2]]),
        "root_pose": jnp.array([[0.0, 0.4, 0.0]]),
        "body_pose": pose,
        "jaw_pose": jnp.zeros((1, 3)),
        "leye_pose": jnp.zeros((1, 3)),
        "reye_pose": jnp.zeros((1, 3)),
        "lhand_pose": jnp.zeros((1, 45)),
        "rhand_pose": jnp.zeros((1, 45)),
        "expr": jnp.zeros((1, model.num_expr)),
    }
    pts = canon.vs_template[0]
    out = deformer.lbs_forward(canon, pts, params, jnp.int32(0))
    # Deformed template vertices should approximately match a direct model
    # forward with the same pose (K=1 weight transfer on template verts is
    # near-exact; pose correctives cause small deviations).
    v_direct, _, _ = model.forward(
        betas, root_pose=params["root_pose"], body_pose=pose,
        transl=params["trans"])
    err = np.linalg.norm(np.asarray(out) - np.asarray(v_direct[0]), axis=-1)
    assert np.median(err) < 0.02


def test_lbs_forward_precomputed_weights_match():
    """w_pts precomputed at the query points must reproduce the dynamic KNN
    path exactly (the stages.seq_static_skin_weights lever is an identity
    when the nonrigid delta is zero)."""
    model = synthetic_body_model()
    deformer = SMPLXDeformer(model, k=1)
    betas = jnp.zeros((1, model.num_betas))
    canon = deformer.initialize(betas)
    pose = jax.random.normal(jax.random.PRNGKey(5), (1, 63)) * 0.15
    params = {
        "shape": betas,
        "trans": jnp.array([[0.05, -0.1, 0.2]]),
        "root_pose": jnp.array([[0.0, 0.3, 0.1]]),
        "body_pose": pose,
        "jaw_pose": jnp.zeros((1, 3)),
        "leye_pose": jnp.zeros((1, 3)),
        "reye_pose": jnp.zeros((1, 3)),
        "lhand_pose": jnp.zeros((1, 45)),
        "rhand_pose": jnp.zeros((1, 45)),
        "expr": jnp.zeros((1, model.num_expr)),
    }
    pts = canon.vs_template[0, ::5] + 0.01
    dyn = deformer.lbs_forward(canon, pts, params, jnp.int32(0))
    w = deformer.interpolate_weights(canon, pts)
    static = deformer.lbs_forward(canon, pts, params, jnp.int32(0), w_pts=w)
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(static))
