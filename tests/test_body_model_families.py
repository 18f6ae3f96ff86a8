"""Body-model factory tests (ref body_models.py:2380-2442 ``create``):
SMPL / SMPL+H / MANO / FLAME npz files all load into the one generic LBS
struct and run the same skinning path. Files are synthesized in the
official npz layouts (no licensed data in the image)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from d3human_tpu.models.smplx.model import create

# family -> (V, J, shape_cols, expr_cols_at_300)
FAMILIES = {
    "smpl": (32, 24, 10, 0),
    "smplh": (32, 52, 16, 0),
    "smplx": (32, 55, 300, 50),
    "mano": (16, 16, 10, 0),
    "flame": (20, 5, 300, 100),
}


def _write_family_npz(path, V, J, n_shape, n_expr, seed=0):
    rng = np.random.RandomState(seed)
    cols = n_shape + n_expr
    parents = np.asarray([-1] + [max(0, j - 1) for j in range(1, J)])
    kintree = np.stack([parents, np.arange(J)], 0)
    # uint32(-1) root sentinel, as in the official files
    kintree_official = kintree.astype(np.int64).copy()
    kintree_official[0, 0] = 2 ** 32 - 1
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(
        path,
        v_template=rng.randn(V, 3).astype(np.float32) * 0.1,
        shapedirs=rng.randn(V, 3, cols).astype(np.float32) * 0.01,
        posedirs=rng.randn(V, 3, (J - 1) * 9).astype(np.float32) * 1e-3,
        J_regressor=np.eye(J, V, dtype=np.float32),
        weights=np.eye(V, J, dtype=np.float32)[:, :J] * 0
        + np.tile(np.eye(J, dtype=np.float32), (V // J + 1, 1))[:V],
        f=rng.randint(0, V, (40, 3)).astype(np.int64),
        kintree_table=kintree_official,
    )


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_create_and_forward(family, tmp_path):
    V, J, n_shape, n_expr = FAMILIES[family]
    gender = "right" if family == "mano" else "neutral"
    fname = f"{family.upper()}_{gender.upper()}.npz"
    _write_family_npz(str(tmp_path / family / fname), V, J, n_shape, n_expr)

    model = create(str(tmp_path), family, gender)
    assert model.num_verts == V
    assert model.num_joints == J
    assert model.parents[0] == -1

    betas = jnp.zeros((1, model.num_betas))
    # pose vector assembled [root, body, ...] and sliced to J*3 internally
    body_pose = jnp.full((1, max(J * 3 - 3, 3)), 0.1)
    v, j, A = model.forward(betas=betas,
                            root_pose=jnp.zeros((1, 3)),
                            body_pose=body_pose,
                            transl=jnp.asarray([[0.0, 0.5, 0.0]]))
    assert v.shape == (1, V, 3)
    assert j.shape[1] == J
    assert A.shape == (1, J, 4, 4)
    assert bool(jnp.all(jnp.isfinite(v)))
    # transl reaches the output
    v0, _, _ = model.forward(betas=betas, root_pose=jnp.zeros((1, 3)),
                             body_pose=body_pose)
    np.testing.assert_allclose(np.asarray(v - v0),
                               np.broadcast_to([0.0, 0.5, 0.0], (1, V, 3)),
                               atol=1e-6)


def test_create_flat_layout_and_errors(tmp_path):
    V, J, n_shape, n_expr = FAMILIES["smpl"]
    _write_family_npz(str(tmp_path / "SMPL_NEUTRAL.npz"), V, J, n_shape,
                      n_expr)
    model = create(str(tmp_path), "smpl", "neutral")   # flat fallback
    assert model.num_verts == V
    with pytest.raises(ValueError):
        create(str(tmp_path), "nope")
    with pytest.raises(FileNotFoundError):
        create(str(tmp_path), "flame", "neutral")
