"""SMPL-X body model in JAX.

Replaces the torch smplx fork (/root/reference/deform/smplx_exavatar/body_models.py:894-1317)
with a functional model: static arrays (template, blendshapes, regressor,
skinning weights, kinematic tree) live in a pytree; ``forward`` assembles the
full 55-joint pose vector from part poses and runs :func:`lbs`, returning
(vertices, joints, A) — A being the per-joint rest->posed 4x4 transforms the
deformer needs (the ExAvatar fork's extra return).

Model data loads from the official SMPL-X npz when available. Because the
licensed npz cannot ship with the repo, :func:`synthetic_body_model` builds a
structurally identical small model (capsule-limb humanoid) used by tests and
benchmarks; the math path is byte-for-byte the same.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.models.smplx.lbs import lbs

# SMPL-X joint layout (public model topology): 55 joints
NUM_JOINTS = 55
NUM_BODY_JOINTS = 21
NUM_HAND_JOINTS = 15
SMPLX_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    15, 15, 15,                                    # jaw, leye, reye
    20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,  # left hand
    21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,  # right hand
)


@dataclasses.dataclass(frozen=True)
class SMPLXModel:
    """Static model data. All arrays are jnp (device) arrays.

    Registered as a pytree (array leaves; faces/parents/nums are aux) so
    the blendshape/regressor tables travel as jit arguments instead of
    multi-MB HLO constants."""

    v_template: jnp.ndarray      # [V, 3]
    shapedirs: jnp.ndarray       # [V, 3, n_betas + n_expr]
    posedirs: jnp.ndarray        # [(J-1)*9, V*3]
    J_regressor: jnp.ndarray     # [J, V]
    lbs_weights: jnp.ndarray     # [V, J]
    faces: np.ndarray            # [F, 3] int (host)
    parents: Tuple[int, ...] = SMPLX_PARENTS
    num_betas: int = 100
    num_expr: int = 50

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    def forward(
        self,
        betas: jnp.ndarray,          # [B, num_betas]
        root_pose: jnp.ndarray,      # [B, 3]
        body_pose: jnp.ndarray,      # [B, 63]
        jaw_pose: Optional[jnp.ndarray] = None,    # [B, 3]
        leye_pose: Optional[jnp.ndarray] = None,   # [B, 3]
        reye_pose: Optional[jnp.ndarray] = None,   # [B, 3]
        lhand_pose: Optional[jnp.ndarray] = None,  # [B, 45]
        rhand_pose: Optional[jnp.ndarray] = None,  # [B, 45]
        expression: Optional[jnp.ndarray] = None,  # [B, num_expr]
        transl: Optional[jnp.ndarray] = None,      # [B, 3]
        face_offset: Optional[jnp.ndarray] = None,    # [B, V, 3]
        joint_offset: Optional[jnp.ndarray] = None,   # [B, J, 3]
        locator_offset: Optional[jnp.ndarray] = None, # [B, J, 3]
    ):
        """Returns (verts [B,V,3], joints [B,J,3], A [B,J,4,4]).

        Mirrors SMPLX.forward (ref body_models.py:1126-1317): pose vector
        order is [root, body, jaw, leye, reye, lhand, rhand]; expression
        coefficients concatenate onto betas against the combined shapedirs;
        transl is added after skinning and included in A's translation the
        same way the reference adds it via apply_lbs (transl added outside).
        """
        B = betas.shape[0]
        J = self.num_joints
        zeros3 = jnp.zeros((B, 3), betas.dtype)
        zeros45 = jnp.zeros((B, 45), betas.dtype)
        jaw_pose = zeros3 if jaw_pose is None else jaw_pose
        leye_pose = zeros3 if leye_pose is None else leye_pose
        reye_pose = zeros3 if reye_pose is None else reye_pose
        lhand_pose = zeros45 if lhand_pose is None else lhand_pose
        rhand_pose = zeros45 if rhand_pose is None else rhand_pose
        if expression is None:
            expression = jnp.zeros((B, self.num_expr), betas.dtype)

        # Model may be synthetic (fewer joints); slice pose to fit.
        full_pose = jnp.concatenate(
            [root_pose, body_pose, jaw_pose, leye_pose, reye_pose,
             lhand_pose, rhand_pose], axis=1)[:, : J * 3]

        shape_components = jnp.concatenate([betas, expression], axis=-1)
        shape_components = shape_components[:, : self.shapedirs.shape[-1]]

        v_template = self.v_template[None]
        if face_offset is not None:
            v_template = v_template + face_offset

        verts, joints, A = lbs(
            shape_components, full_pose, v_template,
            self.shapedirs, self.posedirs, self.J_regressor,
            self.parents, self.lbs_weights,
            joint_offset=joint_offset, locator_offset=locator_offset,
        )
        if transl is not None:
            verts = verts + transl[:, None, :]
            joints = joints + transl[:, None, :]
        return verts, joints, A


class _StaticArray:
    """Hashable host-array holder for pytree AUX data. Raw numpy arrays in
    aux break jit-cache equality checks ('truth value of an array is
    ambiguous') the first time two distinct model instances meet the same
    jitted function."""

    __slots__ = ("a", "_h")

    def __init__(self, a):
        self.a = np.asarray(a)
        self._h = hash((self.a.shape, self.a.dtype.str, self.a.tobytes()))

    def __eq__(self, other):
        return (isinstance(other, _StaticArray)
                and self.a.shape == other.a.shape
                and np.array_equal(self.a, other.a))

    def __hash__(self):
        return self._h


jax.tree_util.register_pytree_node(
    SMPLXModel,
    lambda m: ((m.v_template, m.shapedirs, m.posedirs, m.J_regressor,
                m.lbs_weights),
               (_StaticArray(m.faces), m.parents, m.num_betas, m.num_expr)),
    lambda aux, ch: SMPLXModel(*ch, faces=aux[0].a, parents=aux[1],
                               num_betas=aux[2], num_expr=aux[3]),
)


def load_smplx_npz(model_path: str, gender: str = "neutral",
                   num_betas: int = 100, num_expr: int = 50) -> SMPLXModel:
    """Load the official SMPL-X npz (SMPLX_{GENDER}.npz layout)."""
    fn = os.path.join(model_path, f"SMPLX_{gender.upper()}.npz")
    data = np.load(fn, allow_pickle=True)
    shapedirs = np.asarray(data["shapedirs"], np.float32)
    # official layout: [:, :, :300] shape, [:, :, 300:] expression
    n_shape = min(num_betas, 300)
    sd = np.concatenate(
        [shapedirs[:, :, :n_shape], shapedirs[:, :, 300:300 + num_expr]], axis=-1
    ) if shapedirs.shape[-1] > 300 else shapedirs[:, :, :n_shape]
    posedirs = np.asarray(data["posedirs"], np.float32)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T if posedirs.ndim == 3 else posedirs
    return SMPLXModel(
        v_template=jnp.asarray(data["v_template"], jnp.float32),
        shapedirs=jnp.asarray(sd, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        J_regressor=jnp.asarray(data["J_regressor"], jnp.float32),
        lbs_weights=jnp.asarray(data["weights"], jnp.float32),
        faces=np.asarray(data["f"], np.int64),
        parents=tuple(int(p) for p in np.asarray(data["kintree_table"])[0])
        if "kintree_table" in data else SMPLX_PARENTS,
        num_betas=n_shape, num_expr=num_expr,
    )


def _load_generic_npz(fn: str, num_betas: int, num_expr: int,
                      expr_offset: int) -> SMPLXModel:
    """Shared npz reader for every MPI body-model family. ``expr_offset``
    is where expression columns start in shapedirs (300 for SMPL-X/FLAME
    padded layouts, 0/absent for SMPL/SMPLH/MANO)."""
    data = np.load(fn, allow_pickle=True)
    shapedirs = np.asarray(data["shapedirs"], np.float32)
    n_cols = shapedirs.shape[-1]
    if expr_offset and n_cols > expr_offset:
        n_shape = min(num_betas, expr_offset)
        sd = np.concatenate(
            [shapedirs[:, :, :n_shape],
             shapedirs[:, :, expr_offset:expr_offset + num_expr]], axis=-1)
        ne = min(num_expr, n_cols - expr_offset)
    else:
        n_shape = min(num_betas, n_cols)
        sd = shapedirs[:, :, :n_shape]
        ne = 0
    posedirs = np.asarray(data["posedirs"], np.float32)
    if posedirs.ndim == 3:
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    parents = tuple(
        int(p) if i else -1
        for i, p in enumerate(np.asarray(data["kintree_table"])[0])
    ) if "kintree_table" in data else SMPLX_PARENTS
    return SMPLXModel(
        v_template=jnp.asarray(data["v_template"], jnp.float32),
        shapedirs=jnp.asarray(sd, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        J_regressor=jnp.asarray(data["J_regressor"], jnp.float32),
        lbs_weights=jnp.asarray(data["weights"], jnp.float32),
        faces=np.asarray(data["f"], np.int64),
        parents=parents,
        num_betas=n_shape, num_expr=ne,
    )


# family -> (filename pattern, default num_betas, num_expr, expr col offset)
_BODY_MODEL_FAMILIES = {
    "smpl": ("SMPL_{G}.npz", 10, 0, 0),
    "smplh": ("SMPLH_{G}.npz", 16, 0, 0),
    "smplx": ("SMPLX_{G}.npz", 100, 50, 300),
    "mano": ("MANO_{G}.npz", 10, 0, 0),       # gender slot = RIGHT / LEFT
    "flame": ("FLAME_{G}.npz", 300, 100, 300),
}


def create(model_path: str, model_type: str = "smplx",
           gender: str = "neutral", num_betas: Optional[int] = None,
           num_expr: Optional[int] = None) -> SMPLXModel:
    """Body-model factory (ref body_models.py:2380-2442 ``create``): loads
    SMPL / SMPL+H / SMPL-X / MANO / FLAME npz files into the one generic
    LBS struct — ``forward`` already slices the assembled pose vector to
    the family's joint count (model.py:102-105), so every family runs the
    same MXU skinning path.

    Looks in <model_path>/<model_type>/ first (the reference's folder
    convention, ref :2427-2430), then <model_path>/ flat. The official
    .pkl releases require chumpy to unpickle and are not supported — use
    the npz releases (the reference's own npz path, ref :1013-1022).
    """
    mt = model_type.lower()
    if mt not in _BODY_MODEL_FAMILIES:
        raise ValueError(f"unknown model_type {model_type!r}; expected one "
                         f"of {sorted(_BODY_MODEL_FAMILIES)}")
    pat, d_betas, d_expr, off = _BODY_MODEL_FAMILIES[mt]
    fname = pat.format(G=gender.upper())
    for cand in (os.path.join(model_path, mt, fname),
                 os.path.join(model_path, fname)):
        if os.path.exists(cand):
            return _load_generic_npz(
                cand, num_betas if num_betas is not None else d_betas,
                num_expr if num_expr is not None else d_expr, off)
    raise FileNotFoundError(
        f"no {fname} under {model_path!r} (tried '{mt}/' and flat)")


def synthetic_body_model(n_theta: int = 24, n_phi: int = 12,
                         num_betas: int = 10, num_expr: int = 4,
                         seed: int = 0) -> SMPLXModel:
    """A small, structurally-complete humanoid body model for tests/bench.

    Geometry: a vertical capsule torso with two arm capsules — enough
    articulation (9 joints along a kinematic tree) to exercise every code
    path (blend shapes, pose correctives, chain transforms, skinning).
    """
    rng = np.random.default_rng(seed)
    # --- torso: capsule along y in [-0.6, 0.6], radius 0.18
    ring_t = np.linspace(-0.6, 0.6, n_theta)
    ang = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    verts = []
    for y in ring_t:
        r = 0.18 * np.sqrt(np.clip(1.0 - (abs(y) / 0.62) ** 4, 0.05, 1.0))
        for a in ang:
            verts.append([r * np.cos(a), y, r * np.sin(a)])
    verts = np.asarray(verts, np.float32)
    V = len(verts)

    # faces: quad strips between rings
    faces = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            faces.append([a, b, c])
            faces.append([b, d, c])
    faces = np.asarray(faces, np.int64)

    # --- joints: pelvis, spine x2, neck, head, shoulders, elbows (9)
    J = 9
    parents = (-1, 0, 1, 2, 3, 2, 5, 2, 7)
    joint_pos = np.asarray([
        [0, -0.45, 0], [0, -0.15, 0], [0, 0.15, 0], [0, 0.40, 0],
        [0, 0.55, 0], [-0.15, 0.35, 0], [-0.3, 0.35, 0],
        [0.15, 0.35, 0], [0.3, 0.35, 0],
    ], np.float32)

    # J_regressor: soft-assign joints to nearest vertices
    d = np.linalg.norm(verts[None, :, :] - joint_pos[:, None, :], axis=-1)
    J_regressor = np.exp(-d / 0.05)
    J_regressor /= J_regressor.sum(axis=1, keepdims=True)

    # skinning weights: softmax over joint distance
    w = np.exp(-(d.T / 0.12) ** 2)
    lbs_weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    shapedirs = (rng.normal(size=(V, 3, num_betas + num_expr)) * 0.01).astype(np.float32)
    posedirs = (rng.normal(size=((J - 1) * 9, V * 3)) * 0.001).astype(np.float32)

    return SMPLXModel(
        v_template=jnp.asarray(verts),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor.astype(np.float32)),
        lbs_weights=jnp.asarray(lbs_weights),
        faces=faces,
        parents=parents,
        num_betas=num_betas,
        num_expr=num_expr,
    )
