"""SMPL-X articulated deformer.

TPU-native redesign of /root/reference/deform/smplx_exavatar_deformer.py:21-487:
  * ``initialize``          — canonical A-pose template (slight leg spread,
                              ref deformer.py:178-180) + its joint transforms
                              ``init_A``.
  * ``interpolate_weights`` — inverse-distance KNN transfer of skinning
                              weights from template vertices to query points
                              (ref deformer.py:363-383), on the MXU-blocked
                              KNN op.
  * ``apply_lbs_inverse``   — per-point blended 4x4, optionally inverted
                              (ref deformer.py:385-421); the 4x4 inverse is
                              a batched closed-form solve in XLA.
  * ``lbs_forward``         — canonicalize w.r.t. init_A, then re-pose with
                              the frame's A and translation
                              (ref deformer.py:434-486).

Everything below is jit-traceable; the frame index selects per-frame SMPL-X
parameters with a gather so the whole training step stays one XLA program.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.models.smplx.model import SMPLXModel
from d3human_tpu.ops.knn import knn


@dataclasses.dataclass(frozen=True)
class CanonicalState:
    vs_template: jnp.ndarray   # [1, V, 3] canonical A-pose verts
    init_A: jnp.ndarray        # [1, J, 4, 4]


jax.tree_util.register_pytree_node(
    CanonicalState,
    lambda c: ((c.vs_template, c.init_A), None),
    lambda aux, ch: CanonicalState(*ch),
)


class SMPLXDeformer:
    def __init__(self, model: SMPLXModel, k: int = 1):
        self.model = model
        self.k = k

    def initialize(self, betas: jnp.ndarray) -> CanonicalState:
        """Build the canonical template: zero pose except a +-pi/36 hip
        spread (ref deformer.py:178-180)."""

        @jax.jit
        def build(betas):
            B = betas.shape[0]
            body_pose = jnp.zeros((B, 63), betas.dtype)
            body_pose = body_pose.at[:, 2].set(math.pi / 36)
            body_pose = body_pose.at[:, 5].set(-math.pi / 36)
            verts, _, A = self.model.forward(
                betas=betas,
                root_pose=jnp.zeros((B, 3), betas.dtype),
                body_pose=body_pose,
            )
            return verts, A

        verts, A = build(betas)
        return CanonicalState(vs_template=verts, init_A=A)

    def interpolate_weights(self, canon: CanonicalState, pts: jnp.ndarray) -> jnp.ndarray:
        """pts [P, 3] -> blended skinning weights [P, J].

        K=1 in the reference => nearest template vertex's weights; general K
        uses inverse-distance blending (ref deformer.py:366-381).
        """
        sq, idx = knn(pts, canon.vs_template[0], k=self.k)
        w_dist = 1.0 / (jnp.sqrt(sq + 1e-9) + 1e-9)
        w_dist = w_dist / jnp.sum(w_dist, axis=1, keepdims=True)
        w_nbrs = self.model.lbs_weights[idx]            # [P, K, J]
        return jnp.sum(w_nbrs * w_dist[..., None], axis=1)

    @staticmethod
    def blend_transforms(A: jnp.ndarray, w_pts: jnp.ndarray) -> jnp.ndarray:
        """A [1,J,4,4], w_pts [P,J] -> per-point blended M_p [P,4,4]."""
        return jnp.einsum("pj,jrc->prc", w_pts, A[0])

    @staticmethod
    def _affine_inverse(M: jnp.ndarray) -> jnp.ndarray:
        """Closed-form inverse of affine [..., 4, 4] transforms.

        Blended LBS matrices are affine (last row 0 0 0 1 is preserved by
        convex combination), so inv([R t; 0 1]) = [R^-1, -R^-1 t; 0 1] with
        R^-1 by adjugate — pure vectorized multiply-adds instead of the
        batched LU factorization jnp.linalg.inv would lower to (slow on TPU).
        """
        R = M[..., :3, :3]
        t = M[..., :3, 3]
        c0 = jnp.cross(R[..., :, 1], R[..., :, 2], axis=-1)
        c1 = jnp.cross(R[..., :, 2], R[..., :, 0], axis=-1)
        c2 = jnp.cross(R[..., :, 0], R[..., :, 1], axis=-1)
        det = jnp.sum(R[..., :, 0] * c0, axis=-1, keepdims=True)
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        Rinv = jnp.stack([c0, c1, c2], axis=-2) / det[..., None]
        tinv = -jnp.einsum("...rc,...c->...r", Rinv, t)
        top = jnp.concatenate([Rinv, tinv[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], M.dtype),
            top.shape[:-2] + (1, 4))
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def apply_lbs_inverse(pts: jnp.ndarray, A: jnp.ndarray, w_pts: jnp.ndarray,
                          inverse: bool = True) -> jnp.ndarray:
        """Map pts [P,3] by (sum_j w_j A_j)^{+-1} (ref deformer.py:385-421)."""
        M = SMPLXDeformer.blend_transforms(A, w_pts)
        if inverse:
            M = SMPLXDeformer._affine_inverse(M)
        pts_h = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=-1)
        out = jnp.einsum("prc,pc->pr", M, pts_h)
        return out[:, :3]

    def lbs_forward(
        self,
        canon: CanonicalState,
        pts: jnp.ndarray,                  # [P, 3] points near the template pose
        smplx_params: Dict[str, jnp.ndarray],
        frame_idx: jnp.ndarray,            # scalar int
        w_pts: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Canonicalize pts w.r.t. init_A, re-pose with frame transforms,
        add frame translation (ref deformer.py:434-486).

        smplx_params holds the full per-frame stacks:
          shape [1,nb], face/joint/locator_offset, trans [N,3],
          root_pose [N,3], body_pose [N,63], jaw/leye/reye [N,3],
          lhand/rhand [N,45], expr [N,ne].
        """
        def frame(name, d):
            return jax.lax.dynamic_index_in_dim(
                smplx_params[name], frame_idx, axis=0, keepdims=True
            ).reshape(1, d)

        nb = self.model.num_betas
        ne = self.model.num_expr
        trans = frame("trans", 3)
        _, _, A = self.model.forward(
            betas=smplx_params["shape"].reshape(1, -1)[:, :nb],
            root_pose=frame("root_pose", 3),
            body_pose=frame("body_pose", 63),
            jaw_pose=frame("jaw_pose", 3),
            leye_pose=frame("leye_pose", 3),
            reye_pose=frame("reye_pose", 3),
            lhand_pose=frame("lhand_pose", 45),
            rhand_pose=frame("rhand_pose", 45),
            expression=frame("expr", ne),
            transl=trans,
            face_offset=smplx_params.get("face_offset"),
            joint_offset=smplx_params.get("joint_offset"),
            locator_offset=smplx_params.get("locator_offset"),
        )
        if w_pts is None:
            w_pts = self.interpolate_weights(canon, pts)
        pts_canonical = self.apply_lbs_inverse(pts, canon.init_A, w_pts, inverse=True)
        pts_new = self.apply_lbs_inverse(pts_canonical, A, w_pts, inverse=False)
        return pts_new + trans.reshape(1, 3)
