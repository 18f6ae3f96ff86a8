"""Linear blend skinning math in JAX.

TPU-native reimplementation of the standard SMPL/SMPL-X LBS pipeline
(/root/reference/deform/smplx_exavatar/lbs.py:156-417): shape blendshapes ->
joint regression (+ joint/locator offsets) -> pose blendshapes -> kinematic
chain rigid transforms -> skinning. The kinematic chain uses a topologically
sorted unroll (55 joints -> 55 static 4x4 composes; XLA fuses these into a
handful of kernels), the skinning T = W @ A is a single MXU matmul.

Returns (verts, joints, A) like the ExAvatar fork (A = per-joint 4x4
canonical->posed transforms, needed by the inverse-LBS deformer).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def batch_rodrigues(rot_vecs: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3] (Rodrigues)."""
    angle = jnp.linalg.norm(rot_vecs + epsilon, axis=-1, keepdims=True)
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([
        zeros, -rz, ry,
        rz, zeros, -rx,
        -ry, rx, zeros,
    ], axis=-1).reshape(rot_vecs.shape[:-1] + (3, 3))
    ident = jnp.eye(3, dtype=rot_vecs.dtype)
    return ident + sin * K + (1.0 - cos) * (K @ K)


def transform_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """R [..., 3, 3], t [..., 3] -> homogeneous [..., 4, 4]."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def batch_rigid_transform(
    rot_mats: jnp.ndarray,   # [B, J, 3, 3]
    joints: jnp.ndarray,     # [B, J, 3]
    parents: Tuple[int, ...],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kinematic chain forward transforms.

    parents must be a static python tuple (trace-time unroll; J<=55 so the
    unrolled chain is tiny and XLA schedules it well).
    Returns (posed_joints [B,J,3], rel_transforms [B,J,4,4]).
    """
    parents = tuple(int(p) for p in parents)
    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]),
         joints[:, jnp.asarray(parents[1:])]], axis=1)
    transforms_mat = transform_mat(rot_mats, rel_joints)  # [B, J, 4, 4]

    chain = [transforms_mat[:, 0]]
    for i in range(1, len(parents)):
        chain.append(chain[parents[i]] @ transforms_mat[:, i])
    transforms = jnp.stack(chain, axis=1)                 # [B, J, 4, 4]

    posed_joints = transforms[:, :, :3, 3]
    # Remove the rest-pose joint location from the translation so that A maps
    # rest-pose points: A = T - [0 | T @ joints_homo] (ref lbs.py:412-415).
    joints_homo = jnp.concatenate(
        [joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    correction = jnp.einsum("bjrc,bjc->bjr", transforms, joints_homo)
    rel = transforms.at[:, :, :, 3].add(-correction)
    return posed_joints, rel


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """J_regressor [J, V] x vertices [B, V, 3] -> joints [B, J, 3]."""
    return jnp.einsum("bvk,jv->bjk", vertices, J_regressor)


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    """betas [B, L] x shape_disps [V, 3, L] -> [B, V, 3]."""
    return jnp.einsum("bl,vkl->bvk", betas, shape_disps)


def lbs(
    betas: jnp.ndarray,          # [B, n_betas(+n_expr)]
    pose: jnp.ndarray,           # [B, J*3] axis-angle
    v_template: jnp.ndarray,     # [B, V, 3] (or [V, 3])
    shapedirs: jnp.ndarray,      # [V, 3, L]
    posedirs: jnp.ndarray,       # [(J-1)*9, V*3]
    J_regressor: jnp.ndarray,    # [J, V]
    parents: Tuple[int, ...],
    lbs_weights: jnp.ndarray,    # [V, J]
    joint_offset: Optional[jnp.ndarray] = None,   # [B, J, 3]
    locator_offset: Optional[jnp.ndarray] = None, # [B, J, 3]
    pose2rot: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full LBS (ref lbs.py:156-264). Returns (verts, posed_joints, A)."""
    B = max(betas.shape[0], pose.shape[0])
    if v_template.ndim == 2:
        v_template = v_template[None]
    v_shaped = v_template + blend_shapes(betas, shapedirs)
    J = vertices2joints(J_regressor, v_shaped)
    if joint_offset is not None:
        J = J + joint_offset
    J_lo = J + locator_offset if locator_offset is not None else None

    n_joints = J_regressor.shape[0]
    ident = jnp.eye(3, dtype=v_shaped.dtype)
    if pose2rot:
        rot_mats = batch_rodrigues(pose.reshape(B, -1, 3))
    else:
        rot_mats = pose.reshape(B, -1, 3, 3)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    # Locator offsets move joints used for the chain but not skinning
    # (ref lbs.py:244-247: the chain is re-run with J_lo when present).
    chain_joints = J_lo if J_lo is not None else J
    J_transformed, A = batch_rigid_transform(rot_mats, chain_joints, parents)

    # Skinning: per-vertex blended transforms via one MXU matmul.
    T = jnp.einsum("vj,bjrc->bvrc", lbs_weights, A)
    v_homo = jnp.concatenate(
        [v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = jnp.einsum("bvrc,bvc->bvr", T, v_homo)[..., :3]
    return verts, J_transformed, A
