"""Synthetic monocular-human dataset for tests and benchmarks.

The f3c capture (and the licensed SMPL-X npz) cannot ship with the repo, so
this module builds a fully synthetic but structurally identical problem: a
small articulated body model (models/smplx/model.py:synthetic_body_model),
per-frame poses, a camera, and ground-truth RGB / masks / normals rendered
with the framework's own (brute-force oracle) rasterizer. Cloth/body masks
come from a height-based garment labeling of the template — giving the same
target dict schema as the real loader (data/dataset.py), so every stage
driver and loss tick runs unchanged.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.models.smplx.deformer import SMPLXDeformer
from d3human_tpu.models.smplx.model import SMPLXModel, synthetic_body_model
from d3human_tpu.ops import mesh_ops
from d3human_tpu.ops.rasterizer import (
    barycentrics, interpolate, interpolate_face_attr, rasterize_bruteforce,
    xfm_points,
)
from d3human_tpu.render.camera import look_at, perspective


@dataclasses.dataclass
class SyntheticScene:
    model: SMPLXModel
    deformer: SMPLXDeformer
    canon: object
    pose_params: Dict[str, jnp.ndarray]   # per-frame stacks
    mvp: jnp.ndarray                      # [4, 4]
    mv: jnp.ndarray
    campos: jnp.ndarray
    resolution: Tuple[int, int]
    n_frames: int
    garment_faces: np.ndarray             # [F] 0 body / 1 cloth

    def frame_target(self, frame_idx: int, key=None) -> Dict[str, jnp.ndarray]:
        """Render GT buffers for one frame (all_img/cloth_img/body_img with
        alpha, all_normal, camera) in the schema the loss ticks consume.
        Jitted + cached (eager dispatch is pathologically slow on 1-core
        hosts)."""
        # cycle frames like the reference (dataset_split.py:207
        # ``key_frame[itr % n_images]``) — callers pass the raw iteration
        # counter; without the mod, dynamic_slice CLAMPS to the last frame
        # and every iter past n_frames trains one fixed view (the occluded
        # volume is then unconstrained — the r3 init n_cross explosion).
        frame_idx = int(frame_idx) % self.n_frames
        if not hasattr(self, "_jit_target"):
            self._jit_target = jax.jit(self._frame_target_impl)
        out = dict(self._jit_target(jnp.asarray(frame_idx, jnp.int32)))
        out["frame_idx"] = jnp.asarray(frame_idx, jnp.int32)
        return out

    def _frame_target_impl(self, frame_idx) -> Dict[str, jnp.ndarray]:
        pose = self.pose_params
        sl = lambda name: jax.lax.dynamic_slice_in_dim(
            pose[name], frame_idx, 1, 0)
        verts, _, _ = self.model.forward(
            betas=pose["shape"],
            root_pose=sl("root_pose"),
            body_pose=sl("body_pose"),
            transl=sl("trans"),
        )
        v = verts[0]
        faces = jnp.asarray(self.model.faces, jnp.int32)
        fv = jnp.ones((faces.shape[0],), bool)
        v_clip = xfm_points(v, self.mvp)
        rast = rasterize_bruteforce(v_clip, faces, fv, self.resolution)
        bary, cover = barycentrics(v_clip, faces, rast, self.resolution)
        alpha = cover[..., None].astype(jnp.float32)

        fn = mesh_ops.face_normals(v, faces)
        normal = interpolate_face_attr(fn, rast)
        labels = interpolate_face_attr(
            jnp.asarray(self.garment_faces, jnp.float32)[:, None], rast)

        # procedural GT albedo: position-keyed color (smooth, learnable)
        pos = interpolate(v, bary, faces, rast)
        rgb = 0.5 + 0.4 * jnp.sin(pos * 7.0)
        rgb = rgb * alpha

        cloth_a = labels * alpha
        body_a = (1.0 - labels) * alpha
        # reference convention: normals y/z negated before save; targets store
        # them "as captured", loss re-negates renders (ref hmsdf.py:895-897)
        gt_normal = normal * jnp.asarray([1.0, -1.0, -1.0]) * alpha

        return {
            "frame_idx": jnp.asarray(frame_idx, jnp.int32),
            "mvp": self.mvp,
            "mv": self.mv,
            "campos": self.campos,
            "all_img": jnp.concatenate([rgb, alpha], axis=-1),
            "cloth_img": jnp.concatenate([rgb * cloth_a, cloth_a], axis=-1),
            "body_img": jnp.concatenate([rgb * body_a, body_a], axis=-1),
            "all_normal": gt_normal,
            "cloth_normal": gt_normal * cloth_a,
            "body_normal": gt_normal * body_a,
            "background": jnp.zeros((*self.resolution, 3)),
        }


class CachedTargets:
    """On-device fp16 cache of the synthetic GT buffers (PERF.md lever #6).

    ``SyntheticScene.frame_target`` re-renders the GT body with the
    brute-force oracle rasterizer every call (~0.1 s at 1080² — chosen over
    streaming ~56 MB/frame through the axon tunnel per iteration). For a
    fixed turntable the GT is static, so cache the *compact generators* of
    every target buffer once — rgb, alpha, garment label, normal: 8 fp16
    channels, ~19 MB/frame at 1080², 1.2 GiB for 64 frames — and
    reconstruct the full target dict with a few elementwise ops per step.
    Especially effective in the seq stage, where the reference optimizes the
    SAME frame for 300-1000 consecutive iterations (ref train.py:1349-1352).

    fp16 quantization of 8-bit-ish GT images/unit normals is far below the
    loss noise floor, but it does move golden values — the cache is OFF by
    default (``stages.synthetic_target_cache``) and A/B'd before any flip.
    """

    def __init__(self, scene: SyntheticScene):
        self.scene = scene
        self.n_frames = scene.n_frames
        pack = jax.jit(self._pack_frame)
        # one host loop at construction (n_frames oracle renders, once per
        # run instead of once per iteration)
        self._cache = jnp.stack(
            [pack(jnp.asarray(i, jnp.int32)) for i in range(scene.n_frames)])
        self._reconstruct = jax.jit(self._reconstruct_impl)

    def _pack_frame(self, frame_idx) -> jnp.ndarray:
        t = self.scene._frame_target_impl(frame_idx)
        rgb = t["all_img"][..., :3]
        alpha = t["all_img"][..., 3:4]
        # cloth_img alpha channel = labels * alpha; recover labels where
        # covered (alpha is binary for the oracle raster)
        labels = jnp.where(alpha > 0, t["cloth_img"][..., 3:4]
                           / jnp.maximum(alpha, 1e-8), 0.0)
        return jnp.concatenate(
            [rgb, alpha, labels, t["all_normal"]], -1).astype(jnp.float16)

    def _reconstruct_impl(self, packed, frame_idx) -> Dict[str, jnp.ndarray]:
        p = packed.astype(jnp.float32)
        rgb, alpha, labels, normal = p[..., :3], p[..., 3:4], p[..., 4:5], \
            p[..., 5:8]
        cloth_a = labels * alpha
        body_a = (1.0 - labels) * alpha
        s = self.scene
        return {
            "frame_idx": frame_idx,
            "mvp": s.mvp, "mv": s.mv, "campos": s.campos,
            "all_img": jnp.concatenate([rgb, alpha], -1),
            "cloth_img": jnp.concatenate([rgb * cloth_a, cloth_a], -1),
            "body_img": jnp.concatenate([rgb * body_a, body_a], -1),
            "all_normal": normal,
            "cloth_normal": normal * cloth_a,
            "body_normal": normal * body_a,
            "background": jnp.zeros((*s.resolution, 3)),
        }

    def frame_target(self, frame_idx: int, key=None) -> Dict[str, jnp.ndarray]:
        frame_idx = int(frame_idx) % self.n_frames
        i = jnp.asarray(frame_idx, jnp.int32)
        return dict(self._reconstruct(self._cache[frame_idx], i))


def make_scene(resolution=(128, 128), n_frames: int = 4,
               seed: int = 0) -> SyntheticScene:
    model = synthetic_body_model(seed=seed)
    deformer = SMPLXDeformer(model, k=1)
    betas = jnp.zeros((1, model.num_betas))
    canon = deformer.initialize(betas)

    rng = np.random.default_rng(seed)
    body_pose = np.zeros((n_frames, 63), np.float32)
    body_pose[:, :6] = rng.normal(size=(n_frames, 6)) * 0.1
    # full turntable rotation, like the reference's monocular self-rotation
    # captures (single cameras.npz, person turns through the sequence):
    # every side of the person is observed across the frame cycle, so the
    # mask loss constrains the whole volume — a fixed 0.4 rad arc left ~80%
    # of the surface unseen and the occluded field free to grow noise.
    root_pose = np.zeros((n_frames, 3), np.float32)
    root_pose[:, 1] = np.linspace(0, 2 * np.pi * (n_frames - 1) / n_frames,
                                  n_frames)
    trans = np.zeros((n_frames, 3), np.float32)
    trans[:, 0] = np.linspace(-0.03, 0.03, n_frames)

    pose_params = {
        "shape": betas,
        "trans": jnp.asarray(trans),
        "root_pose": jnp.asarray(root_pose),
        "body_pose": jnp.asarray(body_pose),
        "jaw_pose": jnp.zeros((n_frames, 3)),
        "leye_pose": jnp.zeros((n_frames, 3)),
        "reye_pose": jnp.zeros((n_frames, 3)),
        "lhand_pose": jnp.zeros((n_frames, 45)),
        "rhand_pose": jnp.zeros((n_frames, 45)),
        "expr": jnp.zeros((n_frames, model.num_expr)),
    }

    mv = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0))
    proj = perspective(fovy=0.9, aspect=resolution[1] / resolution[0])
    mvp = jnp.asarray(proj @ mv)
    campos = jnp.asarray(np.linalg.inv(mv)[:3, 3])

    # garment labeling: faces whose centroid is in the torso band
    fverts = np.asarray(model.v_template)[model.faces]
    cy = fverts[:, :, 1].mean(axis=1)
    garment = ((cy > -0.1) & (cy < 0.35)).astype(np.int64)

    return SyntheticScene(
        model=model, deformer=deformer, canon=canon,
        pose_params=pose_params, mvp=mvp, mv=jnp.asarray(mv), campos=campos,
        resolution=tuple(resolution), n_frames=n_frames,
        garment_faces=garment,
    )
