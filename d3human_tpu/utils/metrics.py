"""Evaluation metrics: Chamfer distance + PSNR.

The reference reports Chamfer/PSNR in the paper but ships only a
``mse_to_psnr`` helper (/root/reference/render/util.py:122, SURVEY §6).
These are the parity-run metrics (BASELINE.md measurement protocol).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.ops.knn import knn
from d3human_tpu.ops.image_loss import mse_to_psnr  # noqa: F401 (re-export)


def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray,
                     block: int = 4096) -> jnp.ndarray:
    """Symmetric Chamfer-L2 between point sets [Na,3], [Nb,3] (mean of
    squared nearest-neighbor distances, both directions)."""
    d_ab, _ = knn(a, b, k=1, block=block)
    d_ba, _ = knn(b, a, k=1, block=block)
    return jnp.mean(d_ab[:, 0]) + jnp.mean(d_ba[:, 0])


def mesh_chamfer(verts_a, faces_a, verts_b, faces_b, n_samples: int = 30000,
                 key=None) -> float:
    """Chamfer between area-weighted surface samples of two meshes."""
    from d3human_tpu.ops.mesh_ops import sample_points_on_mesh

    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    pa = sample_points_on_mesh(k1, jnp.asarray(verts_a),
                               jnp.asarray(faces_a, jnp.int32), n_samples)
    pb = sample_points_on_mesh(k2, jnp.asarray(verts_b),
                               jnp.asarray(faces_b, jnp.int32), n_samples)
    return float(jax.jit(chamfer_distance)(pa, pb))


def psnr(img: jnp.ndarray, ref: jnp.ndarray,
         mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """PSNR over [0,1] images; optional mask restricts the region."""
    err = (img - ref) ** 2
    if mask is not None:
        mse = jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask) * img.shape[-1],
                                                1.0)
    else:
        mse = jnp.mean(err)
    return mse_to_psnr(mse)


def iou(mask_a: jnp.ndarray, mask_b: jnp.ndarray,
        thresh: float = 0.5) -> jnp.ndarray:
    a = mask_a > thresh
    b = mask_b > thresh
    inter = jnp.sum(a & b)
    union = jnp.maximum(jnp.sum(a | b), 1)
    return inter / union
