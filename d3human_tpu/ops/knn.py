"""K-nearest-neighbor search on TPU.

Replaces the pytorch3d CUDA KNN (/root/reference/third_parties/pytorch3d/cuda/knn.cu,
ops.py:30-121) used for LBS weight transfer (K=1,
ref deform/smplx_exavatar_deformer.py:366) and the cloth-body collision loss
(ref geometry/hmsdf.py:119).

Design: blocked all-pairs squared distances computed as one MXU matmul per
block (|a-b|^2 = |a|^2 + |b|^2 - 2 a.b), with a running top-k merge across
blocks via jax.lax.scan — O(P*M) FLOPs ride the MXU, memory stays
O(P * block). Distances to padded/invalid reference points are masked to
+inf. Gradients flow through the gathered distances exactly like the CUDA
op's hand-written backward (gather is natively differentiable in XLA).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _block_dists(q: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Squared distances [P, B] between q [P,3] and ref [B,3]."""
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    r2 = jnp.sum(ref * ref, axis=-1)
    cross = jnp.dot(q, ref.T, preferred_element_type=jnp.float32)
    return q2 + r2[None, :] - 2.0 * cross


def knn(
    query: jnp.ndarray,               # [P, 3]
    ref: jnp.ndarray,                 # [M, 3]
    k: int = 1,
    ref_valid: Optional[jnp.ndarray] = None,  # [M] bool mask for padded refs
    block: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sq_dists [P, k], idx [P, k]) of the k nearest refs.

    Distances are differentiable w.r.t. both query and ref (recomputed from
    the gathered neighbors, so the backward is a cheap gather too).
    """
    P = query.shape[0]
    M = ref.shape[0]
    block = min(block, M)
    n_blocks = -(-M // block)
    pad = n_blocks * block - M
    ref_p = jnp.pad(ref, ((0, pad), (0, 0)))
    valid = jnp.ones((M,), bool) if ref_valid is None else ref_valid
    valid_p = jnp.pad(valid, (0, pad), constant_values=False)
    ref_blocks = ref_p.reshape(n_blocks, block, 3)
    valid_blocks = valid_p.reshape(n_blocks, block)

    init = (jnp.full((P, k), jnp.inf, jnp.float32),
            jnp.zeros((P, k), jnp.int32))

    def body(carry, inp):
        best_d, best_i = carry
        rblk, vblk, base = inp
        d = _block_dists(query, rblk)
        d = jnp.where(vblk[None, :], d, jnp.inf)
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (P, block), 1)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, idx], axis=1)
        neg_d, sel = jax.lax.top_k(-cat_d, k)
        return (-neg_d, jnp.take_along_axis(cat_i, sel, axis=1)), None

    bases = jnp.arange(n_blocks, dtype=jnp.int32) * block
    (best_d, best_i), _ = jax.lax.scan(
        body, init, (ref_blocks, valid_blocks, bases))

    # Recompute distances differentiably from the winning indices.
    nn = ref[jnp.clip(best_i, 0, M - 1)]          # [P, k, 3]
    diff = query[:, None, :] - nn
    sq = jnp.sum(diff * diff, axis=-1)
    sq = jnp.where(jnp.isfinite(best_d), sq, jnp.inf)
    return sq, best_i


def knn_gather(ref_attrs: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-neighbor attributes: ref_attrs [M, C], idx [P, k] -> [P, k, C]."""
    return ref_attrs[idx]
