"""Pallas TPU kernel for the rasterizer's per-tile z-buffer resolve.

The XLA path (ops/rasterizer.py:_resolve_tile under lax.map) materializes
(pixels x faces) edge/z intermediates in HBM per face block. This kernel
keeps everything in VMEM: one grid step per tile, edge tests as MXU dots,
and the winner encoded as a packed (quantized-z | slot) int32 so the
min-reduction needs no gather — the slot->face-id lookup happens outside in
XLA on the tiny (H, W) result.

Layout per tile (pre-gathered by XLA from the binning stage):
  A   [NT, 2, 3*MFPT]  edge-function coefficients (x/y rows, edge-major)
  C   [NT, 3*MFPT]     edge-function offsets
  ZP  [NT, 3, MFPT]    z-plane (az, bz, cz)
  LV  [NT, MFPT]       1.0 live / 0.0 dead

Packing: key = (quantized_z << SLOT_BITS) | slot, minimized per pixel.
z in [-1, 1] NDC maps to [0, 2^21); SLOT_BITS=10 supports MFPT <= 1024.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLOT_BITS = 10
Z_BITS = 21
Z_SCALE = float((1 << Z_BITS) - 1)
MISS_KEY = (1 << 31) - 1   # max int32: any hit beats it


def _resolve_kernel(origin_ref, A_ref, C_ref, ZP_ref, LV_ref, out_ref,
                    *, th: int, tw: int, mfpt: int, block: int):
    ox = origin_ref[0, 0]
    oy = origin_ref[0, 1]
    # pixel centers of this tile: [P, 2] with P = th*tw
    P = th * tw
    rows = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1)
    px = (cols + 0.5 + ox).reshape(P, 1)
    py = (rows + 0.5 + oy).reshape(P, 1)
    pix = jnp.concatenate([px, py], axis=1)              # [P, 2]

    nb = mfpt // block

    def body(b, best):
        # slice this face block's coefficients (edge-major: 3 edges packed)
        a = A_ref[0, :, :]                                # [2, 3*MFPT]
        ab = jax.lax.dynamic_slice(a, (0, b * 3 * block), (2, 3 * block))
        cb = jax.lax.dynamic_slice(C_ref[0, :][None, :], (0, b * 3 * block),
                                   (1, 3 * block))[0]
        E = jnp.dot(pix, ab, preferred_element_type=jnp.float32) + cb[None, :]
        E = E.reshape(P, block, 3)
        inside = jnp.all(E >= 0, axis=-1) | jnp.all(E <= 0, axis=-1)

        zp = jax.lax.dynamic_slice(ZP_ref[0], (0, b * block), (3, block))
        lv = jax.lax.dynamic_slice(LV_ref[0][None, :], (0, b * block),
                                   (1, block))[0]
        z = px * zp[0][None, :] + py * zp[1][None, :] + zp[2][None, :]
        hit = inside & (lv[None, :] > 0.5)
        zq = jnp.clip((z + 1.0) * (0.5 * Z_SCALE), 0.0, Z_SCALE)
        zq = zq.astype(jnp.int32)
        slot = jax.lax.broadcasted_iota(jnp.int32, (P, block), 1) + b * block
        key = (zq << SLOT_BITS) | slot
        key = jnp.where(hit, key, MISS_KEY)
        return jnp.minimum(best, jnp.min(key, axis=1))

    best = jnp.full((P,), MISS_KEY, jnp.int32)
    best = jax.lax.fori_loop(0, nb, body, best)
    out_ref[0, :] = best


def resolve_tiles_pallas(
    origins: jnp.ndarray,      # [NT, 2] f32 (x, y) tile pixel origins
    A: jnp.ndarray,            # [NT, 2, 3*MFPT]
    C: jnp.ndarray,            # [NT, 3*MFPT]
    ZP: jnp.ndarray,           # [NT, 3, MFPT]
    LV: jnp.ndarray,           # [NT, MFPT]
    tile: Tuple[int, int],
    block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns packed keys [NT, th*tw] int32 (MISS_KEY = background)."""
    NT, _, m3 = A.shape
    mfpt = m3 // 3
    th, tw = tile
    assert mfpt % block == 0

    kernel = functools.partial(_resolve_kernel, th=th, tw=tw, mfpt=mfpt,
                               block=block)
    return pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, m3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m3), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, mfpt), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mfpt), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th * tw), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, th * tw), jnp.int32),
        interpret=interpret,
    )(origins, A, C, ZP, LV)


def unpack_keys(keys: jnp.ndarray, tile_faces: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """keys [NT, P] + tile_faces [NT, MFPT] -> (tri_id+1 [NT,P], z [NT,P])."""
    miss = keys == MISS_KEY
    slot = keys & ((1 << SLOT_BITS) - 1)
    zq = (keys >> SLOT_BITS).astype(jnp.float32)
    z = zq / (0.5 * Z_SCALE) - 1.0
    fid = jnp.take_along_axis(tile_faces, slot, axis=1) + 1
    tri_id = jnp.where(miss, 0, fid)
    z = jnp.where(miss, 3.4e38, z)
    return tri_id, z
