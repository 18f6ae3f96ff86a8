"""Pallas TPU kernel for the rasterizer's per-tile z-buffer resolve.

The XLA path (ops/rasterizer.py:_resolve_tile under lax.map) materializes
(pixels x faces) edge/z intermediates in HBM per face block. This kernel
keeps everything in VMEM: one grid step per tile, edge tests as MXU dots,
and the winner encoded as a packed (quantized-z | slot) int32 so the
min-reduction needs no gather — the slot->face-id lookup happens outside in
XLA on the tiny (H, W) result.

Layout per tile (pre-gathered by XLA from the binning stage; trailing dims
fully covered by the block so Mosaic accepts the specs):
  A   [NT, 2, 3*MFPT]  edge-function coefficients (x/y rows, EDGE-major:
                       columns [edge0 faces | edge1 | edge2])
  C   [NT, 3, MFPT]    edge-function offsets (row per edge)
  ZP  [NT, 3, MFPT]    z-plane (az, bz, cz)
  LV  [NT, 1, MFPT]    1.0 live / 0.0 dead

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


def _resolve_kernel(A_ref, C_ref, ZP_ref, LV_ref, out_ref,
                    *, th: int, tw: int, ntx: int, mfpt: int, block: int):
    t = pl.program_id(0)
    ox = ((t % ntx) * tw).astype(jnp.float32)
    oy = ((t // ntx) * th).astype(jnp.float32)
    # pixel centers of this tile as [P, 1] columns (P = th*tw)
    P = th * tw
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (lin % tw).astype(jnp.float32) + 0.5 + ox
    py = (lin // tw).astype(jnp.float32) + 0.5 + oy
    pix = jnp.concatenate([px, py], axis=1)              # [P, 2]

    nb = mfpt // block

    def body(b, best):
        # edge-major layout: columns [edge0 | edge1 | edge2], each mfpt wide
        def edge(k):
            ak = A_ref[0, :, pl.ds(k * mfpt + b * block, block)]
            ck = C_ref[0, k:k + 1, pl.ds(b * block, block)]
            return jnp.dot(pix, ak, preferred_element_type=jnp.float32) + ck

        E0, E1, E2 = edge(0), edge(1), edge(2)
        inside = (((E0 >= 0) & (E1 >= 0) & (E2 >= 0))
                  | ((E0 <= 0) & (E1 <= 0) & (E2 <= 0)))

        zp = ZP_ref[0, :, pl.ds(b * block, block)]
        lv = LV_ref[0, :, pl.ds(b * block, block)]
        z = px * zp[0:1, :] + py * zp[1:2, :] + zp[2:3, :]
        hit = inside & (lv > 0.5)
        zq = jnp.clip((z + 1.0) * (0.5 * Z_SCALE), 0.0, Z_SCALE)
        zq = zq.astype(jnp.int32)
        slot = jax.lax.broadcasted_iota(jnp.int32, (P, block), 1) + b * block
        key = (zq << SLOT_BITS) | slot
        key = jnp.where(hit, key, MISS_KEY)
        return jnp.minimum(best, jnp.min(key, axis=1, keepdims=True))

    best = jnp.full((P, 1), MISS_KEY, jnp.int32)
    best = jax.lax.fori_loop(0, nb, body, best)
    out_ref[0] = best.reshape(1, P)


def resolve_tiles_pallas(
    A: jnp.ndarray,            # [NT, 2, 3*MFPT] edge-major
    C: jnp.ndarray,            # [NT, 3, MFPT]
    ZP: jnp.ndarray,           # [NT, 3, MFPT]
    LV: jnp.ndarray,           # [NT, 1, MFPT]
    tile: Tuple[int, int],
    ntx: int,
    block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns packed keys [NT, th*tw] int32 (MISS_KEY = background)."""
    NT, _, m3 = A.shape
    mfpt = m3 // 3
    th, tw = tile
    assert mfpt % block == 0

    kernel = functools.partial(_resolve_kernel, th=th, tw=tw, ntx=ntx,
                               mfpt=mfpt, block=block)
    out = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, 2, m3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, mfpt), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, mfpt), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mfpt), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, th * tw), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, 1, th * tw), jnp.int32),
        interpret=interpret,
    )(A, C, ZP, LV)
    return out[:, 0, :]


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
