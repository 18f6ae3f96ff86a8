"""Pallas TPU kernel for the rasterizer's per-tile z-buffer resolve.

The XLA path (ops/rasterizer.py:_resolve_tile under lax.map) materializes
(pixels x faces) edge/z intermediates in HBM per face block. This kernel
keeps everything in VMEM: one grid step per tile, edge tests as MXU dots,
and the winner encoded as a packed (quantized-z | slot) int32 so the
min-reduction needs no gather — the slot->face-id lookup happens outside in
XLA on the tiny (H, W) result.

Data layout (v2, profiled): ALL per-face kernel inputs are packed into ONE
fused 16-float row — [A0x A0y A1x A1y A2x A2y | C0 C1 C2 | az bz cz | live |
pad(3)] — so the binning stage performs ONE [NT, M]-row gather from a
[F, 16] table and NO transposes (the v1 layout's three separate gathers +
edge-major relayouts dominated the raster cost at 1080^2). The kernel
contracts pixel coordinates against row columns with dot_general, which the
MXU consumes directly in face-major order.

Packing: key = (quantized_z << SLOT_BITS) | slot, minimized per pixel.
z in [-1, 1] NDC maps to [0, 2^21); SLOT_BITS=10 supports M <= 1024 slots.
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
ROW_W = 16                 # fused face-row width


def pack_face_rows(A: jnp.ndarray, C: jnp.ndarray, az, bz, cz,
                   live: jnp.ndarray) -> jnp.ndarray:
    """[F,3,2] edge coeffs + [F,3] offsets + z-plane + live -> [F, 16]."""
    F = A.shape[0]
    return jnp.concatenate([
        A.reshape(F, 6),
        C,
        az[:, None], bz[:, None], cz[:, None],
        live.astype(jnp.float32)[:, None],
        jnp.zeros((F, 3), jnp.float32),
    ], axis=-1)


def _resolve_kernel(rows_ref, out_ref, *, th: int, tw: int, ntx: int,
                    m: int, block: int):
    _resolve_body(rows_ref, None, out_ref, th=th, tw=tw, ntx=ntx,
                  m=m, block=block)


def _resolve_kernel_peel(rows_ref, floor_ref, out_ref, *, th: int, tw: int,
                         ntx: int, m: int, block: int):
    _resolve_body(rows_ref, floor_ref, out_ref, th=th, tw=tw, ntx=ntx,
                  m=m, block=block)


def _resolve_body(rows_ref, floor_ref, out_ref, *, th: int, tw: int,
                  ntx: int, m: int, block: int):
    t = pl.program_id(0)
    ox = ((t % ntx) * tw).astype(jnp.float32)
    oy = ((t // ntx) * th).astype(jnp.float32)
    P = th * tw
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (lin % tw).astype(jnp.float32) + 0.5 + ox
    py = (lin // tw).astype(jnp.float32) + 0.5 + oy
    pix = jnp.concatenate([px, py], axis=1)              # [P, 2]
    pxy1 = jnp.concatenate([px, py, jnp.ones_like(px)], axis=1)   # [P, 3]

    # depth peeling: only keys STRICTLY greater than the previous layer's
    # packed key compete — the packed (zq | slot) order is total, so this
    # enumerates each pixel's covering faces near-to-far across calls.
    floor = (floor_ref[0].reshape(th * tw, 1) if floor_ref is not None
             else None)

    nb = m // block

    def body(b, best):
        rows = rows_ref[0, pl.ds(b * block, block), :]   # [block, 16]

        # E_k[P, block] = pix @ A_k^T + C_k  — face-major dot_general
        def edge(k):
            ak = rows[:, 2 * k: 2 * k + 2]               # [block, 2]
            e = jax.lax.dot_general(
                pix, ak, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return e + rows[:, 6 + k][None, :]

        E0, E1, E2 = edge(0), edge(1), edge(2)
        inside = (((E0 >= 0) & (E1 >= 0) & (E2 >= 0))
                  | ((E0 <= 0) & (E1 <= 0) & (E2 <= 0)))

        # z[P, block] = px*az + py*bz + cz via one dot against [block, 3]
        z = jax.lax.dot_general(
            pxy1, rows[:, 9:12], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        hit = inside & (rows[:, 12][None, :] > 0.5)
        zq = jnp.clip((z + 1.0) * (0.5 * Z_SCALE), 0.0, Z_SCALE)
        zq = zq.astype(jnp.int32)
        slot = jax.lax.broadcasted_iota(jnp.int32, (P, block), 1) + b * block
        key = (zq << SLOT_BITS) | slot
        key = jnp.where(hit, key, MISS_KEY)
        if floor is not None:
            key = jnp.where(key > floor, key, MISS_KEY)
        return jnp.minimum(best, jnp.min(key, axis=1, keepdims=True))

    best = jnp.full((P, 1), MISS_KEY, jnp.int32)
    best = jax.lax.fori_loop(0, nb, body, best)
    out_ref[0] = best.reshape(1, P)


def resolve_tiles_pallas(
    tile_rows: jnp.ndarray,    # [NT, M, 16] fused face rows per tile
    tile: Tuple[int, int],
    ntx: int,
    block: int = 128,
    interpret: bool = False,
    floor: jnp.ndarray = None,  # [NT, th*tw] prev layer's keys (peeling)
) -> jnp.ndarray:
    """Returns packed keys [NT, th*tw] int32 (MISS_KEY = background).

    With ``floor`` (a previous call's output) only strictly-greater keys
    compete — one depth-peel step (ref render/render.py:400-403
    dr.DepthPeeler.rasterize_next_layer). The layers==1 hot path compiles
    the floor-free kernel, unchanged."""
    NT, M, _ = tile_rows.shape
    th, tw = tile
    assert M % block == 0
    assert M <= (1 << SLOT_BITS), "slot field supports <= 1024 faces/tile"

    in_specs = [
        pl.BlockSpec((1, M, ROW_W), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = (tile_rows,)
    if floor is None:
        kernel = functools.partial(_resolve_kernel, th=th, tw=tw, ntx=ntx,
                                   m=M, block=block)
    else:
        kernel = functools.partial(_resolve_kernel_peel, th=th, tw=tw,
                                   ntx=ntx, m=M, block=block)
        in_specs.append(pl.BlockSpec((1, th * tw), lambda t: (t, 0),
                                     memory_space=pltpu.VMEM))
        operands = (tile_rows, floor)
    out = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, th * tw), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, 1, th * tw), jnp.int32),
        interpret=interpret,
    )(*operands)
    return out[:, 0, :]


def unpack_keys(keys: jnp.ndarray, tile_faces: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """keys [NT, P] + tile_faces [NT, M] -> (tri_id+1 [NT,P], z [NT,P])."""
    miss = keys == MISS_KEY
    slot = keys & ((1 << SLOT_BITS) - 1)
    zq = (keys >> SLOT_BITS).astype(jnp.float32)
    z = zq / (0.5 * Z_SCALE) - 1.0
    fid = jnp.take_along_axis(tile_faces, slot, axis=1) + 1
    tri_id = jnp.where(miss, 0, fid)
    z = jnp.where(miss, 3.4e38, z)
    return tri_id, z
