"""Fast scatter-add for TPU: sorted-COO accumulation via MXU one-hot matmuls.

XLA's scatter primitive costs ~90 ns/ROW on TPU regardless of width,
uniqueness, or the indices_are_sorted flag (scripts/profile_bwd.py: 160 ms
for the render path's 1.75M-row vertex-gradient transpose, 63 ms for the
583k-row hash-table gradient). Sorting is cheap (argsort 1.75M = 5 ms), and
so are gathers (9 ns/row) and wide cumsums — the scatter itself is the only
slow primitive. This module therefore never scatters:

  1. sort rows by destination (XLA argsort + take),
  2. binary-search the row range feeding each BLOCK of output rows
     (destinations are sorted, so every output block owns a CONTIGUOUS
     range of rows),
  3. a Pallas kernel walks blocks; each streams its row range through VMEM
     in chunk-aligned windows and accumulates with one-hot dot_generals on
     the MXU — dense block writes, no scattered memory traffic anywhere.

Layout notes (Mosaic constraints): values travel TRANSPOSED as [C, N] so
each window is a lane-contiguous column slice (an [N, 16] HBM memref is
lane-padded to 128 and cannot be column-sliced); windows are absolute
chunk-aligned offsets (DMA offsets must be provably divisible by the
tiling) — rows outside the block's key range simply fail the one-hot match,
so over-reading the neighbors is free.

Used as the custom-VJP backward of the render path's fused vertex gather
and the hash-grid table lookup (the two dominant backward costs), and
usable directly as a jnp.zeros(...).at[idx].add(vals) replacement.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(starts_ref, idx_ref, vals_ref, out_ref, idx_s, vals_s,
                    sems, *, blk: int, chunk: int, cpad: int):
    b = pl.program_id(0)
    s = starts_ref[b]
    e = starts_ref[b + 1]
    base_row = b * blk

    # chunk-ALIGNED absolute windows covering [s, e)
    c0 = s // chunk
    c1 = (e + chunk - 1) // chunk

    def body(ci, acc):
        base = pl.multiple_of(ci * chunk, chunk)
        cp_i = pltpu.make_async_copy(
            idx_ref.at[pl.ds(base, chunk)], idx_s, sems.at[0])
        cp_v = pltpu.make_async_copy(
            vals_ref.at[:, pl.ds(pl.multiple_of(ci * chunk, chunk), chunk)],
            vals_s, sems.at[1])
        cp_i.start()
        cp_v.start()
        cp_i.wait()
        cp_v.wait()
        local = idx_s[:].reshape(chunk, 1) - base_row
        onehot = (local == jax.lax.broadcasted_iota(
            jnp.int32, (chunk, blk), 1)).astype(jnp.float32)
        # acc[c, j] += sum_r vals[c, r] * onehot[r, j].
        # HIGHEST: the products must be exact f32 (default TPU f32 matmul
        # rounds operands through bf16 — visible error on accumulated grads)
        return acc + jax.lax.dot_general(
            vals_s[:], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    acc = jnp.zeros((cpad, blk), jnp.float32)
    acc = jax.lax.fori_loop(c0, c1, body, acc)
    out_ref[...] = acc


def coo_scatter_add(
    idx: jnp.ndarray,          # [N] int32 destination rows
    vals: jnp.ndarray,         # [N, C] float32
    out_rows: int,
    *,
    sorted_idx: bool = False,  # True: idx already ascending (skip the sort)
    block_rows: int = 512,
    chunk: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns jnp.zeros((out_rows, C)).at[idx].add(vals, mode='drop'),
    except rows with idx outside [0, out_rows) — INCLUDING negatives — are
    dropped (``.at[]`` wraps negatives python-style; every caller here uses
    non-negative indices with >= out_rows sentinels for padding)."""
    N, C = vals.shape
    # out-of-range rows -> sentinel beyond the last block (BEFORE the sort,
    # so negatives don't land at the front and break sortedness)
    NB = -(-out_rows // block_rows)
    R = NB * block_rows
    big = jnp.int32(R + 1)
    idx = jnp.where((idx >= 0) & (idx < out_rows), idx, big)
    if not sorted_idx:
        order = jnp.argsort(idx)
        idx = idx[order]
        vals = jnp.take(vals, order, axis=0)
    idx = idx.astype(jnp.int32)
    # pad so every chunk-aligned window slice is in-bounds
    pad = (-N) % chunk + chunk
    idx_p = jnp.concatenate([idx, jnp.full((pad,), big, jnp.int32)])
    cpad = -(-C // 8) * 8
    vals_t = jnp.zeros((cpad, N + pad), jnp.float32)
    vals_t = jax.lax.dynamic_update_slice(vals_t, vals.T, (0, 0))
    # row range per output block
    edges = jnp.arange(0, R + block_rows, block_rows, dtype=jnp.int32)
    starts = jnp.searchsorted(idx, edges, side="left").astype(jnp.int32)

    kernel = functools.partial(_scatter_kernel, blk=block_rows, chunk=chunk,
                               cpad=cpad)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),   # idx
                pl.BlockSpec(memory_space=pltpu.HBM),   # vals (transposed)
            ],
            out_specs=pl.BlockSpec((cpad, block_rows), lambda b, *_: (0, b),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((chunk,), jnp.int32),
                pltpu.VMEM((cpad, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((cpad, R), jnp.float32),
        interpret=interpret,
    )(starts, idx_p, vals_t)
    return out[:C, :out_rows].T


def default_use_pallas() -> bool:
    """Pallas scatter on TPU; XLA scatter elsewhere (CPU tests/interpret).

    D3H_DISABLE_PALLAS=1 forces the XLA fallbacks even on TPU — the lever
    for on-device gradient-equivalence A/Bs of the Mosaic kernels (interpret
    mode exercises the kernel logic but not the compiled Mosaic program)."""
    import os
    if os.environ.get("D3H_DISABLE_PALLAS", "") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:                      # pragma: no cover
        return False


# ---------------------------------------------------------------- custom VJPs

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(table: jnp.ndarray, idx: jnp.ndarray, use_pallas_bwd=True):
    """table[idx] ([..., C] gather) whose backward uses coo_scatter_add
    instead of XLA scatter. idx any int shape; returns table[idx].

    use_pallas_bwd: False = XLA scatter backward; True = Pallas sorted-COO
    backward; "interpret" = the Pallas backward in interpret mode (CPU test
    coverage of the kernel that actually runs on TPU)."""
    return jnp.take(table, idx, axis=0)


def _gather_rows_fwd(table, idx, use_pallas_bwd):
    return jnp.take(table, idx, axis=0), (idx, table.shape)


def _gather_rows_bwd(use_pallas_bwd, res, g):
    idx, tshape = res
    flat_idx = idx.reshape(-1).astype(jnp.int32)
    flat_g = g.reshape(-1, tshape[-1])
    if use_pallas_bwd:
        dt = coo_scatter_add(flat_idx, flat_g, tshape[0],
                             interpret=(use_pallas_bwd == "interpret"))
    else:
        dt = jnp.zeros(tshape, flat_g.dtype).at[flat_idx].add(flat_g)
    return dt, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_add_rows(vals: jnp.ndarray, idx: jnp.ndarray, out_rows: int,
                     use_pallas=True):
    """Differentiable zeros((out_rows, C)).at[idx].add(vals) (idx int [N],
    unsorted, duplicates accumulate; OOB/negative rows dropped). The
    fused-row replacement for scatter-add chains like vertex-normal
    accumulation — ONE sorted-COO kernel instead of k XLA scatters."""
    if use_pallas:
        return coo_scatter_add(idx, vals, out_rows)
    return jnp.zeros((out_rows, vals.shape[-1]), vals.dtype).at[
        jnp.where((idx >= 0) & (idx < out_rows), idx, out_rows)].add(
        vals, mode="drop")


def _segment_add_rows_fwd(vals, idx, out_rows, use_pallas):
    return segment_add_rows(vals, idx, out_rows, use_pallas), idx


def _segment_add_rows_bwd(out_rows, use_pallas, idx, g):
    ok = (idx >= 0) & (idx < out_rows)
    dv = jnp.take(g, jnp.clip(idx, 0, out_rows - 1), axis=0)
    return (jnp.where(ok[..., None], dv, 0.0), None)


segment_add_rows.defvjp(_segment_add_rows_fwd, _segment_add_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def scatter_rows_sorted(vals: jnp.ndarray, idx: jnp.ndarray, out_rows: int,
                        use_pallas=True):
    """zeros((out_rows, C)).at[idx].set(vals) for SORTED UNIQUE idx
    (out-of-range rows dropped) — the compacted-pixel image materialization.
    Forward uses the Pallas sorted-COO kernel on TPU (unique indices make
    add == set); backward is a plain gather."""
    if use_pallas:
        return coo_scatter_add(idx, vals, out_rows, sorted_idx=True)
    buf = jnp.zeros((out_rows, vals.shape[-1]), vals.dtype)
    return buf.at[idx].set(vals, mode="drop", indices_are_sorted=True,
                           unique_indices=True)


def _scatter_rows_sorted_fwd(vals, idx, out_rows, use_pallas):
    return scatter_rows_sorted(vals, idx, out_rows, use_pallas), idx


def _scatter_rows_sorted_bwd(out_rows, use_pallas, idx, g):
    ok = (idx >= 0) & (idx < out_rows)
    dv = jnp.take(g, jnp.clip(idx, 0, out_rows - 1), axis=0)
    return (jnp.where(ok[..., None], dv, 0.0), None)


scatter_rows_sorted.defvjp(_scatter_rows_sorted_fwd,
                           _scatter_rows_sorted_bwd)
