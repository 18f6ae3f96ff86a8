"""Static-capacity stream compaction, TPU-fast.

``jnp.nonzero(mask, size=K)`` is the natural XLA idiom for "compact a
boolean-selected subset into a fixed-size buffer", but on TPU it lowers
through a full sort of the index array — measured at ~137 ms for a 14.8M
mask at f3c scale (scripts/profile_micro.py), which made the two
compactions the single largest cost inside G-Shell extraction.

``first_k_indices`` computes the same thing as cumsum + binary search
("index of the j-th set bit" = searchsorted(cumsum, j)): one vectorized
pass to build the running count, then K independent binary searches that
lower to ~log2(N) rounds of K-row gathers. Ordering (ascending indices)
and fill semantics match jnp.nonzero exactly.

On TPU the binary-search rounds themselves are the remaining cost
(log2(block) rounds of K-row HBM gathers per call; three such compactions
run in every training step). ``_first_k_pallas`` removes them: the cumsum
is a NON-DECREASING destination map (set bit with rank r lands in output
slot r-1), so compaction is exactly the sorted-COO scatter pattern of
ops/scatter.py — each output block of 512 slots owns a contiguous input
row range (one small searchsorted), and a Pallas kernel streams that range
once, matching ranks to slots with a one-hot MXU matmul whose values are
the row POSITIONS generated in-kernel from iota (no values array in HBM at
all). Positions ride exact through f32 one-hot matmuls for n < 2^24.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _first_k_kernel(starts_ref, csum_ref, mask_ref, out_ref, csum_s, mask_s,
                    sems, *, blk: int, chunk: int):
    b = pl.program_id(0)
    s = starts_ref[b]
    e = starts_ref[b + 1]
    base_slot = b * blk
    c0 = s // chunk
    c1 = (e + chunk - 1) // chunk

    def body(ci, acc):
        base = pl.multiple_of(ci * chunk, chunk)
        cp_c = pltpu.make_async_copy(
            csum_ref.at[pl.ds(base, chunk)], csum_s, sems.at[0])
        cp_m = pltpu.make_async_copy(
            mask_ref.at[pl.ds(base, chunk)], mask_s, sems.at[1])
        cp_c.start()
        cp_m.start()
        cp_c.wait()
        cp_m.wait()
        # set bit with rank r = csum goes to output slot r-1
        local = csum_s[:].reshape(chunk, 1) - 1 - base_slot
        hit = ((local == jax.lax.broadcasted_iota(
            jnp.int32, (chunk, blk), 1))
            & (mask_s[:].reshape(chunk, 1) > 0)).astype(jnp.float32)
        # tpu.iota is integer-only on Mosaic; build int32 then cast
        pos = (base + jax.lax.broadcasted_iota(
            jnp.int32, (8, chunk), 1)).astype(jnp.float32)
        # each slot receives exactly ONE nonzero product (its set row's
        # position); HIGHEST keeps f32-exact products (bf16 passes would
        # round positions past 2^8)
        return acc + jax.lax.dot_general(
            pos, hit, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    acc = jnp.zeros((8, blk), jnp.float32)
    acc = jax.lax.fori_loop(c0, c1, body, acc)
    out_ref[...] = acc


def _first_k_pallas(mask: jnp.ndarray, k: int, fill_value: int,
                    blk: int = 512, chunk: int = 1024,
                    interpret: bool = False):
    """first_k_indices via the sorted-COO position scatter (module docs)."""
    mask = mask.reshape(-1)
    n = mask.shape[0]
    assert n < (1 << 24), "positions must stay f32-exact"
    mask_i = mask.astype(jnp.int32)
    csum = jnp.cumsum(mask_i)
    NB = -(-k // blk)
    # output block b owns slots [b*blk, (b+1)*blk) = ranks [b*blk+1, ...]
    edges = jnp.arange(NB + 1, dtype=jnp.int32) * blk + 1
    starts = jnp.searchsorted(csum, edges, side="left").astype(jnp.int32)
    pad = (-n) % chunk + chunk
    csum_p = jnp.concatenate([csum, jnp.zeros((pad,), jnp.int32)])
    mask_p = jnp.concatenate([mask_i, jnp.zeros((pad,), jnp.int32)])

    kernel = functools.partial(_first_k_kernel, blk=blk, chunk=chunk)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),   # csum
                pl.BlockSpec(memory_space=pltpu.HBM),   # mask
            ],
            out_specs=pl.BlockSpec((8, blk), lambda b, *_: (0, b),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((chunk,), jnp.int32),
                pltpu.VMEM((chunk,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8, NB * blk), jnp.float32),
        interpret=interpret,
    )(starts, csum_p, mask_p)
    slots = out[0, :k].astype(jnp.int32)
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)
    return jnp.where(targets <= csum[n - 1], slots, fill_value)


def first_k_indices(mask: jnp.ndarray, k: int, fill_value: int,
                    block: int = 4096, use_pallas=None):
    """Indices of the first k true entries of 1-D ``mask`` (ascending),
    padded with ``fill_value`` — drop-in for
    ``jnp.nonzero(mask, size=k, fill_value=fill_value)[0]``.

    Two-level search: the binary-search rounds against the full-size cumsum
    are the cost (each round = a k-row HBM gather), so the block level
    resolves the top log2(n/block) rounds against a tiny per-block count
    array and only log2(block) rounds touch the big array. On TPU (or with
    use_pallas=True/"interpret") the Pallas sorted-COO position scatter
    replaces the search rounds entirely (module docs)."""
    mask = mask.reshape(-1)
    n = mask.shape[0]
    if use_pallas is None:
        from d3human_tpu.ops.scatter import default_use_pallas
        use_pallas = default_use_pallas()
    if use_pallas and n < (1 << 24) and n > 2 * block:
        return _first_k_pallas(mask, k, fill_value,
                               interpret=(use_pallas == "interpret"))
    nb = -(-n // block)
    if nb <= 2:
        csum = jnp.cumsum(mask.astype(jnp.int32))
        targets = jnp.arange(1, k + 1, dtype=jnp.int32)
        slots = jnp.searchsorted(csum, targets, side="left").astype(jnp.int32)
        return jnp.where(targets <= csum[-1], slots, fill_value)
    csum = jnp.cumsum(mask.astype(jnp.int32))            # [n]
    # prefix count at each block's last element (strided gather, tiny)
    bend = jnp.minimum(
        jnp.arange(1, nb + 1, dtype=jnp.int32) * block - 1, n - 1)
    bcs = csum[bend]                                     # [nb]
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)
    blk = jnp.searchsorted(bcs, targets, side="left").astype(jnp.int32)
    blk_c = jnp.minimum(blk, nb - 1)
    # binary search the GLOBAL csum restricted to the block's index range —
    # the interval is <= block wide, so only bit_length(block) rounds of
    # k-row gathers touch the big array (vs log2(n) for flat searchsorted)
    lo = blk_c * block
    hi = jnp.minimum(lo + block, n)
    for _ in range(block.bit_length()):      # first idx with csum >= target
        mid = (lo + hi) // 2
        v = csum[jnp.minimum(mid, n - 1)]
        go_right = v < targets
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    valid = targets <= csum[n - 1]
    return jnp.where(valid & (lo < n), lo, fill_value)
