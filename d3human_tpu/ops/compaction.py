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
"""

from __future__ import annotations

import jax.numpy as jnp


def first_k_indices(mask: jnp.ndarray, k: int, fill_value: int,
                    block: int = 4096):
    """Indices of the first k true entries of 1-D ``mask`` (ascending),
    padded with ``fill_value`` — drop-in for
    ``jnp.nonzero(mask, size=k, fill_value=fill_value)[0]``.

    Two-level search: the binary-search rounds against the full-size cumsum
    are the cost (each round = a k-row HBM gather), so the block level
    resolves the top log2(n/block) rounds against a tiny per-block count
    array and only log2(block) rounds touch the big array."""
    mask = mask.reshape(-1)
    n = mask.shape[0]
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
