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


def first_k_indices(mask: jnp.ndarray, k: int, fill_value: int):
    """Indices of the first k true entries of 1-D ``mask`` (ascending),
    padded with ``fill_value`` — drop-in for
    ``jnp.nonzero(mask, size=k, fill_value=fill_value)[0]``."""
    mask = mask.reshape(-1)
    csum = jnp.cumsum(mask.astype(jnp.int32))
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)
    slots = jnp.searchsorted(csum, targets, side="left").astype(jnp.int32)
    valid = targets <= csum[-1]
    return jnp.where(valid, slots, fill_value)
