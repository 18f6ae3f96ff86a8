"""first_k_indices (two-level compaction) vs jnp.nonzero(size=) oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from d3human_tpu.ops.compaction import first_k_indices


@pytest.mark.parametrize("n,k,p,blk", [
    (1000, 64, 0.05, 4096),      # small input, falls back to flat path
    (100000, 512, 0.01, 4096),   # sparse
    (100000, 4096, 0.9, 256),    # dense, many blocks
    (5000, 5000, 1.0, 512),      # every bit set, k == n
    (9000, 100, 0.0, 512),       # nothing set -> all fill
    (4097, 64, 0.3, 4096),       # one partial block
])
def test_matches_nonzero(n, k, p, blk):
    rng = np.random.default_rng(n * 31 + k)
    m = jnp.asarray(rng.random(n) < p)
    ref = jnp.nonzero(m, size=k, fill_value=n)[0]
    got = first_k_indices(m, k, n, block=blk)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("n,k,p", [
    (100000, 512, 0.01),         # sparse
    (100000, 4096, 0.9),         # dense: more set bits than capacity
    (50000, 50000, 1.0),         # every bit set, k == n
    (90000, 100, 0.0),           # nothing set -> all fill
    (8193, 640, 0.3),            # n not a multiple of chunk, k not of blk
])
def test_pallas_path_matches_nonzero(n, k, p):
    """_first_k_pallas (the TPU production path) in interpret mode vs the
    jnp.nonzero oracle — the sorted-COO position scatter must reproduce
    ascending-index + fill semantics bit-exactly."""
    rng = np.random.default_rng(n * 7 + k)
    m = jnp.asarray(rng.random(n) < p)
    ref = jnp.nonzero(m, size=k, fill_value=n)[0]
    got = first_k_indices(m, k, n, use_pallas="interpret")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
