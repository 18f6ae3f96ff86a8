"""coo_scatter_add (Pallas sorted-COO scatter) vs the XLA scatter oracle.

Semantics: identical to jnp.zeros((V,C)).at[idx].add(vals, mode='drop')
for idx in [0, V); indices >= V AND negatives are dropped (``.at[]`` wraps
negatives python-style — callers here always use non-negative sentinel
fills, so the kernel drops them instead)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3human_tpu.ops.scatter import coo_scatter_add, gather_rows


def _ref(idx, vals, V):
    idxc = jnp.where((idx >= 0) & (idx < V), idx, V)   # sentinel row
    return jnp.zeros((V + 1, vals.shape[-1])).at[idxc].add(
        vals, mode="drop")[:V]


@pytest.mark.parametrize("N,V,C,oob", [
    (5000, 2000, 14, 5),      # OOB both sides
    (300, 100, 3, 0),
    (20000, 9000, 16, 50),
    (1000, 50000, 2, 0),      # sparse: most blocks empty
    (4096, 512, 8, 0),        # single block, dense
])
def test_matches_xla_scatter(N, V, C, oob):
    rng = np.random.default_rng(N + V)
    idx = jnp.asarray(rng.integers(-oob, V + oob, N), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
    ref = _ref(idx, vals, V)
    got = coo_scatter_add(idx, vals, V, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_sorted_path_skips_sort():
    rng = np.random.default_rng(0)
    N, V, C = 3000, 1000, 4
    idx = jnp.sort(jnp.asarray(rng.integers(0, V, N), jnp.int32))
    vals = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
    got = coo_scatter_add(idx, vals, V, sorted_idx=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(idx, vals, V)),
                               rtol=1e-4, atol=1e-4)


def test_gather_rows_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    V, C, N = 500, 14, 2000
    table = jnp.asarray(rng.normal(size=(V, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, V, (N, 3)), jnp.int32)
    cot = jnp.asarray(rng.normal(size=(N, 3, C)), jnp.float32)

    def f_ref(t):
        return jnp.sum(t[idx] * cot)

    def f_new(t):
        return jnp.sum(gather_rows(t, idx, False) * cot)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_new)(table)),
        np.asarray(jax.grad(f_ref)(table)), rtol=1e-5, atol=1e-5)
    # fwd identical
    np.testing.assert_array_equal(np.asarray(gather_rows(table, idx, False)),
                                  np.asarray(table[idx]))
