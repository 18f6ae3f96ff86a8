"""Backward-path micro-benchmarks at f3c scale: the scatter-add transposes
of the compact render path's gathers, the texture-table scatter, and the
fused-gather interpolate fwd+bwd.

    python scripts/profile_bwd.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import jax.numpy as jnp

ITERS = 10


def scan_time(name, op, *args):
    @jax.jit
    def run(*args):
        def body(acc, i):
            return acc + op(i, *args), None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0]

    t0 = time.time()
    float(run(*args))
    c = time.time() - t0
    t0 = time.time()
    float(run(*args))
    dt = (time.time() - t0) * 1000 / ITERS
    print(f"{name:46s} {dt:8.2f} ms  (compile {c:5.1f}s)", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    V = 1_310_720            # max_verts + 4*max_tets at f3c config
    P = 583_200              # covered-pixel capacity at 1080^2, frac 0.5
    C = 14
    k1, k2, k3 = jax.random.split(key, 3)
    vattr = jax.random.normal(k1, (V, C))
    fids = jax.random.randint(k2, (P, 3), 0, V, jnp.int32)
    g = jax.random.normal(k3, (P, 3, C))

    # fwd gather [P,3,C]
    def gather_fwd(i, vattr, fids):
        return jnp.sum(vattr[fids] * (1.0 + i * 1e-9))

    scan_time("vertex gather fwd [P,3,C]", gather_fwd, vattr, fids)

    # bwd: scatter-add of P*3 rows x C into [V, C]
    def gather_bwd(i, vattr, fids, g):
        def f(va):
            return jnp.sum(va[fids] * (g + i * 1e-9))
        return jnp.sum(jax.grad(f)(vattr))

    scan_time("vertex gather fwd+bwd (scatter-add)", gather_bwd, vattr,
              fids, g)

    # direct .at[].add formulation
    def direct_scatter(i, fids, g):
        buf = jnp.zeros((V, C))
        return jnp.sum(buf.at[fids.reshape(-1)].add(
            (g + i * 1e-9).reshape(-1, C)))

    scan_time("direct scatter-add [3P rows x 14]", direct_scatter, fids, g)

    # segment-sum alternative: sort keys once? measured for reference
    # (sort-by-vertex + segment_sum is the classic TPU workaround)
    def sorted_segsum(i, fids, g):
        keys = fids.reshape(-1)
        order = jnp.argsort(keys)
        ks = keys[order]
        vs = (g + i * 1e-9).reshape(-1, C)[order]
        return jnp.sum(jax.ops.segment_sum(vs, ks, num_segments=V))

    scan_time("argsort + segment_sum", sorted_segsum, fids, g)

    # texture-table scatter (corner-packed rows: 583k x 16 into 2^21 x 16)
    S = 1 << 21
    tbl_g = jax.random.normal(k1, (P, 16))
    tbl_idx = jax.random.randint(k2, (P,), 0, S, jnp.int32)

    def tex_scatter(i, idx, g):
        buf = jnp.zeros((S, 16))
        return jnp.sum(buf.at[idx].add(g + i * 1e-9))

    scan_time("texture table scatter [P x 16 -> 2^21]", tex_scatter,
              tbl_idx, tbl_g)


if __name__ == "__main__":
    main()
