"""Microbenchmark: XLA TPU gather cost vs row width + scatter-add cost.

Design input for the hash-grid texture redesign (PERF.md): is XLA's
row-gather cost per-row or per-byte, and how much does packing corner pairs
into wider rows (roll-and-concat trick) buy?

Measurement: the axon tunnel makes block_until_ready unreliable (PERF.md),
so each op runs ITERS times inside one lax.scan (with a per-iteration index
perturbation to defeat loop-invariant hoisting) and we read back ONE scalar;
a no-op scan baseline is subtracted.

Run on the TPU:  python scripts/bench_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import jax.numpy as jnp

ITERS = 30


def scan_time(name, op, *args):
    """op(i, *args) -> scalar. Returns per-iteration ms."""

    @jax.jit
    def run(*args):
        def body(acc, i):
            return acc + op(i, *args), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    out = float(run(*args))  # compile + 1st run
    t0 = time.time()
    out = float(run(*args))
    dt = (time.time() - t0) * 1000
    per = dt / ITERS
    print(f"{name:46s} {per:9.3f} ms/iter  (total {dt:7.1f} ms)")
    return per


def main():
    key = jax.random.PRNGKey(0)
    base = scan_time("noop baseline", lambda i: jnp.float32(0.0) * i)

    N_ROWS = 520_000
    for n_idx in (2_400_000,):
        idx = jax.random.randint(key, (n_idx,), 0, N_ROWS - ITERS)
        print(f"-- {n_idx} gathers from [{N_ROWS}, W] --")
        for W in (2, 8, 16, 32):
            tbl = jax.random.normal(key, (N_ROWS, W))

            def g(i, tbl, idx):
                return jnp.take(tbl, idx + i, axis=0).sum()

            scan_time(f"take rows W={W}", g, tbl, idx)

        W = 16
        tbl = jax.random.normal(key, (N_ROWS, W))
        vals = jax.random.normal(key, (n_idx, W))

        def s(i, vals, idx):
            return jnp.zeros((N_ROWS, W)).at[idx + i].add(vals).sum()

        scan_time(f"scatter-add {n_idx}x W={W}", s, vals, idx)

    # vertex-attr style gather/scatter (the pixel->vertex backward cost)
    V = 262_144
    for P in (1_200_000, 480_000):
        attrs = jax.random.normal(key, (V, 16))
        fidx = jax.random.randint(key, (P, 3), 0, V - ITERS)
        gv = jax.random.normal(key, (P, 3, 16))

        def vg(i, attrs, fidx):
            return attrs[fidx + i].sum()

        scan_time(f"vertex gather [{P},3] from [{V},16]", vg, attrs, fidx)

        def vs(i, gv, fidx):
            return jnp.zeros((V, 16)).at[fidx + i].add(gv).sum()

        scan_time(f"vertex scatter-add [{P},3]->[{V},16]", vs, gv, fidx)

    # full-image elementwise pass for reference (HBM roofline sanity)
    img = jax.random.normal(key, (1080, 1080, 4))

    def ew(i, img):
        return ((img + i) ** 2).sum()

    scan_time("elementwise 1080^2x4 read+sum", ew, img)

    print(f"(baseline noop {base:.3f} ms/iter — subtract mentally)")


if __name__ == "__main__":
    main()
