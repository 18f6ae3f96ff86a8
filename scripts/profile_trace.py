"""Op-level TPU attribution of the bench train step via jax.profiler.

The incremental forward ladder (profile_ladder.py) prices PREFIXES of the
pipeline, which is noisy at the 50-100 ms level: adding a rung changes what
XLA fuses/DCEs in everything before it (LADDER_r04.txt shows later rungs
measuring *cheaper* than earlier ones). This profiler instead captures a
device trace of the REAL compiled step and aggregates per-op durations —
exact attribution of where the milliseconds go inside the single fused
program the training loop actually runs.

    BENCH_STAGE=init python scripts/profile_trace.py [iters]

Env: everything bench.py honors (BENCH_STAGE/BENCH_SCALE/...) plus
PROFILE_TOP=<n> rows to print (default 45). Writes the raw trace dir under
out/trace/ and prints an aggregated table (grouped by fusion/op name with
framework source hints when present).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax


def capture(iters: int = 6) -> str:
    import bench as B

    scale = os.environ.get("BENCH_SCALE", "full")
    state, step_fn, target, ex = B.build(scale)
    key = jax.random.PRNGKey(0)
    # compile + warm OUTSIDE the trace
    for i in range(2):
        state, aux = step_fn(state, target, jax.random.fold_in(key, i))
    jax.block_until_ready(aux["total"])

    tdir = os.path.join("out", "trace")
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        for i in range(iters):
            state, aux = step_fn(state, target, jax.random.fold_in(key, 9 + i))
        jax.block_until_ready(aux["total"])
    return tdir


def load_events(tdir: str):
    paths = sorted(glob.glob(os.path.join(
        tdir, "**", "*.trace.json.gz"), recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {tdir} — device tracing "
                         f"unsupported on this backend?")
    with gzip.open(paths[-1], "rt") as fh:
        data = json.load(fh)
    return data.get("traceEvents", [])


def aggregate(events, iters: int, top: int = 45):
    # pid -> process name (device lanes are named like '/device:TPU:0 ...')
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", "")
    def collect(device_only: bool):
        per_op = collections.Counter()
        per_op_n = collections.Counter()
        total = 0.0
        for e in events:
            if e.get("ph") != "X":
                continue
            pname = pnames.get(e.get("pid"), "")
            if device_only and ("TPU" not in pname
                                and "tpu" not in pname.lower()):
                continue
            # skip per-module umbrella rows (duplicate the sum of their ops)
            name = e.get("name", "?")
            if name.startswith("jit_") or "XLA Modules" in pname:
                continue
            dur = float(e.get("dur", 0.0))
            per_op[name] += dur
            per_op_n[name] += 1
            total += dur
        return per_op, per_op_n, total

    per_op, per_op_n, total = collect(True)
    if not per_op:
        # axon/remote backends may label device lanes differently — fall
        # back to every lane (host rows are obvious by name)
        print("(no TPU-labeled lane; aggregating ALL lanes)")
        per_op, per_op_n, total = collect(False)
    rows = per_op.most_common(top)
    print(f"\n== device op totals over {iters} iters "
          f"(us summed; /iters for per-step) ==")
    print(f"{'ms/iter':>9}  {'calls':>6}  op")
    for name, us in rows:
        print(f"{us / 1000.0 / iters:9.3f}  {per_op_n[name] // iters:6d}  "
              f"{name[:110]}")
    print(f"{total / 1000.0 / iters:9.3f}  {'':6}  TOTAL device-busy")
    return rows, total


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    top = int(os.environ.get("PROFILE_TOP", "45"))
    tdir = capture(iters)
    events = load_events(tdir)
    aggregate(events, iters, top)


if __name__ == "__main__":
    main()
