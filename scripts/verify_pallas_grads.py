"""On-device gradient-equivalence A/B of the Pallas kernel paths.

Interpret-mode unit tests exercise the kernel *logic* but not the compiled
Mosaic program (a real TPU-only bug was already caught once: the first_k
iota-dtype fix, commit 5d5fd2b). This script runs the ACTUAL init train
step twice on the chip from an identical TrainState — once with the Pallas
paths active (production), once with D3H_DISABLE_PALLAS=1 forcing every
XLA fallback — and compares the loss scalars and the post-step parameters.

A silent Mosaic miscompile in any gradient transpose (sorted-COO scatter,
gather_rows backward, first_k position scatter, raster binning) shows up as
a divergence far above float-accumulation noise (~1e-6 rel).

Usage (chip must be free):
    python scripts/verify_pallas_grads.py            # medium scale
    BENCH_SCALE=full python scripts/verify_pallas_grads.py
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def run_arm(disable_pallas: bool, scale: str):
    if disable_pallas:
        os.environ["D3H_DISABLE_PALLAS"] = "1"
    else:
        os.environ.pop("D3H_DISABLE_PALLAS", None)
    import bench
    state, step_fn, target, _ = bench.build(scale)
    key = jax.random.PRNGKey(7)
    new_state, aux = step_fn(state, target, key)
    jax.block_until_ready(aux["total"])
    scalars = {k: float(v) for k, v in aux.items()
               if hasattr(v, "ndim") and v.ndim == 0}
    leaves = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(new_state.params)
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        leaf = np.asarray(leaf, dtype=np.float64)
        leaves[name] = (float(np.linalg.norm(leaf)),
                        float(leaf.reshape(-1)[:8].sum()))
    return scalars, leaves


def main():
    scale = os.environ.get("BENCH_SCALE", "medium")
    assert jax.devices()[0].platform == "tpu", \
        "this A/B only means anything on the chip"
    print(f"# scale={scale}", file=sys.stderr)
    s_pallas, l_pallas = run_arm(False, scale)
    s_xla, l_xla = run_arm(True, scale)

    report = {"scale": scale, "scalars": {}, "params": {}, "worst": 0.0}
    for k in sorted(set(s_pallas) | set(s_xla)):
        a, b = s_pallas.get(k), s_xla.get(k)
        rel = (abs(a - b) / (abs(b) + 1e-12)) if (a is not None and
                                                  b is not None) else None
        report["scalars"][k] = {"pallas": a, "xla": b, "rel": rel}
        if rel is not None and np.isfinite(rel):
            report["worst"] = max(report["worst"], rel)
    for k in sorted(l_pallas):
        (na, sa), (nb, sb) = l_pallas[k], l_xla[k]
        rel = abs(na - nb) / (abs(nb) + 1e-12)
        report["params"][k] = {"norm_pallas": na, "norm_xla": nb, "rel": rel}
        report["worst"] = max(report["worst"], rel)
    report["verdict"] = ("MATCH (accumulation-order noise)"
                         if report["worst"] < 1e-3 else "DIVERGENT")
    out = os.path.join(REPO, "PALLAS_GRAD_AB.json")
    json.dump(report, open(out, "w"), indent=1)
    print(json.dumps({"worst_rel": report["worst"],
                      "verdict": report["verdict"]}))


if __name__ == "__main__":
    main()
