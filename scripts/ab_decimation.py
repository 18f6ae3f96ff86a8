"""Decimation-budget A/B for the merged seq template (VERDICT r4 next#3a).

Rules `cluster_decimate` in or out of the seq-stage quality floor WITHOUT
spending TPU time: rebuilds the fused template from the split stage's saved
close-hole artifacts at several body-face budgets (including effectively
undecimated) and scores each against (a) the undecimated rewatertight body
and (b) the GT canonical surface — pure host geometry, CPU only.

    python scripts/ab_decimation.py --run out/full20_r05 \
        [--budgets 150000,300000,900000]

Writes AB_DECIMATION.json. The seq stage itself trains at the shipping
budget (pipeline/template.py merge_body_cloth target_faces=300k before head
subdivision); if the undecimated arm's chamfer-vs-GT matches the decimated
ones, decimation is exonerated and the seq floor lies elsewhere (merge
remesh, fusion, or iteration budget).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("D3H_PLATFORM", "cpu")
from d3human_tpu.utils.jax_setup import setup as _setup

_setup()


def chamfer_vs(v1, f1, v2, f2):
    from d3human_tpu.utils.metrics import mesh_chamfer

    return float(mesh_chamfer(np.asarray(v1), np.asarray(f1),
                              np.asarray(v2), np.asarray(f2)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--budgets", default="150000,300000,900000")
    ap.add_argument("--grid-res", type=int, default=96)
    ap.add_argument("--out", default="AB_DECIMATION.json")
    args = ap.parse_args()

    from d3human_tpu.data.synthetic import make_scene
    from d3human_tpu.pipeline import template as T
    from d3human_tpu.utils import io as mesh_io

    ch_dir = os.path.join(args.run, "close_hole_split_cloth0")
    body_obj = os.path.join(ch_dir, "body_concat.obj")
    cloth_obj = os.path.join(ch_dir, "cloth_concat.obj")
    smpl_obj = os.path.join(args.run, "smpl_template.obj")
    if not os.path.exists(body_obj):
        raise SystemExit(f"missing {body_obj} — run the split stage first")

    bv, bf = mesh_io.load_obj(body_obj)
    cv, cf = mesh_io.load_obj(cloth_obj)
    bf = T.trim_open_edges(bf, iters=2)
    soup_v, soup_f = bv, bf
    if os.path.exists(smpl_obj):
        sv, sf = mesh_io.load_obj(smpl_obj)
        sf_cut = T.distance_cut(sv, sf, cv, thresh=0.02)
        if len(sf_cut):
            sf_cut = T.trim_open_edges(sf_cut, iters=1)
        if len(sf_cut):
            sv = T.push_body_inside_cloth(sv, sf_cut, cv, cf)
            soup_v = np.concatenate([soup_v, sv]).astype(np.float32)
            soup_f = np.concatenate([soup_f, sf_cut + len(bv)])

    print("[ab] rewatertight (shared across arms)", flush=True)
    wv0, wf0 = T.rewatertight(soup_v, soup_f, grid_res=args.grid_res)
    print(f"[ab] undecimated body: {len(wv0)} verts {len(wf0)} faces",
          flush=True)

    # GT canonical surface (the synthetic capture's template body)
    scene = make_scene(resolution=(64, 64), n_frames=2)
    gt_v = np.asarray(scene.model.v_template, np.float32)
    gt_f = np.asarray(scene.model.faces, np.int64)

    out = {"undecimated_faces": int(len(wf0)),
           "undecimated_chamfer_vs_gt": chamfer_vs(wv0, wf0, gt_v, gt_f),
           "arms": {}}
    for budget in [int(b) for b in args.budgets.split(",")]:
        if budget >= len(wf0):
            v, f = wv0, wf0
        else:
            v, f = T.cluster_decimate(wv0, wf0, n_cells=512,
                                      target_faces=budget)
        arm = {
            "faces": int(len(f)), "verts": int(len(v)),
            "chamfer_vs_undecimated": chamfer_vs(v, f, wv0, wf0),
            "chamfer_vs_gt": chamfer_vs(v, f, gt_v, gt_f),
        }
        out["arms"][str(budget)] = arm
        print(f"[ab] budget {budget}: {arm}", flush=True)

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"[ab] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
