"""Score whatever seq frames exist and write the seq parity entry.

Round-end insurance for the full-scale completion run: train_d3h.py only
records the seq entry after ALL frames + chamfer eval (train_d3h.py:446),
so a run cut mid-seq leaves per-frame artifacts (fine_all_<f>.ply) but no
parity line. This scorer replays the same BASELINE.md protocol —
per-frame Chamfer of the fitted seq mesh vs the exactly-known synthetic
GT posed surface (ref artifact semantics: train.py:1513-1519) — over the
frames that finished, and merges the entry into <out>/PARITY.json with a
``partial`` marker when fewer than seq_max_frames completed.

Usage: python scripts/score_seq_partial.py --out-dir out/full4_r04 \
           --config configs/f3c_synth_full4.json [--n-frames 64]
CPU-only (D3H_PLATFORM=cpu is forced): safe to run next to a live TPU
trainer.
"""

import argparse
import json
import os
import re
import sys

os.environ.setdefault("D3H_PLATFORM", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", required=True)
    p.add_argument("--config", default="configs/f3c_synth_full4.json")
    p.add_argument("--n-frames", type=int, default=64,
                   help="synthetic capture frame count (train_d3h default)")
    args = p.parse_args()

    import numpy as np

    from train_d3h import _synth_gt_mesh
    from d3human_tpu.config import load_config
    from d3human_tpu.data.synthetic import make_scene
    from d3human_tpu.utils.io import read_ply
    from d3human_tpu.utils.metrics import mesh_chamfer

    cfg = load_config(args.config, overrides={"out_dir": args.out_dir})
    seq_dir = os.path.join(cfg.out_dir, "seq")
    if not os.path.isdir(seq_dir):
        print("no seq dir; nothing to score")
        return
    scene = make_scene(resolution=tuple(cfg.render.train_res),
                       n_frames=args.n_frames)
    gt_pose = {k: np.asarray(v) for k, v in scene.pose_params.items()}

    chs = {}
    for fn in sorted(os.listdir(seq_dir)):
        m = re.match(r"fine_all_(\d+)\.ply", fn)
        if not m:
            continue
        frame = int(m.group(1))
        v, f = read_ply(os.path.join(seq_dir, fn))
        gt_v, gt_f = _synth_gt_mesh(scene, frame, gt_pose)
        chs[frame] = mesh_chamfer(v, f, gt_v, gt_f)
        print(f"frame {frame}: chamfer {chs[frame]:.6f}", flush=True)
    if not chs:
        print("no completed seq frames; nothing to score")
        return

    ppath = os.path.join(cfg.out_dir, "PARITY.json")
    parity = (json.load(open(ppath)) if os.path.exists(ppath)
              else {"config": args.config, "stages": {}})
    entry = {
        "chamfer_per_frame_mean": round(float(np.mean(list(chs.values()))), 6),
        "chamfer_per_frame_max": round(float(np.max(list(chs.values()))), 6),
        "n_frames": len(chs),
        "per_frame": {str(k): round(float(v), 6) for k, v in chs.items()},
    }
    if len(chs) < cfg.stages.seq_max_frames:
        entry["partial"] = (f"{len(chs)}/{cfg.stages.seq_max_frames} frames "
                            f"done at scoring time")
    parity.setdefault("stages", {})["seq"] = entry
    with open(ppath, "w") as fh:
        json.dump(parity, fh, indent=1)
    print(json.dumps({"seq": entry}, indent=1))


if __name__ == "__main__":
    main()
