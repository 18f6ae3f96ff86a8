"""Multi-view parity re-scoring from saved stage checkpoints.

PARITY.json's per-stage psnr/mask_iou come from ONE fixed validation view;
per-frame silhouette IoU spreads +-0.08 across the turntable (AB_INIT_ARMS2
trajectories), so a single view under- or over-states quality. This script
loads each stage's final TrainState checkpoint and scores the mean/min IoU
and mean PSNR over N evenly spaced views, writing PARITY_MULTIVIEW.json
next to PARITY.json.

    python scripts/eval_parity.py --out-dir out/parity_r03d \
        --config configs/f3c_synth.json --stages split_smpl,init,split

(synthetic scenes only — the real-capture path has no exact GT masks)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.utils.jax_setup import setup as _setup_jax

_setup_jax()

from d3human_tpu.config import load_config
from d3human_tpu.data.synthetic import make_scene
from d3human_tpu.models.geometry import GeometryModel
from d3human_tpu.models.perceptual import ConvPerceptual
from d3human_tpu.models.texture import MLPTexture3D
from d3human_tpu.ops.tet_grid import make_tet_grid
from d3human_tpu.render import light as light_mod
from d3human_tpu.train.checkpoint import latest_checkpoint, load_state
from d3human_tpu.train.step import TrainState, init_state
from d3human_tpu.train.validate import validate_split_stage, validate_stage
from d3human_tpu.utils.metrics import psnr as _psnr


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/f3c_synth.json")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--stages", default="split_smpl,init,split,seq")
    p.add_argument("--n-views", type=int, default=8)
    p.add_argument("--n-frames", type=int, default=64)
    return p.parse_args()


def make_part_ceilings(scene):
    """Analytic per-view IoU CEILINGS for the split halves, from GT
    geometry alone (VERDICT r3 weak#6: make the 'structural floor' claim
    concrete — 'X of a possible Y').

    The body half is scored against the VISIBLE-body mask but renders the
    watertight body (cloth-occluded torso included); the cloth half is an
    open shell whose back faces also project. The best any reconstruction
    can do per view is therefore the IoU of the GT *part-faces-only*
    projection vs the GT visible-part mask — rendered here with the oracle
    rasterizer on the GT mesh itself (ref split losses compare the same way,
    hmsdf.py:941-950)."""
    from d3human_tpu.ops.rasterizer import rasterize_bruteforce, xfm_points

    faces = jnp.asarray(scene.model.faces, jnp.int32)
    garment = jnp.asarray(scene.garment_faces) > 0.5

    @jax.jit
    def _alphas(frame_idx):
        pose = scene.pose_params
        sl = lambda n: jax.lax.dynamic_slice_in_dim(pose[n], frame_idx, 1, 0)
        verts, _, _ = scene.model.forward(
            betas=pose["shape"], root_pose=sl("root_pose"),
            body_pose=sl("body_pose"), transl=sl("trans"))
        v_clip = xfm_points(verts[0], scene.mvp)

        def cov(face_valid):
            r = rasterize_bruteforce(v_clip, faces, face_valid,
                                     scene.resolution)
            return r.tri_id > 0

        return (cov(garment), cov(~garment),
                cov(jnp.ones_like(garment)))

    def ceilings(frame_idx, target):
        cloth_cov, body_cov, _ = [np.asarray(a)
                                  for a in _alphas(jnp.asarray(frame_idx))]
        gt_cloth = np.asarray(target["cloth_img"][..., 3]) > 0.5
        gt_body = np.asarray(target["body_img"][..., 3]) > 0.5
        i = lambda a, b: float((a & b).sum() / max((a | b).sum(), 1))
        return {"cloth": i(cloth_cov, gt_cloth), "body": i(body_cov, gt_body)}

    return ceilings


def part_chamfers(scene, frame, mesh_paths):
    """Per-part Chamfer of exported split meshes vs the GT part surfaces
    (garment-labeled face subsets of the GT posed mesh)."""
    from d3human_tpu.utils import io as mesh_io
    from d3human_tpu.utils.metrics import mesh_chamfer

    pp = scene.pose_params
    sl = lambda n: jnp.asarray(np.asarray(pp[n])[frame:frame + 1])
    v, _, _ = scene.model.forward(
        betas=jnp.asarray(np.asarray(pp["shape"])), root_pose=sl("root_pose"),
        body_pose=sl("body_pose"), transl=sl("trans"))
    gt_v = np.asarray(v[0])
    gt_f = np.asarray(scene.model.faces)
    garment = np.asarray(scene.garment_faces) > 0.5
    out = {}
    for part, gf in (("cloth", gt_f[garment]), ("body", gt_f[~garment])):
        path = mesh_paths.get(part)
        if path is None or not os.path.exists(path) or len(gf) == 0:
            continue
        mv, mf = mesh_io.load_obj(path)
        if len(mf) == 0:
            continue
        out[f"chamfer_{part}_vs_gtpart"] = round(
            mesh_chamfer(mv, mf, gt_v, gf), 6)
    return out


def score_seq_stage(cfg, scene):
    """Per-frame, per-part Chamfer of the saved seq meshes (fine_all_<f>.ply,
    faces = the merged template's) vs the GT posed part surfaces — the
    disentanglement measure for the stage that produces D3-Human's actual
    product (ref seq artifacts, train.py:1513-1519)."""
    import re

    from d3human_tpu.pipeline.template import build_seq_template
    from d3human_tpu.utils.io import read_ply
    from d3human_tpu.utils.metrics import mesh_chamfer

    seq_dir = os.path.join(cfg.out_dir, "seq")
    process_dir = os.path.join(cfg.out_dir, "processsplit_cloth0")
    if not os.path.isdir(seq_dir):
        print("[seq] no seq dir, skipping", flush=True)
        return None
    try:
        template = build_seq_template(process_dir)
    except (FileNotFoundError, OSError):
        print("[seq] no merge template, skipping", flush=True)
        return None
    t_f = np.asarray(template.f)
    t_labels = np.asarray(template.face_labels)
    garment = np.asarray(scene.garment_faces) > 0.5
    gt_f_all = np.asarray(scene.model.faces)

    pp = scene.pose_params
    per_frame = {}
    for fn in sorted(os.listdir(seq_dir)):
        m = re.match(r"fine_all_(\d+)\.ply", fn)
        if not m:
            continue
        frame = int(m.group(1))
        v, f = read_ply(os.path.join(seq_dir, fn))
        if f.shape[0] != t_f.shape[0]:
            print(f"[seq] {fn}: face count {f.shape[0]} != template "
                  f"{t_f.shape[0]}; whole-mesh chamfer only", flush=True)
            labels = None
        else:
            labels = t_labels
        sl = lambda n: jnp.asarray(np.asarray(pp[n])[frame:frame + 1])
        gv, _, _ = scene.model.forward(
            betas=jnp.asarray(np.asarray(pp["shape"])),
            root_pose=sl("root_pose"), body_pose=sl("body_pose"),
            transl=sl("trans"))
        gt_v = np.asarray(gv[0])
        row = {"chamfer_all": round(mesh_chamfer(v, f, gt_v, gt_f_all), 6)}
        if labels is not None:
            for part, sel, gsel in (("cloth", labels == 1, garment),
                                    ("body", labels == 0, ~garment)):
                if sel.sum() and gsel.sum():
                    row[f"chamfer_{part}"] = round(
                        mesh_chamfer(v, f[sel], gt_v, gt_f_all[gsel]), 6)
        per_frame[frame] = row
        print(f"[seq] frame {frame}: {row}", flush=True)
    if not per_frame:
        return None
    entry = {"n_frames": len(per_frame), "per_frame": per_frame}
    for k in ("chamfer_all", "chamfer_cloth", "chamfer_body"):
        vals = [r[k] for r in per_frame.values() if k in r]
        if vals:
            entry[f"{k}_mean"] = round(float(np.mean(vals)), 6)
            entry[f"{k}_max"] = round(float(np.max(vals)), 6)
    return entry


def main():
    args = parse_args()
    cfg = load_config(args.config, overrides={"out_dir": args.out_dir})
    scene = make_scene(resolution=tuple(cfg.render.train_res),
                       n_frames=args.n_frames)
    g = cfg.geometry
    # crop-aware lattice: checkpoints trained with geometry.grid_crop have
    # cropped-lattice param shapes — the rescore must rebuild the identical
    # grid (same logic as train_d3h.py)
    crop_box, crop_tag = None, ""
    if g.grid_crop > 0:
        cb = np.asarray(scene.canon.vs_template)[0]
        crop_box = (tuple(cb.min(0) - g.grid_crop),
                    tuple(cb.max(0) + g.grid_crop))
        crop_tag = f"_crop{g.grid_crop:g}"
    grid = make_tet_grid(
        res=g.grid_res, bounds=((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5)),
        y_offset=g.grid_y_offset, scale=g.grid_scale, crop_box=crop_box,
        cache_path=os.path.join(
            cfg.out_dir, f"tet_grid_{g.grid_res}{crop_tag}.npz"))
    model = GeometryModel(cfg, grid, scene.deformer, scene.canon)

    key = jax.random.PRNGKey(cfg.seed)
    kG, kT, kL, _ = jax.random.split(key, 4)
    mn = jnp.concatenate([jnp.asarray(cfg.render.kd_min[:3]),
                          jnp.asarray(cfg.render.ks_min)])
    mx = jnp.concatenate([jnp.asarray(cfg.render.kd_max[:3]),
                          jnp.asarray(cfg.render.ks_max)])
    tex = MLPTexture3D(cfg.texture, (mn, mx))
    params = {
        "geometry": model.init_params(kG, n_images=scene.n_frames),
        "pose": {k: jnp.asarray(np.asarray(v))
                 for k, v in scene.pose_params.items()},
        "material": tex.init(kT),
        "light": light_mod.create_trainable_env(kL, cfg.render.probe_res),
    }

    ceilings_fn = make_part_ceilings(scene)
    out = {}
    opath = os.path.join(cfg.out_dir, "PARITY_MULTIVIEW.json")
    if os.path.exists(opath):
        out = json.load(open(opath))

    def flush_out():
        with open(opath, "w") as fh:
            json.dump(out, fh, indent=1)

    for stage in args.stages.split(","):
        if stage == "seq":
            entry = score_seq_stage(cfg, scene)
            if entry:
                out["seq"] = entry
                flush_out()
                print(f"[seq] {entry}", flush=True)
            continue
        # the split stage's artifacts land in split_cloth0 (train_d3h.py)
        sdir = os.path.join(cfg.out_dir,
                            "split_cloth0" if stage == "split" else stage)
        ck = latest_checkpoint(os.path.join(sdir, "ckp"))
        if ck is None:
            print(f"[{stage}] no checkpoint, skipping", flush=True)
            continue
        # optimizer family matters only for the opt_state pytree shape
        kind = "split" if stage.startswith("split") else stage
        state0, _ = init_state(kind, params, cfg)
        state = load_state(ck, state0)
        split_mode = stage.startswith("split")

        ious, psnrs = [], []
        part_ious = {"body": [], "cloth": []}
        part_ceils = {"body": [], "cloth": []}
        step = max(1, scene.n_frames // args.n_views)
        for fi in range(0, scene.n_frames, step):
            t = scene.frame_target(fi)
            k = jax.random.fold_in(key, 1000 + fi)
            if split_mode:
                _, m = validate_split_stage(k, model, state.params, tex, t,
                                            cfg)
                ious.append(float(m["mask_iou"]))
                psnrs.append(float(m["psnr"]))
                ceil = ceilings_fn(fi, t)
                for part in ("body", "cloth"):
                    if f"{part}_iou" in m:
                        part_ious[part].append(float(m[f"{part}_iou"]))
                        part_ceils[part].append(ceil[part])
            else:
                _, buf = validate_stage(k, model, state.params, tex, t, cfg,
                                        return_buffers=True)
                gt = np.asarray(t["all_img"])
                pa = np.asarray(buf.shaded[..., 3]) > 0.5
                ga = gt[..., 3] > 0.5
                ious.append(
                    float((pa & ga).sum() / max((pa | ga).sum(), 1)))
                psnrs.append(float(_psnr(
                    jnp.asarray(np.asarray(buf.shaded[..., :3])
                                * gt[..., 3:]),
                    jnp.asarray(gt[..., :3] * gt[..., 3:]))))
            print(f"[{stage}] frame {fi}: iou={ious[-1]:.4f} "
                  f"psnr={psnrs[-1]:.2f}", flush=True)
        out[stage] = {
            "checkpoint": os.path.basename(ck),
            "n_views": len(ious),
            "iou_mean": round(float(np.mean(ious)), 4),
            "iou_min": round(float(np.min(ious)), 4),
            "psnr_mean": round(float(np.mean(psnrs)), 2),
        }
        # Per-part silhouette IoUs (split stages). NOTE the structural
        # floors, matching reference semantics (hmsdf.py:941-950 compares
        # each half's FULL silhouette against the VISIBLE-part mask):
        # the body half renders the cloth-occluded torso, and in
        # split_smpl the tight SMPL cloth region cannot match a loose
        # garment silhouette — so split_smpl part IoUs sit low by
        # construction while union IoU is the convergence measure. The
        # split stage (real geometry) is where part IoUs become
        # meaningful for cloth; body keeps the occlusion floor.
        for part, vals in part_ious.items():
            if vals:
                out[stage][f"{part}_iou_mean"] = round(
                    float(np.mean(vals)), 4)
                ceil = float(np.mean(part_ceils[part]))
                out[stage][f"{part}_iou_ceiling"] = round(ceil, 4)
                # 'X of a possible Y': measured mean / analytic ceiling
                out[stage][f"{part}_iou_of_ceiling"] = round(
                    float(np.mean(vals)) / max(ceil, 1e-6), 4)
        # per-part Chamfer vs the GT garment/body face subsets (exported
        # final split meshes live next to the checkpoints)
        if split_mode:
            mesh_paths = {
                part: os.path.join(sdir, f"split_{part}_imesh_final.obj")
                for part in ("body", "cloth")}
            out[stage].update(part_chamfers(scene, 0, mesh_paths))
        flush_out()
        print(f"[{stage}] {out[stage]}", flush=True)


if __name__ == "__main__":
    main()
