"""Full-scale perceptual-backbone quality A/B, scored where it matters.

VERDICT r3 missing#2 / next#5: the perceptual term's default must be backed
by an at-scale quality measurement on reconstruction metrics — not init
stability (AB_INIT only exonerated the term as the collapse *cause*) and
not the r2 toy-scale chamfer (PERCEPTUAL_AB.json). The reference weights
the term x50 in init / x5(+crop) in split / x20 in seq on normal-map
features (/root/reference/geometry/hmsdf.py:137-159, MobileNetV2 taps
[2,4,7] pretrained on ImageNet — weights that cannot ship in this image).

This harness runs the split_smpl stage (the perceptual term's heaviest
full-res user via the per-half normal losses, ref train.py:1062-1074) at
f3c scale from one shared pretrained state, one arm per backbone, and
scores each arm on: exported-mesh Chamfer vs the GT surface (cloth / body /
watertight), silhouette IoU, and masked PSNR over 8 turntable views.

    python scripts/ab_perceptual_split.py --iters 500 \
        --arms conv,none,pyramid --out AB_PERCEPTUAL_SPLIT.json

Writes the JSON incrementally (one entry per arm).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.utils.jax_setup import setup as _setup_jax

_setup_jax()

from d3human_tpu.config import load_config
from d3human_tpu.data.synthetic import make_scene
from d3human_tpu.models.geometry import GeometryModel
from d3human_tpu.models.perceptual import (
    ConvPerceptual, NullPerceptual, PyramidPerceptual,
)
from d3human_tpu.models.texture import MLPTexture3D
from d3human_tpu.ops.tet_grid import make_tet_grid
from d3human_tpu.render import light as light_mod
from d3human_tpu.train.step import TrainState, make_train_step

BACKBONES = {
    "conv": ConvPerceptual,
    "none": NullPerceptual,
    "pyramid": PyramidPerceptual,
}


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/f3c_synth_full4.json")
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--arms", default="conv,none,pyramid")
    p.add_argument("--out", default="AB_PERCEPTUAL_SPLIT.json")
    p.add_argument("--n-frames", type=int, default=64)
    p.add_argument("--n-views", type=int, default=8)
    return p.parse_args()


def main():
    args = parse_args()
    cfg0 = load_config(args.config,
                       overrides={"out_dir": "out/ab_perc_split"})
    os.makedirs(cfg0.out_dir, exist_ok=True)

    print("[setup] scene", flush=True)
    scene = make_scene(resolution=tuple(cfg0.render.train_res),
                       n_frames=args.n_frames)
    from d3human_tpu.data.dataset import shuffled_indexer
    order = shuffled_indexer(scene.n_frames, seed=cfg0.seed)

    g = cfg0.geometry
    crop_box = None
    if g.grid_crop > 0:
        cb = np.asarray(scene.canon.vs_template)[0]
        crop_box = (tuple(cb.min(0) - g.grid_crop),
                    tuple(cb.max(0) + g.grid_crop))
    grid = make_tet_grid(
        res=g.grid_res, bounds=((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5)),
        y_offset=g.grid_y_offset, scale=g.grid_scale, crop_box=crop_box,
        cache_path=os.path.join(cfg0.out_dir, "tet_grid.npz"))
    model = GeometryModel(cfg0, grid, scene.deformer, scene.canon)

    key = jax.random.PRNGKey(cfg0.seed)
    kG, kT, kL, kRun = jax.random.split(key, 4)
    gparams = model.init_params(kG, n_images=scene.n_frames)
    from d3human_tpu.train.checkpoint import (
        cached_sdf_pretrain, load_params, pretrain_cache_paths, save_params,
    )
    pcache, ncache = pretrain_cache_paths(cfg0, crop_box=crop_box)
    gparams, _ = cached_sdf_pretrain(
        model, gparams, cfg0.stages.sdf_mlp_pretrain_steps, pcache)
    if os.path.exists(ncache):
        gparams = dict(gparams)
        gparams["nonrigid"] = load_params(ncache, gparams["nonrigid"])
    else:
        gparams = model.pretrain_nonrigid_zero(
            gparams, cfg0.stages.sdf_deform_pretrain_steps)
        save_params(ncache, gparams["nonrigid"])

    mn = jnp.concatenate([jnp.asarray(cfg0.render.kd_min[:3]),
                          jnp.asarray(cfg0.render.ks_min)])
    mx = jnp.concatenate([jnp.asarray(cfg0.render.kd_max[:3]),
                          jnp.asarray(cfg0.render.ks_max)])
    tex = MLPTexture3D(cfg0.texture, (mn, mx))
    params0 = {
        "geometry": gparams,
        "pose": {k: jnp.asarray(np.asarray(v))
                 for k, v in scene.pose_params.items()},
        "material": tex.init(kT),
        "light": light_mod.create_trainable_env(kL, cfg0.render.probe_res),
    }
    host0 = jax.tree_util.tree_map(np.asarray, params0)

    # GT mesh at frame 0 for Chamfer
    pp = {k: np.asarray(v) for k, v in scene.pose_params.items()}
    sl = lambda n: jnp.asarray(pp[n][0:1])
    gv, _, _ = scene.model.forward(
        betas=jnp.asarray(pp["shape"]), root_pose=sl("root_pose"),
        body_pose=sl("body_pose"), transl=sl("trans"))
    gt_v, gt_f = np.asarray(gv[0]), np.asarray(scene.model.faces)
    garment = np.asarray(scene.garment_faces) > 0.5

    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))

    for arm in args.arms.split(","):
        if arm not in BACKBONES:
            raise SystemExit(f"unknown arm {arm}")
        cfg = dataclasses.replace(cfg0, loss=dataclasses.replace(
            cfg0.loss, perceptual_backbone=arm))
        perceptual = BACKBONES[arm]()
        perc_params = perceptual.init()
        print(f"[arm {arm}] compile", flush=True)
        tx, step_fn = make_train_step("split", model, tex, perceptual,
                                      perc_params, cfg)
        params = jax.tree_util.tree_map(jnp.asarray, host0)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        t0 = time.time()
        aux = None
        for it in range(args.iters):
            target = scene.frame_target(order(it))
            state, aux = step_fn(state, target,
                                 jax.random.fold_in(kRun, it))
            if it % 50 == 0:
                print(f"[arm {arm}] it={it} "
                      f"total={float(aux['total']):.3f}", flush=True)
        dt = time.time() - t0

        # exported meshes -> chamfer vs GT (+ per-part vs GT part faces)
        from d3human_tpu.train.stages import export_stage_meshes
        from d3human_tpu.utils import io as mesh_io
        from d3human_tpu.utils.metrics import mesh_chamfer

        sdir = os.path.join(cfg0.out_dir, f"arm_{arm}")
        paths = export_stage_meshes(model, state.params, sdir, "final")
        entry = {"iters": args.iters,
                 "s_per_iter": round(dt / args.iters, 3)}
        for name, path in paths.items():
            v, f = mesh_io.load_obj(path)
            if len(f) == 0:
                continue
            entry[f"chamfer_{name}"] = round(
                mesh_chamfer(v, f, gt_v, gt_f), 6)
        for part, gsel in (("cloth", garment), ("body", ~garment)):
            v, f = mesh_io.load_obj(paths[part])
            if len(f) and gsel.sum():
                entry[f"chamfer_{part}_vs_gtpart"] = round(
                    mesh_chamfer(v, f, gt_v, gt_f[gsel]), 6)

        # multiview IoU/PSNR
        from d3human_tpu.train.validate import validate_split_stage
        ious, psnrs = [], []
        step = max(1, scene.n_frames // args.n_views)
        for fi in range(0, scene.n_frames, step):
            t = scene.frame_target(fi)
            _, m = validate_split_stage(
                jax.random.fold_in(kRun, 900 + fi), model, state.params,
                tex, t, cfg)
            ious.append(float(m["mask_iou"]))
            psnrs.append(float(m["psnr"]))
        entry["iou_mean"] = round(float(np.mean(ious)), 4)
        entry["iou_min"] = round(float(np.min(ious)), 4)
        entry["psnr_mean"] = round(float(np.mean(psnrs)), 2)
        results[arm] = entry
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"[arm {arm}] done: {entry}", flush=True)


if __name__ == "__main__":
    main()
