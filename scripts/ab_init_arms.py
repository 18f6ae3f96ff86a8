"""Full-scale init-stage stability A/B (r3 diagnosis).

The r2/r3 full-scale parity runs both lost the init stage: r2 collapsed
(n_cross 54k->7k) and r3 exploded then collapsed (57k->220k->0) while
msk_loss climbed from 0.68 to ~18 — the optimizer actively un-fitting the
silhouette. Root-cause candidates:

  1. training data: frame_target() used to CLAMP the frame index, so every
     iter >= n_frames trained one fixed view and the synthetic turn spanned
     only 0.4 rad — the occluded ~80% of the volume was unconstrained
     (fixed in data/synthetic.py: reference-style ``itr % n_images`` cycling
     + full turntable rotation, ref dataset_split.py:207);
  2. the x50 perceptual normal loss on RANDOM conv features
     (PERCEPTUAL_AB.json already measured it hurting chamfer);
  3. plain step-size instability at 1080^2 silhouette-gradient scale.

This script isolates them at full f3c scale: ONE setup (scene, grid,
pretrained SDF), then short fresh-state init arms per variant, logging the
msk/n_cross trajectories that discriminate the hypotheses. Run on TPU:

    python scripts/ab_init_arms.py --iters 400 --arms conv,none,pyramid

Writes AB_INIT.json incrementally (one entry per arm).
"""

from __future__ import annotations

import argparse
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


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/f3c_synth.json")
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--arms", default="conv,none,pyramid",
                   help="comma list: conv|none|pyramid|lr01|lr3|warm1000|"
                        "sdflow|bf16|noclip|jitter4|cache|crop|denseaa")
    p.add_argument("--out", default="AB_INIT.json")
    p.add_argument("--grid-cache", default="out/parity_r03/tet_grid_128.npz")
    p.add_argument("--n-frames", type=int, default=8)
    p.add_argument("--shuffle", action="store_true",
                   help="reference-parity random frame order "
                        "(DataLoader shuffle=True, train.py:585)")
    return p.parse_args()


BACKBONES = {
    "conv": ConvPerceptual,
    "none": NullPerceptual,
    "pyramid": PyramidPerceptual,
}


def main():
    args = parse_args()
    cfg0 = load_config(args.config, overrides={"out_dir": "out/ab_init"})
    os.makedirs(cfg0.out_dir, exist_ok=True)

    print("[setup] scene", flush=True)
    scene = make_scene(resolution=tuple(cfg0.render.train_res),
                       n_frames=args.n_frames)
    if args.shuffle:
        from d3human_tpu.data.dataset import shuffled_indexer
        order = shuffled_indexer(scene.n_frames, seed=cfg0.seed)
    else:
        order = lambda it: it  # noqa: E731  (frame_target applies % itself)
    g = cfg0.geometry
    # honor the config's grid_crop so arms can run the PRODUCTION step
    # verbatim (--config configs/f3c_synth_full4.json; VERDICT r4 next#6 —
    # previously only the dedicated 'crop' arm built a cropped lattice,
    # so full4-config A/Bs silently ran the uncropped grid)
    cfg_crop_box = None
    if g.grid_crop > 0:
        cb0 = np.asarray(scene.canon.vs_template)[0]
        cfg_crop_box = (tuple(cb0.min(0) - g.grid_crop),
                        tuple(cb0.max(0) + g.grid_crop))
    grid = make_tet_grid(
        res=g.grid_res, bounds=((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5)),
        y_offset=g.grid_y_offset, scale=g.grid_scale,
        crop_box=cfg_crop_box,
        cache_path=(args.grid_cache if cfg_crop_box is None else
                    (args.grid_cache or "").replace(
                        ".npz", f"_crop{g.grid_crop:g}.npz") or None))
    if cfg_crop_box is not None:
        print(f"[setup] grid crop {grid.dims} of {g.grid_res}^3 "
              f"({grid.n_tets} tets)", flush=True)
    model = GeometryModel(cfg0, grid, scene.deformer, scene.canon)

    key = jax.random.PRNGKey(cfg0.seed)
    kG, kT, kL, kRun = jax.random.split(key, 4)
    gparams = model.init_params(kG, n_images=scene.n_frames)

    print("[setup] sdf pretrain", flush=True)
    t0 = time.time()
    from d3human_tpu.train.checkpoint import (
        cached_sdf_pretrain, load_params, pretrain_cache_paths, save_params,
    )
    pcache, ncache = pretrain_cache_paths(cfg0, crop_box=cfg_crop_box)
    gparams, ploss = cached_sdf_pretrain(
        model, gparams, cfg0.stages.sdf_mlp_pretrain_steps, pcache)
    if os.path.exists(ncache):
        gparams = dict(gparams)
        gparams["nonrigid"] = load_params(ncache, gparams["nonrigid"])
    else:
        gparams = model.pretrain_nonrigid_zero(
            gparams, cfg0.stages.sdf_deform_pretrain_steps)
        save_params(ncache, gparams["nonrigid"])
    print(f"[setup] pretrain done loss="
          f"{'cached' if ploss is None else f'{ploss:.2e}'} "
          f"({time.time()-t0:.0f}s)", flush=True)

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
    # host-side snapshot: each arm's TrainState is donated into its step,
    # so the shared starting tree must be rebuilt from host copies per arm
    host0 = jax.tree_util.tree_map(np.asarray, params0)

    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))

    for arm in args.arms.split(","):
        import dataclasses

        cfg = cfg0
        backbone = "conv"
        model_a, host0_a = model, host0   # crop arm swaps both
        if arm == "crop":
            # body-tight lattice (geometry.grid_crop lever): same cell
            # size, ~4-5x fewer cells; extraction-identical for surfaces
            # inside the crop (tests/test_grid_crop.py). Quality + speed
            # measured in one arm.
            cb = np.asarray(scene.canon.vs_template)[0]
            crop_box = (tuple(cb.min(0) - 0.1), tuple(cb.max(0) + 0.1))
            grid_c = make_tet_grid(
                res=g.grid_res, bounds=((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5)),
                y_offset=g.grid_y_offset, scale=g.grid_scale,
                crop_box=crop_box,
                cache_path=(args.grid_cache or "").replace(
                    ".npz", "_crop0.1.npz") or None)
            cfg = dataclasses.replace(cfg0, geometry=dataclasses.replace(
                cfg0.geometry, grid_crop=0.1))
            model_a = GeometryModel(cfg, grid_c, scene.deformer, scene.canon)
            print(f"[arm crop] grid {grid_c.dims} of {g.grid_res}^3 "
                  f"({grid_c.n_tets} tets)", flush=True)
            gp = model_a.init_params(kG, n_images=scene.n_frames)
            pc, _ = pretrain_cache_paths(cfg, crop_box=crop_box)
            gp, _pl = cached_sdf_pretrain(
                model_a, gp, cfg.stages.sdf_mlp_pretrain_steps, pc)
            gp = dict(gp)
            gp["nonrigid"] = jax.tree_util.tree_map(
                jnp.asarray, host0["geometry"]["nonrigid"])
            p0 = dict(params0)
            p0["geometry"] = gp
            host0_a = jax.tree_util.tree_map(np.asarray, p0)
        elif arm in BACKBONES:
            backbone = arm
        elif arm == "lr01":
            lr = list(cfg0.optim.learning_rate)
            cfg = dataclasses.replace(cfg0, optim=dataclasses.replace(
                cfg0.optim, learning_rate=(lr[0] * 0.1, lr[1])))
        elif arm == "lr3":
            lr = list(cfg0.optim.learning_rate)
            cfg = dataclasses.replace(cfg0, optim=dataclasses.replace(
                cfg0.optim, learning_rate=(lr[0] / 3.0, lr[1])))
        elif arm == "warm1000":
            cfg = dataclasses.replace(cfg0, optim=dataclasses.replace(
                cfg0.optim, warmup_iter=1000))
        elif arm == "sdflow":
            # only the init sdf_net group: ref 1e-2 -> 1e-3 (sdf lr 3e-5)
            cfg = dataclasses.replace(cfg0, optim=dataclasses.replace(
                cfg0.optim, sdf_lr_mult=1e-3))
        elif arm == "bf16":
            # sdf MLP hidden layers in bfloat16 (perf lever; quality gate)
            cfg = dataclasses.replace(cfg0, field=dataclasses.replace(
                cfg0.field, use_bfloat16=True))
        elif arm == "noclip":
            cfg = dataclasses.replace(cfg0, optim=dataclasses.replace(
                cfg0.optim, clip_max_norm=0.0))
        elif arm == "jitter4":
            # fewer texture-jitter taps (render.jitter_subsample 2 -> 4):
            # perf lever on the key-dependent ~225 ms bucket; quality gate
            # for flipping the default (the taps only feed the kd/ks
            # smoothness regularizers, ref render.py:72,102)
            cfg = dataclasses.replace(cfg0, render=dataclasses.replace(
                cfg0.render, jitter_subsample=4))
        elif arm == "cache":
            # on-device fp16 GT target cache (data/synthetic.py:
            # CachedTargets): same losses up to fp16 GT quantization;
            # wall-clock lever for the parity loop, quality gate here
            cfg = dataclasses.replace(cfg0, stages=dataclasses.replace(
                cfg0.stages, synthetic_target_cache=True))
        elif arm == "denseaa":
            # dense antialiasing (every neighbor pair, no sparse candidate
            # filter / capacity) at the CONFIG's lr. NOTE: with
            # f3c_synth.json this is the stabilized 0.003 (init_lr_scale
            # 0.1 is pinned there) — an AA-equivalence check at the
            # shipped settings, NOT the lr-0.03 discriminator. Use
            # denseaa03/conv03 for the stability hypothesis.
            cfg = dataclasses.replace(cfg0, render=dataclasses.replace(
                cfg0.render, aa_dense=True))
        elif arm in ("denseaa03", "conv03"):
            # the VERDICT r3 weak#5 discriminator, done right: TRUE
            # reference lr 0.03 (init_lr_scale reset to 1.0), dense vs
            # sparse AA otherwise identical. exp-1's conv arm at true 0.03
            # collapsed at it~=450; denseaa03 collapsing too falsifies
            # "sparse-AA gradient structure" as the mechanism, denseaa03
            # surviving convicts the sparse pair filter.
            cfg = dataclasses.replace(
                cfg0,
                optim=dataclasses.replace(cfg0.optim, init_lr_scale=1.0),
                render=dataclasses.replace(
                    cfg0.render, aa_dense=(arm == "denseaa03")))
        elif arm == "softmask":
            # candidate (a) falsifier (STABILITY.md round-4 note): TRUE lr
            # 0.03 + GT mattes softened with a ~2 px gaussian edge
            # (matting realism — real captures never have binary-exact
            # masks). Candidate (a) predicts this arm survives where
            # conv03 collapses.
            cfg = dataclasses.replace(cfg0, optim=dataclasses.replace(
                cfg0.optim, init_lr_scale=1.0))
        else:
            raise SystemExit(f"unknown arm {arm}")

        get_t = scene.frame_target
        if arm == "cache":
            from d3human_tpu.data.synthetic import CachedTargets

            get_t = CachedTargets(scene).frame_target
        elif arm == "softmask":
            # ~2 px separable gaussian on the GT alpha (rgb untouched):
            # the mask MSE / msdf-hinge objective sees a soft silhouette
            # basin instead of a binary-exact one
            k1 = jnp.asarray([0.0545, 0.2442, 0.4026, 0.2442, 0.0545])

            @jax.jit
            def _soften(img):
                pad = jnp.pad(img[..., 3], 2, mode="edge")
                h = sum(k1[i] * pad[:, i:i + img.shape[1]] for i in range(5))
                h = h[2:-2]
                v = jnp.pad(h, ((2, 2), (0, 0)), mode="edge")
                a2 = sum(k1[i] * v[i:i + img.shape[0]] for i in range(5))
                return jnp.concatenate([img[..., :3], a2[..., None]], -1)

            _soft_cache = {}

            def get_t(fi, _base=scene.frame_target):
                fi = int(fi)
                if fi not in _soft_cache:
                    t = dict(_base(fi))
                    t["all_img"] = _soften(t["all_img"])
                    _soft_cache[fi] = t
                return _soft_cache[fi]

        perceptual = BACKBONES[backbone]()
        perc_params = perceptual.init()
        print(f"[arm {arm}] compile", flush=True)
        tx, step_fn = make_train_step("init", model_a, tex, perceptual,
                                      perc_params, cfg)
        params = jax.tree_util.tree_map(jnp.asarray, host0_a)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))

        traj = []
        t0 = time.time()
        for it in range(args.iters):
            target = get_t(order(it))
            state, aux = step_fn(state, target,
                                 jax.random.fold_in(kRun, it))
            if it % 10 == 0 or it == args.iters - 1:
                row = {k: round(float(v), 4) for k, v in aux.items()
                       if np.ndim(v) == 0}
                row["it"] = it
                traj.append(row)
                if it % 50 == 0:
                    print(f"[arm {arm}] it={it} total={row['total']:.3f} "
                          f"msk={row['msk_loss']:.3f} "
                          f"iou={row.get('iou', float('nan')):.3f} "
                          f"n_cross={row['n_cross']:.0f}", flush=True)
        dt = time.time() - t0

        # end-of-arm quality eval: silhouette IoU + masked PSNR over 8
        # turntable views (quality discriminator beyond the msk trajectory)
        from d3human_tpu.utils.metrics import psnr as _psnr
        from d3human_tpu.train.validate import validate_stage
        ious, psnrs = [], []
        for fi in range(0, scene.n_frames, max(1, scene.n_frames // 8)):
            t = scene.frame_target(fi)
            _, buf = validate_stage(jax.random.fold_in(kRun, 999), model_a,
                                    state.params, tex, t, cfg,
                                    return_buffers=True)
            gt = np.asarray(t["all_img"])
            pa = np.asarray(buf.shaded[..., 3]) > 0.5
            ga = gt[..., 3] > 0.5
            ious.append(float((pa & ga).sum() / max((pa | ga).sum(), 1)))
            psnrs.append(float(_psnr(
                jnp.asarray(np.asarray(buf.shaded[..., :3]) * gt[..., 3:]),
                jnp.asarray(gt[..., :3] * gt[..., 3:]))))
        results[arm] = {
            "iters": args.iters, "s_per_iter": round(dt / args.iters, 3),
            "eval_iou_mean": round(float(np.mean(ious)), 4),
            "eval_iou_min": round(float(np.min(ious)), 4),
            "eval_psnr_mean": round(float(np.mean(psnrs)), 2),
            "final": traj[-1], "traj": traj,
        }
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"[arm {arm}] done: final msk={traj[-1]['msk_loss']:.3f} "
              f"n_cross={traj[-1]['n_cross']:.0f} ({dt:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
