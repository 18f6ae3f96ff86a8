"""CLI: the full 4-stage D3-Human reconstruction pipeline, TPU-native.

Equivalent of /root/reference/train.py:1528-1926:

    python train_d3h.py --config configs/f3c.json --folder_name f3c \
        --trainset_path ./data --out-dir out/f3c [--synthetic]

Stage graph (ref call stack, SURVEY §3.0):
    split_smpl -> close_hole -> init -> split -> close_hole+merge -> seq
with `--synthetic` running the whole pipeline on the built-in synthetic
scene (no licensed SMPL-X npz / capture data required).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.utils.jax_setup import setup as _setup_jax

_setup_jax()

from d3human_tpu.config import Config, load_config
from d3human_tpu.data.synthetic import make_scene
from d3human_tpu.models.geometry import GeometryModel
from d3human_tpu.models.perceptual import ConvPerceptual
from d3human_tpu.models.smplx.deformer import SMPLXDeformer
from d3human_tpu.models.smplx.model import load_smplx_npz, synthetic_body_model
from d3human_tpu.models.texture import MLPTexture3D
from d3human_tpu.ops.tet_grid import make_tet_grid
from d3human_tpu.pipeline.components import process_close_hole
from d3human_tpu.pipeline.template import build_seq_template, merge_body_cloth
from d3human_tpu.render import light as light_mod
from d3human_tpu.train.checkpoint import (
    cached_sdf_pretrain, latest_checkpoint, load_params, load_state,
    pretrain_cache_paths, save_params,
)
from d3human_tpu.train.stages import (
    export_stage_meshes, run_seq_stage, run_stage,
)
from d3human_tpu.train.step import TrainState, make_train_step


def parse_args():
    p = argparse.ArgumentParser("d3human_tpu")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--out-dir", dest="out_dir", type=str, default="out/run")
    p.add_argument("--trainset_path", type=str, default="./data")
    p.add_argument("--folder_name", type=str, default="")
    p.add_argument("--synthetic", action="store_true",
                   help="run on the built-in synthetic scene")
    p.add_argument("--synthetic-frames", type=int, default=64,
                   help="synthetic capture length (turntable frame count)")
    p.add_argument("--stages", type=str,
                   default="split_smpl,init,split,seq",
                   help="comma-separated subset of the stage graph")
    p.add_argument("--iters-scale", type=float, default=1.0,
                   help="scale all stage iteration counts (smoke runs)")
    p.add_argument("--seq-parallel", action="store_true",
                   help="optimize all seq-stage frames simultaneously as "
                        "per-frame replicas sharded over the device mesh "
                        "(wall-clock = max instead of the reference's "
                        "serial sum; no warm-start chain — every frame "
                        "gets the full first-frame iteration budget). "
                        "Use D3H_NUM_CPU_DEVICES=8 D3H_PLATFORM=cpu to "
                        "exercise it without a TPU pod.")
    p.add_argument("--resume", action="store_true",
                   help="resume each stage from its latest checkpoint "
                        "(full TrainState incl. optimizer moments; "
                        "ref load_ckp train.py:284-331)")
    return p.parse_args()


def _synth_gt_mesh(scene, frame: int, gt_pose=None):
    """GT posed surface of the synthetic capture at one frame. gt_pose is a
    numpy snapshot taken before training (the live pose arrays are donated
    into the jitted step and deleted)."""
    pp = gt_pose if gt_pose is not None else scene.pose_params
    sl = lambda n: jnp.asarray(np.asarray(pp[n])[frame: frame + 1])
    v, _, _ = scene.model.forward(
        betas=jnp.asarray(np.asarray(pp["shape"])),
        root_pose=sl("root_pose"), body_pose=sl("body_pose"),
        transl=sl("trans"))
    return np.asarray(v[0]), np.asarray(scene.model.faces)


def main():
    args = parse_args()
    cfg = load_config(args.config, overrides={"out_dir": args.out_dir})
    os.makedirs(cfg.out_dir, exist_ok=True)
    stages = args.stages.split(",")
    s = lambda n: max(2, int(n * args.iters_scale))

    # ---- parity bookkeeping (BASELINE.md protocol: per-stage Chamfer vs GT
    # geometry + PSNR/IoU from the validation pass; on synthetic scenes the
    # GT posed mesh is exactly known) --------------------------------------
    import json as _json

    parity: dict = {"config": args.config, "iters_scale": args.iters_scale,
                    "stages": {}}
    # on --resume, keep entries of stages this invocation doesn't re-run
    # (e.g. a --stages split,seq relaunch must not clobber init's entry)
    _ppath = os.path.join(cfg.out_dir, "PARITY.json")
    if args.resume and os.path.exists(_ppath):
        try:
            parity["stages"].update(_json.load(open(_ppath)).get("stages", {}))
        except Exception:
            pass

    def record_parity(stage_name, stage_dir, mesh_paths=None, scene=None,
                      frame=0):
        entry = {}
        fm = os.path.join(stage_dir, "validate", "final_metrics.json")
        if os.path.exists(fm):
            entry.update(_json.load(open(fm)))
        if scene is not None and mesh_paths:
            from d3human_tpu.utils import io as _io
            from d3human_tpu.utils.metrics import mesh_chamfer

            gt_v, gt_f = _synth_gt_mesh(scene, frame, gt_pose)
            for name, path in mesh_paths.items():
                v, f = _io.load_obj(path)
                if len(f) == 0:
                    continue
                entry[f"chamfer_{name}"] = round(
                    mesh_chamfer(v, f, gt_v, gt_f), 6)
        parity["stages"][stage_name] = entry
        with open(os.path.join(cfg.out_dir, "PARITY.json"), "w") as fh:
            _json.dump(parity, fh, indent=1)
        print(f"[parity] {stage_name}: {entry}", flush=True)

    key = jax.random.PRNGKey(cfg.seed)

    # ---------------- data + body model ----------------------------------
    if args.synthetic:
        # frame count approximates a real self-rotation capture: many
        # frames with small (~5-6 deg) view increments. Few widely-spaced
        # views make consecutive steps conflict violently (see
        # shuffled_indexer docstring / AB_INIT.json).
        scene = make_scene(resolution=tuple(cfg.render.train_res),
                           n_frames=args.synthetic_frames)
        deformer, canon = scene.deformer, scene.canon
        pose_params = scene.pose_params
        n_images = scene.n_frames
        from d3human_tpu.data.dataset import shuffled_indexer
        _order = shuffled_indexer(n_images, seed=cfg.seed)
        src = scene
        if (cfg.stages.synthetic_target_cache
                or os.environ.get("D3H_TARGET_CACHE", "") == "1"):
            from d3human_tpu.data.synthetic import CachedTargets
            src = CachedTargets(scene)
            print(f"[data] on-device fp16 target cache: {scene.n_frames} "
                  f"frames at {cfg.render.train_res}", flush=True)
        get_frame = src.frame_target              # frame semantics (seq)
        get_target = lambda it: get_frame(_order(it))  # noqa: E731
        # numpy snapshot of GT poses (live arrays are donated into the step)
        gt_pose = {k: np.asarray(v) for k, v in scene.pose_params.items()}
    else:
        from d3human_tpu.data.dataset import FrameDataset, composite_background
        data_root = os.path.join(args.trainset_path, args.folder_name)
        dataset = FrameDataset(data_root, cfg.render.train_res)
        gender = args.folder_name.split("/")[-1].split("-")[0] or "neutral"
        model_sx = load_smplx_npz(os.path.join(args.trainset_path, "smplx"),
                                  gender=gender)
        deformer = SMPLXDeformer(model_sx, k=1)
        shape = jnp.asarray(dataset.smplx_params["shape"])
        canon = deformer.initialize(shape[:, :model_sx.num_betas])
        pose_params = {k: jnp.asarray(v)
                       for k, v in dataset.smplx_params.items()}
        n_images = dataset.n_images
        rng = np.random.default_rng(0)
        from d3human_tpu.data.dataset import shuffled_indexer
        _order = shuffled_indexer(n_images, seed=cfg.seed)

        def get_frame(frame):                     # frame semantics (seq)
            t = dataset.frame_target(frame)
            t = composite_background(t, "random", rng)
            return {k: jnp.asarray(v) for k, v in t.items()}

        def get_target(it):
            return get_frame(_order(it))

    # ---------------- model ------------------------------------------------
    g = cfg.geometry
    crop_box, crop_tag = None, ""
    if g.grid_crop > 0:
        # body-tight lattice: canonical template bbox + margin (the SDF /
        # msdf / deform fields are only ever extracted near the template)
        cb = np.asarray(canon.vs_template)[0]
        crop_box = (tuple(cb.min(0) - g.grid_crop),
                    tuple(cb.max(0) + g.grid_crop))
        crop_tag = f"_crop{g.grid_crop:g}"
    grid = make_tet_grid(
        res=g.grid_res,
        bounds=((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5)),
        y_offset=g.grid_y_offset, scale=g.grid_scale, crop_box=crop_box,
        cache_path=os.path.join(cfg.out_dir,
                                f"tet_grid_{g.grid_res}{crop_tag}.npz"))
    if crop_box is not None:
        print(f"[grid] crop {grid.dims} of {g.grid_res}^3 "
              f"({grid.n_verts} verts, {grid.n_tets} tets)", flush=True)
    model = GeometryModel(cfg, grid, deformer, canon)

    kG, kT, kL, kRun = jax.random.split(key, 4)
    gparams = model.init_params(kG, n_images=n_images)

    print("[pretrain] SDF -> template body SDF", flush=True)
    # disk-cached like the reference (hmsdf.py:251-253, :289-291) — keyed by
    # everything that determines the result (grid, steps, seed)
    pcache, ncache = pretrain_cache_paths(cfg, crop_box=crop_box)
    gparams, ploss = cached_sdf_pretrain(
        model, gparams, cfg.stages.sdf_mlp_pretrain_steps, pcache)
    print(f"[pretrain] done, loss="
          f"{'cached' if ploss is None else f'{ploss:.2e}'}", flush=True)
    if os.path.exists(ncache):
        print(f"[pretrain] cached nonrigid <- {ncache}", flush=True)
        gparams = dict(gparams)
        gparams["nonrigid"] = load_params(ncache, gparams["nonrigid"])
    else:
        gparams = model.pretrain_nonrigid_zero(
            gparams, cfg.stages.sdf_deform_pretrain_steps)
        save_params(ncache, gparams["nonrigid"])

    mn = jnp.concatenate([jnp.asarray(cfg.render.kd_min[:3]),
                          jnp.asarray(cfg.render.ks_min)])
    mx = jnp.concatenate([jnp.asarray(cfg.render.kd_max[:3]),
                          jnp.asarray(cfg.render.ks_max)])
    tex = MLPTexture3D(cfg.texture, (mn, mx))
    if cfg.loss.perceptual_backbone == "mobilenet":
        from d3human_tpu.models.mobilenet import MobileNetFeatures

        perceptual = MobileNetFeatures()
        perc_params = perceptual.init(cfg.loss.perceptual_npz)
    elif cfg.loss.perceptual_backbone == "pyramid":
        from d3human_tpu.models.perceptual import PyramidPerceptual

        perceptual = PyramidPerceptual()
        perc_params = perceptual.init()
    elif cfg.loss.perceptual_backbone == "none":
        from d3human_tpu.models.perceptual import NullPerceptual

        perceptual = NullPerceptual()
        perc_params = perceptual.init()
    else:
        perceptual = ConvPerceptual()
        perc_params = perceptual.init()

    params = {
        "geometry": gparams,
        "pose": pose_params,
        "material": tex.init(kT),
        "light": light_mod.create_trainable_env(kL, cfg.render.probe_res),
    }

    def stage_state(stage):
        tx, step_fn = make_train_step(stage, model, tex, perceptual,
                                      perc_params, cfg)
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32)), step_fn

    def precompile_async(stage):
        """AOT-compile the NEXT stage's jitted step in a daemon thread while
        the current stage trains (VERDICT r3 weak#7: the ~510 s full-scale
        step compile was half the wall-clock of a short stage). The compile
        populates the persistent cache (utils/jax_setup.py), so the stage's
        real first call deserializes in seconds.

        Tracing is shape-only (.lower on abstract avals — no device
        buffers), but .compile() for a TPU target IS device-side work on
        axon: it rides the same remote-compile channel the trainer uses, so
        it can add latency to the training loop's own compiles mid-stage
        (acceptable: stages compile once, then run thousands of iterations).
        The target's avals are captured HERE on the caller's thread —
        get_target(0) executes device compute (synthetic GT render), which
        must not race the training loop from a daemon thread. Opt out via
        D3H_PRECOMPILE=0."""
        if os.environ.get("D3H_PRECOMPILE", "1") != "1":
            return
        import threading

        # eval_shape preserves weak_type so the abstract avals match the
        # real call's exactly (a mismatch would compile a never-reused
        # variant)
        abstract = lambda tree: jax.eval_shape(lambda x: x, tree)
        tgt_ab = abstract(get_target(0))       # device work: main thread

        def run():
            try:
                t0 = __import__("time").time()
                tx, step_fn = make_train_step(stage, model, tex, perceptual,
                                              perc_params, cfg)
                p_ab = abstract(params)
                st_ab = TrainState(
                    params=p_ab,
                    opt_state=jax.eval_shape(tx.init, p_ab),
                    step=jax.ShapeDtypeStruct((), jnp.int32))
                key_ab = abstract(jax.random.PRNGKey(0))
                step_fn.jitted.lower(
                    st_ab, tgt_ab, key_ab,
                    abstract(step_fn.consts)).compile()
                print(f"[precompile] {stage} step ready "
                      f"({__import__('time').time() - t0:.0f}s)", flush=True)
            except Exception as e:  # noqa: BLE001 — advisory only
                print(f"[precompile] {stage} failed: {type(e).__name__}: {e}",
                      flush=True)

        threading.Thread(target=run, daemon=True,
                         name=f"precompile-{stage}").start()

    def maybe_resume(state, stage_dir, n_iters):
        """--resume: restore the latest full TrainState for this stage and
        return (state, start_it). A finished stage resumes at n_iters (the
        loop no-ops) so re-running the pipeline skips completed work —
        the init->split reload the reference does explicitly at
        train.py:1825 falls out of this (split starts from init's params
        carried in-memory or from its own checkpoints on disk)."""
        if not args.resume:
            return state, 0
        ck = latest_checkpoint(os.path.join(stage_dir, "ckp"))
        if ck is None:
            return state, 0
        state = load_state(ck, state)
        start_it = int(os.path.basename(ck)[len("state_"):-4])
        print(f"[resume] {ck} -> start_it={start_it + 1}", flush=True)
        return state, min(start_it + 1, n_iters)

    # ---------------- stage graph -----------------------------------------
    if "split_smpl" in stages:
        state, step_fn = stage_state("split")
        sdir = os.path.join(cfg.out_dir, "split_smpl")
        n = s(cfg.stages.split_smpl_epoch)
        state, start_it = maybe_resume(state, sdir, n)
        if "init" in stages:
            precompile_async("init")   # overlap init's ~510 s compile
        state = run_stage("split_smpl", n, state, step_fn, get_target, cfg,
                          sdir, kRun, model, start_it=start_it,
                          tex_module=tex)
        params = state.params
        paths = export_stage_meshes(model, params,
                                    os.path.join(cfg.out_dir, "split_smpl"),
                                    "final")
        process_close_hole(os.path.join(cfg.out_dir, "close_hole_smpl"),
                           paths["body"], paths["cloth"])
        record_parity("split_smpl", sdir, paths,
                      scene if args.synthetic else None)

    if "init" in stages:
        params = dict(params)
        params["geometry"] = model.reinit_fields(
            jax.random.fold_in(key, 7), params["geometry"])
        params["geometry"], _ = cached_sdf_pretrain(
            model, params["geometry"], cfg.stages.sdf_mlp_pretrain_steps,
            pcache)
        state, step_fn = stage_state("init")
        sdir = os.path.join(cfg.out_dir, "init")
        n = s(cfg.stages.init_epoch)
        state, start_it = maybe_resume(state, sdir, n)
        if "split" in stages and "split_smpl" not in stages:
            # split_smpl already compiled the split-family step otherwise
            precompile_async("split")
        state = run_stage("init", n, state, step_fn, get_target, cfg, sdir,
                          jax.random.fold_in(kRun, 1), model,
                          start_it=start_it, tex_module=tex)
        params = state.params
        paths = export_stage_meshes(model, params, sdir, "final")
        record_parity("init", sdir, {"watertight": paths["watertight"]},
                      scene if args.synthetic else None)

    process_dir = os.path.join(cfg.out_dir, "processsplit_cloth0")
    if "split" in stages:
        state, step_fn = stage_state("split")
        sdir = os.path.join(cfg.out_dir, "split_cloth0")
        n = s(cfg.stages.split_epoch)
        state, start_it = maybe_resume(state, sdir, n)
        state = run_stage("split", n, state, step_fn, get_target, cfg, sdir,
                          jax.random.fold_in(kRun, 2), model,
                          start_it=start_it, tex_module=tex)
        params = state.params
        paths = export_stage_meshes(model, params,
                                    os.path.join(cfg.out_dir, "split_cloth0"),
                                    "final")
        record_parity("split", sdir, paths,
                      scene if args.synthetic else None)
        # host merge pipeline, resume-aware: on --resume, completed outputs
        # are reused (each marker below is the step's last-written file), so
        # a watchdog relaunch during the seq stage does not repay the ~15 min
        # close-hole + merge host/TPU work
        ch_dir = os.path.join(cfg.out_dir, "close_hole_split_cloth0")
        ch = {"body": os.path.join(ch_dir, "body_concat.obj"),
              "cloth": os.path.join(ch_dir, "cloth_concat.obj"),
              "bbox": os.path.join(ch_dir, "bbox.npz")}
        if not (args.resume and os.path.exists(ch["bbox"])):
            ch = process_close_hole(ch_dir, paths["body"], paths["cloth"])
        else:
            print("[close_hole] resume: reusing", ch_dir, flush=True)
        # SMPL template mesh: the under-cloth body patch donor for the
        # distance cut (ref smpl_cloth_path, script...:629-690)
        from d3human_tpu.utils import io as mesh_io
        smpl_path = os.path.join(cfg.out_dir, "smpl_template.obj")
        mesh_io.write_obj(smpl_path, np.asarray(canon.vs_template[0]),
                          np.asarray(deformer.model.faces))
        merge_marker = os.path.join(process_dir, "inside_body_index.npz")
        if not (args.resume and os.path.exists(merge_marker)):
            merge_body_cloth(process_dir, ch["body"], ch["cloth"],
                             grid_res=min(96, cfg.geometry.grid_res),
                             smpl_obj=smpl_path, bbox_npz=ch.get("bbox"))
        else:
            print("[merge] resume: reusing", process_dir, flush=True)

    if "seq" in stages:
        template = build_seq_template(process_dir)
        if args.synthetic:
            # merge-pipeline error floor (r5 seq-quality diagnostic): the
            # chamfer of the UNOPTIMIZED fused template posed to frame 0 vs
            # the GT surface isolates what close-hole/msdf-cut/decimate/
            # fusion cost BEFORE any seq iteration — if this is already at
            # the seq stage's final chamfer, the gap is the merge, not the
            # per-frame optimization budget
            from d3human_tpu.utils.metrics import mesh_chamfer as _mc
            t0 = get_frame(0)
            posed0 = jax.jit(model.pose_verts)(
                template.v, params["pose"], t0["frame_idx"])
            gt_v0, gt_f0 = _synth_gt_mesh(scene, 0, gt_pose)
            ch_t = _mc(np.asarray(posed0), np.asarray(template.f),
                       gt_v0, gt_f0)
            parity["stages"]["seq_template_frame0"] = {
                "chamfer_unoptimized_template": round(float(ch_t), 6),
                "n_faces": int(template.f.shape[0]),
                "n_verts": int(template.v.shape[0])}
            with open(os.path.join(cfg.out_dir, "PARITY.json"), "w") as fh:
                _json.dump(parity, fh, indent=1)
            print(f"[parity] seq template frame0 chamfer={ch_t:.6f} "
                  f"({template.f.shape[0]} faces)", flush=True)
        if cfg.stages.seq_static_skin_weights:
            # one-time KNN weight transfer at the rest template (perf lever;
            # default OFF = reference per-iteration re-interpolation)
            template = dataclasses.replace(
                template, w_pts=jax.jit(model.static_skin_weights)(template.v))
        cfg_seq = cfg
        if args.iters_scale != 1.0:
            cfg_seq = dataclasses.replace(cfg, stages=dataclasses.replace(
                cfg.stages,
                seq_iters_first=s(cfg.stages.seq_iters_first),
                seq_iters_rest=s(cfg.stages.seq_iters_rest)))
        if args.seq_parallel:
            from d3human_tpu.train.stages import run_seq_stage_parallel
            run_seq_stage_parallel(
                params, template, get_frame, n_frames=n_images, cfg=cfg_seq,
                save_path=os.path.join(cfg.out_dir, "seq"),
                key=jax.random.fold_in(kRun, 3), model=model,
                tex_module=tex, perceptual=perceptual,
                perc_params=perc_params)
        else:
            tx, step_fn = make_train_step("seq", model, tex, perceptual,
                                          perc_params, cfg, template=template)
            state = TrainState(params=params, opt_state=tx.init(params),
                               step=jnp.zeros((), jnp.int32))
            run_seq_stage(state, step_fn, template, get_frame,
                          n_frames=n_images, cfg=cfg_seq,
                          save_path=os.path.join(cfg.out_dir, "seq"),
                          key=jax.random.fold_in(kRun, 3), model=model,
                          tex_module=tex)
        if args.synthetic:
            # per-frame Chamfer of the fitted seq meshes vs the GT posed
            # surfaces (BASELINE.md protocol on fine_all_*.ply)
            from d3human_tpu.utils.metrics import mesh_chamfer
            import re as _re

            from d3human_tpu.utils.io import read_ply

            seq_dir = os.path.join(cfg.out_dir, "seq")
            chs = []
            for fn in sorted(os.listdir(seq_dir)):
                m = _re.match(r"fine_all_(\d+)\.ply", fn)
                if not m:
                    continue
                frame = int(m.group(1))
                v, f = read_ply(os.path.join(seq_dir, fn))
                gt_v, gt_f = _synth_gt_mesh(scene, frame, gt_pose)
                chs.append(mesh_chamfer(v, f, gt_v, gt_f))
            if chs:
                record_parity("seq", seq_dir, None)
                parity["stages"]["seq"].update({
                    "chamfer_per_frame_mean": round(float(np.mean(chs)), 6),
                    "chamfer_per_frame_max": round(float(np.max(chs)), 6),
                    "n_frames": len(chs)})
                with open(os.path.join(cfg.out_dir, "PARITY.json"),
                          "w") as fh:
                    import json as _j
                    _j.dump(parity, fh, indent=1)

    print("[done]", flush=True)


if __name__ == "__main__":
    main()
