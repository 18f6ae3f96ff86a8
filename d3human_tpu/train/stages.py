"""Stage drivers: the 4-stage optimization pipeline.

Orchestrates the reference's stage graph (/root/reference/train.py:1528-1926):

  A. split_smpl — optimize_mesh_split on the SMPL-pretrained SDF (ref :1776)
  B. init       — reset msdf+sdf, optimize_mesh_init (ref :1802-1804)
  C. split      — reload init ckpt, optimize_mesh_split (ref :1825-1827),
                  then host template processing (close holes, msdf-cut
                  merge — pipeline/, ref :1843-1858)
  D. seq        — per-frame nonrigid refinement on the merged template
                  (ref :1921-1926, <=20 frames, 1000 iters for frame 0 else
                  300) — optionally frame-parallel over the device mesh
                  (parallel/frames.py), the rebuild's TPU win.

Each driver is a thin python loop around ONE jitted step; checkpoints,
scalar logs, validation strips, and mesh artifacts land in
out_dir/<stage>/ exactly like the reference's file-mediated DAG.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.config import Config
from d3human_tpu.models.geometry import GeometryModel, SeqTemplate
from d3human_tpu.train.checkpoint import save_params, save_state
from d3human_tpu.train.step import TrainState, make_train_step
from d3human_tpu.utils import io as mesh_io
from d3human_tpu.utils.logging import ScalarLogger, StepTimer


def run_stage(
    stage: str,
    n_iters: int,
    state: TrainState,
    step_fn,
    next_target: Callable[[int], Dict],
    cfg: Config,
    save_path: str,
    key,
    model: Optional[GeometryModel] = None,
    log_cb: Optional[Callable[[int, Dict], None]] = None,
    start_it: int = 0,
    tex_module=None,
    validate_every: Optional[int] = None,
    raster_opts: Optional[dict] = None,
):
    """Generic driver loop (ref optimize_mesh_init/split skeletons,
    train.py:651-833 / :949-1243). ``start_it`` resumes mid-stage; when
    ``tex_module`` is given, a validation strip + PSNR/IoU land in
    save_path/validate every ``validate_every`` iters (ref validate_itr,
    train.py:358-537 called from the drivers at save intervals)."""
    os.makedirs(save_path, exist_ok=True)
    logger = ScalarLogger(os.path.join(save_path, "loss_log"))
    timer = StepTimer()
    validate_every = validate_every or cfg.stages.save_checkpoint_interval

    def maybe_validate(it):
        if tex_module is None or model is None:
            return
        from d3human_tpu.train.validate import (
            validate_split_stage, validate_stage,
        )
        from d3human_tpu.utils.metrics import iou, psnr

        target = next_target(it)
        vdir = os.path.join(save_path, "validate")
        os.makedirs(vdir, exist_ok=True)
        if stage.startswith("split"):
            # split stages train two halves; a single-half render vs the
            # full-person mask caps IoU at the area ratio (r2 parity bug)
            strip, metrics = validate_split_stage(
                jax.random.fold_in(key, 0x7FFFFFFF), model, state.params,
                tex_module, target, cfg, raster_opts=raster_opts)
            mesh_io.save_image(os.path.join(vdir, f"img_pass1_{it:06d}.png"),
                               strip)
            logger.log(it, {f"val_{k}": v for k, v in metrics.items()})
            print(f"[{stage}] validate iter={it}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()),
                  flush=True)
            return metrics
        strip, buffers = validate_stage(
            jax.random.fold_in(key, 0x7FFFFFFF), model, state.params,
            tex_module, target, cfg, raster_opts=raster_opts,
            return_buffers=True)
        mesh_io.save_image(os.path.join(vdir, f"img_pass1_{it:06d}.png"),
                           strip)
        gt = target["all_img"]
        metrics = {
            "psnr": float(psnr(buffers.shaded[..., :3] * gt[..., 3:],
                               gt[..., :3] * gt[..., 3:])),
            "mask_iou": float(iou(buffers.shaded[..., 3] > 0.5,
                                  gt[..., 3] > 0.5)),
        }
        logger.log(it, {f"val_{k}": v for k, v in metrics.items()})
        print(f"[{stage}] validate iter={it}: psnr={metrics['psnr']:.2f} "
              f"iou={metrics['mask_iou']:.4f}", flush=True)
        return metrics

    # device sync every SYNC_EVERY iters, not every iter: a per-iteration
    # block_until_ready costs one axon RTT per step and serializes host-side
    # batch prep against device compute; the bound keeps the in-flight
    # dispatch queue (h2d target uploads) to ~10 steps.
    SYNC_EVERY = 10
    timer.start()
    for it in range(start_it, n_iters):
        target = next_target(it)
        state, aux = step_fn(state, target, jax.random.fold_in(key, it))
        timer.lap()
        if (it % SYNC_EVERY == 0 or it % cfg.stages.log_interval == 0
                or it == n_iters - 1):
            timer.flush(aux["total"])

        if it % cfg.stages.log_interval == 0:
            # ONE device_get for all scalars (a float() per key costs
            # one tunnel round-trip each)
            scalars = {k: float(v) for k, v in jax.device_get(
                {k: v for k, v in aux.items() if np.ndim(v) == 0}).items()}
            scalars["time_ms"] = timer.avg_ms
            logger.log(it, scalars)
            print(f"[{stage}] iter={it:5d} total={scalars['total']:.4f} "
                  f"time={timer.avg_ms:.1f}ms rem={timer.eta(n_iters - it)}",
                  flush=True)
            # z-ordered truncation is oracle-validated exact up to ~2.5x
            # capacity (tests/test_rasterizer.py overflow oracle); past
            # that, coverage loss becomes possible — surface it loudly
            # split stages prefix per-half metrics (body_/cloth_)
            # absurd-magnitude scalars: every loss term is bounded by
            # construction (sigmoid'd materials, unit normals, clamped
            # msdf), so values like 1e16 indicate a corrupted device
            # readback (seen once ~3 min before an axon tunnel death) or
            # a real NaN/overflow — either way, say so loudly
            absurd = {k: v for k, v in scalars.items()
                      if "loss" in k or k == "total"
                      if not (abs(v) < 1e9) or v != v}
            if absurd:
                print(f"[{stage}] WARNING: absurd loss scalars {absurd} — "
                      f"suspect corrupted readback or numerical blowup",
                      flush=True)
            nmt = max((v for k, v in scalars.items()
                       if k.endswith("n_max_tile")), default=0)
            if nmt > 2.5 * 896:
                print(f"[{stage}] WARNING: per-tile face count {nmt:.0f} "
                      f"exceeds validated truncation regime (2.5x 896); "
                      f"raster coverage may be wrong — raise "
                      f"max_faces_per_tile", flush=True)
            # oversize (multi-tile) faces past max_global are dropped
            # farthest-first (z-sorted like the per-tile lists) — still
            # loud when the 128-slot list overflows
            nbig = max((v for k, v in scalars.items()
                        if k.endswith("n_big_faces")), default=0)
            if nbig > 128:
                print(f"[{stage}] WARNING: {nbig:.0f} oversize faces exceed "
                      f"the {128}-slot global raster list; near-camera "
                      f"geometry may be dropped — raise max_global",
                      flush=True)
            if log_cb is not None:
                log_cb(it, scalars)

        if it % cfg.stages.save_checkpoint_interval == 0 and it != 0:
            save_state(os.path.join(save_path, "ckp", f"state_{it}.npz"),
                       state)
        if it % validate_every == 0 and it != 0:
            maybe_validate(it)
    fm_path = os.path.join(save_path, "validate", "final_metrics.json")
    if start_it >= n_iters and os.path.exists(fm_path):
        # resumed past the end of an already-validated stage: the state is
        # unchanged, so re-running the final validation only repays its
        # render compiles (and re-exposes the run to transient
        # remote-compile failures — one SIGKILL'd helper cost a full replay)
        print(f"[{stage}] resume: stage complete, reusing {fm_path}",
              flush=True)
        logger.close()
        return state
    save_state(os.path.join(save_path, "ckp", f"state_{n_iters - 1}.npz"),
               state)
    final_metrics = maybe_validate(n_iters - 1)
    if final_metrics is not None:
        import json

        with open(os.path.join(save_path, "validate",
                               "final_metrics.json"), "w") as fh:
            json.dump({"iter": n_iters - 1, **final_metrics}, fh)
    logger.close()
    return state


def export_stage_meshes(model: GeometryModel, params: Dict, save_path: str,
                        tag: str) -> Dict[str, str]:
    """Dump cloth/body/watertight template meshes as objs (ref split drivers
    write split_{body,cloth}_imesh_*.obj, train.py:977-989). Returns paths."""
    out = {}
    consts = model.consts()
    extract = jax.jit(lambda c, p, s: model.bind(c).extract(p, s))
    for name, sign in (("cloth", 1.0), ("body", -1.0)):
        mesh, _ = extract(consts, params["geometry"], sign)
        v, f = mesh_io.compact_mesh(mesh.verts, mesh.faces, mesh.face_valid)
        path = os.path.join(save_path, f"split_{name}_imesh_{tag}.obj")
        mesh_io.write_obj(path, v, f)
        out[name] = path
    # watertight template
    mesh, _ = extract(consts, params["geometry"], 1.0)
    v, f = mesh_io.compact_mesh(mesh.verts_wt, mesh.faces_wt,
                                mesh.face_wt_valid)
    path = os.path.join(save_path, f"watertight_imesh_{tag}.obj")
    mesh_io.write_obj(path, v, f)
    out["watertight"] = path
    return out


def _make_visible_triangles_fn(cfg):
    """Jitted face-id raster pass -> per-frame visible-triangle indices.

    The reference saves the rasterizer's visible-triangle set alongside each
    seq frame's delta (ref train.py:1513-1519, ids collected at
    render/render.py:404-407); downstream consumers mask per-frame edits
    with it. Returns a host function (posed_v, faces, mvp) -> int32 [K]."""
    from d3human_tpu.ops.rasterizer import rasterize, xfm_points

    @jax.jit
    def tri_id(v, f, mvp):
        rast = rasterize(xfm_points(v, mvp), f,
                         jnp.ones((f.shape[0],), bool),
                         tuple(cfg.render.train_res),
                         backend=cfg.render.backend)
        return rast.tri_id

    def visible(v, f, mvp):
        ids = np.unique(np.asarray(tri_id(v, f, mvp)))
        return (ids[ids > 0] - 1).astype(np.int32)

    return visible


def run_seq_stage_parallel(
    params: Dict,
    template: SeqTemplate,
    frame_targets: Callable[[int], Dict],
    n_frames: int,
    cfg: Config,
    save_path: str,
    key,
    model: GeometryModel,
    tex_module,
    perceptual,
    perc_params,
    n_devices: int = 0,
):
    """Frame-parallel seq driver (the TPU-native production path): every
    frame optimizes simultaneously as a per-frame parameter replica sharded
    over the device mesh's 'frames' axis (parallel/frames.py). Wall-clock
    is max(per-frame iters) instead of the reference's serial sum
    (ref train.py:1921-1926).

    Deviations from the serial-parity driver, by design (documented in
    parallel/frames.py): no frame-to-frame warm start, so EVERY frame runs
    the full ``seq_iters_first`` budget; the whole optimization is one jit
    call (no mid-run checkpoints — rerun on interruption). Artifacts are
    written in the exact serial format (delta/<f>.npz + fine_all_<f>.ply),
    so parity scoring and downstream tooling see no difference."""
    from d3human_tpu.parallel.frames import make_parallel_seq_runner
    from d3human_tpu.parallel.mesh import make_frame_mesh

    os.makedirs(os.path.join(save_path, "delta"), exist_ok=True)
    n_frames = min(n_frames, cfg.stages.seq_max_frames)
    mesh = make_frame_mesh(n_devices)
    n_dev = mesh.devices.size
    # pad the frame axis to a mesh multiple (shardings need divisibility);
    # padded replicas re-optimize frame 0 and are dropped at export
    n_pad = -(-n_frames // n_dev) * n_dev
    frames = [frame_targets(min(f, n_frames - 1)) for f in range(n_pad)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)

    launch, mesh = make_parallel_seq_runner(
        model, tex_module, perceptual, perc_params, template, cfg,
        n_frames=n_pad, n_iters=cfg.stages.seq_iters_first, mesh=mesh)
    print(f"[seq-par] {n_frames} frames (+{n_pad - n_frames} pad) x "
          f"{cfg.stages.seq_iters_first} iters on {n_dev} device(s)",
          flush=True)
    t0 = time.time()
    per_frame_params, totals = launch(params, stacked, key)
    totals = np.asarray(totals)                      # [n_pad, n_iters]
    wall = time.time() - t0
    print(f"[seq-par] done in {wall:.1f}s "
          f"({wall / cfg.stages.seq_iters_first * 1000:.1f} ms/iter "
          f"wall across all frames)", flush=True)

    logger = ScalarLogger(os.path.join(save_path, "loss_log"))
    # one jit object reused across frames (a fresh lambda per frame would
    # defeat the jit cache and retrace/compile n_frames times)
    export_fn = jax.jit(
        lambda c, g, t, p, i: model.bind(c).seq_deformed(g, t, p, i))
    visible_fn = _make_visible_triangles_fn(cfg)
    consts = model.consts()
    for frame in range(n_frames):
        for it in range(0, totals.shape[1], cfg.stages.log_interval):
            logger.log(frame * 100000 + it,
                       {"total": float(totals[frame, it])})
        p_f = jax.tree.map(lambda x: x[frame], per_frame_params)
        target = frames[frame]
        posed, delta = export_fn(consts, p_f["geometry"], template,
                                 p_f["pose"], target["frame_idx"])
        np.savez(os.path.join(save_path, "delta", f"{frame}.npz"),
                 delta=np.asarray(delta),
                 visible_triangles=visible_fn(posed, template.f,
                                              target["mvp"]))
        mesh_io.write_ply(os.path.join(save_path, f"fine_all_{frame}.ply"),
                          np.asarray(posed), np.asarray(template.f))
        print(f"[seq-par] frame={frame} final total="
              f"{float(totals[frame, -1]):.4f}", flush=True)
    logger.close()
    return per_frame_params


def run_seq_stage(
    state: TrainState,
    step_fn,
    template: SeqTemplate,
    frame_targets: Callable[[int], Dict],
    n_frames: int,
    cfg: Config,
    save_path: str,
    key,
    model: GeometryModel,
    tex_module=None,
):
    """Serial per-frame seq driver (ref train.py:1921-1926 + 1349-1352:
    frame 0 gets seq_iters_first, later frames seq_iters_rest; capped at
    seq_max_frames). The frame-parallel variant lives in parallel/frames.py.
    With ``tex_module`` given, each completed frame also writes a per-part
    opt-vs-ref validation strip + metrics (ref validate_itr_all)."""
    os.makedirs(os.path.join(save_path, "delta"), exist_ok=True)
    ckp_dir = os.path.join(save_path, "ckp")
    os.makedirs(ckp_dir, exist_ok=True)
    n_frames = min(n_frames, cfg.stages.seq_max_frames)
    timer = StepTimer()
    logger = ScalarLogger(os.path.join(save_path, "loss_log"))
    # one jit object across frames (a fresh per-frame lambda would retrace
    # and recompile the export n_frames times)
    export_fn = jax.jit(
        lambda c, g, t, p, i: model.bind(c).seq_deformed(g, t, p, i))
    visible_fn = _make_visible_triangles_fn(cfg)
    consts = model.consts()
    # per-frame resume: the post-frame state checkpoint is written after the
    # frame's artifacts, so its presence marks the frame complete; the serial
    # warm start (ref train.py:1349-1352) resumes exactly from the last one
    start_frame = 0
    from d3human_tpu.train.checkpoint import load_state, save_state
    for frame in range(n_frames - 1, -1, -1):
        p = os.path.join(ckp_dir, f"state_frame{frame}.npz")
        if os.path.exists(p):
            state = load_state(p, state)
            start_frame = frame + 1
            print(f"[seq] resume: frames 0..{frame} complete, "
                  f"starting at frame {start_frame}", flush=True)
            break
    for frame in range(start_frame, n_frames):
        iters = (cfg.stages.seq_iters_first if frame == 0
                 else cfg.stages.seq_iters_rest)
        target = frame_targets(frame)
        aux = None
        timer.start()
        for it in range(iters):
            state, aux = step_fn(state, target,
                                 jax.random.fold_in(key, frame * 100000 + it))
            timer.lap()
            if it % 10 == 0 or it % cfg.stages.log_interval == 0 \
                    or it == iters - 1:
                timer.flush(aux["total"])
            if it % cfg.stages.log_interval == 0:
                scalars = {k: float(v) for k, v in jax.device_get(
                    {k: v for k, v in aux.items()
                     if np.ndim(v) == 0}).items()}
                scalars["time_ms"] = timer.avg_ms
                logger.log(frame * 100000 + it, scalars)
                print(f"[seq] frame={frame} iter={it:4d} "
                      f"total={scalars['total']:.4f} "
                      f"time={timer.avg_ms:.1f}ms", flush=True)
        # per-frame delta artifact (ref train.py:1513-1519)
        posed, delta = export_fn(
            consts, state.params["geometry"], template,
            state.params["pose"], target["frame_idx"])
        np.savez(os.path.join(save_path, "delta", f"{frame}.npz"),
                 delta=np.asarray(delta),
                 visible_triangles=visible_fn(posed, template.f,
                                              target["mvp"]))
        mesh_io.write_ply(os.path.join(save_path, f"fine_all_{frame}.ply"),
                          np.asarray(posed), np.asarray(template.f))
        if tex_module is not None:
            from d3human_tpu.train.validate import validate_seq_stage
            vdir = os.path.join(save_path, "validate")
            os.makedirs(vdir, exist_ok=True)
            strip, metrics = validate_seq_stage(
                jax.random.fold_in(key, 0x7EADBEE + frame), model,
                state.params, tex_module, template, target, cfg)
            mesh_io.save_image(
                os.path.join(vdir, f"seq_frame{frame:04d}.png"), strip)
            logger.log(frame * 100000 + iters, {
                f"val_{k}": v for k, v in metrics.items()})
            print(f"[seq] validate frame={frame}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()),
                  flush=True)
        save_state(os.path.join(ckp_dir, f"state_frame{frame}.npz"), state)
        # resume only ever reads the LATEST frame checkpoint; prune older
        # ones once the new one is durably written (full-scale states are
        # ~100s of MB each — 20 frames would grow disk linearly for nothing)
        for old in range(frame - 1):
            op = os.path.join(ckp_dir, f"state_frame{old}.npz")
            if os.path.exists(op):
                os.remove(op)
    logger.close()
    return state
