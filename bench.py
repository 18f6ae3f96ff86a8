"""Benchmark: per-iteration wall-clock of the init-stage training step at
reference scale (f3c config: 128^3 G-Shell grid, 1080x1080 render, 6x256
Softplus SDF MLP, hash-grid texture) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note (BASELINE.md): the reference publishes no numbers — its V100
per-iteration wall-clock is only printed at runtime (ref train.py:805-806).
``vs_baseline`` is therefore measured against a documented engineering
estimate of the reference on V100 at the same config: ~3.0 iters/s
(nvdiffrast raster + OptiX BVH rebuild + chunked 2.1M-point MLP eval per
iteration). Replace REFERENCE_ITERS_PER_SEC when a measured number lands.
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_ITERS_PER_SEC = 3.0   # documented estimate, see module docstring

# seq-stage V100 estimate: explicit-mesh path (no marching tets), ~140k-face
# template at 1080^2 — nvdiffrast render_mask + 3 masked losses + LBS +
# knn collision per iter (ref train.py:1354-1421). Engineering estimate.
SEQ_REFERENCE_ITERS_PER_SEC = 5.0

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from d3human_tpu.utils.jax_setup import setup as _setup_jax  # noqa: E402

_setup_jax()


def _reap_training_stack():
    """One-TPU-process rule: if an unattended training stack (watchdog +
    trainer + job queue, scripts/watchdog_train.py / tpu_queue.sh) is live
    when the bench starts, two TPU clients would contend and wedge the RPC
    stream (PERF.md incident log) — and a wedged bench is the single worst
    outcome for a round. Kill the stack via its OWN pid files (never by
    process-name pattern); training resumes from stage checkpoints later."""
    if os.environ.get("D3H_PLATFORM") == "cpu":
        return
    from d3human_tpu.utils.run_guard import reap_training_stack

    reap_training_stack()


def _preflight_tunnel():
    """Fail FAST (one JSON line + rc=1) when the axon TPU relay is dead.

    Observed twice in round 3: the tunnel's host relay dies and the next
    jax backend init blocks forever in a futex wait — a hung bench is far
    worse for the driver than a clean error. Only probes when the axon
    platform would actually be selected."""
    if os.environ.get("D3H_PLATFORM") == "cpu":
        return
    import socket

    try:
        socket.create_connection(("127.0.0.1", 8082), timeout=3).close()
    except OSError:
        # No relay: either the tunnel is down or this is a non-axon host.
        # Distinguish by whether the axon plugin is importable.
        try:
            import axon.register  # noqa: F401
        except Exception:
            return  # not an axon image; let jax pick its own backend
        out = {
            "metric": "init_step_iters_per_sec", "value": 0.0,
            "unit": "iters/s", "vs_baseline": 0.0,
            "error": "axon TPU tunnel relay (:8082) is dead; "
                     "bench aborted before backend init to avoid hanging",
        }
        # point at the most recent REAL chip measurement so a tunnel
        # outage at round end doesn't erase the round's perf evidence
        # (value stays 0.0 — the stale number is provenance, not a claim)
        mid = os.path.join(REPO, "BENCH_MIDROUND_r03.json")
        try:
            with open(mid) as f:
                prev = json.load(f)
            out["last_measured_on_tpu"] = {
                "file": os.path.basename(mid),
                "value": prev.get("value"),
                "unit": prev.get("unit"),
                "vs_baseline": prev.get("vs_baseline"),
            }
        except (OSError, ValueError):
            pass
        print(json.dumps(out))
        sys.exit(1)


# NOTE: reap + preflight run from main(), NOT at import — importing bench
# (e.g. from the test suite's build-guard) must never SIGTERM the live
# unattended training stack (this exact accident killed a parity watchdog
# mid-round; the pid files are real even when the import is innocent).


def build(scale: str):
    from d3human_tpu.config import (
        Config, GeometryConfig, RenderConfig, StageConfig, TextureConfig,
    )
    from d3human_tpu.data.synthetic import make_scene
    from d3human_tpu.models.geometry import GeometryModel
    from d3human_tpu.models.perceptual import ConvPerceptual
    from d3human_tpu.models.texture import MLPTexture3D
    from d3human_tpu.ops.tet_grid import make_tet_grid
    from d3human_tpu.render import light as light_mod
    from d3human_tpu.train.step import TrainState, make_train_step

    if scale == "full":          # f3c reference scale
        res, grid_res = (1080, 1080), 128
        mv, mt = 2 ** 18, 196608
    elif scale == "medium":
        res, grid_res = (720, 720), 96
        mv, mt = 2 ** 17, 2 ** 17
    else:
        res, grid_res = (256, 256), 32
        mv, mt = 2 ** 14, 2 ** 14

    # The init total has no image term (ref train.py:718; the reference
    # still pays the texture/shade cost there for a log-only value), and the
    # shading-off init step is proven loss-bit-identical by
    # tests/test_golden_losses.py — so the framework ships init_shading off
    # and the default bench measures the as-shipped step. BENCH_SHADING=on
    # restores the reference-equivalent workload (shading computed + logged)
    # for apples-to-apples capture.
    env_shading = os.environ.get("BENCH_SHADING", "")
    if env_shading:
        shading = env_shading != "off"
    else:
        from d3human_tpu.config import RenderConfig
        shading = RenderConfig().init_shading
    # BENCH_BF16=1 flips the field-MLP hidden layers to bfloat16 — the
    # reference's FLAGS.use_float16 analogue, OFF by default there too
    # (ref train.py:1626). Speed capture only; a default flip is gated on
    # the AB_BACKBONE bf16 quality arm.
    from d3human_tpu.config import FieldConfig
    bf16 = os.environ.get("BENCH_BF16", "0") == "1"
    # BENCH_JITTER=<n> overrides render.jitter_subsample (texture jitter
    # taps are part of the ~225 ms key-dependent render work; higher
    # subsample = fewer taps).
    jit_sub = int(os.environ.get("BENCH_JITTER", "0") or "0")
    # BENCH_COV overrides render.max_covered_frac (the compacted-pixel
    # capacity). Default = the shipping full-scale configuration's 0.25
    # (configs/f3c_synth_full4.json; production coverage peaks ~0.12 of the
    # frame = 0.48 of this capacity — compaction is EXACT below capacity,
    # so this is value-identical to the library default 0.5 at half the
    # per-pixel rows; cap_cov overflow is asserted after the run).
    cov = float(os.environ.get("BENCH_COV", "0.25"))
    render_kw = dict(train_res=res, texture_res=res, init_shading=shading,
                     max_covered_frac=cov)
    if jit_sub:
        render_kw["jitter_subsample"] = jit_sub
    # Ablation knobs for step-cost attribution (each removes ONE loss-path
    # component; differences vs the default run price that component
    # fwd+bwd — the scan/micro profilers can't see through the fused step):
    #   BENCH_PERC=none|pyramid|conv   perceptual backbone (default conv)
    #   BENCH_NO_EIK=1                 drop the eikonal term (+ its
    #                                  double-backprop MLP pass)
    #   BENCH_NO_MSDFREG=1             drop the mesh-msdf open/close regs
    from d3human_tpu.config import LossConfig
    loss_kw = {}
    perc = os.environ.get("BENCH_PERC", "")
    if perc:
        loss_kw["perceptual_backbone"] = perc
    if os.environ.get("BENCH_NO_EIK", "0") == "1":
        loss_kw["use_eikonal"] = False
    if os.environ.get("BENCH_NO_MSDFREG", "0") == "1":
        loss_kw["use_mesh_msdf_reg"] = False
    # BENCH_SDF_CHUNK overrides geometry.sdf_chunk (0 = unchunked full-grid
    # MLP eval: removes the serialized remat while-loops — TRACE_r05 prices
    # them at ~68 ms/step fwd+bwd — at the cost of full activation memory)
    # default 0 = the shipping full-scale configuration (measured: 1.922
    # vs 1.843 it/s chunked, no OOM at f3c crop scale — the 680k-point
    # activation set fits v5e HBM comfortably; the chunked path remains for
    # bigger grids via the env or config)
    geo_kw = {"sdf_chunk": 0}
    if os.environ.get("BENCH_SDF_CHUNK", "") != "":
        geo_kw["sdf_chunk"] = int(os.environ["BENCH_SDF_CHUNK"])
    cfg = Config(
        field=FieldConfig(use_bfloat16=bf16),
        geometry=GeometryConfig(grid_res=grid_res, max_verts=mv, max_tets=mt,
                                **geo_kw),
        render=RenderConfig(**render_kw),
        loss=LossConfig(**loss_kw),
        stages=StageConfig(init_epoch=2001),
    )
    scene = make_scene(resolution=(64, 64), n_frames=2)  # poses/camera only
    # camera at bench render res
    from d3human_tpu.render.camera import look_at, perspective
    mvm = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0))
    proj = perspective(fovy=0.9, aspect=1.0)
    scene.mvp = jnp.asarray(proj @ mvm)
    scene.campos = jnp.asarray(np.linalg.inv(mvm)[:3, 3])
    scene.resolution = res

    # BENCH_GRID_CROP=<margin> crops the lattice to the canonical template
    # bbox + margin at identical cell positions (geometry.grid_crop lever;
    # a surface inside the crop extracts bitwise-identically —
    # tests/test_grid_crop.py).
    # default = the shipping full-scale configuration's margin (0.1,
    # pinned in configs/f3c_synth_full4.json; the library default is the
    # reference-parity 0.0) — the metric string discloses the active value
    env_crop = os.environ.get("BENCH_GRID_CROP", "")
    crop_m = float(env_crop) if env_crop else 0.1
    crop_box, crop_tag = None, ""
    if crop_m > 0:
        cb = np.asarray(scene.canon.vs_template)[0]
        crop_box = (tuple(cb.min(0) - crop_m), tuple(cb.max(0) + crop_m))
        crop_tag = f"_crop{crop_m:g}"
    cache = os.path.join(REPO, ".tet_cache", f"grid_{grid_res}{crop_tag}.npz")
    grid = make_tet_grid(res=grid_res,
                         bounds=((-0.6, -0.8, -0.4), (0.6, 0.8, 0.4)),
                         y_offset=0.0, scale=1.0, cache_path=cache,
                         crop_box=crop_box)
    if crop_box is not None:
        print(f"[bench] grid crop {grid.dims} of {grid_res}^3 "
              f"({grid.n_tets} tets)", flush=True)
    model = GeometryModel(cfg, grid, scene.deformer, scene.canon)

    key = jax.random.PRNGKey(0)
    kt, kl = jax.random.split(key)
    gparams = model.init_params(key, n_images=2)
    # The bench scene must contain a REAL surface. The r5 exact compactions
    # made extraction/covered-pixel cost occupancy-dependent (by design —
    # production pays for what it renders), and a random-init sdf_net has
    # no zero crossing in the lattice: an empty mesh silently under-prices
    # the pixel path (the r<=4 capacity-padded design was occupancy-blind,
    # so this never mattered before). Quick-fit the MLP to an analytic
    # capsule at production-like screen occupancy (~0.1 of the frame at the
    # bench camera), and give msdf a height split so the split-stage halves
    # carry real per-half faces and an open/close boundary.
    _v = np.asarray(grid.verts)
    _seg = np.clip(_v[:, 1], -0.35, 0.35)
    _ax = np.stack([np.zeros_like(_seg), _seg, np.zeros_like(_seg)], -1)
    _capsule = 0.24 - np.linalg.norm(_v - _ax, axis=-1)  # pos inside (ref)
    gparams, _ploss = model.pretrain_sdf(
        gparams, jnp.asarray(_capsule, jnp.float32),
        steps=int(os.environ.get("BENCH_SDF_SEED_STEPS", "400")))
    gparams["msdf"] = jnp.asarray(
        np.clip(_v[:, 1] * 4.0, -1.0, 1.0), jnp.float32)
    print(f"[bench] seeded capsule surface (pretrain loss {_ploss:.2e})",
          flush=True)
    tex = MLPTexture3D(cfg.texture, (jnp.zeros((6,)), jnp.ones((6,))))
    if cfg.loss.perceptual_backbone == "none":
        from d3human_tpu.models.perceptual import NullPerceptual
        perceptual = NullPerceptual()
    elif cfg.loss.perceptual_backbone == "pyramid":
        from d3human_tpu.models.perceptual import PyramidPerceptual
        perceptual = PyramidPerceptual()
    else:
        perceptual = ConvPerceptual()
    perc_params = perceptual.init()
    params = {
        "geometry": gparams,
        "pose": scene.pose_params,
        "material": tex.init(kt),
        "light": light_mod.create_trainable_env(kl, cfg.render.probe_res),
    }
    # BENCH_STAGE=split benches the split-stage step (both halves per iter,
    # ref train.py:1040-1045 — the slowest stage per the r03d parity run at
    # 2.98 s/iter) with the shared level-1 extraction (get_meshes_pair).
    stage = os.environ.get("BENCH_STAGE", "init")
    # BENCH_NO_AA=1 ablates the sparse-AA apply (XLA then dead-code-
    # eliminates the pair geometry too) — prices AA fwd+bwd incl. the
    # silhouette-gradient transposes
    if os.environ.get("BENCH_NO_AA", "0") == "1":
        from d3human_tpu.render import pipeline as _pl
        _pl.apply_aa_sparse = lambda img, pairs: img
    tx, step_fn = make_train_step(stage, model, tex, perceptual,
                                  perc_params, cfg)
    # BENCH_FWDONLY=1 times the loss evaluation alone (no grad/optimizer);
    # default-minus-this = total backward+update cost
    if os.environ.get("BENCH_FWDONLY", "0") == "1":
        # the FWDONLY consts thread template=None, which only the seq stage
        # consumes — fail loudly instead of crashing inside the loss
        assert stage in ("init", "split"), \
            f"BENCH_FWDONLY supports template-free stages, not {stage!r}"
        from d3human_tpu.train.step import make_stage_loss_fn
        loss_fn = make_stage_loss_fn(stage, tex, perceptual, perc_params,
                                     cfg, None)
        consts = {"model": model.consts(), "template": None}

        @jax.jit
        def fwd_step(state, target, key, consts=consts):
            total, aux = loss_fn(model.bind(consts["model"]),
                                 consts["template"], state.params, target,
                                 state.step, key)
            return state, aux

        step_fn = fwd_step
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    extras = {"model": model, "tex": tex, "perceptual": perceptual,
              "perc_params": perc_params, "cfg": cfg, "tx": tx,
              "stage": stage, "grid_crop": crop_m}

    # synthetic target at bench resolution (mask disc + noise rgb)
    H, W = res
    yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    mask = ((xx ** 2 / 0.15 + yy ** 2 / 0.7) < 1).astype(np.float32)[..., None]
    rgb = (0.5 + 0.2 * np.sin(8 * xx))[..., None].repeat(3, -1).astype(
        np.float32) * mask
    nrm = np.stack([xx, yy, np.sqrt(np.clip(1 - xx**2 - yy**2, 0, 1))],
                   -1).astype(np.float32) * mask
    target = {
        "frame_idx": jnp.int32(0),
        "mvp": scene.mvp, "campos": scene.campos,
        "all_img": jnp.asarray(np.concatenate([rgb, mask], -1)),
        "all_normal": jnp.asarray(nrm),
        "background": jnp.zeros((H, W, 3)),
    }
    if stage == "split":
        cloth_a = mask * (yy > 0)[..., None]
        body_a = mask - cloth_a
        target.update({
            "cloth_img": jnp.asarray(
                np.concatenate([rgb * cloth_a, cloth_a], -1)),
            "body_img": jnp.asarray(
                np.concatenate([rgb * body_a, body_a], -1)),
            "cloth_normal": jnp.asarray(nrm * cloth_a),
            "body_normal": jnp.asarray(nrm * body_a),
        })
    return state, step_fn, target, extras


def build3(scale):
    state, step_fn, target, _ = build(scale)
    return state, step_fn, target


def build_seq(scale: str):
    """Seq-stage bench: explicit-template per-frame refinement at full
    render scale (the reference's hot loop for 95% of its iterations —
    train.py:1349-1421). The full-scale template is synthesized at the r4
    completion run's MEASURED fused-template budget (~415k faces / ~134k
    verts after cluster decimation — VERDICT r4 weak#4: the old 141k-face
    stand-in flattered the seq number ~3.6x vs the real pipeline): the
    synthetic body is midpoint-subdivided past the budget, then
    cluster-decimated to it with the same pipeline/template.py step the
    production merge uses."""
    from d3human_tpu.config import (
        Config, GeometryConfig, RenderConfig, StageConfig, TextureConfig,
    )
    from d3human_tpu.data.synthetic import make_scene
    from d3human_tpu.models.geometry import GeometryModel, SeqTemplate
    from d3human_tpu.models.perceptual import ConvPerceptual
    from d3human_tpu.models.texture import MLPTexture3D
    from d3human_tpu.ops.mesh_ops import find_connected_faces
    from d3human_tpu.ops.tet_grid import make_tet_grid
    from d3human_tpu.pipeline.template import midpoint_subdivide_in_bbox
    from d3human_tpu.render import light as light_mod
    from d3human_tpu.train.step import TrainState, make_train_step

    # target_faces = the completion run's fused-template face count (README
    # r4 status / PARITY_r04 run: ~415k faces at 2.76 s/iter on chip);
    # BENCH_SEQ_FACES overrides for scaling studies
    if scale == "full":
        res, n_subdiv = (1080, 1080), 5          # 552 * 4^5 = 565k, then cut
        target_faces = int(os.environ.get("BENCH_SEQ_FACES", "415000"))
    elif scale == "medium":
        res, n_subdiv = (720, 720), 3
        target_faces = None
    else:
        res, n_subdiv = (256, 256), 2
        target_faces = None

    cfg = Config(
        geometry=GeometryConfig(grid_res=16, max_verts=2 ** 12,
                                max_tets=2 ** 12),
        render=RenderConfig(train_res=res, texture_res=res),
        stages=StageConfig(),
    )
    scene = make_scene(resolution=(64, 64), n_frames=2)
    from d3human_tpu.render.camera import look_at, perspective
    mvm = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0))
    proj = perspective(fovy=0.9, aspect=1.0)
    scene.mvp = jnp.asarray(proj @ mvm)
    scene.campos = jnp.asarray(np.linalg.inv(mvm)[:3, 3])
    scene.resolution = res

    # subdivide the body to template scale
    v = np.asarray(scene.model.v_template, np.float32)
    f = np.asarray(scene.model.faces, np.int64)
    big = (np.full(3, -1e9), np.full(3, 1e9))
    for _ in range(n_subdiv):
        v, f = midpoint_subdivide_in_bbox(v, f, big)
    if target_faces is not None and len(f) > target_faces:
        from d3human_tpu.pipeline.template import cluster_decimate
        v, f = cluster_decimate(v, f, target_faces=target_faces)
        v, f = np.asarray(v, np.float32), np.asarray(f, np.int64)
    fverts = v[f]
    cy = fverts[:, :, 1].mean(axis=1)
    labels = ((cy > -0.1) & (cy < 0.35)).astype(np.int64)
    vl = np.zeros(len(v), np.int64)
    vl[np.unique(f[labels == 1])] = 1
    connected, _ = find_connected_faces(f)
    template = SeqTemplate(
        v=jnp.asarray(v), f=jnp.asarray(f, jnp.int32),
        v_labels=jnp.asarray(vl),
        face_labels=jnp.asarray(labels, jnp.int32),
        body_vidx=jnp.asarray(np.nonzero(vl == 0)[0], jnp.int32),
        cloth_vidx=jnp.asarray(np.nonzero(vl == 1)[0], jnp.int32),
        body_f=jnp.asarray(f[labels == 0], jnp.int32),
        connected_faces=jnp.asarray(connected, jnp.int32),
    )
    print(f"# seq bench template: {len(v)} verts, {len(f)} faces",
          file=sys.stderr)
    if os.environ.get("BENCH_SEQ_STATICW", "0") == "1":
        # A/B the static-skin-weights lever (stages.seq_static_skin_weights)
        import dataclasses as _dc

        cfg = _dc.replace(cfg, stages=_dc.replace(
            cfg.stages, seq_static_skin_weights=True))

    grid = make_tet_grid(res=16,
                         bounds=((-0.6, -0.8, -0.4), (0.6, 0.8, 0.4)),
                         y_offset=0.0, scale=1.0)
    model = GeometryModel(cfg, grid, scene.deformer, scene.canon)
    if cfg.stages.seq_static_skin_weights:
        import dataclasses as _dc

        template = _dc.replace(
            template, w_pts=jax.jit(model.static_skin_weights)(template.v))
    key = jax.random.PRNGKey(0)
    kt, kl = jax.random.split(key)
    gparams = model.init_params(key, n_images=2)
    tex = MLPTexture3D(cfg.texture, (jnp.zeros((6,)), jnp.ones((6,))))
    perceptual = ConvPerceptual()
    perc_params = perceptual.init()
    params = {
        "geometry": gparams,
        "pose": scene.pose_params,
        "material": tex.init(kt),
        "light": light_mod.create_trainable_env(kl, cfg.render.probe_res),
    }
    tx, step_fn = make_train_step("seq", model, tex, perceptual,
                                  perc_params, cfg, template=template)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    target = scene.frame_target(0)
    return state, step_fn, target, {"cfg": cfg}


def main():
    _reap_training_stack()
    _preflight_tunnel()
    scale = os.environ.get("BENCH_SCALE", "full")
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    # the headline number must exercise the TPU kernel path: raster backend
    # 'auto' resolves to pallas on TPU and the sorted-COO scatter activates
    # via default_use_pallas() (VERDICT r1 weak#7 observability)
    plat = jax.devices()[0].platform
    if plat == "tpu":
        from d3human_tpu.config import Config
        from d3human_tpu.ops.scatter import default_use_pallas

        assert Config().render.backend in ("auto", "pallas"), \
            "bench must run the pallas raster backend on TPU"
        assert default_use_pallas(), "pallas scatter must be active on TPU"
        print(f"# platform={plat} raster=pallas scatter=pallas",
              file=sys.stderr)

    if scale.startswith("seq"):
        # BENCH_SCALE=seq[:full|medium|small] — seq-stage iters/sec
        sub = scale.split(":")[1] if ":" in scale else "full"
        state, step_fn, target, _ = build_seq(sub)
        key = jax.random.PRNGKey(42)
        for i in range(warmup):
            state, aux = step_fn(state, target, jax.random.fold_in(key, i))
        jax.block_until_ready(aux["total"])
        t0 = time.time()
        for i in range(iters):
            state, aux = step_fn(state, target,
                                 jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(aux["total"])
        ips = iters / (time.time() - t0)
        print(json.dumps({
            "metric": (f"seq-stage train iters/sec ({sub} scale: "
                       + ("static-skin-weights; "
                          if os.environ.get("BENCH_SEQ_STATICW") == "1"
                          else "")
                       + "subdivided template, raster res per config)"),
            "value": round(ips, 3),
            "unit": "iters/sec",
            "vs_baseline": round(ips / SEQ_REFERENCE_ITERS_PER_SEC, 3),
        }))
        return

    stage = os.environ.get("BENCH_STAGE", "init")
    # split runs BOTH halves per iteration (ref train.py:1040-1045), so the
    # reference-estimate throughput halves
    stage_baseline = (REFERENCE_ITERS_PER_SEC / 2.0 if stage == "split"
                      else REFERENCE_ITERS_PER_SEC)
    for attempt in ([scale, "medium", "small"] if scale == "full"
                    else [scale, "small"]):
        try:
            state, step_fn, target, extras = build(attempt)
            key = jax.random.PRNGKey(42)
            for i in range(warmup):
                state, aux = step_fn(state, target, jax.random.fold_in(key, i))
            jax.block_until_ready(aux["total"])
            t0 = time.time()
            for i in range(iters):
                state, aux = step_fn(state, target,
                                     jax.random.fold_in(key, 100 + i))
            jax.block_until_ready(aux["total"])
            dt = (time.time() - t0) / iters
            ips = 1.0 / dt
            sh = ("" if stage != "init" else
                  "; init_shading=on" if extras["cfg"].render.init_shading
                  else "; init_shading=off (log-only term skipped, "
                       "gradients identical)")
            crop_active = extras.get("grid_crop") or ""
            # seq uses the explicit template (no lattice — nothing to crop)
            if crop_active and stage != "seq":
                sh += (f"; grid_crop={crop_active} "
                       f"(body-tight lattice, extraction-identical subset)")
            cov_vals = [v for k, v in jax.device_get(aux).items()
                        if k.endswith("cap_cov")]
            cov_used = float(max(cov_vals, default=0.0))
            assert cov_used < 1.0, \
                f"covered-pixel capacity overflow (cap_cov={cov_used:.2f})"
            # an empty surface renders nothing and the exact compactions
            # then skip the pixel path — fail loudly instead of printing a
            # hollow throughput number (caught live in the r5 split capture:
            # 373 it/s at occupancy 0.00)
            assert not cov_vals or cov_used > 0.0, \
                "bench scene rendered nothing (empty surface)"
            sh += (f"; max_covered_frac={extras['cfg'].render.max_covered_frac}"
                   f" (exact: peak occupancy {cov_used:.2f})")
            print(json.dumps({
                "metric": f"{stage}-stage train iters/sec ({attempt} scale: "
                          f"grid^3 + raster res per config{sh})",
                "value": round(ips, 3),
                "unit": "iters/sec",
                "vs_baseline": round(ips / stage_baseline, 3),
            }))
            return
        except Exception as e:           # noqa: BLE001
            print(f"# bench scale '{attempt}' failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    print(json.dumps({"metric": "init-stage train iters/sec", "value": 0.0,
                      "unit": "iters/sec", "vs_baseline": 0.0}))


if __name__ == "__main__":
    main()
