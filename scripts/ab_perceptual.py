"""A/B study: what do the perceptual-loss features do to convergence?

The reference's dominant normal-loss terms run through *pretrained*
MobileNetV2 taps (/root/reference/geometry/hmsdf.py:137-159; weights x50
init, x5 split, x250*20 seq). This image has no network egress and no cached
checkpoint, so the rebuild ships (a) an exact MobileNetV2 architecture +
offline weight converter (models/mobilenet.py, scripts/convert_mobilenet.py)
and (b) feature stand-ins. This experiment quantifies the substitution on a
synthetic capture by training the init stage to convergence under each
variant and scoring geometry-side metrics (mask IoU, masked normal MSE,
Chamfer to the GT posed mesh):

    python scripts/ab_perceptual.py [iters] [grid_res] [res]

Writes PERCEPTUAL_AB.json (one entry per variant).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import jax.numpy as jnp
import numpy as np


class NullPerceptual:
    """Perceptual term disabled (loss identically 0)."""

    def init(self, *a, **k):
        return {}

    def loss(self, params, x, y):
        return jnp.float32(0.0)


def run_variant(name, perceptual, perc_params, iters, grid_res, res):
    from d3human_tpu.config import (
        Config, GeometryConfig, RenderConfig, StageConfig,
    )
    from d3human_tpu.data.synthetic import make_scene
    from d3human_tpu.models.geometry import GeometryModel
    from d3human_tpu.models.texture import MLPTexture3D
    from d3human_tpu.ops.tet_grid import make_tet_grid
    from d3human_tpu.render import light as light_mod
    from d3human_tpu.train.step import TrainState, make_train_step
    from d3human_tpu.utils import metrics as M

    # f3c capacities once the grid is full-scale (2^16 overflows at 128^3)
    mv, mt = (2 ** 18, 196608) if grid_res >= 96 else (2 ** 16, 2 ** 16)
    cfg = Config(
        geometry=GeometryConfig(grid_res=grid_res, max_verts=mv,
                                max_tets=mt),
        render=RenderConfig(train_res=(res, res), texture_res=(res, res)),
        stages=StageConfig(init_epoch=iters),
    )
    scene = make_scene(resolution=(res, res), n_frames=2)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(repo, ".tet_cache", f"grid_{grid_res}.npz")
    grid = make_tet_grid(res=grid_res,
                         bounds=((-0.6, -0.8, -0.4), (0.6, 0.8, 0.4)),
                         y_offset=0.0, scale=1.0, cache_path=cache)
    model = GeometryModel(cfg, grid, scene.deformer, scene.canon)
    key = jax.random.PRNGKey(0)
    kt, kl = jax.random.split(key)
    gparams = model.init_params(key, n_images=2)
    gparams, _ = model.pretrain_sdf(gparams, model.smpl_template_sdf(),
                                    steps=cfg.stages.sdf_mlp_pretrain_steps)
    tex = MLPTexture3D(cfg.texture, (jnp.zeros((6,)), jnp.ones((6,))))
    params = {
        "geometry": gparams,
        "pose": scene.pose_params,
        "material": tex.init(kt),
        "light": light_mod.create_trainable_env(kl, cfg.render.probe_res),
    }
    tx, step_fn = make_train_step("init", model, tex, perceptual,
                                  perc_params, cfg)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    target = scene.frame_target(0)
    # numpy snapshot: the live pose arrays are donated into the step
    gt_pose = {k: np.asarray(v) for k, v in scene.pose_params.items()}

    t0 = time.time()
    for i in range(iters):
        state, aux = step_fn(state, target, jax.random.fold_in(key, i))
        if i % 100 == 0:
            print(f"[{name}] it {i} total {float(aux['total']):.1f}",
                  flush=True)
    train_s = time.time() - t0

    # ---- final metrics (oracle full-path render) -------------------------
    from d3human_tpu.train.losses import render_stage_mesh

    consts = model.consts()
    meshes, buffers = jax.jit(
        lambda c, p, t: render_stage_mesh(
            jax.random.PRNGKey(1), model.bind(c), p["geometry"],
            p["pose"], tex, p["material"], t, cfg,
            compact=False))(consts, state.params, target)
    alpha = np.asarray(buffers.alpha[..., 0])
    gt_mask = np.asarray(target["all_img"][..., 3])
    gt_nrm = np.asarray(target["all_normal"])
    # render normal in target convention (y/z negated, ref hmsdf.py:895-897)
    ren_nrm = np.asarray(buffers.geometric_normal[..., :3]) * np.asarray(
        [1.0, -1.0, -1.0])
    m = (gt_mask > 0.5) & (alpha > 0.5)
    nrm_mse = float(np.mean(np.sum((ren_nrm - gt_nrm) ** 2, -1)[m]))
    iou = float(M.iou(jnp.asarray(alpha), jnp.asarray(gt_mask)))

    # chamfer vs GT posed mesh
    gt_v, _, _ = scene.model.forward(
        betas=jnp.asarray(gt_pose["shape"]),
        root_pose=jnp.asarray(gt_pose["root_pose"][:1]),
        body_pose=jnp.asarray(gt_pose["body_pose"][:1]),
        transl=jnp.asarray(gt_pose["trans"][:1]))
    v = np.asarray(meshes.verts_posed)
    fvalid = np.asarray(meshes.mesh.face_valid)
    f = np.asarray(meshes.mesh.faces)[fvalid]
    if len(f) == 0:
        ch = float("inf")        # geometry collapsed — the A/B verdict
    else:
        ch = M.mesh_chamfer(v, f, np.asarray(gt_v[0]),
                            np.asarray(scene.model.faces))

    return {"variant": name, "iters": iters, "grid_res": grid_res,
            "res": res, "mask_iou": round(iou, 4),
            "normal_mse": round(nrm_mse, 5),
            "chamfer": (round(float(ch), 6) if ch != float("inf") else "diverged"),
            "train_s": round(train_s, 1)}


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    grid_res = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 384

    from d3human_tpu.models.mobilenet import MobileNetFeatures
    from d3human_tpu.models.perceptual import ConvPerceptual, PyramidPerceptual

    only = os.environ.get("AB_VARIANTS", "").split(",") if \
        os.environ.get("AB_VARIANTS") else None
    variants = [
        ("none", NullPerceptual(), {}),
        ("conv_random", ConvPerceptual(), ConvPerceptual().init()),
        ("pyramid", PyramidPerceptual(), PyramidPerceptual().init()),
        ("mobilenet_random", MobileNetFeatures(),
         MobileNetFeatures().init()),
    ]
    if only:
        variants = [v for v in variants if v[0] in only]
    npz = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "d3human_tpu/data/mobilenet_v2_features.npz")
    if os.path.exists(npz):
        variants.append(("mobilenet_pretrained", MobileNetFeatures(),
                         MobileNetFeatures().init(npz)))

    results = []
    for name, perc, pp in variants:
        results.append(run_variant(name, perc, pp, iters, grid_res, res))
        print(json.dumps(results[-1]), flush=True)

    out = os.environ.get("AB_OUT") or os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "PERCEPTUAL_AB.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
