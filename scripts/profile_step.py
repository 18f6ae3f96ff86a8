"""Per-component timing of the init-stage training step on the current
backend (run on the TPU for real numbers):

    python scripts/profile_step.py [small|medium|full]

Times (a) SDF field eval, (b) G-Shell extraction, (c) LBS posing,
(d) rasterize, (e) full render, (f) full loss fwd, (g) full train step —
each as an isolated jitted program with chained dependencies.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import jax.numpy as jnp

from bench import build as bench_build


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:28s} {dt:9.2f} ms")
    return dt


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "small"
    # bench.build gives us a ready state/step/target; grab internals
    import bench as B

    state, step_fn, target, _extras = B.build(scale)
    params = state.params

    # rebuild the pieces the same way bench.build did
    from d3human_tpu.train import losses as L

    # The step closure owns model/tex/etc; easiest: re-run build pieces here
    # by re-importing through bench internals is awkward — instead time the
    # composed levels through public entry points:
    print(f"== scale: {scale} ==")

    # component-level: rebuild a model identical to bench's
    import dataclasses
    import numpy as np
    from d3human_tpu.config import (
        Config, GeometryConfig, RenderConfig, StageConfig,
    )
    from d3human_tpu.data.synthetic import make_scene
    from d3human_tpu.models.geometry import GeometryModel
    from d3human_tpu.ops.tet_grid import make_tet_grid

    if scale == "full":
        res, grid_res, mv, mt = (1080, 1080), 128, 2 ** 18, 196608
    elif scale == "medium":
        res, grid_res, mv, mt = (720, 720), 96, 2 ** 17, 2 ** 17
    else:
        res, grid_res, mv, mt = (256, 256), 32, 2 ** 14, 2 ** 14

    cfg = Config(geometry=GeometryConfig(grid_res=grid_res, max_verts=mv,
                                         max_tets=mt),
                 render=RenderConfig(train_res=res))
    scene = make_scene(resolution=(64, 64), n_frames=2)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".tet_cache", f"grid_{grid_res}.npz")
    grid = make_tet_grid(res=grid_res,
                         bounds=((-0.6, -0.8, -0.4), (0.6, 0.8, 0.4)),
                         y_offset=0.0, scale=1.0, cache_path=cache)
    model = GeometryModel(cfg, grid, scene.deformer, scene.canon)
    gparams = params["geometry"]
    consts = model.consts()

    sdf_eval = jax.jit(lambda c, p: model.bind(c).query_sdf(
        p, c["grid"].verts))
    timeit("sdf field eval (fwd)", sdf_eval, consts, gparams)

    sdf_grad = jax.jit(jax.grad(lambda p, c: jnp.sum(
        model.bind(c).query_sdf(p, c["grid"].verts))))
    timeit("sdf field eval (fwd+bwd)", sdf_grad, gparams, consts)

    extract = jax.jit(lambda c, p: model.bind(c).extract(p)[0].verts.sum())
    timeit("field + gshell extract", extract, consts, gparams)

    meshes_fn = jax.jit(lambda c, p, pp: model.bind(c).get_meshes(
        p, pp, jnp.int32(0)).verts_posed.sum())
    timeit("field+extract+LBS pose", meshes_fn, consts, gparams,
           params["pose"])

    # raster only (static mesh)
    mesh, _ = jax.jit(lambda c, p: model.bind(c).extract(p))(consts, gparams)
    from d3human_tpu.ops.rasterizer import rasterize, xfm_points

    def rast_fn(verts, faces, fv):
        v_clip = xfm_points(verts, target["mvp"])
        r = rasterize(v_clip, faces, fv, res)
        return r.tri_id.sum()

    timeit("rasterize (bin+resolve)", jax.jit(rast_fn), mesh.verts,
           mesh.faces, mesh.face_valid)

    # full step LAST: it donates params/state buffers
    box = {"state": state}

    def one_step():
        box["state"], aux = step_fn(box["state"], target,
                                    jax.random.PRNGKey(0))
        return aux["total"]

    timeit("full train step", one_step)

if __name__ == "__main__":
    main()
