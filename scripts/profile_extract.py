"""Component timing with per-iteration readbacks + consts-as-jit-args:

    python scripts/profile_extract.py [full|medium|small]

Times sdf-eval, G-Shell extract (fwd and fwd+bwd), LBS, rasterize,
texture-on-covered-pixels — the pieces of the init-stage step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import jax.numpy as jnp


def loop_time(name, fn, *args, iters=6):
    t0 = time.time()
    out = fn(*args)
    s = float(jax.tree.leaves(out)[0].sum()
              if hasattr(jax.tree.leaves(out)[0], "sum")
              else jax.tree.leaves(out)[0])
    print(f"{name:34s} compile {time.time()-t0:6.1f}s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        s = float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) * 1000 / iters
    print(f"{name:34s} {dt:9.2f} ms/iter", flush=True)
    return dt


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "full"
    import bench as B

    state, _sf, target, ex = B.build(scale)
    model, tex, cfg = ex["model"], ex["tex"], ex["cfg"]
    params = state.params
    consts = model.consts()
    print(f"== scale {scale} ==", flush=True)

    base = loop_time("noop readback", jax.jit(lambda x: x + 1.0),
                     jnp.float32(0))

    sdf_eval = jax.jit(lambda c, p: model.bind(c).query_sdf(
        p, c["grid"].verts))
    loop_time("sdf eval fwd", sdf_eval, consts, params["geometry"])

    extract = jax.jit(lambda c, p: model.bind(c).extract(p)[0].verts)
    loop_time("extract fwd", extract, consts, params["geometry"])

    def eg(c, p):
        def f(p):
            mesh, _ = model.bind(c).extract(p)
            return jnp.sum(mesh.verts * 1e-3) + jnp.sum(mesh.msdf_aug * 1e-6)
        return jax.grad(f)(p)["sdf_net"]["layers"][0]["w"]

    loop_time("extract fwd+bwd", jax.jit(eg), consts, params["geometry"])

    meshes_fn = jax.jit(lambda c, p, pp: model.bind(c).get_meshes(
        p, pp, jnp.int32(0)).verts_posed)
    loop_time("get_meshes fwd (extract+LBS)", meshes_fn, consts,
              params["geometry"], params["pose"])

    # raster on the extracted mesh
    from d3human_tpu.ops.rasterizer import rasterize, xfm_points

    mesh_v = jax.jit(lambda c, p, pp: model.bind(c).get_meshes(
        p, pp, jnp.int32(0)))(consts, params["geometry"], params["pose"])
    res = tuple(cfg.render.train_res)

    def rast_fn(verts, faces, fv, mvp):
        v_clip = xfm_points(verts, mvp)
        r = rasterize(v_clip, faces, fv, res)
        return r.tri_id

    loop_time("rasterize fwd", jax.jit(rast_fn), mesh_v.verts_posed,
              mesh_v.mesh.faces, mesh_v.mesh.face_valid, target["mvp"])

    # texture on covered pixels (the compact-path hot lookup)
    P = int(res[0] * res[1] * cfg.render.max_covered_frac)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (P, 3), jnp.float32,
                             -0.5, 0.5)

    tex_fwd = jax.jit(lambda tp, x: tex.sample(tp, x))
    loop_time(f"texture sample fwd [{P}]", tex_fwd, params["material"], pts)

    def tg(tp, x):
        return jax.grad(lambda tp: jnp.sum(tex.sample(tp, x)))(
            tp)["net"][0]["w"]

    loop_time(f"texture sample fwd+bwd [{P}]", jax.jit(tg),
              params["material"], pts)

    print(f"(readback baseline {base:.1f} ms)")


if __name__ == "__main__":
    main()
