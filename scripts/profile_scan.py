"""Component timing with scan-based in-jit repetition (axon-safe).

Each component runs ITERS times inside one lax.scan with a per-iteration
perturbation (defeats loop-invariant hoisting); one scalar readback per
measurement. Usage:  python scripts/profile_scan.py [small|medium|full]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import jax.numpy as jnp

ITERS = 10


def scan_time(name, op, *args):
    @jax.jit
    def run(*args):
        def body(acc, i):
            return acc + op(i, *args), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    t0 = time.time()
    out = float(run(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    out = float(run(*args))
    dt = (time.time() - t0) * 1000 / ITERS
    print(f"{name:40s} {dt:9.2f} ms/iter   (compile {compile_s:5.1f}s)",
          flush=True)
    return dt


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "full"
    import bench as B

    state, step_fn, target, ex = B.build(scale)
    model, tex, cfg = ex["model"], ex["tex"], ex["cfg"]
    perceptual, perc_params = ex["perceptual"], ex["perc_params"]
    params = state.params
    consts = model.consts()
    res = tuple(cfg.render.train_res)
    print(f"== scale {scale}: grid {cfg.geometry.grid_res} res {res} ==",
          flush=True)

    scan_time("noop", lambda i: jnp.float32(0.0) * i)

    # SDF field eval fwd
    def sdf_fwd(i, c, p):
        m = model.bind(c)
        return m.query_sdf(p, c["grid"].verts + i * 1e-9).sum()

    scan_time("sdf field fwd (grid verts)", sdf_fwd, consts,
              params["geometry"])

    def sdf_grad(i, c, p):
        m = model.bind(c)

        def f(p):
            return m.query_sdf(p, c["grid"].verts + i * 1e-9).sum()

        g = jax.grad(f)(p)
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    scan_time("sdf field fwd+bwd", sdf_grad, consts, params["geometry"])

    # extraction
    def ext(i, c, p):
        m = model.bind(c)
        p = dict(p, msdf=p["msdf"] + i * 1e-9)
        mesh, _ = m.extract(p)
        return mesh.verts.sum()

    scan_time("field + gshell extract", ext, consts, params["geometry"])

    def meshes(i, c, p, pp):
        m = model.bind(c)
        p = dict(p, msdf=p["msdf"] + i * 1e-9)
        return m.get_meshes(p, pp, jnp.int32(0)).verts_posed.sum()

    scan_time("field+extract+LBS", meshes, consts, params["geometry"],
              params["pose"])

    # raster on a frozen mesh
    mesh_ex = jax.jit(
        lambda c, p: model.bind(c).extract(p)[0])(consts, params["geometry"])
    from d3human_tpu.ops.rasterizer import rasterize, xfm_points

    def rast_only(i, verts, faces, fv):
        v_clip = xfm_points(verts + i * 1e-9, target["mvp"])
        r = rasterize(v_clip, faces, fv, res)
        return r.zbuf.sum() * 0 + r.tri_id.sum().astype(jnp.float32)

    scan_time("rasterize (bin+resolve)", rast_only, mesh_ex.verts,
              mesh_ex.faces, mesh_ex.face_valid)

    # loss forward only
    from d3human_tpu.train import losses as L

    def loss_fwd(i, c, p, tgt):
        out = L.tick_init(jax.random.fold_in(jax.random.PRNGKey(0), i),
                          model.bind(c), p["geometry"], p["pose"], tex,
                          p["material"], perceptual, perc_params, tgt,
                          i, cfg, None)
        return out["total"]

    scan_time("loss fwd (tick_init)", loss_fwd, consts, params, target)

    def loss_grad(i, c, p, tgt):
        def f(p):
            return loss_fwd(i, c, p, tgt)

        g = jax.grad(f)(p)
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    scan_time("loss fwd+bwd", loss_grad, consts, params, target)

    # full step via python-loop dispatch for comparison
    box = {"s": state}

    def one():
        box["s"], aux = step_fn(box["s"], target, jax.random.PRNGKey(0))
        return aux["total"]

    one()
    t0 = time.time()
    for _ in range(5):
        v = float(one())
    print(f"{'full train step (py-loop)':40s} {(time.time()-t0)*200:9.2f} "
          f"ms/iter", flush=True)


if __name__ == "__main__":
    main()
