"""Micro-profile of extract + rasterize internals at full scale (scan-based,
perturbed per iteration so nothing hoists).

    python scripts/profile_micro.py [full|medium]
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
    float(run(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    float(run(*args))
    dt = (time.time() - t0) * 1000 / ITERS
    print(f"{name:44s} {dt:9.2f} ms/iter   (compile {compile_s:5.1f}s)",
          flush=True)
    return dt


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "full"
    import bench as B

    state, _sf, target, ex = B.build(scale)
    model, cfg = ex["model"], ex["cfg"]
    params = state.params
    consts = model.consts()
    grid = consts["grid"]
    MV, MT = cfg.geometry.max_verts, cfg.geometry.max_tets
    res = tuple(cfg.render.train_res)
    print(f"== scale {scale}: grid {cfg.geometry.grid_res} MV={MV} MT={MT} "
          f"E={grid.n_edges} T={grid.n_tets} ==", flush=True)

    scan_time("noop", lambda i: jnp.float32(0.0) * i)

    # frozen field values (isolate extraction from the MLP)
    sdf0, msdf0, pos0 = jax.jit(
        lambda c, p: (model.bind(c).query_sdf(p, c["grid"].verts),
                      p["msdf"],
                      c["grid"].verts + model.bind(c).max_disp * jnp.tanh(
                          p["deform"]) if False else c["grid"].verts))(
        consts, params["geometry"])

    from d3human_tpu.ops import marching_tets as MTmod

    def crossing_only(i, sdf):
        occ = (sdf + i * 1e-12) > 0
        cr = MTmod._structured_crossing(occ.reshape(grid.vert_dims))
        return jnp.sum(cr).astype(jnp.float32)

    scan_time("crossing flags (slices)", crossing_only, sdf0)

    def nonzero_mv(i, sdf):
        occ = (sdf + i * 1e-12) > 0
        cr = MTmod._structured_crossing(occ.reshape(grid.vert_dims))
        (slots,) = jnp.nonzero(cr, size=MV, fill_value=grid.n_edges)
        return jnp.sum(slots).astype(jnp.float32)

    scan_time("crossing + nonzero(MV)", nonzero_mv, sdf0)

    def valid_tets(i, sdf):
        occ = (sdf + i * 1e-12) > 0
        vt = MTmod._structured_valid_tets(occ.reshape(grid.vert_dims))
        return jnp.sum(vt).astype(jnp.float32)

    scan_time("valid-tet flags (slices)", valid_tets, sdf0)

    def nonzero_mt(i, sdf):
        occ = (sdf + i * 1e-12) > 0
        vt = MTmod._structured_valid_tets(occ.reshape(grid.vert_dims))
        (slots,) = jnp.nonzero(vt, size=MT, fill_value=grid.n_tets)
        return jnp.sum(slots).astype(jnp.float32)

    scan_time("valid-tets + nonzero(MT)", nonzero_mt, sdf0)

    def full_extract(i, sdf, msdf, pos):
        mesh = MTmod.gshell_extract(grid, pos, sdf + i * 1e-12, msdf, MV, MT)
        return jnp.sum(mesh.verts)

    scan_time("gshell_extract (frozen field)", full_extract, sdf0, msdf0,
              pos0)

    # ---- rasterize internals ---------------------------------------------
    mesh_ex = jax.jit(
        lambda c, p: model.bind(c).extract(p)[0])(consts, params["geometry"])
    from d3human_tpu.ops.rasterizer import rasterize, xfm_points

    v_clip0 = jax.jit(lambda v: xfm_points(v, target["mvp"]))(mesh_ex.verts)

    def rast_full(i, v_clip, faces, fv):
        r = rasterize(v_clip + i * 1e-9, faces, fv, res)
        return r.tri_id.sum().astype(jnp.float32)

    scan_time("rasterize full", rast_full, v_clip0, mesh_ex.faces,
              mesh_ex.face_valid)

    # binning-only variant: replicate the first part of rasterize
    def rast_bin(i, v_clip, faces, fv):
        from d3human_tpu.ops import rasterizer as R
        verts_clip = v_clip + i * 1e-9
        H, W = res
        th, tw = 8, 128
        ntx = -(-W // tw)
        nty = -(-H // th)
        NT = nty * ntx
        F = faces.shape[0]
        tri, ok_w = R._face_setup(verts_clip, faces)
        live = fv & ok_w
        pix_xy = R._screen_xy(tri, res)
        xmin = jnp.min(pix_xy[..., 0], axis=1)
        xmax = jnp.max(pix_xy[..., 0], axis=1)
        ymin = jnp.min(pix_xy[..., 1], axis=1)
        ymax = jnp.max(pix_xy[..., 1], axis=1)
        live = live & (xmax >= 0) & (xmin < W) & (ymax >= 0) & (ymin < H)
        tx0 = jnp.clip(jnp.floor(xmin / tw), 0, ntx - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor(xmax / tw), 0, ntx - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor(ymin / th), 0, nty - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor(ymax / th), 0, nty - 1).astype(jnp.int32)
        sx, sy = tx1 - tx0 + 1, ty1 - ty0 + 1
        span = sx * sy
        small = live & (span <= 8)
        K = 8
        k = jnp.arange(K, dtype=jnp.int32)
        kx = k[None, :] % jnp.maximum(sx, 1)[:, None]
        ky = k[None, :] // jnp.maximum(sx, 1)[:, None]
        pair_tile = (ty0[:, None] + ky) * ntx + (tx0[:, None] + kx)
        pair_ok = small[:, None] & (k[None, :] < span[:, None])
        pair_tile = jnp.where(pair_ok, pair_tile, NT)
        pair_face = jnp.broadcast_to(
            jnp.arange(F, dtype=jnp.int32)[:, None], (F, K))
        packed = (pair_tile.reshape(-1) << 20) | pair_face.reshape(-1)
        packed = jnp.sort(packed)
        return packed[::1000].sum().astype(jnp.float32)

    scan_time("rasterize: setup+bin+sort only", rast_bin, v_clip0,
              mesh_ex.faces, mesh_ex.face_valid)

    # texture fwd/bwd on covered-pixel count
    tex = ex["tex"]
    P = int(res[0] * res[1] * cfg.render.max_covered_frac)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (P, 3), jnp.float32,
                             -0.5, 0.5)

    def tex_fwd(i, tp, x):
        return jnp.sum(tex.sample(tp, x + i * 1e-9))

    scan_time(f"texture fwd [{P}]", tex_fwd, params["material"], pts)

    def tex_bwd(i, tp, x):
        g = jax.grad(lambda tp: jnp.sum(tex.sample(tp, x + i * 1e-9)))(tp)
        return sum(jnp.sum(t) for t in jax.tree.leaves(g))

    scan_time(f"texture fwd+bwd [{P}]", tex_bwd, params["material"], pts)


if __name__ == "__main__":
    main()
