"""Price the compact render path's cover/gather/interp segment at f3c shapes
(the +373 ms rung of LADDER_r04 — the biggest cost in the init forward) and
candidate restructurings, WITHOUT the extraction prefix, so each variant
compiles in seconds instead of minutes.

Variants:
  current    — render_mesh_compact's exact math (AoS [P,3,C] intermediates,
               full-mesh face_normals + fattr gather)
  cross      — face normal from the already-gathered corner positions
               (kills the standalone full-F face_normals + the [P,4] gather)
  soa        — `cross` + all post-gather math in structure-of-arrays layout
               (one [P,42] gather reshaped/transposed; every op on [P]-last
               arrays so the VPU sees full lanes instead of 3- and 14-lane
               padded tiles)

Each variant is priced forward-only and fwd+grad(verts,msdf) with the
scan-of-iterations + perturbation substrate (PERF.md measurement rules).

    python scripts/bench_interp.py [P_frac]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10
H = W = 1080
MV = 2 ** 18
MT = 196608
V = MV + 4 * MT          # 1,048,576 aug verts
F = 4 * MT               # 786,432 aug faces


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
    print(f"{name:46s} {dt:9.2f} ms/iter   (compile {compile_s:5.1f}s)",
          flush=True)
    return dt


def make_inputs(p_frac: float):
    rng = np.random.default_rng(0)
    verts = rng.standard_normal((V, 3), np.float32) * 0.3
    faces = rng.integers(0, V, (F, 3)).astype(np.int32)
    face_valid = np.ones(F, bool)
    msdf = rng.standard_normal(V).astype(np.float32)
    # plausible raster: elliptical disc of covered pixels with random ids
    yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    cover = (xx ** 2 / 0.2 + yy ** 2 / 0.75) < 1
    tri_id = np.where(cover, rng.integers(1, F + 1, (H, W)), 0).astype(
        np.int32)
    print(f"coverage {cover.mean():.3f}  P_cap={int(H*W*p_frac)}",
          flush=True)
    mvp = np.eye(4, dtype=np.float32) + 0.01 * rng.standard_normal((4, 4))
    mvp[3, 2] += 1.0
    campos = np.asarray([0.0, 0.0, 2.2], np.float32)
    return (jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(face_valid),
            jnp.asarray(msdf), jnp.asarray(tri_id), jnp.asarray(mvp),
            jnp.asarray(campos))


def main():
    p_frac = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    P = int(H * W * p_frac)
    npix = H * W
    res = (H, W)
    verts0, faces, face_valid, msdf0, tri_id, mvp, campos = make_inputs(p_frac)

    from d3human_tpu.ops import mesh_ops
    from d3human_tpu.ops.compaction import first_k_indices
    from d3human_tpu.ops.rasterizer import (
        Rast, barycentrics_compact, compact_cover, pixel_centers_at,
        xfm_points,
    )
    from d3human_tpu.ops.scatter import default_use_pallas, gather_rows

    use_pl = default_use_pallas()
    rast = Rast(tri_id=tri_id, zbuf=jnp.where(tri_id > 0, 1.0, 3.4e38))

    scan_time("noop", lambda i: jnp.float32(0.0) * i)

    # ---- ladder within the rung -------------------------------------------
    def r_cover(i, tid):
        idx = first_k_indices((tid + 0 * i).reshape(-1) > 0, P, npix)
        return jnp.sum(idx).astype(jnp.float32) * 1e-9

    scan_time("compact_cover (first_k over 1.17M)", r_cover, tri_id)

    def r_autonrm(i, verts):
        v = verts + i * 1e-12
        vn = mesh_ops.auto_normals(v, faces, face_valid)
        return jnp.sum(vn) * 1e-9

    scan_time("auto_normals (full mesh)", r_autonrm, verts0)

    def r_facenrm(i, verts):
        v = verts + i * 1e-12
        fn = mesh_ops.face_normals(v, faces)
        return jnp.sum(fn) * 1e-9

    scan_time("face_normals (full mesh)", r_facenrm, verts0)

    idx0, valid0, fid0 = compact_cover(rast, P)

    def r_gather(i, verts):
        v = verts + i * 1e-12
        v_clip = xfm_points(v, mvp)
        vattr = jnp.concatenate(
            [v_clip, v, v, v, msdf0[:, None]], axis=-1)       # [V, 14]
        g = gather_rows(vattr, faces[fid0], use_pl)            # [P, 3, 14]
        return jnp.sum(g) * 1e-9

    scan_time("fused vattr gather [P,3,14]", r_gather, verts0)

    def r_bary(i, verts):
        v = verts + i * 1e-12
        v_clip = xfm_points(v, mvp)
        vattr = jnp.concatenate(
            [v_clip, v, v, v, msdf0[:, None]], axis=-1)
        g = gather_rows(vattr, faces[fid0], use_pl)
        pix_xy = pixel_centers_at(jnp.minimum(idx0, npix - 1), res)
        bary = barycentrics_compact(g[..., :4], pix_xy, res)
        interp = jnp.einsum("pk,pkc->pc", bary, g[..., 4:])
        return jnp.sum(interp) * 1e-9

    scan_time("+ bary + einsum (AoS)", r_bary, verts0)

    # ---- full current path (what render_mesh_compact computes to nrm_ts) ---
    def cur_path(v, msdf):
        v_clip = xfm_points(v, mvp)
        idx, valid, fid = compact_cover(rast, P)
        ic = jnp.minimum(idx, npix - 1)
        pix_xy = pixel_centers_at(ic, res)
        vmask = valid[:, None].astype(jnp.float32)
        v_nrm = mesh_ops.auto_normals(v, faces, face_valid)
        vattr = jnp.concatenate(
            [v_clip, v, v, v_nrm, msdf[:, None]], axis=-1)
        g = gather_rows(vattr, faces[fid], use_pl)
        bary = barycentrics_compact(g[..., :4], pix_xy, res)
        interp = jnp.einsum("pk,pkc->pc", bary, g[..., 4:])
        pos = interp[:, 0:3] * vmask
        nrm_s = interp[:, 6:9] * vmask
        msdf_pix = interp[:, 9:10] * vmask
        fn = mesh_ops.face_normals(v, faces)
        fattr = gather_rows(fn, fid, use_pl)
        geo_n = fattr * vmask
        view = campos[None, :] - pos
        flip = jnp.sum(geo_n * view, axis=-1, keepdims=True) < 0
        nrm_ts = mesh_ops.safe_normalize(jnp.where(flip, -nrm_s, nrm_s)) * vmask
        return pos, interp[:, 3:6] * vmask, nrm_s, msdf_pix, geo_n, nrm_ts

    # ---- cross variant: face normal from gathered corners ------------------
    def cross_path(v, msdf):
        v_clip = xfm_points(v, mvp)
        idx, valid, fid = compact_cover(rast, P)
        ic = jnp.minimum(idx, npix - 1)
        pix_xy = pixel_centers_at(ic, res)
        vmask = valid[:, None].astype(jnp.float32)
        v_nrm = mesh_ops.auto_normals(v, faces, face_valid)
        vattr = jnp.concatenate(
            [v_clip, v, v, v_nrm, msdf[:, None]], axis=-1)
        g = gather_rows(vattr, faces[fid], use_pl)
        bary = barycentrics_compact(g[..., :4], pix_xy, res)
        interp = jnp.einsum("pk,pkc->pc", bary, g[..., 4:])
        pos = interp[:, 0:3] * vmask
        nrm_s = interp[:, 6:9] * vmask
        msdf_pix = interp[:, 9:10] * vmask
        p0, p1, p2 = g[:, 0, 4:7], g[:, 1, 4:7], g[:, 2, 4:7]
        geo_n = mesh_ops.safe_normalize(
            jnp.cross(p1 - p0, p2 - p0)) * vmask
        view = campos[None, :] - pos
        flip = jnp.sum(geo_n * view, axis=-1, keepdims=True) < 0
        nrm_ts = mesh_ops.safe_normalize(jnp.where(flip, -nrm_s, nrm_s)) * vmask
        return pos, interp[:, 3:6] * vmask, nrm_s, msdf_pix, geo_n, nrm_ts

    # ---- SoA variant: [P]-last layout after ONE gather ----------------------
    def soa_path(v, msdf):
        v_clip = xfm_points(v, mvp)
        idx, valid, fid = compact_cover(rast, P)
        ic = jnp.minimum(idx, npix - 1)
        vmask1 = valid.astype(jnp.float32)                    # [P]
        v_nrm = mesh_ops.auto_normals(v, faces, face_valid)
        vattr = jnp.concatenate(
            [v_clip, v, v, v_nrm, msdf[:, None]], axis=-1)
        g = gather_rows(vattr, faces[fid], use_pl)            # [P, 3, 14]
        gt = g.reshape(P, 42).T                               # [42, P]
        px = (ic % W).astype(jnp.float32) + 0.5               # [P]
        py = (ic // W).astype(jnp.float32) + 0.5

        def corner(k):
            base = 14 * k
            w = gt[base + 3]
            w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
            xs = (gt[base + 0] / w * 0.5 + 0.5) * W
            ys = (0.5 - gt[base + 1] / w * 0.5) * H
            return xs, ys, w

        xs0, ys0, w0 = corner(0)
        xs1, ys1, w1 = corner(1)
        xs2, ys2, w2 = corner(2)

        def edge(xa, ya, xb, yb):
            return (xb - xa) * (py - ya) - (yb - ya) * (px - xa)

        e0 = edge(xs1, ys1, xs2, ys2)
        e1 = edge(xs2, ys2, xs0, ys0)
        e2 = edge(xs0, ys0, xs1, ys1)
        ssum = e0 + e1 + e2
        ssum = jnp.where(jnp.abs(ssum) < 1e-12, 1e-12, ssum)
        b0, b1, b2 = e0 / ssum / w0, e1 / ssum / w1, e2 / ssum / w2
        bsum = b0 + b1 + b2
        bsum = jnp.where(jnp.abs(bsum) < 1e-12, 1e-12, bsum)
        b0, b1, b2 = b0 / bsum, b1 / bsum, b2 / bsum
        # degenerate guard (scalarized): any |b| > 2 -> clamped convex
        bad = ((jnp.abs(b0) > 2) | (jnp.abs(b1) > 2) | (jnp.abs(b2) > 2))
        c0 = jnp.clip(b0, 0, 1)
        c1 = jnp.clip(b1, 0, 1)
        c2 = jnp.clip(b2, 0, 1)
        cs = jnp.maximum(c0 + c1 + c2, 1e-8)
        b0 = jnp.where(bad, c0 / cs, b0)
        b1 = jnp.where(bad, c1 / cs, b1)
        b2 = jnp.where(bad, c2 / cs, b2)

        def interp_c(off):
            return (b0 * gt[off] + b1 * gt[14 + off]
                    + b2 * gt[28 + off]) * vmask1

        pos = [interp_c(4 + j) for j in range(3)]
        pos_orig = [interp_c(7 + j) for j in range(3)]
        nrm_s = [interp_c(10 + j) for j in range(3)]
        msdf_pix = interp_c(13)
        # face normal from corners (SoA cross)
        ax = gt[14 + 4] - gt[4]
        ay = gt[14 + 5] - gt[5]
        az = gt[14 + 6] - gt[6]
        bx = gt[28 + 4] - gt[4]
        by = gt[28 + 5] - gt[5]
        bz = gt[28 + 6] - gt[6]
        nx = ay * bz - az * by
        ny = az * bx - ax * bz
        nz = ax * by - ay * bx
        inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
        geo = [nx * inv * vmask1, ny * inv * vmask1, nz * inv * vmask1]
        dot = ((campos[0] - pos[0]) * geo[0] + (campos[1] - pos[1]) * geo[1]
               + (campos[2] - pos[2]) * geo[2])
        sgn = jnp.where(dot < 0, -1.0, 1.0)
        t = [nrm_s[j] * sgn for j in range(3)]
        tn = jax.lax.rsqrt(jnp.maximum(
            t[0] ** 2 + t[1] ** 2 + t[2] ** 2, 1e-20))
        nrm_ts = [t[j] * tn * vmask1 for j in range(3)]
        return pos, pos_orig, nrm_s, msdf_pix, geo, nrm_ts

    def price(name, path):
        def fwd(i, verts, msdf):
            out = path(verts + i * 1e-12, msdf)
            return sum(jnp.sum(o) for o in jax.tree.leaves(out)) * 1e-9

        scan_time(f"{name} fwd", fwd, verts0, msdf0)

        def fwdbwd(i, verts, msdf):
            def lf(v, m):
                out = path(v, m)
                return sum(jnp.sum(o) for o in jax.tree.leaves(out)) * 1e-9

            l, g = jax.value_and_grad(lf, argnums=(0, 1))(
                verts + i * 1e-12, msdf)
            return l + jnp.sum(g[0]) * 1e-9 + jnp.sum(g[1]) * 1e-9

        scan_time(f"{name} fwd+bwd", fwdbwd, verts0, msdf0)

    price("current (AoS + full-F face_normals)", cur_path)
    price("cross  (corner face normal)", cross_path)
    price("soa    (cross + [P]-last math)", soa_path)


if __name__ == "__main__":
    main()
