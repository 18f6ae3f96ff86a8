"""Forward-ladder profiler: price each sub-stage of the init-step forward by
timing increasing prefixes of the real pipeline at bench config (crop on,
shade off — exactly what bench.py measures). Consecutive differences
attribute the cost; the final rungs are the full tick_init fwd and the full
train step, so the ladder reconciles against BENCH numbers.

Timing substrate: python loop + per-iteration scalar readback (the axon
remote-compile size limit rules out scan-of-steps for the big programs,
PERF.md); the noop-readback baseline is printed for subtraction. Every rung
perturbs the SDF params per iteration so nothing hoists.

    python scripts/profile_ladder.py [full|medium|small]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import jax.numpy as jnp


def loop_time(name, fn, *args, iters=8):
    t0 = time.time()
    out = float(fn(*args))            # compile + warm
    c = time.time() - t0
    t0 = time.time()
    for i in range(iters):
        out = float(fn(*args))
    dt = (time.time() - t0) * 1000 / iters
    print(f"{name:40s} {dt:9.2f} ms/iter   (compile {c:6.1f}s)", flush=True)
    return dt


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "full"
    import bench as B

    state, step_fn, target, ex = B.build(scale)
    model, tex, cfg = ex["model"], ex["tex"], ex["cfg"]
    perceptual, perc_params = ex["perceptual"], ex["perc_params"]
    params0 = state.params
    consts = model.consts()
    res = tuple(cfg.render.train_res)
    H, W = res
    print(f"== ladder @ {scale}: grid {ex['model'].grid.dims} res {res} "
          f"shade={cfg.render.init_shading} ==", flush=True)

    base = loop_time("noop readback", jax.jit(lambda x: x + 1.0),
                     jnp.float32(0))

    it_box = {"i": 0}

    def perturbed():
        # new params each call so nothing constant-folds across iterations
        it_box["i"] += 1
        eps = it_box["i"] * 1e-12
        p = dict(params0)
        g = dict(p["geometry"])
        g["sdf_net"] = jax.tree.map(lambda x: x + eps, g["sdf_net"])
        p["geometry"] = g
        return p

    m = model.bind(consts)

    # ---- rung 1: extract (field MLP + gshell) ------------------------------
    def r_extract(p):
        mesh, sdf = m.extract(p["geometry"])
        return jnp.sum(mesh.verts) + jnp.sum(sdf) * 1e-6

    # ---- rung 2: + LBS pose -------------------------------------------------
    def r_meshes(p):
        meshes = m.get_meshes(p["geometry"], p["pose"], target["frame_idx"])
        return jnp.sum(meshes.verts_posed)

    # ---- rung 3: + rasterize ------------------------------------------------
    from d3human_tpu.ops.rasterizer import (
        aa_geometry_compact, aa_pairs_compact, apply_aa_sparse,
        barycentrics_compact, compact_cover, pixel_centers_at, rasterize,
        scatter_image, xfm_points,
    )

    def upto_rast(p):
        meshes = m.get_meshes(p["geometry"], p["pose"], target["frame_idx"])
        v_clip = xfm_points(meshes.verts_posed, target["mvp"])
        rast = rasterize(v_clip, meshes.mesh.faces, meshes.mesh.face_valid,
                         res)
        return meshes, v_clip, rast

    def r_rast(p):
        meshes, v_clip, rast = upto_rast(p)
        return jnp.sum(rast.tri_id).astype(jnp.float32) * 1e-9 \
            + jnp.sum(v_clip) * 1e-9

    # ---- rung 4: + compact cover + fused gather + interp --------------------
    from d3human_tpu.ops import mesh_ops
    from d3human_tpu.ops.scatter import default_use_pallas, gather_rows

    P = int(H * W * cfg.render.max_covered_frac)

    def upto_interp(p):
        meshes, v_clip, rast = upto_rast(p)
        npix = H * W
        idx, valid, fid = compact_cover(rast, P)
        ic = jnp.minimum(idx, npix - 1)
        pix_xy = pixel_centers_at(ic, res)
        vmask = valid[:, None].astype(jnp.float32)
        verts = meshes.verts_posed
        faces = meshes.mesh.faces
        v_nrm = mesh_ops.auto_normals(verts, faces, meshes.mesh.face_valid)
        msdf_v = meshes.mesh.msdf_aug[:, None]
        vattr = jnp.concatenate(
            [v_clip, verts, meshes.verts_template, v_nrm, msdf_v], axis=-1)
        g = gather_rows(vattr, faces[fid], default_use_pallas())
        bary = barycentrics_compact(g[..., :4], pix_xy, res)
        interp = jnp.einsum("pk,pkc->pc", bary, g[..., 4:])
        fn = mesh_ops.face_normals(verts, faces)
        fattr = gather_rows(fn, fid, default_use_pallas())
        return (meshes, v_clip, rast, idx, valid, interp * vmask,
                fattr * vmask, pix_xy, vmask)

    def r_interp(p):
        out = upto_interp(p)
        return jnp.sum(out[5]) + jnp.sum(out[6])

    # ---- rung 5: + scatter_image + composite (no AA, no jitter tap) ---------
    def upto_scatter(p):
        (meshes, v_clip, rast, idx, valid, interp, geo_n, pix_xy,
         vmask) = upto_interp(p)
        pos = interp[:, 0:3]
        nrm_s = interp[:, 6:9]
        msdf_pix = interp[:, 9:10]
        view = target["campos"][None, :] - pos
        flip = jnp.sum(geo_n * view, axis=-1, keepdims=True) < 0
        _ = mesh_ops.safe_normalize(jnp.where(flip, -nrm_s, nrm_s)) * vmask
        packed = jnp.concatenate(
            [jnp.zeros_like(pos), geo_n, msdf_pix, nrm_s], axis=-1)  # 10 ch
        img = scatter_image(packed, idx, res)
        cover = rast.tri_id > 0
        alpha = cover[..., None].astype(jnp.float32)
        return meshes, v_clip, rast, img, alpha, pix_xy, vmask

    def r_scatter(p):
        out = upto_scatter(p)
        return jnp.sum(out[3]) + jnp.sum(out[4])

    # ---- rung 6: + jitter normal tap (RNG + bilinear gather) ----------------
    from d3human_tpu.render.pipeline import _bilinear_sample

    sub = slice(None, None, cfg.render.jitter_subsample)

    def r_jitter(p):
        meshes, v_clip, rast, img, alpha, pix_xy, vmask = upto_scatter(p)
        k_nrm = jax.random.PRNGKey(7)
        uv = pix_xy[sub] / jnp.asarray([W, H], jnp.float32)
        jit_uv = uv + 0.005 * jax.random.normal(k_nrm, uv.shape)
        nrm_img = img[..., 6:9]
        nrm_tap = _bilinear_sample(nrm_img, jit_uv)
        mask_tap = _bilinear_sample(alpha, jit_uv)
        return jnp.sum(nrm_tap * mask_tap) + jnp.sum(img)

    # ---- rung 7: + sparse AA -------------------------------------------------
    aa_max_pairs = (cfg.render.aa_max_pairs
                    if getattr(cfg.render, "aa_max_pairs", None)
                    else 16 * max(H, W))

    def r_aa(p):
        meshes, v_clip, rast, img, alpha, pix_xy, vmask = upto_scatter(p)
        rgb = img[..., 0:3]
        aa_in = jnp.concatenate(
            [rgb, alpha, img[..., 3:6], img[..., 9:10]], axis=-1)
        pairs = []
        for axis in (1, 0):
            pidx, pvalid, _n = aa_pairs_compact(
                rast, res, axis, aa_max_pairs, 0.01)
            pairs.append(aa_geometry_compact(
                v_clip, meshes.mesh.faces, rast, pidx, pvalid, res, axis))
        aa_out = apply_aa_sparse(aa_in, pairs)
        return jnp.sum(aa_out)

    # ---- rung 8: full render_mesh (everything incl. mesh buffers) -----------
    from d3human_tpu.train import losses as L

    def r_render(p):
        meshes, buffers = L.render_stage_mesh(
            jax.random.PRNGKey(3), m, p["geometry"], p["pose"], tex,
            p["material"], target, cfg, shade=bool(cfg.render.init_shading))
        return jnp.sum(buffers.shaded) + jnp.sum(buffers.msdf_image)

    # ---- rung 9-11: individual loss tails on top of the render --------------
    def r_msk(p):
        meshes, buffers = L.render_stage_mesh(
            jax.random.PRNGKey(3), m, p["geometry"], p["pose"], tex,
            p["material"], target, cfg, shade=bool(cfg.render.init_shading))
        gt_mask = target["all_img"][..., 3:]
        msk = 100.0 * jnp.mean((buffers.shaded[..., 3:] - gt_mask) ** 2)
        return msk + L.msdf_image_hinges(buffers, gt_mask)

    def r_eik(p):
        meshes, buffers = L.render_stage_mesh(
            jax.random.PRNGKey(3), m, p["geometry"], p["pose"], tex,
            p["material"], target, cfg, shade=bool(cfg.render.init_shading))
        pts = mesh_ops.sample_points_on_mesh(
            jax.random.PRNGKey(11), meshes.verts_posed, meshes.mesh.faces,
            cfg.geometry.n_eikonal_samples, meshes.mesh.face_valid)
        eik = L.eikonal_loss(m, p["geometry"], pts, jnp.int32(5), cfg)
        return eik + jnp.sum(buffers.shaded) * 1e-9

    def r_perc(p):
        meshes, buffers = L.render_stage_mesh(
            jax.random.PRNGKey(3), m, p["geometry"], p["pose"], tex,
            p["material"], target, cfg, shade=bool(cfg.render.init_shading))
        out_n, ref_n = L._normal_images(buffers, target["all_normal"])
        return 50.0 * perceptual.loss(perc_params, out_n[None], ref_n[None])

    # ---- rung 12: full tick_init fwd -----------------------------------------
    def r_tick(p):
        out = L.tick_init(jax.random.PRNGKey(0), m, p["geometry"], p["pose"],
                          tex, p["material"], perceptual, perc_params,
                          target, jnp.int32(5), cfg, None)
        return out["total"]

    rungs = [
        ("extract (field+gshell)", r_extract),
        ("+ LBS pose", r_meshes),
        ("+ rasterize", r_rast),
        ("+ cover/gather/interp", r_interp),
        ("+ scatter_image", r_scatter),
        ("+ jitter normal tap", r_jitter),
        ("+ sparse AA (no tap)", r_aa),
        ("render_mesh full", r_render),
        ("render + msk/msdf hinges", r_msk),
        ("render + eikonal", r_eik),
        ("render + perceptual", r_perc),
        ("tick_init fwd", r_tick),
    ]
    # LADDER_RUNGS=0,2,5 selects a subset (full-scale compiles are ~1-5 min
    # EACH; on the TPU pick the rungs the current question needs)
    sel = os.environ.get("LADDER_RUNGS", "")
    if sel:
        want = {int(s) for s in sel.split(",")}
        rungs = [r for i, r in enumerate(rungs) if i in want]
    results = {}
    for name, fn in rungs:
        try:
            jf = jax.jit(fn)
            results[name] = loop_time(name, lambda p=None, jf=jf: jf(
                perturbed()), iters=8)
        except Exception as e:            # noqa: BLE001
            print(f"{name:40s} FAILED {type(e).__name__}: {e}", flush=True)

    if os.environ.get("LADDER_NO_STEP", "0") == "1":
        print(f"(noop baseline {base:.1f} ms)", flush=True)
        return

    # full step (fwd+bwd+opt) via the bench step_fn
    box = {"s": state}

    def one():
        box["s"], aux = step_fn(box["s"], target, jax.random.PRNGKey(
            it_box["i"]))
        it_box["i"] += 1
        return aux["total"]

    results["full train step"] = loop_time("full train step", one, iters=8)
    print(f"(noop baseline {base:.1f} ms — subtract from every rung)",
          flush=True)


if __name__ == "__main__":
    main()
