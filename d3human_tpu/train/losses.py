"""Per-iteration loss computation for the three stage families.

Pure-function redesign of the reference's tick_init / tick_split / tick_seq
(/root/reference/geometry/hmsdf.py:810-915, :917-1096, :1099-1182) plus the
stage drivers' final weighting (/root/reference/train.py:718, :1050-1087,
:1412-1421). Every tick renders the current geometry and returns a dict of
named losses; the total is assembled exactly like the corresponding driver.

All schedules that the reference implements with python-side ints
(eikonal coefficient steps ref :861-872, sdf-reg annealing ref :881) are
jnp.where over a traced iteration scalar so a single compiled step serves
the whole stage.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from d3human_tpu.config import Config
from d3human_tpu.models.geometry import (
    ExtractedMeshes, GeometryModel, SeqTemplate, collision_loss,
)
from d3human_tpu.models.perceptual import ConvPerceptual, random_crop_pair
from d3human_tpu.ops import mesh_ops
from d3human_tpu.ops.image_loss import make_loss_fn
from d3human_tpu.ops.marching_tets import sdf_reg_loss
from d3human_tpu.render import regularizer
from d3human_tpu.render.pipeline import MeshBuffers, render_mesh


def _huber_sum(x: jnp.ndarray, target: jnp.ndarray, mask=None) -> jnp.ndarray:
    """torch F.huber_loss(delta=1, reduction='sum')."""
    d = x - target
    l = jnp.where(jnp.abs(d) < 1.0, 0.5 * d * d, jnp.abs(d) - 0.5)
    if mask is not None:
        l = jnp.where(mask, l, 0.0)
    return jnp.sum(l)


def eikonal_coeff(it, scale: Optional[float]):
    """ref hmsdf.py:861-872 hardcoded schedule."""
    if scale is not None:
        return jnp.asarray(scale)
    return jnp.where(it < 500, 3e-1, jnp.where(it < 2000, 1e-1, 1e-2))


def eikonal_loss(model: GeometryModel, params, pts: jnp.ndarray,
                 it, cfg: Config) -> jnp.ndarray:
    """||grad sdf|| -> 1 at surface samples (ref hmsdf.py:856-876; the
    double backprop is plain grad-of-grad in JAX)."""
    pts = jax.lax.stop_gradient(pts)

    def f(p):
        return jnp.sum(model.query_sdf(params, p))

    g = jax.grad(f)(pts)
    coeff = eikonal_coeff(it, cfg.loss.eikonal_scale)
    return coeff * jnp.mean(
        (jnp.sqrt(jnp.sum(g * g, axis=-1) + 1e-12) - 1.0) ** 2)


def _normal_images(buffers: MeshBuffers, normal_ref: jnp.ndarray):
    """Unit normals with the reference's y/z negation, remapped to [0,1]
    (ref hmsdf.py:895-900)."""
    out_n = mesh_ops.safe_normalize(buffers.geometric_normal[..., 0:3])
    out_n = out_n * jnp.asarray([1.0, -1.0, -1.0])
    ref_n = mesh_ops.safe_normalize(normal_ref[..., 0:3])
    return (out_n + 1.0) / 2.0, (ref_n + 1.0) / 2.0


def msdf_image_hinges(buffers: MeshBuffers, gt_mask: jnp.ndarray):
    """ref hmsdf.py:838-839 / :953-954: push the rendered mSDF negative
    outside the mask and positive (toward 1) inside."""
    msdf_img = buffers.msdf_image
    outside = (gt_mask == 0).astype(jnp.float32)
    inside = (gt_mask == 1).astype(jnp.float32)
    l_out = jnp.mean(jnp.abs(jnp.clip(msdf_img, 0.0, None) * outside))
    l_in = jnp.mean(jnp.abs(jnp.clip(msdf_img, None, 0.0) * inside - 1.0))
    return 5e-1 * l_out + 5e-1 * l_in


def render_stage_mesh(key, model: GeometryModel, params, pose_params,
                      tex_module, tex_params, target, cfg: Config,
                      msdf_sign: float = 1.0,
                      raster_opts=None, compact=None, shade=True,
                      meshes=None, need_smoothness=True) -> tuple:
    """getMesh + render (ref render_init/render_split, hmsdf.py:706-773).
    Texture coordinates use the *unposed* template positions
    (ref render.py:259 interpolates mesh_original = tmp_nodeform_mesh).
    Pass precomputed ``meshes`` to reuse a shared extraction (split stage
    extracts both halves at once via get_meshes_pair)."""
    if meshes is None:
        meshes = model.get_meshes(params, pose_params, target["frame_idx"],
                                  msdf_sign=msdf_sign)
    buffers = render_mesh(
        key,
        verts=meshes.verts_posed,
        verts_original=meshes.verts_template,
        faces=meshes.mesh.faces,
        face_valid=meshes.mesh.face_valid,
        mvp=target["mvp"],
        campos=target["campos"],
        resolution=tuple(cfg.render.train_res),
        tex_module=tex_module,
        tex_params=tex_params,
        background=target["background"],
        msdf_attr=meshes.mesh.msdf_aug,
        spp=cfg.render.spp,
        raster_opts=raster_opts,
        max_covered_frac=cfg.render.max_covered_frac,
        jitter_subsample=cfg.render.jitter_subsample,
        aa_dense=cfg.render.aa_dense,
        compact=compact,
        shade=shade,
        layers=cfg.render.layers,
        need_smoothness=need_smoothness,
    )
    return meshes, buffers


def capacity_metrics(buffers: MeshBuffers, meshes=None) -> dict:
    """Static-capacity occupancy ratios (overflow => silently dropped work
    => quietly wrong gradients). Logged in every step's aux so a sizing
    problem is visible in the scalar logs, not a mystery."""
    out = {}
    st = buffers.stats
    if st is not None:
        out["cap_cov"] = st["n_cov"] / st["cov_capacity"]
        out["cap_aa"] = (jnp.maximum(st["aa_pairs_x"], st["aa_pairs_y"])
                         / st["aa_capacity"])
        if st.get("aa_dense"):
            # tags dense-AA runs: their cap_aa is occupancy of the FULL
            # per-axis pair grid, not of the sparse compaction capacity
            out["aa_dense"] = jnp.float32(st["aa_dense"])
    if buffers.rast.n_max_tile is not None:
        out["n_max_tile"] = buffers.rast.n_max_tile
        out["n_big_faces"] = buffers.rast.n_big
    if meshes is not None:
        out["n_cross"] = meshes.mesh.n_cross
        out["n_valid_tets"] = meshes.mesh.n_valid_tets
    return out


def mask_iou(pred_alpha, gt_mask):
    """Hard-threshold silhouette IoU — convergence telemetry (not a loss)."""
    p = pred_alpha > 0.5
    g = gt_mask > 0.5
    inter = jnp.sum(p & g).astype(jnp.float32)
    union = jnp.sum(p | g).astype(jnp.float32)
    return inter / jnp.maximum(union, 1.0)


def tick_init(key, model: GeometryModel, params, pose_params,
              tex_module, tex_params, perceptual: ConvPerceptual, perc_params,
              target, it, cfg: Config, raster_opts=None) -> Dict[str, jnp.ndarray]:
    """ref hmsdf.py:810-915 + total at train.py:718."""
    k_render, k_sample = jax.random.split(key)
    shade = bool(cfg.render.init_shading)
    # need_smoothness=False: the init total is reg+normal+msk (ref
    # train.py:718) — the material/normal smoothness regularizers never
    # enter it, so the render can drop their channels entirely
    meshes, buffers = render_stage_mesh(
        k_render, model, params, pose_params, tex_module, tex_params,
        target, cfg, raster_opts=raster_opts, shade=shade,
        need_smoothness=False)

    color_ref = target["all_img"]
    gt_mask = color_ref[..., 3:]
    loss_fn = make_loss_fn(cfg.loss.loss)

    msk_loss = 100.0 * jnp.mean((buffers.shaded[..., 3:] - gt_mask) ** 2)
    if shade:
        img_loss = loss_fn(buffers.shaded[..., 0:3] * gt_mask,
                           color_ref[..., 0:3] * gt_mask)
    else:
        # log-only metric (not in total, ref train.py:718); shading skipped
        img_loss = jnp.asarray(0.0)
    img_loss = img_loss + msdf_image_hinges(buffers, gt_mask)

    # eikonal on points sampled from the posed surface (ref hmsdf.py:714,856)
    # — face areas reuse the render's corner gather (stats.fn_raw)
    pts = mesh_ops.sample_points_on_mesh(
        k_sample, meshes.verts_posed, meshes.mesh.faces,
        cfg.geometry.n_eikonal_samples, meshes.mesh.face_valid,
        fn_raw=(buffers.stats or {}).get("fn_raw"))
    eik = eikonal_loss(model, params, pts, it, cfg) if cfg.loss.use_eikonal \
        else jnp.asarray(0.0)

    # annealed sign-flip regularizer (ref hmsdf.py:881-882)
    t_iter = it / cfg.stages.init_epoch
    sdf_w = cfg.loss.sdf_regularizer - (
        cfg.loss.sdf_regularizer - 0.01) * jnp.minimum(1.0, 4.0 * t_iter)
    sdf_reg = sdf_reg_loss(meshes.sdf, model.grid) * sdf_w

    out_n, ref_n = _normal_images(buffers, target["all_normal"])
    normal_loss = 50.0 * perceptual.loss(perc_params, out_n[None], ref_n[None])

    reg_loss = sdf_reg + eik
    total = reg_loss + normal_loss + msk_loss     # ref train.py:718
    out = {
        "total": total, "img_loss": img_loss, "msk_loss": msk_loss,
        "sdf_reg_loss": sdf_reg, "eik_loss": eik, "reg_loss": reg_loss,
        "normal_loss": normal_loss,
        "iou": mask_iou(buffers.shaded[..., 3:], gt_mask),
    }
    out.update(capacity_metrics(buffers, meshes))
    return out


def tick_split_one(key, model: GeometryModel, params, pose_params,
                   tex_module, tex_params, perceptual, perc_params,
                   target, it, cfg: Config, mesh_type: str,
                   raster_opts=None, meshes=None) -> Dict[str, jnp.ndarray]:
    """One half (cloth or body) of the split tick (ref hmsdf.py:917-1096)."""
    sign = 1.0 if mesh_type == "cloth" else -1.0
    k_render, k_sample, k_crop = jax.random.split(key, 3)
    meshes, buffers = render_stage_mesh(
        k_render, model, params, pose_params, tex_module, tex_params,
        target, cfg, msdf_sign=sign, raster_opts=raster_opts, meshes=meshes)

    color_ref = target[f"{mesh_type}_img"]
    normal_ref = target[f"{mesh_type}_normal"]
    gt_mask = color_ref[..., 3:]
    loss_fn = make_loss_fn(cfg.loss.loss)

    msk_loss = jnp.mean((buffers.shaded[..., 3:] - gt_mask) ** 2)
    img_loss = loss_fn(buffers.shaded[..., 0:3] * gt_mask,
                       color_ref[..., 0:3] * gt_mask)
    img_loss = img_loss + msdf_image_hinges(buffers, gt_mask)

    pts = mesh_ops.sample_points_on_mesh(
        k_sample, meshes.verts_posed, meshes.mesh.faces,
        cfg.geometry.n_eikonal_samples, meshes.mesh.face_valid,
        fn_raw=(buffers.stats or {}).get("fn_raw"))
    eik = eikonal_loss(model, params, pts, it, cfg) if cfg.loss.use_eikonal \
        else jnp.asarray(0.0)

    # mesh-msdf open/close regularizers (ref hmsdf.py:996-1028)
    mesh_msdf_reg = jnp.asarray(0.0)
    if cfg.loss.use_mesh_msdf_reg:
        regscale = (64.0 / cfg.geometry.grid_res) ** 3
        eps = 1e-3
        open_s = cfg.loss.msdf_reg_open_scale
        close_s = cfg.loss.msdf_reg_close_scale
        # mesh.msdf_aug is ALREADY the sign-corrected view: _gshell_level2
        # multiplies by msdf_sign before storing (body mesh carries -raw,
        # exactly the reference's extra['msdf'] of the negated field,
        # ref hmsdf_tets_split.py:254-264 + :440-447). Re-applying `sign`
        # here (a r2-r4 bug) returned the body half to the RAW view, which
        # inverts its open/close regularizers: the body open term then
        # pushes raw mSDF NEGATIVE (expanding body into cloth) instead of
        # shrinking the body shell — a systematic anti-cloth pressure that
        # matched the observed split-stage cloth regression
        # (PARITY_MULTIVIEW_r04: cloth IoU 0.444->0.408 across split).
        # Smoking gun: body/cloth mesh_msdf_reg logs were bit-identical
        # (both halves share aug vertex slots; raw view == raw view),
        # where correct views are sign-mirrored and differ.
        msdf_aug = meshes.mesh.msdf_aug
        if open_s > 0:
            mesh_msdf_reg = open_s * regscale * _huber_sum(
                jnp.clip(msdf_aug, -eps, None), -eps)
        if close_s != 0:
            # visible boundary verts (ref :1013-1026): faces seen by the
            # rasterizer -> their boundary-block vertices. Sorted-COO count
            # on TPU (the 3F-row XLA boolean scatter costs ~90 ns/row —
            # ~200 ms/half at split scale, scripts/profile_bwd.py).
            MV = meshes.mesh.n_verts_watertight
            vis_faces = buffers.visible_faces
            nv = meshes.mesh.verts.shape[0]
            safe_faces = jnp.where(
                (vis_faces & meshes.mesh.face_valid)[:, None],
                meshes.mesh.faces, nv)
            from d3human_tpu.ops.scatter import (
                coo_scatter_add, default_use_pallas,
            )
            ids = safe_faces.reshape(-1)
            if default_use_pallas():
                cnt = coo_scatter_add(
                    ids, jnp.ones((ids.shape[0], 1), jnp.float32), nv + 1)
                bnd_seen = cnt[MV:-1, 0] > 0
            else:
                vert_seen = jnp.zeros((nv + 1,), bool).at[ids].set(True)
                bnd_seen = vert_seen[MV:-1]
            bnd_msdf = msdf_aug[MV:]
            mesh_msdf_reg = mesh_msdf_reg + close_s * regscale * _huber_sum(
                jnp.clip(bnd_msdf, None, eps), eps, mask=bnd_seen)

    t_iter = it / cfg.stages.split_epoch
    sdf_w = cfg.loss.sdf_regularizer - (
        cfg.loss.sdf_regularizer - 0.01) * jnp.minimum(1.0, 4.0 * t_iter)
    sdf_reg = sdf_reg_loss(meshes.sdf, model.grid) * sdf_w

    # shading regularizers (ref hmsdf.py:1034-1046; monochrome is zero since
    # the env-shading branch is dead and diffuse_light never exists)
    if buffers.stats is not None:
        mtl_smooth = regularizer.material_smoothness_compact(
            buffers.stats, cfg.loss.lambda_kd, cfg.loss.lambda_ks,
            cfg.loss.lambda_nrm)
    else:
        mtl_smooth = regularizer.material_smoothness_grad(
            buffers.kd_grad, buffers.ks_grad, buffers.normal_grad,
            cfg.loss.lambda_kd, cfg.loss.lambda_ks, cfg.loss.lambda_nrm)
    chroma = regularizer.chroma_loss(buffers.kd, color_ref,
                                     cfg.loss.lambda_chroma)

    out_n, ref_n = _normal_images(buffers, normal_ref)
    normal_mse = jnp.mean((out_n * 2 - 1 - (ref_n * 2 - 1)) ** 2)
    cos = jnp.sum((out_n * 2 - 1) * (ref_n * 2 - 1), axis=-1)
    norms = (jnp.linalg.norm(out_n * 2 - 1, axis=-1)
             * jnp.linalg.norm(ref_n * 2 - 1, axis=-1))
    normal_cos = 0.1 * (1.0 - jnp.mean(cos / jnp.maximum(norms, 1e-8)))
    crop_a, crop_b = random_crop_pair(
        k_crop, out_n[None], ref_n[None], cfg.loss.perceptual_crop)
    normal_loss = 5.0 * perceptual.loss(perc_params, crop_a, crop_b)

    geo_reg = sdf_reg + eik
    shading_reg = mtl_smooth + chroma
    # mesh_msdf_reg is LOG-ONLY in the reference: tick_split returns it but
    # reg_loss = geo_reg + shading_reg (ref hmsdf.py:1049-1051) and the
    # driver's total never adds it (ref train.py:1087 — grep shows the only
    # uses are tensorboard writes at :1116,:1135). Rounds 2-4 summed it into
    # the total here — with the body half additionally on the raw-sign view
    # — a compounding deviation that pressured mSDF toward body everywhere.
    reg_loss = geo_reg + shading_reg
    out = {
        "img_loss": img_loss, "msk_loss": msk_loss, "eik_loss": eik,
        "sdf_reg_loss": sdf_reg, "mesh_msdf_reg_loss": mesh_msdf_reg,
        "mtl_smooth_loss": mtl_smooth, "chroma_loss": chroma,
        "reg_loss": reg_loss, "normal_loss": normal_loss,
        "normal_loss_mse": normal_mse, "normal_loss_cos": normal_cos,
    }
    out.update(capacity_metrics(buffers, meshes))
    return out


def tick_split(key, model, params, pose_params, tex_module, tex_params,
               perceptual, perc_params, target, it, cfg: Config,
               raster_opts=None) -> Dict[str, jnp.ndarray]:
    """Both halves + the driver's weighting (ref train.py:1040-1087:
    total = cloth img+normal+reg + body img+normal+reg + 10x mask each).
    The two halves share one level-1 extraction + LBS (bit-identical to
    independent per-half extraction, models/geometry.py:get_meshes_pair) —
    the sign enters the reference's pipeline before its big gathers, so
    XLA's CSE cannot recover this sharing on its own."""
    kc, kb = jax.random.split(key)
    meshes_c, meshes_b = model.get_meshes_pair(params, pose_params,
                                               target["frame_idx"])
    cloth = tick_split_one(kc, model, params, pose_params, tex_module,
                           tex_params, perceptual, perc_params, target, it,
                           cfg, "cloth", raster_opts, meshes=meshes_c)
    body = tick_split_one(kb, model, params, pose_params, tex_module,
                          tex_params, perceptual, perc_params, target, it,
                          cfg, "body", raster_opts, meshes=meshes_b)
    total = (cloth["img_loss"] + cloth["normal_loss"] + cloth["reg_loss"]
             + body["img_loss"] + body["normal_loss"] + body["reg_loss"]
             + 10.0 * cloth["msk_loss"] + 10.0 * body["msk_loss"])
    out = {"total": total}
    out.update({f"cloth_{k}": v for k, v in cloth.items()})
    out.update({f"body_{k}": v for k, v in body.items()})
    return out


def tick_seq(key, model: GeometryModel, params, pose_params,
             tex_module, tex_params, perceptual, perc_params,
             template: SeqTemplate, target, it, cfg: Config,
             raster_opts=None) -> Dict[str, jnp.ndarray]:
    """Seq-stage tick (ref hmsdf.py:1099-1182) with the driver weights
    (ref train.py:1412-1421): per-frame nonrigid refinement of the explicit
    merged template, mask decomposition via the mesh_id buffer, collision +
    laplacian + normal-consistency smoothness."""
    k_render = key
    posed, delta = model.seq_deformed(params, template, pose_params,
                                      target["frame_idx"])
    face_valid = jnp.ones((template.f.shape[0],), bool)
    buffers = render_mesh(
        k_render,
        verts=posed,
        verts_original=template.v,
        faces=template.f,
        face_valid=face_valid,
        mvp=target["mvp"],
        campos=target["campos"],
        resolution=tuple(cfg.render.train_res),
        tex_module=tex_module,
        tex_params=tex_params,
        background=target["background"],
        face_labels=template.face_labels,
        spp=cfg.render.spp,
        raster_opts=raster_opts,
        max_covered_frac=cfg.render.max_covered_frac,
        jitter_subsample=cfg.render.jitter_subsample,
        aa_dense=cfg.render.aa_dense,
    )

    # mask decomposition (ref hmsdf.py:788-798): cloth = label*alpha
    alpha = buffers.alpha[..., 0]
    v_label = buffers.mesh_id[..., 0]
    cloth_mask = (v_label * alpha)[..., None]
    body_mask = ((1.0 - v_label) * alpha)[..., None]
    all_mask = alpha[..., None]

    gt_all = target["all_img"]
    gt_cloth = target["cloth_img"]
    gt_body = target["body_img"]
    loss_fn = make_loss_fn(cfg.loss.loss)

    all_msk = 200.0 * jnp.mean((all_mask - gt_all[..., 3:]) ** 2)
    cloth_msk = 200.0 * jnp.mean((cloth_mask - gt_cloth[..., 3:]) ** 2)
    body_msk = 200.0 * jnp.mean((body_mask - gt_body[..., 3:]) ** 2)

    all_img = loss_fn(buffers.shaded[..., 0:3] * all_mask, gt_all[..., 0:3])
    cloth_img = loss_fn(buffers.shaded[..., 0:3] * cloth_mask,
                        gt_cloth[..., 0:3])
    body_img = loss_fn(buffers.shaded[..., 0:3] * body_mask,
                       gt_body[..., 0:3])

    if buffers.stats is not None:
        mtl_smooth = regularizer.material_smoothness_compact(
            buffers.stats, cfg.loss.lambda_kd, cfg.loss.lambda_ks,
            cfg.loss.lambda_nrm)
    else:
        mtl_smooth = regularizer.material_smoothness_grad(
            buffers.kd_grad, buffers.ks_grad, buffers.normal_grad,
            cfg.loss.lambda_kd, cfg.loss.lambda_ks, cfg.loss.lambda_nrm)
    chroma = regularizer.chroma_loss(buffers.kd, gt_all,
                                     cfg.loss.lambda_chroma)
    shading_reg = mtl_smooth + chroma

    delta_loss = jnp.sum(jnp.sum(delta ** 2, axis=-1))

    out_n, ref_n = _normal_images(buffers, target["all_normal"])
    normal_loss = 20.0 * perceptual.loss(perc_params, out_n[None], ref_n[None])

    lap = mesh_ops.laplacian_uniform_loss(posed, template.f)
    nds_normal = mesh_ops.normal_consistency_loss(
        posed, template.f, template.connected_faces)

    cloth_v = posed[template.cloth_vidx]
    body_v = posed[template.body_vidx]
    colli = collision_loss(cloth_v, body_v, template.body_f,
                           cfg.loss.collision_push_eps)

    # driver weighting (ref train.py:1412-1421)
    total = (250.0 * normal_loss
             + 0.1 * shading_reg
             + body_msk + cloth_msk + all_msk
             + 1e6 * lap
             + 1e5 * colli
             + 1e3 * nds_normal
             + delta_loss)
    out = {
        "total": total, "all_img_loss": all_img, "all_msk_loss": all_msk,
        "cloth_img_loss": cloth_img, "cloth_msk_loss": cloth_msk,
        "body_img_loss": body_img, "body_msk_loss": body_msk,
        "laplacian_loss": lap, "colli_loss": colli,
        "nds_normal_loss": nds_normal, "normal_loss": normal_loss,
        "delta_loss": delta_loss, "mtl_smooth_loss": mtl_smooth,
        "chroma_loss": chroma, "reg_loss": shading_reg,
    }
    out.update(capacity_metrics(buffers))
    return out
