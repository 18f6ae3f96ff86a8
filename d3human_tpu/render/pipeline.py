"""Mesh rendering pipeline: rasterize -> interpolate -> shade -> composite.

Functional redesign of the reference render pass
(/root/reference/render/render.py: shade:42-205, render_layer:213-339,
render_mesh:347-451) and its mask/id variant
(/root/reference/render/render_mask.py, which adds a per-pixel ``mesh_id``
buffer composited WITHOUT antialiasing — how cloth/body masks come from one
merged mesh in the seq stage).

Reference behaviors preserved:
  * ``bsdf`` is forced to 'kd' (ref render.py:120) => albedo-only shading;
    the env-light/OptiX/denoiser branch is dead at runtime. The light is
    still carried/optimized for surface parity.
  * material-smoothness inputs come from jittered texture taps
    (spatial +N(0,0.01) world jitter for kd/ks, ref render.py:84-89) and a
    jittered screen-space resample of the normal buffer (+-N(0,0.005) UV,
    ref render.py:68-72,102-103).
  * alpha for depth/invdepth is forced to 1 to avoid double blending
    (ref render.py:180-195).
  * composite = lerp(background, color, alpha) then antialias
    (ref render.py:375-382); every buffer is antialiased except mesh_id.

The whole pipeline is jit-traceable with static shapes; the only
non-differentiable piece is the rasterizer's visibility (by design).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from d3human_tpu.ops import mesh_ops
from d3human_tpu.ops.rasterizer import (
    Rast, aa_geometry_compact, aa_pairs_compact, aa_weights, apply_aa,
    apply_aa_sparse, barycentrics, barycentrics_compact, compact_cover,
    interpolate, interpolate_face_attr, pixel_centers_at, rasterize,
    rasterize_bruteforce, scatter_image, visible_face_mask, xfm_points,
)


class MeshBuffers(NamedTuple):
    shaded: jnp.ndarray             # [H, W, 4] kd + alpha, composited + AA
    diffuse_light: jnp.ndarray      # [H, W, 3] (pbr path; zeros under 'kd')
    specular_light: jnp.ndarray     # [H, W, 3]
    geometric_normal: jnp.ndarray   # [H, W, 4]
    normal: jnp.ndarray             # [H, W, 4] (smooth, two-sided)
    depth: jnp.ndarray              # [H, W, 2]
    invdepth: jnp.ndarray           # [H, W, 2]
    kd: jnp.ndarray                 # [H, W, 4]
    ks: jnp.ndarray                 # [H, W, 4]
    kd_grad: jnp.ndarray            # [H, W, 4]
    ks_grad: jnp.ndarray            # [H, W, 4]
    normal_grad: jnp.ndarray        # [H, W, 4]
    msdf_image: jnp.ndarray         # [H, W, 1]
    mesh_id: jnp.ndarray            # [H, W, 1] face-label buffer (no AA)
    alpha: jnp.ndarray              # [H, W, 1] raw coverage (pre-AA)
    visible_faces: jnp.ndarray      # [F] bool
    rast: Rast
    # compact-path extras (None on the full path): per-covered-pixel arrays
    # for mean-based regularizers + overflow observability counters
    stats: Optional[dict] = None


def _bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C], uv [..., 2] in [0,1] -> [..., C] (clamp boundary).

    The 4 corner taps run as ONE fused row-gather on the flattened image
    (gather_rows), so the backward is a single Pallas sorted-COO scatter on
    TPU instead of 4 XLA image scatters (~90 ns/row each,
    scripts/profile_bwd.py) — the jitter-tap transpose was one of the
    remaining un-routed scatters in the train step."""
    H, W = img.shape[:2]
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    from d3human_tpu.ops.scatter import default_use_pallas, gather_rows

    flat = img.reshape(H * W, -1)
    rows = jnp.stack([y0 * W + x0, y0 * W + x1,
                      y1 * W + x0, y1 * W + x1])           # [4, ...]
    wts = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                     (1 - fx) * fy, fx * fy])              # [4, ...]
    g = gather_rows(flat, rows, default_use_pallas())      # [4, ..., C]
    return jnp.sum(g * wts[..., None], axis=0)


def render_mesh(
    key: jax.Array,
    verts: jnp.ndarray,             # [V, 3] posed vertex positions
    verts_original: jnp.ndarray,    # [V, 3] canonical positions (texture coords)
    faces: jnp.ndarray,             # [F, 3]
    face_valid: jnp.ndarray,        # [F]
    mvp: jnp.ndarray,               # [4, 4]
    campos: jnp.ndarray,            # [3]
    resolution: Tuple[int, int],
    tex_module,                     # MLPTexture3D
    tex_params,
    background: jnp.ndarray,        # [H, W, 3]
    msdf_attr: Optional[jnp.ndarray] = None,     # [V] mSDF per vertex
    face_labels: Optional[jnp.ndarray] = None,   # [F] 0=body 1=cloth
    v_nrm: Optional[jnp.ndarray] = None,         # [V, 3] smooth normals
    spp: int = 1,
    use_bruteforce_raster: bool = False,
    raster_opts: Optional[dict] = None,
    max_covered_frac: float = 0.5,
    aa_all_buffers: bool = False,
    bsdf: str = "kd",
    light_params=None,
    n_light_samples: int = 8,
    shadow_scale: float = 1.0,
    sdf_fn=None,
    compact: Optional[bool] = None,
    aa_max_pairs: Optional[int] = None,
    aa_z_thresh: float = 0.01,
    jitter_subsample: int = 2,
    shade: bool = True,
    layers: int = 1,
    aa_dense: bool = False,
    need_smoothness: bool = True,
) -> MeshBuffers:
    """Dispatch: the compacted training path (default where it applies) or
    the full-image reference path (validation / spp>1 / pbr / oracle /
    layers>1 depth peeling).

    ``need_smoothness=False`` (init stage) additionally drops the smooth-
    normal interpolation + jittered normal tap + their channels from the
    fused scatter: the only consumer is the material-smoothness regularizer,
    which the init total never includes (ref train.py:718) — but the fused
    multi-channel image scatter otherwise keeps the whole subtree alive
    against DCE (~60 ms/step at f3c scale, TRACE_r05_init2).

    ``shade=False`` skips every texture/material lookup and returns zero
    kd/ks/color channels (alpha, normals, msdf unchanged). The init stage's
    total is reg+normal+msk with NO img term (ref train.py:718), so color is
    a log-only output there — skipping it removes the hash-grid taps from
    the hot loop without touching any gradient."""
    if compact is None:
        compact = (spp == 1 and bsdf == "kd" and not use_bruteforce_raster
                   and not aa_all_buffers and 0 < max_covered_frac < 1
                   and layers == 1)
    if compact:
        return render_mesh_compact(
            key, verts, verts_original, faces, face_valid, mvp, campos,
            resolution, tex_module, tex_params, background,
            msdf_attr=msdf_attr, face_labels=face_labels, v_nrm=v_nrm,
            raster_opts=raster_opts, max_covered_frac=max_covered_frac,
            aa_max_pairs=aa_max_pairs, aa_z_thresh=aa_z_thresh,
            jitter_subsample=jitter_subsample, shade=shade,
            aa_dense=aa_dense, need_smoothness=need_smoothness)
    return render_mesh_full(
        key, verts, verts_original, faces, face_valid, mvp, campos,
        resolution, tex_module, tex_params, background, shade=shade,
        msdf_attr=msdf_attr,
        face_labels=face_labels, v_nrm=v_nrm, spp=spp,
        use_bruteforce_raster=use_bruteforce_raster, raster_opts=raster_opts,
        max_covered_frac=max_covered_frac, aa_all_buffers=aa_all_buffers,
        bsdf=bsdf, light_params=light_params,
        n_light_samples=n_light_samples, shadow_scale=shadow_scale,
        sdf_fn=sdf_fn, layers=layers)


def render_mesh_compact(
    key: jax.Array,
    verts: jnp.ndarray,
    verts_original: jnp.ndarray,
    faces: jnp.ndarray,
    face_valid: jnp.ndarray,
    mvp: jnp.ndarray,
    campos: jnp.ndarray,
    resolution: Tuple[int, int],
    tex_module,
    tex_params,
    background: jnp.ndarray,
    msdf_attr: Optional[jnp.ndarray] = None,
    face_labels: Optional[jnp.ndarray] = None,
    v_nrm: Optional[jnp.ndarray] = None,
    raster_opts: Optional[dict] = None,
    max_covered_frac: float = 0.5,
    aa_max_pairs: Optional[int] = None,
    aa_z_thresh: float = 0.01,
    jitter_subsample: int = 2,
    shade: bool = True,
    aa_dense: bool = False,
    need_smoothness: bool = True,
) -> MeshBuffers:
    """Covered-pixel-compacted render (the TPU training hot path).

    Identical math to ``render_mesh_full`` for every buffer the loss ticks
    consume, restructured around the measured TPU cost model
    (scripts/bench_gather.py — gathers/scatters cost per ROW; scatter-adds
    are the backward of every per-pixel gather):

      * ALL per-pixel shading work runs on a static-capacity compacted list
        of covered pixels (``compact_cover``), so gather/scatter rows scale
        with coverage, not resolution;
      * every vertex attribute (clip pos for barycentrics, posed/template
        positions, smooth normal, mSDF) is fetched by ONE fused wide-row
        gather — one scatter-add in the backward instead of five;
      * antialiasing processes a compacted SILHOUETTE pair list (coverage
        change or depth discontinuity) instead of every neighboring pixel
        pair — the same edge set nvdiffrast's edge hash selects (interior
        edges shared by two visible triangles carry no silhouette gradient);
      * jittered material/normal smoothness taps run on a 1/jitter_subsample
        subsample of covered pixels — an unbiased estimator of the
        reference's full-frame mean (ref render.py:68-109);
      * full [H, W] images are materialized by ONE multi-channel scatter
        only for the buffers consumed as images (shaded, geometric normal,
        mSDF, mesh_id, kd); mean-based regularizer inputs stay compacted in
        ``stats``.

    Buffers not used by any loss tick (depth/invdepth/smooth-normal image,
    ks/grad images) return zeros — use render_mesh_full for validation.
    """
    H, W = resolution
    npix = H * W
    v_clip = xfm_points(verts, mvp)
    rast = rasterize(v_clip, faces, face_valid, resolution,
                     **(raster_opts or {}))
    P = int(npix * max_covered_frac)
    idx, valid, fid = compact_cover(rast, P)
    ic = jnp.minimum(idx, npix - 1)                 # safe index for gathers
    pix_xy = pixel_centers_at(ic, resolution)
    vmask = valid[:, None].astype(jnp.float32)

    # ---- lean init-stage path (docstring of render_mesh): shading off, no
    # face labels, and no smoothness consumers => only geometric normals +
    # mSDF survive to the losses. Every gradient-bearing loss value is
    # bit-identical to the full packing (locked by test_golden_losses);
    # shaded rgb is background-only there (img term is log-only zero).
    if not shade and face_labels is None and not need_smoothness:
        from d3human_tpu.ops.scatter import default_use_pallas, gather_rows

        fn_raw = mesh_ops.face_normals(verts, faces, normalize=False)
        msdf_v = (msdf_attr[:, None] if msdf_attr is not None
                  else jnp.zeros((verts.shape[0], 1)))
        vattr = jnp.concatenate([v_clip, verts, msdf_v], axis=-1)   # [V, 8]
        g = gather_rows(vattr, faces[fid], default_use_pallas())    # [P,3,8]
        bary = barycentrics_compact(g[..., :4], pix_xy, resolution)
        interp = jnp.einsum("pk,pkc->pc", bary, g[..., 4:])
        pos = interp[:, 0:3] * vmask
        msdf_pix = interp[:, 3:4] * vmask
        fattr = gather_rows(fn_raw, fid, default_use_pallas())      # [P, 3]
        geo_n = mesh_ops.safe_normalize(fattr) * vmask

        packed = jnp.concatenate([geo_n, msdf_pix], axis=-1)        # 4 ch
        img = scatter_image(packed, idx, resolution)
        cover = rast.tri_id > 0
        alpha = cover[..., None].astype(jnp.float32)

        if aa_max_pairs is None:
            aa_max_pairs = 16 * max(H, W)
        aa_in = jnp.concatenate([alpha, img], axis=-1)              # 5 ch
        if aa_dense:
            from d3human_tpu.ops.rasterizer import aa_pair_candidates
            aa_out = apply_aa(aa_in,
                              aa_weights(v_clip, faces, rast, resolution))
            aa_counts = [jnp.sum(aa_pair_candidates(rast, ax, aa_z_thresh))
                         for ax in (1, 0)]
            aa_max_pairs = H * (W - 1)
        else:
            pairs, aa_counts = [], []
            for axis in (1, 0):
                pidx, pvalid, n_cand = aa_pairs_compact(
                    rast, resolution, axis, aa_max_pairs, aa_z_thresh)
                pairs.append(aa_geometry_compact(
                    v_clip, faces, rast, pidx, pvalid, resolution, axis))
                aa_counts.append(n_cand)
            aa_out = apply_aa_sparse(aa_in, pairs)
        aa_alpha = aa_out[..., 0:1]
        # rgb is dead in this mode (img term log-only zero); composite the
        # background against the AA'd alpha so the saved strips stay sane
        shaded = jnp.concatenate([background * (1.0 - aa_alpha), aa_alpha],
                                 axis=-1)
        geo_b = jnp.concatenate([aa_out[..., 1:4], aa_alpha], axis=-1)
        msdf_b = aa_out[..., 4:5]

        zeros4 = jnp.zeros((H, W, 4))
        zeros3 = jnp.zeros((H, W, 3))
        zeros2 = jnp.zeros((H, W, 2))
        stats = {
            "idx": idx, "valid": valid, "fn_raw": fn_raw, "npix": npix,
            "n_cov": jnp.sum(cover), "cov_capacity": P,
            "aa_pairs_x": aa_counts[0], "aa_pairs_y": aa_counts[1],
            "aa_capacity": aa_max_pairs,
            "aa_dense": 1.0 if aa_dense else 0.0,
        }
        return MeshBuffers(
            shaded=shaded, diffuse_light=zeros3, specular_light=zeros3,
            geometric_normal=geo_b, normal=zeros4, depth=zeros2,
            invdepth=zeros2, kd=zeros4, ks=zeros4, kd_grad=zeros4,
            ks_grad=zeros4, normal_grad=zeros4, msdf_image=msdf_b,
            mesh_id=jnp.zeros((H, W, 1)), alpha=alpha,
            visible_faces=visible_face_mask(rast, faces.shape[0]),
            rast=rast, stats=stats)

    # ONE corner gather serves face normals, vertex normals, and (via
    # stats) the eikonal sampler's face areas — each extra 3F-row gather
    # costs ~12 ms/step at f3c scale (TRACE_r05)
    fn_raw = mesh_ops.face_normals(verts, faces, normalize=False)
    if v_nrm is None:
        v_nrm = mesh_ops.auto_normals(verts, faces, face_valid,
                                      fn_raw=fn_raw)
    msdf_v = (msdf_attr[:, None] if msdf_attr is not None
              else jnp.zeros((verts.shape[0], 1)))

    # ---- ONE fused vertex gather (backward = Pallas sorted-COO scatter
    # on TPU — the XLA scatter transpose was the dominant backward cost)
    from d3human_tpu.ops.scatter import default_use_pallas, gather_rows

    vattr = jnp.concatenate(
        [v_clip, verts, verts_original, v_nrm, msdf_v], axis=-1)  # [V, 14]
    g = gather_rows(vattr, faces[fid], default_use_pallas())      # [P, 3, 14]
    bary = barycentrics_compact(g[..., :4], pix_xy, resolution)   # [P, 3]
    interp = jnp.einsum("pk,pkc->pc", bary, g[..., 4:])
    pos = interp[:, 0:3] * vmask
    pos_orig = interp[:, 3:6] * vmask
    nrm_s = interp[:, 6:9] * vmask
    msdf_pix = interp[:, 9:10] * vmask

    # ---- face-attr gather ----------------------------------------------
    fn = mesh_ops.safe_normalize(fn_raw)
    flab = (face_labels.astype(jnp.float32)[:, None]
            if face_labels is not None else jnp.zeros((faces.shape[0], 1)))
    fattr = gather_rows(jnp.concatenate([fn, flab], axis=-1), fid,
                        default_use_pallas())                     # [P, 4]
    geo_n = fattr[:, :3] * vmask
    mesh_id_pix = fattr[:, 3:4] * vmask

    # two-sided shading normal (ref ru.prepare_shading_normal)
    view_vec = campos[None, :] - pos
    flip = jnp.sum(geo_n * view_vec, axis=-1, keepdims=True) < 0
    nrm_ts = mesh_ops.safe_normalize(jnp.where(flip, -nrm_s, nrm_s)) * vmask

    # ---- texture + jittered smoothness taps ------------------------------
    k_jit, k_nrm = jax.random.split(key)
    sub = slice(None, None, jitter_subsample)
    if shade:
        tex = tex_module.sample(tex_params, pos_orig) * vmask     # [P, 6]
        pts_h = pos_orig[sub]
        noise = 0.01 * jax.random.normal(k_jit, pts_h.shape)
        tex_j = tex_module.sample(tex_params, pts_h + noise)
        tex_d = jnp.abs(tex_j - tex[sub]) * vmask[sub]
    else:
        tex = jnp.zeros((pos_orig.shape[0], 6), pos_orig.dtype)
        tex_d = jnp.zeros((pos_orig[sub].shape[0], 6), pos_orig.dtype)
    kd_pix, ks_pix = tex[:, 0:3], tex[:, 3:6]
    kd_grad_pix = tex_d[:, 0:3]
    ks_grad_pix = tex_d[:, 3:6] * jnp.asarray([0.0, 1.0, 1.0])

    # ---- scatter the image-consumed channels ONCE ------------------------
    # [rgb(3) | geo_n(3) | msdf(1) | nrm_s(3, raw smooth — jitter tap
    #  compares pre-flip normals like the full path) | kd(3) | mesh_id(1)]
    shaded_col = kd_pix                        # bsdf forced 'kd' at runtime
    packed = jnp.concatenate(
        [shaded_col, geo_n, msdf_pix, nrm_s, kd_pix, mesh_id_pix], axis=-1)
    img = scatter_image(packed, idx, resolution)                  # [H, W, 14]
    cover = rast.tri_id > 0
    alpha = cover[..., None].astype(jnp.float32)

    # ---- normal-smoothness jitter tap (ref render.py:68-72,102-103) ------
    # normal + alpha taps share one fused 4-channel bilinear gather
    uv = pix_xy[sub] / jnp.asarray([W, H], jnp.float32)
    jit_uv = uv + 0.005 * jax.random.normal(k_nrm, uv.shape)
    na_img = jnp.concatenate([img[..., 7:10], alpha], axis=-1)
    na_tap = _bilinear_sample(na_img, jit_uv)
    nrm_tap, mask_tap = na_tap[..., :3], na_tap[..., 3:]
    nrm_grad_pix = (jnp.abs(nrm_tap - nrm_s[sub])
                    * mask_tap * vmask[sub])

    # ---- composite + sparse AA -------------------------------------------
    rgb_img = img[..., 0:3]
    shaded_rgb = rgb_img + background * (1.0 - alpha)
    if aa_max_pairs is None:
        aa_max_pairs = 16 * max(H, W)
    aa_in = jnp.concatenate(
        [shaded_rgb, alpha, img[..., 3:6], img[..., 6:7]], axis=-1)  # 8 ch
    if aa_dense:
        # stability-A/B instrumentation (config.render.aa_dense): every
        # neighbor pair through the dense _aa_weights math — no candidate
        # filter, no capacity. Counts reported = per-axis active-pair
        # candidates; capacity := the per-axis full pair grid (H*(W-1)),
        # so the logged cap_aa is a true occupancy of what dense mode
        # processes — NOT comparable to sparse-mode cap_aa (candidates vs
        # the compaction capacity); the aa_dense stat below tags the mode.
        from d3human_tpu.ops.rasterizer import aa_pair_candidates

        aa_out = apply_aa(aa_in, aa_weights(v_clip, faces, rast, resolution))
        aa_counts = [jnp.sum(aa_pair_candidates(rast, ax, aa_z_thresh))
                     for ax in (1, 0)]
        aa_max_pairs = H * (W - 1)
    else:
        pairs = []
        aa_counts = []
        for axis in (1, 0):
            pidx, pvalid, n_cand = aa_pairs_compact(
                rast, resolution, axis, aa_max_pairs, aa_z_thresh)
            pairs.append(aa_geometry_compact(
                v_clip, faces, rast, pidx, pvalid, resolution, axis))
            aa_counts.append(n_cand)
        aa_out = apply_aa_sparse(aa_in, pairs)
    shaded = aa_out[..., 0:4]
    aa_alpha = aa_out[..., 3:4]
    geo_b = jnp.concatenate([aa_out[..., 4:7], aa_alpha], axis=-1)
    msdf_b = aa_out[..., 7:8]

    zeros4 = jnp.zeros((H, W, 4))
    zeros3 = jnp.zeros((H, W, 3))
    zeros2 = jnp.zeros((H, W, 2))
    stats = {
        "idx": idx, "valid": valid,
        "fn_raw": fn_raw,
        "kd": kd_pix, "ks": ks_pix,
        "kd_grad": kd_grad_pix, "ks_grad": ks_grad_pix,
        "nrm_grad": nrm_grad_pix,
        "valid_sub": valid[sub],
        "jitter_subsample": jitter_subsample,
        "npix": npix,
        # capacity observability (VERDICT r1 weak#6): a silent overflow is
        # quietly wrong gradients — surface the ratios in every step's aux
        "n_cov": jnp.sum(cover), "cov_capacity": P,
        "aa_pairs_x": aa_counts[0], "aa_pairs_y": aa_counts[1],
        "aa_capacity": aa_max_pairs,
        # static mode tag: dense every-pair AA (cap_aa semantics differ from
        # the sparse compacted-pair path — see the aa_dense branch above)
        "aa_dense": 1.0 if aa_dense else 0.0,
    }
    return MeshBuffers(
        shaded=shaded,
        diffuse_light=zeros3,
        specular_light=zeros3,
        geometric_normal=geo_b,
        normal=zeros4,
        depth=zeros2,
        invdepth=zeros2,
        kd=jnp.concatenate([img[..., 10:13], alpha], axis=-1),
        ks=zeros4, kd_grad=zeros4, ks_grad=zeros4, normal_grad=zeros4,
        msdf_image=msdf_b,
        mesh_id=img[..., 13:14],
        alpha=alpha,
        visible_faces=visible_face_mask(rast, faces.shape[0]),
        rast=rast,
        stats=stats,
    )


def render_mesh_full(
    key: jax.Array,
    verts: jnp.ndarray,             # [V, 3] posed vertex positions
    verts_original: jnp.ndarray,    # [V, 3] canonical positions (texture coords)
    faces: jnp.ndarray,             # [F, 3]
    face_valid: jnp.ndarray,        # [F]
    mvp: jnp.ndarray,               # [4, 4]
    campos: jnp.ndarray,            # [3]
    resolution: Tuple[int, int],
    tex_module,                     # MLPTexture3D
    tex_params,
    background: jnp.ndarray,        # [H, W, 3]
    msdf_attr: Optional[jnp.ndarray] = None,     # [V] mSDF per vertex
    face_labels: Optional[jnp.ndarray] = None,   # [F] 0=body 1=cloth
    v_nrm: Optional[jnp.ndarray] = None,         # [V, 3] smooth normals
    spp: int = 1,
    use_bruteforce_raster: bool = False,
    raster_opts: Optional[dict] = None,
    max_covered_frac: float = 0.5,
    aa_all_buffers: bool = False,
    bsdf: str = "kd",
    light_params=None,
    n_light_samples: int = 8,
    shadow_scale: float = 1.0,
    sdf_fn=None,
    shade: bool = True,
    layers: int = 1,
) -> MeshBuffers:
    H, W = resolution
    full_res = (H * spp, W * spp)

    v_clip = xfm_points(verts, mvp)
    raster = rasterize_bruteforce if use_bruteforce_raster else rasterize
    rast = raster(v_clip, faces, face_valid, full_res, layers=layers,
                  **(raster_opts or {} if not use_bruteforce_raster else {}))
    # layers>1 depth-peels (ref render/render.py:400-403 DepthPeeler); all
    # per-pixel buffers come from the NEAREST layer, and the shaded buffer
    # is re-composited back-to-front across layers below (ref :375-383
    # composite_buffer). With opaque geometry (alpha == coverage) the
    # layered composite equals the single-layer one away from the
    # silhouette rim, where per-layer AA spills farther layers' color into
    # rim pixels (reference semantics) — asserted in tests.
    rast_layers = rast if layers > 1 else (rast,)
    rast = rast_layers[0]
    bary, cover = barycentrics(v_clip, faces, rast, full_res)
    mask = cover[..., None].astype(jnp.float32)

    # ---- interpolated geometry buffers ------------------------------------
    gb_pos = interpolate(verts, bary, faces, rast)
    gb_pos_orig = interpolate(verts_original, bary, faces, rast)
    fn = mesh_ops.face_normals(verts, faces)
    gb_geo_normal = interpolate_face_attr(fn, rast)
    if v_nrm is None:
        v_nrm = mesh_ops.auto_normals(verts, faces, face_valid)
    gb_normal = interpolate(v_nrm, bary, faces, rast)

    # two-sided shading normal: flip toward the viewer
    # (ref ru.prepare_shading_normal two_sided_shading=True, render.py:111)
    view_vec = campos[None, None, :] - gb_pos
    flip = jnp.sum(gb_geo_normal * view_vec, axis=-1, keepdims=True) < 0
    gb_normal_ts = mesh_ops.safe_normalize(
        jnp.where(flip, -gb_normal, gb_normal))

    # ---- texture lookups (kd path; bsdf forced 'kd', ref render.py:120) ---
    # The hash-grid gather is the renderer's dominant cost; only covered
    # pixels need texture, so compact them (static capacity) before the
    # lookup — background pixels get zeros, exactly what compositing uses.
    k_jit, k_nrm = jax.random.split(key)
    npix = full_res[0] * full_res[1]
    max_cov = (int(npix * max_covered_frac) if max_covered_frac else npix)
    if not shade:
        tex = jnp.zeros((*full_res, 6))
        tex_j = tex
    elif max_cov < npix:
        flat_cov = cover.reshape(-1)
        from d3human_tpu.ops.compaction import first_k_indices
        cov_idx = first_k_indices(flat_cov, max_cov, npix)
        pts = jnp.concatenate(
            [gb_pos_orig.reshape(-1, 3), jnp.zeros((1, 3))], axis=0)[cov_idx]
        tex_c = tex_module.sample(tex_params, pts)

        def scatter(vals, idx):
            buf = jnp.zeros((npix + 1, vals.shape[-1]), vals.dtype)
            return buf.at[idx].set(vals)[:npix].reshape(*full_res, -1)

        tex = scatter(tex_c, cov_idx)
        # jittered smoothness tap on every 2nd covered pixel (feeds only the
        # mean-based material-smoothness reg; subsampling the estimator
        # halves the dominant gather cost)
        half_idx = cov_idx[::2]
        pts_h = pts[::2]
        noise = 0.01 * jax.random.normal(k_jit, pts_h.shape)
        tex_jh = tex_module.sample(tex_params, pts_h + noise)
        tex_base_h = tex_c[::2]
        # scatter |jitter - base| so unsampled pixels contribute 0 to the reg
        diff = jnp.abs(tex_jh - tex_base_h)
        tex_j = tex + scatter(diff, half_idx)
    else:
        tex = tex_module.sample(tex_params, gb_pos_orig)
        jitter_pos = gb_pos_orig + 0.01 * jax.random.normal(
            k_jit, gb_pos_orig.shape)
        tex_j = tex_module.sample(tex_params, jitter_pos)
    kd, ks = tex[..., 0:3], tex[..., 3:6]
    kd_grad = jnp.abs(tex_j[..., 0:3] - kd)
    ks_grad = jnp.abs(tex_j[..., 3:6] - ks) * jnp.asarray([0.0, 1.0, 1.0])

    # ---- jittered normal smoothness (ref render.py:68-72,102-103) ---------
    uu, vv = jnp.meshgrid(
        (jnp.arange(full_res[1]) + 0.5) / full_res[1],
        (jnp.arange(full_res[0]) + 0.5) / full_res[0])
    pix_uv = jnp.stack([uu, vv], axis=-1)
    jit_uv = pix_uv + 0.005 * jax.random.normal(k_nrm, pix_uv.shape)
    nrm_tap = _bilinear_sample(gb_normal, jit_uv)
    mask_tap = _bilinear_sample(mask, jit_uv)
    grad_weight = mask * mask_tap
    nrm_grad = jnp.abs(nrm_tap - gb_normal) * grad_weight

    # ---- scalar buffers ----------------------------------------------------
    alpha = mask
    dist = jnp.sqrt(jnp.sum((gb_pos - campos[None, None, :]) ** 2,
                            axis=-1, keepdims=True) + 1e-12)
    depth = jnp.where(cover[..., None], dist, 0.0)
    invdepth = jnp.where(cover[..., None], 1.0 / jnp.maximum(dist, 1e-8), 0.0)

    if msdf_attr is not None:
        msdf_img = interpolate(msdf_attr[:, None], bary, faces, rast)
    else:
        msdf_img = jnp.zeros((*full_res, 1))

    if face_labels is not None:
        mesh_id = interpolate_face_attr(
            face_labels.astype(jnp.float32)[:, None], rast)
    else:
        mesh_id = jnp.zeros((*full_res, 1))

    # ---- composite + antialias (ref render.py:375-449) --------------------
    # AA edge geometry is color-independent: computed once, applied to every
    # buffer (the reference recomputes it inside dr.antialias per buffer).
    ones = jnp.ones_like(alpha)
    weights = aa_weights(v_clip, faces, rast, full_res)

    def comp(color, bg, aa=True):
        rgba = jnp.concatenate(
            [bg + (color - bg) * alpha, alpha * ones], axis=-1)
        return apply_aa(rgba, weights) if aa else rgba

    # The reference antialiases every buffer (ref render.py:432-449); only
    # shaded / geometric-normal / msdf feed pixelwise losses — the material
    # buffers feed mean-based regularizers where edge blending is noise.
    # aa_all_buffers=True restores exact reference behavior.
    zero3 = jnp.zeros_like(kd)
    # shading (ref render.py:117-176): 'kd' is the reference's runtime path;
    # 'pbr' = the re-designed env-light MC (render/envshade.py) with
    # SDF-sphere-traced shadows instead of OptiX shadow rays
    if bsdf == "pbr" and light_params is not None:
        from d3human_tpu.render.envshade import env_shade

        k_env = jax.random.fold_in(key, 17)
        diffuse_l, specular_l = env_shade(
            k_env, gb_pos, gb_normal_ts, campos, kd, ks, light_params,
            n_samples=n_light_samples, sdf_fn=sdf_fn,
            shadow_scale=shadow_scale)
        kd_pbr = kd * (1.0 - ks[..., 2:3])      # ref render.py:150
        shaded_col = diffuse_l * kd_pbr + specular_l
    elif bsdf == "normal":
        shaded_col = (gb_normal_ts + 1.0) * 0.5
        diffuse_l = specular_l = jnp.zeros_like(kd)
    else:                                        # 'kd' (forced at runtime)
        shaded_col = kd
        diffuse_l = specular_l = jnp.zeros_like(kd)

    shaded = comp(shaded_col, background)
    if layers > 1:
        # back-to-front lerp + per-layer AA, exactly the reference's
        # composite_buffer loop (render/render.py:375-383). Far layers are
        # painted first; each nearer layer lerps over the accumulator by
        # its own coverage, then antialiases against its own silhouette.
        ones1 = jnp.ones_like(alpha)
        accum = jnp.concatenate(
            [background, jnp.zeros_like(alpha)], axis=-1)
        for rl in reversed(rast_layers):
            bary_l, cover_l = barycentrics(v_clip, faces, rl, full_res)
            alpha_l = cover_l[..., None].astype(jnp.float32)
            if bsdf == "normal":
                n_l = interpolate(v_nrm, bary_l, faces, rl)
                pos_l = interpolate(verts, bary_l, faces, rl)
                gn_l = interpolate_face_attr(fn, rl)
                flip_l = jnp.sum(
                    gn_l * (campos[None, None, :] - pos_l),
                    axis=-1, keepdims=True) < 0
                col_l = (mesh_ops.safe_normalize(
                    jnp.where(flip_l, -n_l, n_l)) + 1.0) * 0.5
            elif shade:
                pos_orig_l = interpolate(verts_original, bary_l, faces, rl)
                col_l = tex_module.sample(tex_params, pos_orig_l)[..., 0:3]
            else:
                col_l = jnp.zeros((*full_res, 3))
            layer_rgba = jnp.concatenate([col_l, ones1], axis=-1)
            accum = accum + (layer_rgba - accum) * alpha_l
            accum = apply_aa(accum,
                             aa_weights(v_clip, faces, rl, full_res))
        shaded = accum
    geo_n = comp(gb_geo_normal, zero3)
    nrm = comp(gb_normal_ts, zero3, aa=aa_all_buffers)
    kd_b = comp(kd, zero3, aa=aa_all_buffers)
    ks_b = comp(ks, zero3, aa=aa_all_buffers)
    kdg_b = comp(kd_grad, zero3, aa=aa_all_buffers)
    ksg_b = comp(ks_grad, zero3, aa=aa_all_buffers)
    nrmg_b = comp(nrm_grad, zero3, aa=aa_all_buffers)
    # depth buffers: alpha forced 1 to avoid double blending (ref :180-195)
    depth_b = jnp.concatenate([20.0 + (depth - 20.0) * alpha, ones], axis=-1)
    invd_b = jnp.concatenate([invdepth * alpha, ones], axis=-1)
    if aa_all_buffers:
        depth_b = apply_aa(depth_b, weights)
        invd_b = apply_aa(invd_b, weights)
    msdf_b = apply_aa(jnp.concatenate([msdf_img * alpha, alpha], axis=-1),
                      weights)[..., :1]

    out = MeshBuffers(
        shaded=shaded,
        diffuse_light=diffuse_l,
        specular_light=specular_l,
        geometric_normal=geo_n,
        normal=nrm,
        depth=depth_b[..., :2],
        invdepth=invd_b[..., :2],
        kd=kd_b, ks=ks_b, kd_grad=kdg_b, ks_grad=ksg_b, normal_grad=nrmg_b,
        msdf_image=msdf_b,
        mesh_id=mesh_id,                 # NOT antialiased (ref render_mask)
        alpha=alpha,
        visible_faces=visible_face_mask(rast, faces.shape[0]),
        rast=rast,
    )
    if spp > 1:
        from d3human_tpu.ops.rasterizer import avg_pool_nhwc
        out = MeshBuffers(*[
            avg_pool_nhwc(b, spp) if isinstance(b, jnp.ndarray)
            and b.ndim == 3 and b.shape[0] == full_res[0] else b
            for b in out])
    return out
