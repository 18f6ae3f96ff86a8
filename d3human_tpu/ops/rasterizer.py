"""Differentiable triangle rasterization for TPU (nvdiffrast replacement).

Replaces the nvdiffrast CUDA/OpenGL rasterize/interpolate/antialias stack the
reference renders through (/root/reference/render/render.py:396-403 rasterize,
:36-37 interpolate, :381 antialias) with an XLA-native design:

  1. ``rasterize``  — hard visibility only: per-pixel (triangle_id, depth).
     Non-differentiable by construction (ids are integers); wrapped in
     stop_gradient. Tile-binned: faces are binned to 8x128-pixel tiles by a
     single int32 sort of packed (tile_id, face_id) keys (tile<<20|face), and
     each tile z-buffers only its own face list. Edge/depth evaluation is
     formulated as (pixels x 2) @ (2 x faces) matmuls so coverage tests ride
     the MXU. Oversize faces (bbox spanning > bin_expand tiles) go to a
     global list every tile also tests.
  2. ``interpolate`` — all gradients: perspective-correct barycentrics are
     recomputed *analytically* from clip-space vertices at each covered
     pixel, so attribute and position gradients come from plain autodiff.
     This factorization is mathematically identical to nvdiffrast's
     rasterize-backward (barycentric derivative chain).
  3. ``antialias``  — silhouette gradients: for neighboring pixel pairs with
     differing coverage, the covering triangle's edge crossing between the
     two pixel centers yields a blend weight t whose derivative w.r.t. the
     clip vertices is the screen-space silhouette gradient (the mechanism by
     which mask losses move the SDF).

Conventions: pixel (row i, col j) center maps to NDC
(x = (j+.5)*2/W - 1, y = 1 - (i+.5)*2/H) — row 0 is the image top, matching
the reference's dataset/projection stack (flip baked into the NDC matrix,
/root/reference/dataset/dataset_split.py:57-68). Depth test keeps the
smallest z/w (GL convention, nearer < farther).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from d3human_tpu.ops.compaction import first_k_indices

BG_SENTINEL_Z = 3.4e38


class Rast(NamedTuple):
    tri_id: jnp.ndarray   # [H, W] int32: face index + 1; 0 = background
    zbuf: jnp.ndarray     # [H, W] f32: screen-space z/w of the winner
    # capacity observability: faces silently dropped past these are wrong
    # gradients — surfaced into every training step's metrics
    n_max_tile: Optional[jnp.ndarray] = None   # max per-tile face-list length
    n_big: Optional[jnp.ndarray] = None        # oversize (global-list) faces


def xfm_points(points: jnp.ndarray, mtx: jnp.ndarray) -> jnp.ndarray:
    """Transform [N,3] points by a 4x4 matrix -> clip space [N,4]
    (ref render/renderutils xfm_points semantics: row-vector points)."""
    p = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    return p @ mtx.T


def _screen_xy(verts_clip: jnp.ndarray, res: Tuple[int, int]) -> jnp.ndarray:
    """Clip -> pixel coordinates. Returns [N, 2] (x_pix, y_pix)."""
    H, W = res
    w = verts_clip[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    ndc = verts_clip[..., :2] / w
    x = (ndc[..., 0] * 0.5 + 0.5) * W
    y = (0.5 - ndc[..., 1] * 0.5) * H
    return jnp.stack([x, y], axis=-1)


def _face_setup(verts_clip, faces):
    """Per-face screen geometry: pixel-space corner positions [F,3,2],
    z/w per corner [F,3], 1/w per corner [F,3], front-of-camera mask."""
    tri = verts_clip[faces]                       # [F, 3, 4]
    w = tri[..., 3]
    ok_w = jnp.all(w > 1e-6, axis=-1)             # near-plane conservative cull
    return tri, ok_w


def _edge_coeffs(pix_xy: jnp.ndarray):
    """pix_xy [F,3,2] -> edge functions E_k(p) = cross(v_{k+1}-v_k, p-v_k).

    Returns (A [F,3,2], C [F,3]) so that E_k(p) = A_k . p + C_k.
    Edge k connects corner k -> k+1; E_k > 0 when p is left of the edge.
    """
    v0 = pix_xy
    v1 = pix_xy[:, jnp.asarray([1, 2, 0])]
    d = v1 - v0                                   # [F, 3, 2]
    # cross(d, p - v0) = d.x*(p.y-v0.y) - d.y*(p.x-v0.x)
    A = jnp.stack([-d[..., 1], d[..., 0]], axis=-1)          # [F, 3, 2]
    C = d[..., 1] * v0[..., 0] - d[..., 0] * v0[..., 1]      # [F, 3]
    return A, C


def _z_plane(pix_xy: jnp.ndarray, z: jnp.ndarray):
    """Affine z/w over the screen: z(p) = az*x + by*y + c per face.

    z/w is affine in screen space (perspective-correct depth)."""
    x, y = pix_xy[..., 0], pix_xy[..., 1]
    det = ((x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0])
           - (x[:, 2] - x[:, 0]) * (y[:, 1] - y[:, 0]))
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    dz1, dz2 = z[:, 1] - z[:, 0], z[:, 2] - z[:, 0]
    az = (dz1 * (y[:, 2] - y[:, 0]) - dz2 * (y[:, 1] - y[:, 0])) / det
    bz = (dz2 * (x[:, 1] - x[:, 0]) - dz1 * (x[:, 2] - x[:, 0])) / det
    cz = z[:, 0] - az * x[:, 0] - bz * y[:, 0]
    return az, bz, cz


def _resolve_tile(pix: jnp.ndarray, face_ids: jnp.ndarray, A, C, az, bz, cz,
                  live: jnp.ndarray, block: int = 128,
                  floor_z: Optional[jnp.ndarray] = None,
                  floor_id: Optional[jnp.ndarray] = None):
    """Z-buffer resolve of one pixel set against one face list.

    pix: [P, 2] pixel centers. face_ids: [M] global ids (for output).
    A [M,3,2], C [M,3], (az,bz,cz) [M], live [M].
    floor_z/floor_id [P]: depth peeling — only candidates strictly after
    (floor_z, floor_id) in (z, id+1) lexicographic order compete, so
    repeated calls enumerate each pixel's covering faces near-to-far.
    Returns (best_id [P] int32 (0=miss), best_z [P]).
    """
    P = pix.shape[0]
    M = face_ids.shape[0]
    block = min(block, M)
    nb = -(-M // block)
    pad = nb * block - M
    if pad:
        pad0 = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        A, C, az, bz, cz = map(pad0, (A, C, az, bz, cz))
        face_ids = pad0(face_ids)
        live = jnp.concatenate([live, jnp.zeros((pad,), bool)])

    def body(carry, s):
        best_z, best_id = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, s * block, block, 0)
        Ab, Cb, azb, bzb, czb = sl(A), sl(C), sl(az), sl(bz), sl(cz)
        idb, liveb = sl(face_ids), sl(live)
        # E: [P, block, 3] via matmul on (P,2)x(2, block*3)
        E = (pix @ Ab.reshape(-1, 2).T).reshape(P, block, 3) + Cb[None]
        inside = (jnp.all(E >= 0, axis=-1) | jnp.all(E <= 0, axis=-1))
        z = pix[:, 0:1] * azb[None] + pix[:, 1:2] * bzb[None] + czb[None]
        z = jnp.where(inside & liveb[None], z, BG_SENTINEL_Z)
        if floor_z is not None:
            after = ((z > floor_z[:, None])
                     | ((z == floor_z[:, None])
                        & (idb[None, :] + 1 > floor_id[:, None])))
            z = jnp.where(after, z, BG_SENTINEL_Z)
        zmin = jnp.min(z, axis=1)
        arg = jnp.argmin(z, axis=1)
        cand_id = idb[arg] + 1
        better = zmin < best_z
        return (jnp.where(better, zmin, best_z),
                jnp.where(better, cand_id, best_id)), None

    init = (jnp.full((P,), BG_SENTINEL_Z), jnp.zeros((P,), jnp.int32))
    (bz_, bi_), _ = jax.lax.scan(body, init, jnp.arange(nb))
    return bi_, bz_


def rasterize(
    verts_clip: jnp.ndarray,      # [V, 4]
    faces: jnp.ndarray,           # [F, 3] int32
    face_valid: jnp.ndarray,      # [F] bool
    resolution: Tuple[int, int],  # (H, W)
    tile: Tuple[int, int] = (8, 128),
    # full-scale captures reach ~1300 candidate faces in the densest tile;
    # with z-aware truncation the overflow tail is occluded geometry, and
    # 896 slots (+128 global) stay within the kernel's 1024-slot key field
    max_faces_per_tile: int = 896,
    bin_expand: int = 8,
    # oversize faces are rare post-binning (n_big counter in Rast); 128
    # slots keep the unified per-tile face list at 640 rows instead of 1024
    max_global: int = 128,
    backend: str = "auto",        # 'auto' | 'xla' | 'pallas'
    layers: int = 1,
) -> Rast:
    """Tile-binned z-buffer rasterization (hard visibility, no gradients).

    backend='pallas' resolves tiles with the VMEM-resident Pallas kernel
    (ops/pallas_raster.py); 'xla' uses the lax.map path; 'auto' picks
    pallas on TPU.

    layers>1 depth-peels (ref render/render.py:400-403 dr.DepthPeeler):
    layer k+1 is each pixel's nearest covering face strictly behind layer
    k's. Setup/binning runs once; only the per-tile resolve repeats, with
    the previous layer as the depth floor. Returns a tuple of Rast
    (near-to-far) when layers > 1, a single Rast otherwise."""
    verts_clip = jax.lax.stop_gradient(verts_clip)
    H, W = resolution
    th, tw = tile
    nty, ntx = -(-H // th), -(-W // tw)
    NT = nty * ntx
    F = faces.shape[0]
    assert F < (1 << 20), "pack format supports < 1M faces"
    assert NT < (1 << 11), "pack format supports < 2048 tiles"

    tri, ok_w = _face_setup(verts_clip, faces)
    live = face_valid & ok_w
    pix_xy = _screen_xy(tri, resolution)          # [F, 3, 2]
    zw = tri[..., 2] / jnp.where(jnp.abs(tri[..., 3]) < 1e-8, 1e-8, tri[..., 3])
    A, C = _edge_coeffs(pix_xy)
    az, bz, cz = _z_plane(pix_xy, zw)

    # degenerate faces (zero area) are dropped
    area = C.sum(-1)  # E_0+E_1+E_2 at origin... use cross product directly
    x, y = pix_xy[..., 0], pix_xy[..., 1]
    area = ((x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0])
            - (x[:, 2] - x[:, 0]) * (y[:, 1] - y[:, 0]))
    live = live & (jnp.abs(area) > 1e-12)

    # ---- binning ----------------------------------------------------------
    xmin = jnp.min(pix_xy[..., 0], axis=1)
    xmax = jnp.max(pix_xy[..., 0], axis=1)
    ymin = jnp.min(pix_xy[..., 1], axis=1)
    ymax = jnp.max(pix_xy[..., 1], axis=1)
    on_screen = (xmax >= 0) & (xmin < W) & (ymax >= 0) & (ymin < H)
    live = live & on_screen
    tx0 = jnp.clip(jnp.floor(xmin / tw), 0, ntx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(xmax / tw), 0, ntx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(ymin / th), 0, nty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(ymax / th), 0, nty - 1).astype(jnp.int32)
    sx = tx1 - tx0 + 1
    sy = ty1 - ty0 + 1
    span = sx * sy
    small = live & (span <= bin_expand)
    big = live & (span > bin_expand)

    # emit up to bin_expand (tile, face) pairs per face
    K = bin_expand
    k = jnp.arange(K, dtype=jnp.int32)
    kx = k[None, :] % jnp.maximum(sx, 1)[:, None]
    ky = k[None, :] // jnp.maximum(sx, 1)[:, None]
    pair_tile = (ty0[:, None] + ky) * ntx + (tx0[:, None] + kx)   # [F, K]
    pair_ok = small[:, None] & (k[None, :] < span[:, None])
    pair_tile = jnp.where(pair_ok, pair_tile, NT)                 # sentinel
    pair_face = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[:, None],
                                 (F, K))
    # keys ordered (tile | nearest-z): within a tile the face list is
    # NEAR-TO-FAR, so when a dense tile overflows max_faces_per_tile the
    # truncation drops the FARTHEST faces — the ones most likely occluded.
    # (A plain (tile|face) key dropped arbitrary faces; full-scale captures
    # hit n_max_tile ~1300 vs 512 slots.) Face ids ride along through the
    # argsort permutation — int64 packing is unavailable without x64.
    zq = jnp.clip((jnp.min(zw, axis=1) + 1.0) * (0.5 * ((1 << 20) - 1)),
                  0.0, float((1 << 20) - 1)).astype(jnp.int32)
    key = ((pair_tile << 20)
           | jnp.broadcast_to(zq[:, None], (F, K))).reshape(-1)
    # multi-operand sort carries the face ids THROUGH the sort — the
    # argsort-then-take formulation paid two F*K-row gathers after the sort
    # (2 x ~45 ms at f3c scale, TRACE_r05: fusion.86/87), the sort itself
    # only ~10 ms
    s_key, s_face = jax.lax.sort(
        (key, pair_face.reshape(-1)), num_keys=1, is_stable=True)
    s_tile = s_key >> 20

    starts = jnp.searchsorted(s_tile, jnp.arange(NT + 1, dtype=jnp.int32))
    MFPT = max_faces_per_tile
    slot = jnp.arange(MFPT, dtype=jnp.int32)
    gpos = starts[:NT, None] + slot[None, :]                      # [NT, MFPT]
    in_list = gpos < starts[1:, None]
    gpos = jnp.clip(gpos, 0, F * K - 1)
    tile_faces = jnp.where(in_list, s_face[gpos], 0)              # [NT, MFPT]
    tile_live = in_list

    # global (oversize) face list — nearest-z first, mirroring the per-tile
    # truncation policy: if n_big ever exceeds max_global the dropped tail is
    # the farthest (most-occluded) faces, not an arbitrary index suffix that
    # could delete near-camera geometry in close-up frames.
    big_key = jnp.where(big, zq, jnp.int32(1) << 30)
    big_idx = jnp.argsort(big_key)[:max_global].astype(jnp.int32)
    big_ok = jnp.take(big_key, big_idx) < (jnp.int32(1) << 30)
    if big_idx.shape[0] < max_global:          # tiny meshes: F < max_global
        pad = max_global - big_idx.shape[0]
        big_idx = jnp.pad(big_idx, (0, pad))
        big_ok = jnp.pad(big_ok, (0, pad))
    big_idx_c = jnp.clip(big_idx, 0, F - 1)

    if backend == "auto":
        backend = ("pallas" if jax.devices()[0].platform == "tpu" else "xla")

    if backend in ("pallas", "pallas_interpret"):
        # unify tile lists + global list so the kernel sees one face set;
        # invalid slots point at a sentinel dead row (F) so the whole
        # per-tile payload is ONE row-gather from the fused [F+1, 16] table
        # (the previous 3-gather + edge-major-transpose prep dominated the
        # raster cost at 1080^2)
        from d3human_tpu.ops.pallas_raster import (
            pack_face_rows, resolve_tiles_pallas, unpack_keys,
        )

        G = max_global
        all_faces = jnp.concatenate([
            jnp.where(tile_live, tile_faces, F),
            jnp.broadcast_to(jnp.where(big_ok, big_idx_c, F), (NT, G)),
        ], axis=1)
        M = all_faces.shape[1]
        pad = (-M) % 128
        if pad:
            all_faces = jnp.pad(all_faces, ((0, 0), (0, pad)),
                                constant_values=F)
            M += pad
        rows = pack_face_rows(A, C, az, bz, cz, live)       # [F, 16]
        rows = jnp.concatenate(
            [rows, jnp.zeros((1, rows.shape[1]), rows.dtype)], axis=0)
        tile_rows = rows[all_faces]                          # [NT, M, 16]
        per_layer = []
        keys = None
        for _ in range(layers):
            keys = resolve_tiles_pallas(
                tile_rows, tile, ntx,
                interpret=(backend == "pallas_interpret"), floor=keys)
            ids, zs = unpack_keys(keys, jnp.minimum(all_faces, F - 1))
            # sentinel slots are never hit, but keep ids well-defined anyway
            per_layer.append((ids.reshape(NT, th, tw),
                              zs.reshape(NT, th, tw)))
    else:
        ii = jnp.arange(th, dtype=jnp.float32)
        jj = jnp.arange(tw, dtype=jnp.float32)
        base_pix = jnp.stack(
            jnp.meshgrid(jj + 0.5, ii + 0.5, indexing="xy"), axis=-1
        ).reshape(-1, 2)  # [th*tw, 2] as (x, y)

        def make_do_tile(floor_ids, floor_zs):
            def do_tile(t):
                tyx = jnp.stack([(t % ntx) * tw, (t // ntx) * th]).astype(
                    jnp.float32)
                pix = base_pix + tyx[None, :]
                fids = tile_faces[t]
                fl = tile_live[t]
                fz = None if floor_zs is None else floor_zs[t].reshape(-1)
                fi = None if floor_ids is None else floor_ids[t].reshape(-1)
                idt, zt = _resolve_tile(
                    pix, fids, A[fids], C[fids], az[fids], bz[fids],
                    cz[fids], fl, floor_z=fz, floor_id=fi)
                idg, zg = _resolve_tile(
                    pix, big_idx_c, A[big_idx_c], C[big_idx_c],
                    az[big_idx_c], bz[big_idx_c], cz[big_idx_c], big_ok,
                    floor_z=fz, floor_id=fi)
                # merge by (z, id): a face lives in either the tile or the
                # global list, so equal-z merges only tie across DIFFERENT
                # faces; pick the lexicographically smaller id for a total
                # order consistent with the peel floor.
                better = (zg < zt) | ((zg == zt) & (idg < idt))
                return jnp.where(better, idg, idt), jnp.where(better, zg, zt)
            return do_tile

        per_layer = []
        fids_prev = fzs_prev = None
        for _ in range(layers):
            ids, zs = jax.lax.map(make_do_tile(fids_prev, fzs_prev),
                                  jnp.arange(NT, dtype=jnp.int32),
                                  batch_size=min(NT, 32))
            per_layer.append((ids.reshape(NT, th, tw),
                              zs.reshape(NT, th, tw)))
            fids_prev, fzs_prev = per_layer[-1]

    def untile(x):
        return x.reshape(nty, ntx, th, tw).transpose(0, 2, 1, 3).reshape(
            nty * th, ntx * tw)[:H, :W]

    n_max_tile = jnp.max(starts[1:] - starts[:-1])
    n_big_ = jnp.sum(big)
    rasts = tuple(Rast(tri_id=untile(ids), zbuf=untile(zs),
                       n_max_tile=n_max_tile, n_big=n_big_)
                  for ids, zs in per_layer)
    return rasts[0] if layers == 1 else rasts


def rasterize_bruteforce(verts_clip, faces, face_valid, resolution,
                         layers: int = 1) -> Rast:
    """Oracle rasterizer: every pixel tests every face. For tests/small
    scenes (the reference's use_python= pattern, ref renderutils/ops.py).
    layers>1 depth-peels like ``rasterize`` (tuple of Rast, near-to-far)."""
    verts_clip = jax.lax.stop_gradient(verts_clip)
    H, W = resolution
    tri, ok_w = _face_setup(verts_clip, faces)
    live = face_valid & ok_w
    pix_xy = _screen_xy(tri, resolution)
    zw = tri[..., 2] / jnp.where(jnp.abs(tri[..., 3]) < 1e-8, 1e-8, tri[..., 3])
    A, C = _edge_coeffs(pix_xy)
    az, bz, cz = _z_plane(pix_xy, zw)
    x, y = pix_xy[..., 0], pix_xy[..., 1]
    area = ((x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0])
            - (x[:, 2] - x[:, 0]) * (y[:, 1] - y[:, 0]))
    live = live & (jnp.abs(area) > 1e-12)

    jjj, iii = jnp.meshgrid(jnp.arange(W) + 0.5, jnp.arange(H) + 0.5)
    pix = jnp.stack([jjj.reshape(-1), iii.reshape(-1)], axis=-1)
    all_ids = jnp.arange(faces.shape[0], dtype=jnp.int32)
    out, fz, fi = [], None, None
    for _ in range(layers):
        ids, zs = _resolve_tile(pix, all_ids, A, C, az, bz, cz, live,
                                floor_z=fz, floor_id=fi)
        out.append(Rast(tri_id=ids.reshape(H, W), zbuf=zs.reshape(H, W)))
        fz, fi = zs, ids
    return out[0] if layers == 1 else tuple(out)


# ---------------------------------------------------------------------------
# Differentiable attribute interpolation
# ---------------------------------------------------------------------------

def _pixel_centers(resolution):
    H, W = resolution
    jjj, iii = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                            jnp.arange(H, dtype=jnp.float32) + 0.5)
    return jjj, iii  # x, y pixel coords [H, W]


def barycentrics(
    verts_clip: jnp.ndarray, faces: jnp.ndarray, rast: Rast,
    resolution: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Perspective-correct barycentrics [H, W, 3] + coverage mask [H, W].

    Fully differentiable w.r.t. verts_clip — this is where nvdiffrast's
    rasterize-backward position gradients come from."""
    H, W = resolution
    fid = jnp.maximum(rast.tri_id - 1, 0)                  # [H, W]
    tri = verts_clip[faces[fid]]                           # [H, W, 3, 4]
    w = tri[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    xs = (tri[..., 0] / w * 0.5 + 0.5) * W                 # [H, W, 3]
    ys = (0.5 - tri[..., 1] / w * 0.5) * H
    px, py = _pixel_centers(resolution)
    # screen-space edge functions at the pixel center
    def edge(k):
        k1 = (k + 1) % 3
        return ((xs[..., k1] - xs[..., k]) * (py - ys[..., k])
                - (ys[..., k1] - ys[..., k]) * (px - xs[..., k]))
    # b_k is opposite edge k -> use edges (1,2,0)
    e0, e1, e2 = edge(1), edge(2), edge(0)
    ssum = e0 + e1 + e2
    ssum = jnp.where(jnp.abs(ssum) < 1e-12, 1e-12, ssum)
    bs = jnp.stack([e0, e1, e2], axis=-1) / ssum[..., None]  # screen-space
    # perspective correction: b_k ∝ bs_k / w_k
    bw = bs / w
    bsum = jnp.sum(bw, axis=-1, keepdims=True)
    bsum = jnp.where(jnp.abs(bsum) < 1e-12, 1e-12, bsum)
    bary = _degenerate_guard(bw / bsum)
    mask = rast.tri_id > 0
    return jnp.where(mask[..., None], bary, 0.0), mask


def _degenerate_guard(bary: jnp.ndarray) -> jnp.ndarray:
    """Bound barycentrics of sliver-covered pixels to a convex combination.

    A pixel can pass the coverage edge tests on a near-zero-area triangle;
    the edge sum then lands on the 1e-12 clamp and the individual
    barycentrics blow up with mixed signs (they still sum to 1, so the
    pathology is invisible to sum checks). Interpolated attributes at those
    pixels explode — observed in production f3c runs as intermittent ~1e11
    spikes of the mSDF hinge (log-only in init, but part of the SPLIT-stage
    total: the 7.4e16 loss spikes in out/parity_r03d/split loss logs).
    nvdiffrast never produces them because its coverage and its (u, v) come
    from one watertight rasterizer (rast.cu's fixed-point edge functions).

    Healthy covered pixels have b in [0, 1] up to rounding, so the where()
    keeps them BIT-IDENTICAL (golden losses unchanged); only pixels with a
    component beyond ±2 are replaced by the clamped renormalized convex
    version of themselves."""
    bad = jnp.any(jnp.abs(bary) > 2.0, axis=-1, keepdims=True)
    safe = jnp.clip(bary, 0.0, 1.0)
    safe = safe / jnp.maximum(jnp.sum(safe, axis=-1, keepdims=True), 1e-8)
    return jnp.where(bad, safe, bary)


def interpolate(
    attrs: jnp.ndarray,        # [V, C] vertex attributes
    bary: jnp.ndarray,         # [H, W, 3]
    faces: jnp.ndarray,        # [F, 3]
    rast: Rast,
) -> jnp.ndarray:
    """Gather + weighted sum (ref render.py:36-37 dr.interpolate)."""
    fid = jnp.maximum(rast.tri_id - 1, 0)
    fa = attrs[faces[fid]]                                  # [H, W, 3, C]
    out = jnp.sum(fa * bary[..., None], axis=-2)
    return jnp.where((rast.tri_id > 0)[..., None], out, 0.0)


def interpolate_face_attr(face_attrs: jnp.ndarray, rast: Rast) -> jnp.ndarray:
    """Flat per-face attributes (e.g. face normals / labels)."""
    fid = jnp.maximum(rast.tri_id - 1, 0)
    out = face_attrs[fid]
    return jnp.where((rast.tri_id > 0)[..., None], out, 0.0)


# ---------------------------------------------------------------------------
# Covered-pixel compaction (the TPU hot-path layout)
# ---------------------------------------------------------------------------
# Measured (scripts/bench_gather.py): every per-pixel gather's backward is a
# scatter-add whose cost is per-row and 3-15x a gather's. Running the shading
# /loss path on a compacted covered-pixel list (static capacity) instead of
# the full image cuts those rows ~2.5x at typical coverage, and fusing all
# vertex attributes into ONE wide gather cuts the row count another ~4x.


def compact_cover(rast: Rast, max_cov: int):
    """Compacted covered pixels. Returns (idx [P], valid [P], fid [P]) with
    idx = sorted flat pixel indices (fill = npix, out-of-bounds => dropped by
    scatter mode), fid clamped to a valid face."""
    flat = rast.tri_id.reshape(-1)
    npix = flat.shape[0]
    idx = first_k_indices(flat > 0, max_cov, npix)
    valid = idx < npix
    fid = jnp.maximum(flat[jnp.minimum(idx, npix - 1)] - 1, 0)
    return idx, valid, fid


def pixel_centers_at(idx: jnp.ndarray, resolution) -> jnp.ndarray:
    """Flat pixel index -> (x+.5, y+.5) centers [P, 2]."""
    H, W = resolution
    x = (idx % W).astype(jnp.float32) + 0.5
    y = (idx // W).astype(jnp.float32) + 0.5
    return jnp.stack([x, y], axis=-1)


def barycentrics_compact(tri_clip: jnp.ndarray, pix_xy: jnp.ndarray,
                         resolution) -> jnp.ndarray:
    """Perspective-correct barycentrics on a compacted pixel list.

    tri_clip: [P, 3, 4] clip-space corners of each pixel's covering face;
    pix_xy: [P, 2]. Same math as ``barycentrics`` (differentiable wrt
    tri_clip)."""
    H, W = resolution
    w = tri_clip[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    xs = (tri_clip[..., 0] / w * 0.5 + 0.5) * W                # [P, 3]
    ys = (0.5 - tri_clip[..., 1] / w * 0.5) * H
    px, py = pix_xy[..., 0], pix_xy[..., 1]

    def edge(k):
        k1 = (k + 1) % 3
        return ((xs[..., k1] - xs[..., k]) * (py - ys[..., k])
                - (ys[..., k1] - ys[..., k]) * (px - xs[..., k]))

    e0, e1, e2 = edge(1), edge(2), edge(0)
    ssum = e0 + e1 + e2
    ssum = jnp.where(jnp.abs(ssum) < 1e-12, 1e-12, ssum)
    bs = jnp.stack([e0, e1, e2], axis=-1) / ssum[..., None]
    bw = bs / w
    bsum = jnp.sum(bw, axis=-1, keepdims=True)
    bsum = jnp.where(jnp.abs(bsum) < 1e-12, 1e-12, bsum)
    return _degenerate_guard(bw / bsum)


def scatter_image(vals: jnp.ndarray, idx: jnp.ndarray, resolution):
    """[P, C] compacted values -> [H, W, C] image (zeros elsewhere).
    idx is sorted+unique by construction (first_k compaction); out-of-bounds
    rows (the fill) are dropped. Pallas sorted-COO kernel on TPU."""
    from d3human_tpu.ops.scatter import (
        default_use_pallas, scatter_rows_sorted,
    )

    H, W = resolution
    buf = scatter_rows_sorted(vals, idx, H * W, default_use_pallas())
    return buf.reshape(H, W, vals.shape[-1])


# ---------------------------------------------------------------------------
# Sparse antialiasing (compacted silhouette pairs)
# ---------------------------------------------------------------------------

def aa_pair_candidates(rast: Rast, axis: int, z_thresh: float):
    """Full-image candidate mask for AA pixel pairs along `axis` — integer
    ops only, no gradients. A pair qualifies when the ids differ AND
    (coverage changes OR the depth jump exceeds z_thresh relative): this is
    the silhouette-edge set nvdiffrast antialiases (interior edges shared by
    two visible triangles are skipped there via its edge hash; here via the
    depth-continuity test)."""
    idm, zb = rast.tri_id, rast.zbuf
    if axis == 1:
        ida, idb = idm[:, :-1], idm[:, 1:]
        za, zb_ = zb[:, :-1], zb[:, 1:]
    else:
        ida, idb = idm[:-1, :], idm[1:, :]
        za, zb_ = zb[:-1, :], zb[1:, :]
    a_cov, b_cov = ida > 0, idb > 0
    differs = ida != idb
    cov_edge = a_cov != b_cov
    zjump = jnp.abs(za - zb_) > z_thresh * (jnp.abs(za) + jnp.abs(zb_) + 1e-3)
    return differs & (a_cov | b_cov) & (cov_edge | zjump)


def aa_pairs_compact(rast: Rast, resolution, axis: int, max_pairs: int,
                     z_thresh: float = 0.01):
    """Compact the candidate mask into flat pair indices. Returns
    (pidx [Q] flat index into the PAIR grid, valid [Q], n_candidates)."""
    cand = aa_pair_candidates(rast, axis, z_thresh)
    flat = cand.reshape(-1)
    n = flat.shape[0]
    pidx = first_k_indices(flat, max_pairs, n)
    return pidx, pidx < n, jnp.sum(flat)


def aa_geometry_compact(verts_clip, faces, rast: Rast, pidx, pvalid,
                        resolution, axis: int):
    """Per-pair AA blend geometry (same math as _aa_weights_axis, gathered
    on the compacted pair list). Returns (ia, ib, a_wins [Q], spill [Q],
    recede [Q]) with ia/ib flat FULL-image pixel indices."""
    H, W = resolution
    pw = W - 1 if axis == 1 else W
    # pair p = (row, col) in the pair grid; members a/b in the image
    prow = pidx // pw
    pcol = pidx % pw
    if axis == 1:
        ia = prow * W + pcol
        ib = ia + 1
    else:
        ia = prow * W + pcol
        ib = ia + W
    n = H * W
    ia_c = jnp.minimum(ia, n - 1)
    ib_c = jnp.minimum(ib, n - 1)
    idm = rast.tri_id.reshape(-1)
    zbf = rast.zbuf.reshape(-1)
    ida, idb = idm[ia_c], idm[ib_c]
    za, zb_ = zbf[ia_c], zbf[ib_c]
    a_cov, b_cov = ida > 0, idb > 0
    a_wins = a_cov & ((~b_cov) | (za <= zb_))
    winner_id = jnp.where(a_wins, ida, idb)
    fid = jnp.maximum(winner_id - 1, 0)

    from d3human_tpu.ops.scatter import default_use_pallas, gather_rows
    tri = gather_rows(verts_clip, faces[fid],
                      default_use_pallas())                    # [Q, 3, 4]
    w = tri[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    xs = (tri[..., 0] / w * 0.5 + 0.5) * W
    ys = (0.5 - tri[..., 1] / w * 0.5) * H

    pax = (ia_c % W).astype(jnp.float32) + 0.5
    pay = (ia_c // W).astype(jnp.float32) + 0.5
    pbx = (ib_c % W).astype(jnp.float32) + 0.5
    pby = (ib_c // W).astype(jnp.float32) + 0.5

    k1 = jnp.asarray([1, 2, 0])

    def edges_at(qx, qy):
        return ((xs[..., k1] - xs) * (qy[..., None] - ys)
                - (ys[..., k1] - ys) * (qx[..., None] - xs))   # [Q, 3]

    Ea = edges_at(pax, pay)
    Eb = edges_at(pbx, pby)
    sgn = jnp.where(jnp.sum(Ea, -1, keepdims=True)
                    + jnp.sum(Eb, -1, keepdims=True) >= 0, 1.0, -1.0)
    Ew = jnp.where(a_wins[..., None], Ea, Eb) * sgn
    Eo = jnp.where(a_wins[..., None], Eb, Ea) * sgn
    ex = jnp.abs(xs[..., k1] - xs)
    ey = jnp.abs(ys[..., k1] - ys)
    owns = (ey >= ex) if axis == 1 else (ex > ey)
    flips = (Ew > 0) & (Eo < 0) & owns
    denom = Ew - Eo
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t_k = jnp.where(flips, Ew / denom, 2.0)
    t = jnp.min(t_k, axis=-1)
    active = pvalid & jnp.any(flips, axis=-1) & (t <= 1.0)
    spill = jnp.where(active, jnp.clip(t - 0.5, 0.0, 0.5), 0.0)
    recede = jnp.where(active, jnp.clip(0.5 - t, 0.0, 0.5), 0.0)
    return ia, ib, a_wins, spill, recede


def apply_aa_sparse(img: jnp.ndarray, pairs) -> jnp.ndarray:
    """Apply compacted AA blend deltas to a full [H, W, C] image.
    ``pairs`` is a sequence of aa_geometry_compact outputs (one per axis).
    Out-of-bounds pair indices (nonzero fill) are dropped by scatter mode."""
    H, W, C = img.shape
    flat = img.reshape(-1, C)
    for (ia, ib, a_wins, spill, recede) in pairs:
        n = H * W
        ca = flat[jnp.minimum(ia, n - 1)]
        cb = flat[jnp.minimum(ib, n - 1)]
        aw = a_wins[..., None]
        wcol = jnp.where(aw, ca, cb)
        lcol = jnp.where(aw, cb, ca)
        d_l = (wcol - lcol) * spill[..., None]
        d_w = (lcol - wcol) * recede[..., None]
        d_a = jnp.where(aw, d_w, d_l)
        d_b = jnp.where(aw, d_l, d_w)
        flat = flat.at[ia].add(d_a, mode="drop")
        flat = flat.at[ib].add(d_b, mode="drop")
    return flat.reshape(H, W, C)


# ---------------------------------------------------------------------------
# Antialiasing (silhouette gradients)
# ---------------------------------------------------------------------------

def _aa_weights_axis(verts_clip, faces, rast, resolution, axis):
    """Color-independent AA geometry for neighbor pairs along `axis`:
    returns (a_wins, spill, recede) with spill/recede already masked by
    pair-activity. Computed ONCE per rasterization and applied to every
    composited buffer (the reference antialiases ~11 buffers per frame;
    the edge geometry is identical across them)."""
    H, W = resolution
    idm = rast.tri_id
    zb = rast.zbuf
    if axis == 1:
        ida, idb = idm[:, :-1], idm[:, 1:]
        za, zb_ = zb[:, :-1], zb[:, 1:]
    else:
        ida, idb = idm[:-1, :], idm[1:, :]
        za, zb_ = zb[:-1, :], zb[1:, :]

    differs = ida != idb
    # winner = the closer covered pixel
    a_cov = ida > 0
    b_cov = idb > 0
    a_wins = a_cov & ((~b_cov) | (za <= zb_))
    winner_id = jnp.where(a_wins, ida, idb)
    active = differs & (a_cov | b_cov)

    fid = jnp.maximum(winner_id - 1, 0)
    tri = verts_clip[faces[fid]]                            # [., ., 3, 4]
    w = tri[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    xs = (tri[..., 0] / w * 0.5 + 0.5) * W
    ys = (0.5 - tri[..., 1] / w * 0.5) * H

    # pixel centers of A and B
    px, py = _pixel_centers(resolution)
    if axis == 1:
        pax, pay = px[:, :-1], py[:, :-1]
        pbx, pby = px[:, 1:], py[:, 1:]
    else:
        pax, pay = px[:-1, :], py[:-1, :]
        pbx, pby = px[1:, :], py[1:, :]

    def edges_at(qx, qy):
        k1 = jnp.asarray([1, 2, 0])
        return ((xs[..., k1] - xs) * (qy[..., None] - ys)
                - (ys[..., k1] - ys) * (qx[..., None] - xs))  # [., ., 3]

    Ea = edges_at(pax, pay)
    Eb = edges_at(pbx, pby)
    # orient so the winner side is positive
    sgn = jnp.where(jnp.sum(Ea, -1, keepdims=True) + jnp.sum(Eb, -1, keepdims=True) >= 0, 1.0, -1.0)
    Ew = jnp.where(a_wins[..., None], Ea, Eb) * sgn
    Eo = jnp.where(a_wins[..., None], Eb, Ea) * sgn
    # axis ownership (nvdiffrast rule): horizontal pairs blend across
    # mostly-VERTICAL edges and vice versa, so a slanted silhouette is
    # corrected by exactly one pair direction, never both.
    k1 = jnp.asarray([1, 2, 0])
    ex = jnp.abs(xs[..., k1] - xs)
    ey = jnp.abs(ys[..., k1] - ys)
    owns = (ey >= ex) if axis == 1 else (ex > ey)
    flips = (Ew > 0) & (Eo < 0) & owns
    denom = Ew - Eo
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t_k = Ew / denom                       # crossing position from winner
    t_k = jnp.where(flips, t_k, 2.0)
    t = jnp.min(t_k, axis=-1)              # first exit edge
    has_edge = jnp.any(flips, axis=-1) & (t <= 1.0)

    # blend: boundary at distance t from winner center; midpoint at 0.5
    #   t > 0.5: winner spills into the loser pixel by (t - 0.5)
    #   t < 0.5: winner's own pixel partially uncovered by (0.5 - t)
    active = (active & has_edge)[..., None]
    spill = jnp.where(active, jnp.clip(t - 0.5, 0.0, 0.5)[..., None], 0.0)
    recede = jnp.where(active, jnp.clip(0.5 - t, 0.0, 0.5)[..., None], 0.0)
    return a_wins[..., None], spill, recede


def aa_weights(verts_clip: jnp.ndarray, faces: jnp.ndarray, rast: Rast,
               resolution: Tuple[int, int]):
    """Precompute AA blend geometry for both pair directions."""
    return (
        _aa_weights_axis(verts_clip, faces, rast, resolution, axis=1),
        _aa_weights_axis(verts_clip, faces, rast, resolution, axis=0),
    )


def apply_aa(color: jnp.ndarray, weights) -> jnp.ndarray:
    """Blend one buffer with precomputed AA weights (both directions)."""
    for axis, (a_wins, spill, recede) in zip((1, 0), weights):
        if axis == 1:
            ca, cb = color[:, :-1], color[:, 1:]
        else:
            ca, cb = color[:-1, :], color[1:, :]
        wcol = jnp.where(a_wins, ca, cb)
        lcol = jnp.where(a_wins, cb, ca)
        # per-pair deltas (a pixel appears in both its left and right pair;
        # nvdiffrast accumulates the corrections — so do we)
        d_l = (wcol - lcol) * spill
        d_w = (lcol - wcol) * recede
        d_a = jnp.where(a_wins, d_w, d_l)
        d_b = jnp.where(a_wins, d_l, d_w)
        delta = jnp.zeros_like(color)
        if axis == 1:
            delta = delta.at[:, :-1].add(d_a).at[:, 1:].add(d_b)
        else:
            delta = delta.at[:-1, :].add(d_a).at[1:, :].add(d_b)
        color = color + delta
    return color


def antialias(color: jnp.ndarray, verts_clip: jnp.ndarray, faces: jnp.ndarray,
              rast: Rast) -> jnp.ndarray:
    """Discrete edge antialiasing with silhouette gradients
    (ref render.py:381 dr.antialias inside composite_buffer).

    color: [H, W, C]."""
    return apply_aa(color, aa_weights(verts_clip, faces, rast,
                                      color.shape[:2]))


# ---------------------------------------------------------------------------
# Image helpers (spp scaling)
# ---------------------------------------------------------------------------

def avg_pool_nhwc(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    if factor == 1:
        return img
    H, W, C = img.shape[-3], img.shape[-2], img.shape[-1]
    lead = img.shape[:-3]
    x = img.reshape(*lead, H // factor, factor, W // factor, factor, C)
    return x.mean(axis=(-4, -2))


def visible_face_mask(rast: Rast, n_faces: int) -> jnp.ndarray:
    """Boolean [F] mask of faces visible in the rasterization — static-shape
    replacement for the reference's `rast[...,-1].unique()` visible-triangle
    list (ref render.py:404-407).

    On TPU the marking runs as a sorted-COO count (ops/scatter.py) — the
    npix-row XLA boolean scatter costs ~90 ns/row (~100 ms at 1080^2) when
    the mask is actually consumed (split-stage visible-boundary reg)."""
    ids = rast.tri_id.reshape(-1)
    from d3human_tpu.ops.scatter import default_use_pallas

    if default_use_pallas():
        from d3human_tpu.ops.scatter import coo_scatter_add
        cnt = coo_scatter_add(ids, jnp.ones((ids.shape[0], 1), jnp.float32),
                              n_faces + 1)
        return cnt[1:, 0] > 0
    mask = jnp.zeros((n_faces + 1,), bool)
    mask = mask.at[ids].set(True)
    return mask[1:]
