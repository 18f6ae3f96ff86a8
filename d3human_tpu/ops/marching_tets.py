"""G-Shell marching tetrahedra with static shapes (XLA-native).

Re-design of the reference's two-level differentiable iso-extraction
(/root/reference/geometry/gshell_tets.py:253-447 and the split variant
/root/reference/geometry/hmsdf_tets_split.py:254-454, which is the same
algorithm with the mSDF negated for the body half):

  level 1  marching tets on the SDF: crossing grid edges become vertices
           (linear interpolation whose weights carry gradients back into the
           SDF — this is how silhouette losses reach the field), sign-mixed
           tets emit 1 or 2 triangles via lookup tables;
  level 2  the interpolated mSDF re-cuts every level-1 polygon face (tri or
           quad) into the open-shell region, appending boundary vertices on
           polygon edges whose interpolation *coefficients* are
           gradient-stopped for the carried mSDF values but NOT for the
           boundary positions (ref gshell_tets.py:373-389 — load-bearing).

TPU-first shape strategy (instead of torch.unique / boolean indexing):
  * the tet grid topology is static, so vertex identity == grid-edge
    identity; crossing edges are compacted to MAX_V slots;
  * sign-mixed tets are compacted to MAX_T slots (both via the
    searchsorted-over-cumsum compaction in ops/compaction.py — TPU's
    sized-nonzero lowers through a sort and was the profiled hot spot);
  * every compacted tet owns a fixed block of 4 boundary-vertex slots and 4
    cut-face slots (the per-case maxima), masked by validity — no second
    compaction, no dynamic shapes anywhere.

The lookup tables are the published DMTet / G-Shell marching-tets constants
(mathematical case tables, same role as the classic marching-cubes tables).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.ops.compaction import first_k_indices
from d3human_tpu.ops.tet_grid import (
    EDGE_CLASSES, KUHN_PATHS, TetGrid,
)


def _structured_crossing(occ3: jnp.ndarray) -> jnp.ndarray:
    """Edge-crossing flags for ALL lattice edges in class-major order via
    shifted-slice comparisons — zero gathers (see ops/tet_grid.py docs)."""
    vx, vy, vz = occ3.shape
    parts = []
    for (dx, dy, dz) in EDGE_CLASSES:
        a = occ3[: vx - dx, : vy - dy, : vz - dz]
        b = occ3[dx:, dy:, dz:]
        parts.append((a != b).reshape(-1))
    return jnp.concatenate(parts)


def _structured_valid_tets(occ3: jnp.ndarray) -> jnp.ndarray:
    """Sign-mixed flags for all tets (cell-major, 6 per cell) via sliced
    corner sums — zero gathers."""
    vx, vy, vz = occ3.shape
    rx, ry, rz = vx - 1, vy - 1, vz - 1
    per_type = []
    occ_i = occ3.astype(jnp.int8)
    for path in KUHN_PATHS:
        s = None
        for (px, py, pz) in path:
            c = occ_i[px: px + rx, py: py + ry, pz: pz + rz]
            s = c if s is None else s + c
        per_type.append((s > 0) & (s < 4))
    # [6, rx, ry, rz] -> cell-major x tet-type order (id = cell*6 + k)
    v = jnp.stack(per_type, axis=-1)          # [rx, ry, rz, 6]
    return v.reshape(-1)


def _structured_sdf_pairs(sdf3: jnp.ndarray):
    """(sdf_a, sdf_b) over all edges, class-major — for the sign-flip reg."""
    vx, vy, vz = sdf3.shape
    pa, pb = [], []
    for (dx, dy, dz) in EDGE_CLASSES:
        pa.append(sdf3[: vx - dx, : vy - dy, : vz - dz].reshape(-1))
        pb.append(sdf3[dx:, dy:, dz:].reshape(-1))
    return jnp.concatenate(pa), jnp.concatenate(pb)

# --- level-1 tables: SDF marching tets (16 sign cases -> up to 2 triangles
# over the 6 tet edges, base_tet_edges order). Case bit i = occ(vert i)*2^i.
TRIANGLE_TABLE = np.asarray([
    [-1, -1, -1, -1, -1, -1],
    [1, 0, 2, -1, -1, -1],
    [4, 0, 3, -1, -1, -1],
    [1, 4, 2, 1, 3, 4],
    [3, 1, 5, -1, -1, -1],
    [2, 3, 0, 2, 5, 3],
    [1, 4, 0, 1, 5, 4],
    [4, 2, 5, -1, -1, -1],
    [4, 5, 2, -1, -1, -1],
    [4, 1, 0, 4, 5, 1],
    [3, 2, 0, 3, 5, 2],
    [1, 3, 5, -1, -1, -1],
    [4, 1, 2, 4, 3, 1],
    [3, 0, 4, -1, -1, -1],
    [2, 0, 1, -1, -1, -1],
    [-1, -1, -1, -1, -1, -1],
], np.int32)

NUM_TRIANGLES_TABLE = np.asarray(
    [0, 1, 1, 2, 1, 2, 2, 1, 1, 2, 2, 1, 2, 1, 1, 0], np.int32)

# Polygon boundary cycle of each case's face (3 verts + closing entry for
# triangles, 4 verts for quads); entries index the tet's 6 edge slots.
MESH_EDGE_TABLE = np.asarray([
    [-1, -1, -1, -1],
    [1, 0, 2, 1],
    [4, 0, 3, 4],
    [1, 3, 4, 2],
    [3, 1, 5, 3],
    [2, 5, 3, 0],
    [1, 5, 4, 0],
    [4, 2, 5, 4],
    [4, 5, 2, 4],
    [4, 5, 1, 0],
    [3, 5, 2, 0],
    [1, 3, 5, 1],
    [4, 3, 1, 2],
    [3, 0, 4, 3],
    [2, 0, 1, 2],
    [-1, -1, -1, -1],
], np.int32)

# --- level-2 tables: mSDF cut of a triangle face. Case bit order is the
# *flipped* power (index = 4*occ(c0) + 2*occ(c1) + occ(c2),
# ref gshell_tets.py:401-404). Entries 0..2 = polygon corners, 3..5 =
# boundary verts on edges (c0,c1), (c1,c2), (c2,c0).
TRI_CUT_TABLE = np.asarray([
    [-1, -1, -1, -1, -1, -1],
    [4, 2, 5, -1, -1, -1],
    [3, 1, 4, -1, -1, -1],
    [3, 1, 2, 3, 2, 5],
    [0, 3, 5, -1, -1, -1],
    [0, 3, 4, 0, 4, 2],
    [0, 1, 4, 0, 4, 5],
    [0, 1, 2, -1, -1, -1],
], np.int32)
NUM_TRI_CUT = np.asarray([0, 1, 1, 2, 1, 2, 2, 1], np.int32)

# mSDF cut of a quad face (index = 8*occ(c0)+4*occ(c1)+2*occ(c2)+occ(c3)).
# Entries 0..3 = corners, 4..7 = boundary verts on edges (c0,c1), (c1,c2),
# (c2,c3), (c3,c0).
QUAD_CUT_TABLE = np.asarray([
    [-1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1],
    [6, 3, 7, -1, -1, -1, -1, -1, -1, -1, -1, -1],
    [5, 2, 6, -1, -1, -1, -1, -1, -1, -1, -1, -1],
    [5, 2, 7, 3, 7, 2, -1, -1, -1, -1, -1, -1],
    [4, 1, 5, -1, -1, -1, -1, -1, -1, -1, -1, -1],
    [4, 1, 5, 4, 5, 7, 5, 6, 7, 7, 6, 3],
    [4, 1, 2, 6, 4, 2, -1, -1, -1, -1, -1, -1],
    [4, 1, 2, 7, 4, 2, 7, 2, 3, -1, -1, -1],
    [0, 4, 7, -1, -1, -1, -1, -1, -1, -1, -1, -1],
    [0, 4, 6, 3, 0, 6, -1, -1, -1, -1, -1, -1],
    [0, 4, 5, 0, 5, 2, 0, 2, 6, 0, 6, 7],
    [0, 4, 5, 0, 5, 2, 0, 2, 3, -1, -1, -1],
    [0, 1, 5, 7, 0, 5, -1, -1, -1, -1, -1, -1],
    [0, 1, 5, 0, 5, 6, 0, 6, 3, -1, -1, -1],
    [0, 1, 2, 0, 2, 6, 0, 6, 7, -1, -1, -1],
    [0, 1, 2, 0, 2, 3, -1, -1, -1, -1, -1, -1],
], np.int32)
NUM_QUAD_CUT = np.asarray(
    [0, 1, 1, 2, 1, 4, 2, 3, 1, 2, 4, 3, 2, 3, 3, 2], np.int32)


def _cut_ref_tables(table, counts, n_corners):
    """Which corner / boundary slots each cut case actually references —
    lets vert_valid come from table lookups instead of scattering all 3*4*MT
    face-vertex ids (the XLA boolean scatter costs ~90 ns/row; at f3c scale
    that was ~200 ms inside every extraction)."""
    corner = np.zeros((len(table), 4), bool)
    bnd = np.zeros((len(table), 4), bool)
    for c, row in enumerate(table):
        for e in row[: 3 * counts[c]]:
            if e < n_corners:
                corner[c, e] = True
            else:
                bnd[c, e - n_corners] = True
    return corner, bnd


TRI_CORNER_REF, TRI_BND_REF = _cut_ref_tables(TRI_CUT_TABLE, NUM_TRI_CUT, 3)
QUAD_CORNER_REF, QUAD_BND_REF = _cut_ref_tables(QUAD_CUT_TABLE,
                                                NUM_QUAD_CUT, 4)


class GShellMesh(NamedTuple):
    """Fixed-capacity extracted mesh. Verts layout: [0, MV) watertight
    (SDF-crossing) vertices, [MV, MV+4*MT) per-tet boundary vertices."""

    verts: jnp.ndarray            # [MV + 4*MT, 3] aug vertex positions
    faces: jnp.ndarray            # [4*MT, 3] i32 aug (open-shell) faces
    face_valid: jnp.ndarray       # [4*MT] bool
    vert_valid: jnp.ndarray       # [MV + 4*MT] bool (referenced by any face)
    msdf_aug: jnp.ndarray         # [MV + 4*MT] mSDF, coeff-grad-stopped
    # watertight template (level-1 mesh)
    verts_wt: jnp.ndarray         # [MV, 3]
    faces_wt: jnp.ndarray         # [2*MT, 3] i32
    face_wt_valid: jnp.ndarray    # [2*MT] bool
    msdf_wt: jnp.ndarray          # [MV] coeff-grad-stopped mSDF at wt verts
    # monitoring (dynamic scalars)
    n_cross: jnp.ndarray          # crossing-edge count
    n_valid_tets: jnp.ndarray     # sign-mixed tet count

    @property
    def n_verts_watertight(self) -> int:
        return self.verts_wt.shape[0]

    @property
    def msdf_boundary(self) -> jnp.ndarray:
        return self.msdf_aug[self.verts_wt.shape[0]:]


def _stable_denom(d: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """sign(d) * (|d| + eps), zeros -> eps (ref gshell_tets.py:296-297)."""
    s = jnp.where(d >= 0, 1.0, -1.0)
    return s * (jnp.abs(d) + eps)


def _select_cols(rows: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis(rows [N, K], idx [N, L], axis=1) as a branchless
    K-way select. XLA lowers per-row take_along_axis to a full gather
    (~7.5 ns/row on TPU — the marching-tets table lookups cost ~35 ms/step
    at f3c scale, TRACE_r05 fusion.97/98/99); for the tiny K (<= 8) here a
    sum of masked columns is pure VPU work."""
    N, K = rows.shape
    out = jnp.zeros(idx.shape, rows.dtype)
    for k in range(K):
        out = out + jnp.where(idx == k, rows[:, k][:, None], 0)
    return out


def _gshell_level1(
    grid: TetGrid,
    pos: jnp.ndarray,        # [N, 3] deformed grid vertex positions
    sdf: jnp.ndarray,        # [N]
    msdf: jnp.ndarray,       # [N] UNSIGNED (sign applied in level 2)
    max_verts: int,
    max_tets: int,
) -> dict:
    """Everything that does not depend on the mSDF cut sign: level-1
    marching tets (SDF crossings -> watertight mesh), the two stream
    compactions, all large fused-row gathers, and the level-2 boundary
    vertices (bit-invariant under a global mSDF negation because IEEE
    negation commutes exactly with the interpolation arithmetic — see
    gshell_extract_pair). The split stage cuts the SAME level-1 mesh with
    both signs (ref hmsdf_tets_split.py:254-264 runs the whole extraction
    twice; here the expensive shared prefix runs once)."""
    sdf = sdf.reshape(-1).astype(jnp.float32)
    msdf = msdf.reshape(-1).astype(jnp.float32)
    MV, MT = max_verts, max_tets
    E = grid.n_edges

    # ---- level 1: vertices on SDF-crossing grid edges --------------------
    occ = sdf > 0
    if grid.dims is not None:
        # structured lattice: crossing flags by shifted slices (gather-free)
        crossing = _structured_crossing(occ.reshape(grid.vert_dims))
    else:
        e0, e1 = grid.edges[:E, 0], grid.edges[:E, 1]
        crossing = occ[e0] != occ[e1]
    vert_slots = first_k_indices(crossing, MV, E)
    vert_ok = vert_slots < E

    va = grid.edges[vert_slots, 0]
    vb = grid.edges[vert_slots, 1]
    # ONE fused row per endpoint ([pos | sdf | msdf]) — and a Pallas
    # sorted-COO scatter transpose on TPU (ops/scatter.py)
    from d3human_tpu.ops.scatter import default_use_pallas, gather_rows

    use_pl = default_use_pallas()
    psm = jnp.concatenate([pos, sdf[:, None], msdf[:, None]], axis=-1)
    rows_a = gather_rows(psm, va, use_pl)                         # [MV, 5]
    rows_b = gather_rows(psm, vb, use_pl)
    sdf_a, sdf_b = rows_a[:, 3], rows_b[:, 3]
    denom = _stable_denom(sdf_a - sdf_b)
    wa = -sdf_b / denom                   # gradient flows into the SDF here
    wb = sdf_a / denom
    wa = jnp.where(vert_ok, wa, 0.0)
    wb = jnp.where(vert_ok, wb, 0.0)
    verts_wt = rows_a[:, :3] * wa[:, None] + rows_b[:, :3] * wb[:, None]
    msdf_wt_grad = rows_a[:, 4] * wa + rows_b[:, 4] * wb
    msdf_wt_stop = (rows_a[:, 4] * jax.lax.stop_gradient(wa)
                    + rows_b[:, 4] * jax.lax.stop_gradient(wb))

    # edge id -> vertex slot (only crossing edges are ever dereferenced)
    edge2slot = jnp.zeros((E + 1,), jnp.int32).at[vert_slots].set(
        jnp.arange(MV, dtype=jnp.int32))

    # ---- level 1: sign-mixed tets -> case ids + faces --------------------
    T = grid.n_tets
    if grid.dims is not None:
        valid_tet = _structured_valid_tets(occ.reshape(grid.vert_dims))
    else:
        occ4_all = occ[grid.tets]                                  # [T, 4]
        occ_sum = jnp.sum(occ4_all, axis=-1)
        valid_tet = (occ_sum > 0) & (occ_sum < 4)
    tet_slots = first_k_indices(valid_tet, MT, T)
    tet_ok = tet_slots < T
    tet_slots_c = jnp.clip(tet_slots, 0, T - 1)

    # per-COMPACTED-tet corner occupancy (cheap MT-sized gathers)
    tets_c = grid.tets[tet_slots_c]                                # [MT, 4]
    occ4 = occ[tets_c]
    powers = jnp.asarray([1, 2, 4, 8], jnp.int32)
    tcase = jnp.sum(occ4.astype(jnp.int32) * powers, axis=-1)
    tcase = jnp.where(tet_ok, tcase, 0)
    idx_map = edge2slot[grid.tet_edges[tet_slots_c]]               # [MT, 6]

    tri_tab = jnp.asarray(TRIANGLE_TABLE)
    ntri = jnp.asarray(NUM_TRIANGLES_TABLE)[tcase]                 # [MT]
    sel = jnp.clip(tri_tab[tcase], 0, 5)                           # [MT, 6]
    faces_wt = _select_cols(idx_map, sel)                          # [MT, 6]
    faces_wt = faces_wt.reshape(MT * 2, 3)
    face_wt_valid = (
        jnp.stack([ntri >= 1, ntri >= 2], axis=1).reshape(-1) & \
        jnp.repeat(tet_ok, 2)
    )
    faces_wt = jnp.where(face_wt_valid[:, None], faces_wt, 0)

    # ---- level 2: mSDF cut ------------------------------------------------
    # polygon cycle (4 slots; triangles repeat the first as the 4th)
    cyc_sel = jnp.clip(jnp.asarray(MESH_EDGE_TABLE)[tcase], 0, 5)  # [MT, 4]
    cyc = _select_cols(idx_map, cyc_sel)                           # [MT, 4]

    # fused [verts | m_grad | m_stop] row gather over the polygon cycle
    vm = jnp.concatenate(
        [verts_wt, msdf_wt_grad[:, None], msdf_wt_stop[:, None]], axis=-1)
    vm_c = gather_rows(vm, cyc, use_pl)                            # [MT, 4, 5]
    m_c = vm_c[..., 3]                                             # [MT, 4]
    m_c_stop = vm_c[..., 4]
    v_c = vm_c[..., :3]                                            # [MT, 4, 3]

    # boundary vertex on each cycle edge (e, e+1 mod 4)
    nxt = jnp.asarray([1, 2, 3, 0], jnp.int32)
    mA, mB = m_c, m_c[:, nxt]
    vA, vB = v_c, v_c[:, nxt]
    same_sign = jnp.abs(jnp.sign(mA) + jnp.sign(mB)) == 2
    bdenom = mA - mB
    b_ok = (~same_sign) & (jnp.abs(bdenom) > 1e-12)
    bdenom = _stable_denom(bdenom)
    bwA = jnp.where(b_ok, -mB / bdenom, 0.0)                       # [MT, 4]
    bwB = jnp.where(b_ok, mA / bdenom, 0.0)
    verts_b = vA * bwA[..., None] + vB * bwB[..., None]            # [MT, 4, 3]
    # carried mSDF: stop-vgrad values with *detached* coefficients
    # (ref gshell_tets.py:388-389)
    msdf_b = (m_c_stop * jax.lax.stop_gradient(bwA)
              + m_c_stop[:, nxt] * jax.lax.stop_gradient(bwB))     # [MT, 4]

    verts_wt = jnp.where(vert_ok[:, None], verts_wt, 0.0)
    verts_aug_raw = jnp.concatenate(
        [verts_wt, verts_b.reshape(MT * 4, 3)], axis=0)
    is_quad = ntri == 2

    return {
        "MV": MV, "MT": MT,
        "vert_ok": vert_ok, "verts_wt": verts_wt,
        "msdf_wt_stop": msdf_wt_stop,
        "faces_wt": faces_wt, "face_wt_valid": face_wt_valid,
        "tet_ok": tet_ok, "ntri": ntri, "is_quad": is_quad, "cyc": cyc,
        "m_c": m_c, "msdf_b": msdf_b,
        "verts_aug_raw": verts_aug_raw,
        "n_cross": jnp.sum(crossing),
        "n_valid_tets": jnp.sum(valid_tet),
    }


def _gshell_level2(lv1: dict, msdf_sign: float) -> Tuple[GShellMesh, jnp.ndarray]:
    """Sign-dependent mSDF cut of the shared level-1 polygons: cheap [MT,*]
    table lookups + sign flips only (the boundary-vertex positions are
    sign-invariant and come precomputed from level 1). Returns the mesh and
    the shared UNMASKED aug vertex array (so callers posing both halves can
    run LBS once)."""
    MV, MT = lv1["MV"], lv1["MT"]
    tet_ok, ntri, is_quad = lv1["tet_ok"], lv1["ntri"], lv1["is_quad"]
    cyc = lv1["cyc"]
    # exact sign application (gather commutes with negation bit-exactly, so
    # this equals running the whole extraction on msdf_sign * msdf)
    m_c = msdf_sign * lv1["m_c"]                                   # [MT, 4]
    msdf_b = msdf_sign * lv1["msdf_b"]
    msdf_wt_stop = msdf_sign * lv1["msdf_wt_stop"]
    verts_wt = lv1["verts_wt"]

    # cut-case index
    mocc = (m_c > 0).astype(jnp.int32)                             # [MT, 4]
    tri_powers = jnp.asarray([4, 2, 1, 0], jnp.int32)
    quad_powers = jnp.asarray([8, 4, 2, 1], jnp.int32)
    mi_tri = jnp.sum(mocc * tri_powers, axis=-1)
    mi_quad = jnp.sum(mocc * quad_powers, axis=-1)

    n_cut = jnp.where(
        is_quad,
        jnp.asarray(NUM_QUAD_CUT)[mi_quad],
        jnp.asarray(NUM_TRI_CUT)[mi_tri],
    )
    n_cut = jnp.where(tet_ok & (ntri > 0), n_cut, 0)

    # global vertex numbering for the cut tables:
    #   tri  slots: [c0, c1, c2, b0, b1, b2]
    #   quad slots: [c0, c1, c2, c3, b0, b1, b2, b3]
    tet_ids = jnp.arange(MT, dtype=jnp.int32)
    b_base = MV + tet_ids * 4
    glob_tri = jnp.concatenate(
        [cyc[:, :3], b_base[:, None] + jnp.asarray([0, 1, 2], jnp.int32)],
        axis=1)                                                     # [MT, 6]
    glob_quad = jnp.concatenate(
        [cyc, b_base[:, None] + jnp.asarray([0, 1, 2, 3], jnp.int32)],
        axis=1)                                                     # [MT, 8]

    tri_cut = jnp.clip(jnp.asarray(TRI_CUT_TABLE)[mi_tri], 0, 5)    # [MT, 6]
    quad_cut = jnp.clip(jnp.asarray(QUAD_CUT_TABLE)[mi_quad], 0, 7)  # [MT,12]
    faces_tri = _select_cols(glob_tri, tri_cut)                      # [MT, 6]
    faces_tri = jnp.concatenate(
        [faces_tri, jnp.zeros((MT, 6), jnp.int32)], axis=1)          # [MT, 12]
    faces_quad = _select_cols(glob_quad, quad_cut)                    # [MT, 12]
    faces_aug = jnp.where(is_quad[:, None], faces_quad, faces_tri)
    faces_aug = faces_aug.reshape(MT * 4, 3)
    face_id_in_tet = jnp.tile(jnp.arange(4, dtype=jnp.int32), (MT,))
    face_valid = face_id_in_tet < jnp.repeat(n_cut, 4)
    faces_aug = jnp.where(face_valid[:, None], faces_aug, 0)

    # ---- assemble ----------------------------------------------------------
    verts_aug_raw = lv1["verts_aug_raw"]
    msdf_aug = jnp.concatenate([msdf_wt_stop, msdf_b.reshape(MT * 4)], axis=0)

    # mark referenced vertices (ref zeroes unused ones; we track a mask).
    # Boundary slots come straight from the cut-case reference tables; only
    # the corner marks (watertight verts, shared across tets) need a
    # scatter — [MT, 4] rows via sorted-COO on TPU instead of the
    # [4*MT, 3]-row XLA boolean scatter over the whole aug vertex table.
    alive = tet_ok & (ntri > 0) & (n_cut > 0)
    corner_ref = jnp.where(
        is_quad[:, None],
        jnp.asarray(QUAD_CORNER_REF)[mi_quad],
        jnp.asarray(TRI_CORNER_REF)[mi_tri]) & alive[:, None]   # [MT, 4]
    bnd_ref = jnp.where(
        is_quad[:, None],
        jnp.asarray(QUAD_BND_REF)[mi_quad],
        jnp.asarray(TRI_BND_REF)[mi_tri]) & alive[:, None]      # [MT, 4]
    corner_ids = jnp.where(corner_ref, cyc, MV).reshape(-1)
    from d3human_tpu.ops.scatter import coo_scatter_add, default_use_pallas
    if default_use_pallas():
        cnt = coo_scatter_add(
            corner_ids, jnp.ones((corner_ids.shape[0], 1), jnp.float32),
            MV + 1)
        wt_mark = cnt[:MV, 0] > 0
    else:
        wt_mark = jnp.zeros((MV + 1,), bool).at[corner_ids].set(True)[:MV]
    vert_valid = jnp.concatenate(
        [wt_mark & lv1["vert_ok"], bnd_ref.reshape(-1)])
    verts_aug = jnp.where(vert_valid[:, None], verts_aug_raw, 0.0)

    mesh = GShellMesh(
        verts=verts_aug,
        faces=faces_aug,
        face_valid=face_valid,
        vert_valid=vert_valid,
        msdf_aug=msdf_aug,
        verts_wt=verts_wt,
        faces_wt=lv1["faces_wt"],
        face_wt_valid=lv1["face_wt_valid"],
        msdf_wt=msdf_wt_stop,
        n_cross=lv1["n_cross"],
        n_valid_tets=lv1["n_valid_tets"],
    )
    return mesh, verts_aug_raw


def gshell_extract(
    grid: TetGrid,
    pos: jnp.ndarray,        # [N, 3] deformed grid vertex positions
    sdf: jnp.ndarray,        # [N]
    msdf: jnp.ndarray,       # [N]
    max_verts: int,
    max_tets: int,
    msdf_sign: float = 1.0,  # +1 cloth / template, -1 body (split variant)
) -> GShellMesh:
    lv1 = _gshell_level1(grid, pos, sdf, msdf, max_verts, max_tets)
    mesh, _ = _gshell_level2(lv1, msdf_sign)
    return mesh


def gshell_extract_pair(
    grid: TetGrid,
    pos: jnp.ndarray,
    sdf: jnp.ndarray,
    msdf: jnp.ndarray,
    max_verts: int,
    max_tets: int,
) -> Tuple[GShellMesh, GShellMesh, jnp.ndarray]:
    """Both split-stage cuts — cloth (mSDF>0) and body (mSDF<0, ref
    hmsdf_tets_split.py:254-264) — sharing one level-1 extraction. The
    reference runs the full two-level extraction per half every split
    iteration (ref train.py:1040-1045 -> getMesh_split twice); here the SDF
    crossing detection, both stream compactions, every large fused-row
    gather, and the boundary-vertex interpolation run ONCE, and only the
    cheap per-tet cut tables differ per sign. Outputs are bit-identical to
    two independent gshell_extract calls (tested): negation is exact in
    IEEE float and commutes with gather/+-*/ and _stable_denom, so applying
    the sign after the shared gathers equals signing the input.

    Returns (cloth_mesh, body_mesh, verts_aug_raw) where verts_aug_raw is
    the UNMASKED shared vertex array — pose it once with LBS and mask per
    half (posing is per-vertex, models/smplx/deformer.py:126)."""
    lv1 = _gshell_level1(grid, pos, sdf, msdf, max_verts, max_tets)
    cloth, raw = _gshell_level2(lv1, 1.0)
    body, _ = _gshell_level2(lv1, -1.0)
    return cloth, body, raw


def sdf_reg_loss(sdf: jnp.ndarray, grid: TetGrid) -> jnp.ndarray:
    """Sign-flip BCE regularizer over grid edges
    (ref geometry/hmsdf.py:162-170): for every edge whose endpoint SDFs
    disagree in sign, pushes each endpoint's logit toward the other's sign.
    Masked mean over crossing edges only. Structured grids use shifted-slice
    endpoint pairs (gather-free)."""
    if grid.dims is not None:
        a, b = _structured_sdf_pairs(sdf.reshape(grid.vert_dims))
    else:
        E = grid.n_edges
        a = sdf[grid.edges[:E, 0]]
        b = sdf[grid.edges[:E, 1]]
    mask = jnp.sign(a) != jnp.sign(b)

    def bce(logit, target):
        # binary_cross_entropy_with_logits
        return jnp.maximum(logit, 0) - logit * target + jnp.log1p(
            jnp.exp(-jnp.abs(logit)))

    loss = bce(a, (b > 0).astype(jnp.float32)) + bce(b, (a > 0).astype(jnp.float32))
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, loss, 0.0)) / denom
