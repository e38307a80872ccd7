"""On-device iso-surface extraction via vectorized marching tetrahedra.

Replaces the reference's CPU PyMCubes / kaolin ``voxelgrids_to_trianglemeshes``
(lib/common/seg3d_lossless.py:583-604) — the reference falls back to CPU above
256^3 because GPU MC needs >9 GB there; this implementation stays on device at
512^3 and is built around the TPU's strengths:

1. **Active cells**: one pass over the grid marks cells whose 8 corners mix
   inside/outside; a cumsum-compaction (no data-dependent shapes) packs the
   first ``max_cells`` linear indices into a fixed buffer.
2. **Table lookups ride the MXU**: each cell spawns 6 tetrahedra (Kuhn
   subdivision); the per-tet case tables (generated programmatically at
   import, winding checked geometrically) are applied as one-hot matmuls —
   ``one_hot(case) @ table`` — producing dense per-cell corner-selection
   weights instead of per-triangle gathers (measured 5x faster than the
   gather formulation on v5e).
3. **SoA planes**: interpolated vertex coordinates are computed as dense
   ``[cells, 36]`` planes (6 tets x 2 tris x 3 verts), one per coordinate —
   never a ``[..., 3]`` trailing axis that TPU tiling would pad 3->128.
4. **Compaction + dedup on device**: valid slots compact into a fixed
   triangle budget; shared vertices dedup via a sort of exact integer edge
   ids (every MT vertex lies on a unique lattice edge), so only compact
   ``verts[nv, 3] + faces[nt, 3]`` ever leave the device — the host link is
   ~20 MB/s in this environment.

Outputs are in grid coordinates (x, y, z); faces wind counter-clockwise seen
from outside (occ < iso side).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# cube corner c -> offset (x, y, z)
_CORNER_OFF = np.array([[c & 1, (c >> 1) & 1, (c >> 2) & 1]
                        for c in range(8)], np.int32)

# Kuhn 6-tet subdivision: paths 0 -> a -> b -> 7 along cube edges
_TETS = np.array([
    [0, 1, 3, 7], [0, 1, 5, 7], [0, 2, 3, 7],
    [0, 2, 6, 7], [0, 4, 5, 7], [0, 4, 6, 7],
], np.int32)


def _build_tet_tables():
    """Per-(tet, case) triangle tables.

    Returns:
      sel_a, sel_b: [6, 16, 2, 3, 8] float32 one-hot corner selectors for the
        two edge endpoints of each triangle vertex (zero rows when invalid).
      valid: [6, 16, 2] bool.
    """
    sel_a = np.zeros((6, 16, 2, 3, 8), np.float32)
    sel_b = np.zeros((6, 16, 2, 3, 8), np.float32)
    valid = np.zeros((6, 16, 2), bool)

    for t, tet in enumerate(_TETS):
        pos = _CORNER_OFF[tet].astype(np.float64)      # [4, 3]
        for case in range(1, 15):
            inside = [i for i in range(4) if case & (1 << i)]
            outside = [i for i in range(4) if not case & (1 << i)]

            if len(inside) == 1:
                i = inside[0]
                e = [(i, o) for o in outside]
                tris = [(e[0], e[1], e[2])]
            elif len(inside) == 3:
                o = outside[0]
                e = [(i, o) for i in inside]
                tris = [(e[0], e[1], e[2])]
            else:
                i0, i1 = inside
                o0, o1 = outside
                a, b, c, d = ((i0, o0), (i0, o1), (i1, o1), (i1, o0))
                tris = [(a, b, c), (a, c, d)]

            outward = (pos[outside].mean(0) - pos[inside].mean(0))
            for k, tri in enumerate(tris):
                mids = np.array([(pos[i] + pos[o]) / 2 for i, o in tri])
                n = np.cross(mids[1] - mids[0], mids[2] - mids[0])
                order = (0, 1, 2) if np.dot(n, outward) >= 0 else (0, 2, 1)
                for j, oj in enumerate(order):
                    i_loc, o_loc = tri[oj]
                    sel_a[t, case, k, j, tet[i_loc]] = 1.0
                    sel_b[t, case, k, j, tet[o_loc]] = 1.0
                valid[t, case, k] = True
    return sel_a, sel_b, valid


_SEL_A, _SEL_B, _TRI_VALID = _build_tet_tables()


def _build_combined_tables():
    """Fold (tet, case) into one 96-way axis so the per-cell table stage is
    plain [NC, 96] @ [96, .] MXU matmuls.

    The earlier formulation materialized corner-selector tensors
    ``Wa/Wb [NC, 36, 8]`` whose trailing 8-wide axis the TPU layout pads to
    128 lanes — ~16x the useful HBM traffic, measured as ~135 ms of the
    227 ms marching pass at 256^3. Here every derived quantity gets its own
    precomputed [96, 36] table (e96 = tet*16 + case, w36 = tet*6 + slot):
    corner offsets Ta/Tb per coordinate, corner one-hots VA/VB (contracted
    against the cell's 8 occupancy values as an outer-product matmul), and
    the triangle-valid mask TV [96, 12]."""
    A = _SEL_A.reshape(6, 16, 6, 8)          # [t, case, w6, corner]
    B = _SEL_B.reshape(6, 16, 6, 8)
    offs = _CORNER_OFF.astype(np.float32)
    Ta = np.zeros((96, 36, 3), np.float32)
    Tb = np.zeros((96, 36, 3), np.float32)
    VA = np.zeros((96, 36, 8), np.float32)
    VB = np.zeros((96, 36, 8), np.float32)
    TV = np.zeros((96, 12), np.float32)
    for t in range(6):
        for case in range(16):
            e = t * 16 + case
            Ta[e, t * 6:(t + 1) * 6] = A[t, case] @ offs
            Tb[e, t * 6:(t + 1) * 6] = B[t, case] @ offs
            VA[e, t * 6:(t + 1) * 6] = A[t, case]
            VB[e, t * 6:(t + 1) * 6] = B[t, case]
            TV[e, t * 2:(t + 1) * 2] = _TRI_VALID[t, case]
    return Ta, Tb, VA, VB, TV


_T_A, _T_B, _VAL_A, _VAL_B, _TV96 = _build_combined_tables()


def _compact_indices(mask_flat: jnp.ndarray, budget: int):
    """Pack indices of true entries into a fixed-size buffer (first `budget`
    in linear order) via top_k over index keys — 2.2x faster than the
    cumsum+scatter formulation on v5e (TPU scatters serialize). Padded slots
    clamp to the last element. Returns (idx [budget] int32, count int32
    clamped to budget, total int32 unclamped — total > count means
    overflow: true entries were dropped)."""
    n = mask_flat.shape[0]
    key = jnp.where(mask_flat, jnp.arange(n, dtype=jnp.int32),
                    jnp.int32(2 ** 31 - 1))
    k = min(budget, n)
    neg = jax.lax.top_k(-key, k)[0]
    idx = jnp.minimum(-neg, n - 1)
    if k < budget:
        idx = jnp.concatenate(
            [idx, jnp.full((budget - k,), n - 1, jnp.int32)])
    total = jnp.sum(mask_flat.astype(jnp.int32))
    return idx, jnp.minimum(total, budget), total


class MarchOut(NamedTuple):
    verts_x: jnp.ndarray       # [max_verts]
    verts_y: jnp.ndarray
    verts_z: jnp.ndarray
    faces: jnp.ndarray         # [max_tris, 3] int32 into the vert buffers
    n_verts: jnp.ndarray       # scalar int32 (clamped to max_verts)
    n_tris: jnp.ndarray        # scalar int32 (clamped to max_tris)
    n_cells: jnp.ndarray       # scalar int32 (cells in-buffer, <= max_cells)
    n_tris_total: jnp.ndarray  # scalar int32 true count; > n_tris = overflow
    n_cells_total: jnp.ndarray = jnp.zeros((), jnp.int32)
    # ^ true candidate-cell count: dense path = all active cells; coarse
    #   path = survivors + 8x each dropped mixed coarse cell (upper bound).
    #   n_cells_total > n_cells means candidates were silently lost — raise
    #   max_cells (mirrors the engine's levelN_overflow stats).


def _active_cells(occ: jnp.ndarray, iso: float, max_cells: int,
                  coarse_occ: Optional[jnp.ndarray],
                  max_candidates: Optional[int] = None):
    """Stage 1 (shared by the indexed and lattice paths): candidate cell
    coordinates. Returns (cx, cy, cz, cell_idx, alive_cells, n_cells,
    n_cells_total), each [max_cells] except the scalars.

    The coarse path expands every mixed coarse cell x8 into fine candidates
    (buffer [max_candidates], default max_cells), then filters to the cells
    that are EXACTLY mixed at fine resolution before compacting into the
    [max_cells] output buffer. The mixed test is a separable min/max over
    the 2x2x2 corner window computed elementwise on the whole bit volume
    (no per-corner gathers) + ONE 1-wide gather per candidate; it shrinks
    the alive set ~2.5x (dilation vs true surface), and every downstream
    static buffer — the 8-corner gather, the per-cell table/edge stages,
    the packed cell list — shrinks with it through the AutoMarcher's
    bucket autotuning."""
    D, H, W = occ.shape
    inside = occ > iso
    cw, ch = W - 1, H - 1

    def corner(arr, c, d_, h_, w_):
        dx, dy, dz = _CORNER_OFF[c]
        return arr[dz:dz + d_ - 1, dy:dy + h_ - 1, dx:dx + w_ - 1]

    if coarse_occ is None:
        cnt = sum(corner(inside, c, D, H, W).astype(jnp.int8)
                  for c in range(8))
        active = (cnt > 0) & (cnt < 8)
        cell_idx, n_cells, n_cells_total = _compact_indices(
            active.reshape(-1), max_cells)
        alive_cells = jnp.arange(max_cells) < n_cells
        cz = cell_idx // (ch * cw)
        cy = (cell_idx // cw) % ch
        cx = cell_idx % cw
    else:
        Dc, Hc, Wc = coarse_occ.shape
        in_c = coarse_occ > iso
        cntc = sum(corner(in_c, c, Dc, Hc, Wc).astype(jnp.int8)
                   for c in range(8))
        mixed = (cntc > 0) & (cntc < 8)
        mcand = max_candidates or max_cells
        nc_budget = mcand // 8
        idxc, n_c, n_mixed_total = _compact_indices(
            mixed.reshape(-1), nc_budget)
        ccz = idxc // ((Hc - 1) * (Wc - 1))
        ccy = (idxc // (Wc - 1)) % (Hc - 1)
        ccx = idxc % (Wc - 1)
        # coarse cell c covers fine (sliced-by-one) cells {2c-1, 2c}/axis
        offs = jnp.asarray(_CORNER_OFF)                     # [8, 3] (x,y,z)
        fx = 2 * ccx[:, None] - 1 + offs[None, :, 0]
        fy = 2 * ccy[:, None] - 1 + offs[None, :, 1]
        fz = 2 * ccz[:, None] - 1 + offs[None, :, 2]
        valid = ((fx >= 0) & (fx < cw) & (fy >= 0) & (fy < ch) &
                 (fz >= 0) & (fz < D - 1) &
                 (jnp.arange(nc_budget)[:, None] < n_c))
        kx = jnp.clip(fx, 0, cw - 1).reshape(-1)
        ky = jnp.clip(fy, 0, ch - 1).reshape(-1)
        kz = jnp.clip(fz, 0, D - 2).reshape(-1)
        cand_idx = (kz * ch + ky) * cw + kx                 # [mcand]

        # exact mixed test: separable all-inside / any-inside reductions
        ai = inside[:, :, :-1] & inside[:, :, 1:]
        ao = inside[:, :, :-1] | inside[:, :, 1:]
        ai = ai[:, :-1] & ai[:, 1:]
        ao = ao[:, :-1] | ao[:, 1:]
        mixedv = ((ao[:-1] | ao[1:]) & ~(ai[:-1] & ai[1:])).reshape(-1)
        alive_cand = valid.reshape(-1) & mixedv[cand_idx]

        cpos, n_cells, n_alive_total = _compact_indices(alive_cand,
                                                        max_cells)
        cell_idx = cand_idx[cpos]
        cx, cy, cz = kx[cpos], ky[cpos], kz[cpos]
        alive_cells = jnp.arange(max_cells) < n_cells
        # each dropped mixed coarse cell hides up to 8 fine candidates —
        # count them so callers see coarse-candidate overflow
        n_cells_total = n_alive_total + 8 * jnp.maximum(
            n_mixed_total - nc_budget, 0)
    return cx, cy, cz, cell_idx, alive_cells, n_cells, n_cells_total


@functools.partial(jax.jit, static_argnames=("max_cells", "max_tris",
                                             "max_verts", "max_candidates"))
def marching_tetrahedra_indexed(occ: jnp.ndarray, iso: float = 0.5,
                                max_cells: int = 1 << 18,
                                max_tris: int = 1 << 20,
                                max_verts: int = 1 << 19,
                                coarse_occ: Optional[jnp.ndarray] = None,
                                max_candidates: Optional[int] = None
                                ) -> MarchOut:
    """Extract an indexed mesh from ``occ [D, H, W]`` ([z, y, x] layout),
    fully on device. See module docstring for the pipeline.

    ``coarse_occ``: when ``occ`` is the 2x trilinear align_corners upsample
    of this grid sliced by one (the recon engine's faster-mode final level,
    engine.py), active fine cells can only lie inside MIXED coarse cells —
    trilinear interpolation is a convex combination, so a one-sided coarse
    cell stays one-sided. Candidates then come from the (8x smaller) coarse
    mixed mask, skipping the full-grid active scan + compaction."""
    D, H, W = occ.shape
    dt = occ.dtype
    cw, ch = W - 1, H - 1

    # ---- 1. active cells --------------------------------------------------
    cx, cy, cz, cell_idx, alive_cells, n_cells, n_cells_total = \
        _active_cells(occ, iso, max_cells, coarse_occ, max_candidates)

    occ_flat = occ.reshape(-1)
    lin = ((cz[:, None] + _CORNER_OFF[:, 2][None]) * H +
           (cy[:, None] + _CORNER_OFF[:, 1][None])) * W + \
        (cx[:, None] + _CORNER_OFF[:, 0][None])
    cvals = occ_flat[lin]                               # [NC, 8]
    cbits = (cvals > iso).astype(jnp.int32)

    # ---- 2. dense per-cell table application (combined-one-hot matmuls) ---
    # e96 = tet*16 + case; the 96-hot row has exactly one 1 per tet, so
    # every per-slot quantity is one [NC, 96] @ [96, 36] MXU matmul (see
    # _build_combined_tables for why no [NC, 36, 8] tensors appear here).
    tet_bits = cbits[:, _TETS]                          # [NC, 6, 4]
    case = (tet_bits * jnp.array([1, 2, 4, 8])).sum(-1)  # [NC, 6]
    e96 = case + 16 * jnp.arange(6)[None]
    onehot96 = sum(jax.nn.one_hot(e96[:, t], 96, dtype=dt)
                   for t in range(6))                   # [NC, 96]

    ta = jnp.asarray(_T_A)                              # [96, 36, 3]
    tb = jnp.asarray(_T_B)
    ax = onehot96 @ ta[..., 0]
    ay = onehot96 @ ta[..., 1]
    az = onehot96 @ ta[..., 2]
    bx = onehot96 @ tb[..., 0]
    by = onehot96 @ tb[..., 1]
    bz = onehot96 @ tb[..., 2]

    # corner values: contract the (96-hot x 8 cell corners) outer product
    # against the corner one-hot tables in a single matmul each
    outer = (onehot96[:, :, None] * cvals[:, None, :]).reshape(-1, 96 * 8)
    va = outer @ jnp.asarray(
        _VAL_A.transpose(0, 2, 1).reshape(96 * 8, 36))  # [NC, 36]
    vb = outer @ jnp.asarray(
        _VAL_B.transpose(0, 2, 1).reshape(96 * 8, 36))

    denom = vb - va
    t = jnp.where(jnp.abs(denom) < 1e-12, 0.5, (iso - va) / denom)
    t = jnp.clip(t, 0.0, 1.0)                           # [NC, 36]

    px = cx[:, None].astype(dt) + ax + t * (bx - ax)
    py = cy[:, None].astype(dt) + ay + t * (by - ay)
    pz = cz[:, None].astype(dt) + az + t * (bz - az)

    # exact lattice-edge id per vertex slot (for dedup): every MT vertex lies
    # on the edge (corner_a, corner_b) of its cell; global id =
    # lattice_vertex_id(min end) * 8 + direction code (dx + 2dy + 4dz).
    # ax..bz are exact {0, 1} corner offsets, so they round-trip to ints.
    ga_x = cx[:, None] + ax.astype(jnp.int32)
    ga_y = cy[:, None] + ay.astype(jnp.int32)
    ga_z = cz[:, None] + az.astype(jnp.int32)
    gb_x = cx[:, None] + bx.astype(jnp.int32)
    gb_y = cy[:, None] + by.astype(jnp.int32)
    gb_z = cz[:, None] + bz.astype(jnp.int32)
    a_lin = (ga_z * H + ga_y) * W + ga_x
    b_lin = (gb_z * H + gb_y) * W + gb_x
    lo = jnp.minimum(a_lin, b_lin)
    dx = jnp.abs(gb_x - ga_x)
    dy = jnp.abs(gb_y - ga_y)
    dz = jnp.abs(gb_z - ga_z)
    dir_code = dx + 2 * dy + 4 * dz                     # in [1, 7]
    edge_id = lo * 8 + dir_code                         # [NC, 36] int32

    # ---- 3. triangle validity + compaction ---------------------------------
    slot_valid = (onehot96 @ jnp.asarray(_TV96)) > 0.5   # [NC, 12]
    slot_valid = (slot_valid &
                  alive_cells[:, None]).reshape(-1)      # [NC*12]

    tri_idx, n_tris, n_tris_total = _compact_indices(slot_valid, max_tris)
    tri_alive = jnp.arange(max_tris) < n_tris

    # triangle slot s covers vertex-slots [3s, 3s+3) after the (k, j)
    # reordering: vertex-slot = tet*6 + k*3 + j; triangle slot = tet*2 + k
    def tri_gather(plane):                               # [NC, 36] -> [mt, 3]
        flat = plane.reshape(-1, 12, 3).reshape(-1, 3)   # [NC*12, 3]
        return flat[tri_idx]

    tvx = tri_gather(px)
    tvy = tri_gather(py)
    tvz = tri_gather(pz)
    teid = tri_gather(edge_id)
    teid = jnp.where(tri_alive[:, None], teid, jnp.int32(2 ** 31 - 1))

    # ---- 4. vertex dedup via sort of exact edge ids -------------------------
    # one multi-operand lax.sort co-sorts the coordinates and the original
    # slot position with the keys — TPU gathers serialize, so sort-then-
    # 4-gathers (the argsort formulation) loses to carrying the payload
    # through the sort network
    M = max_tris * 3
    keys = teid.reshape(-1)                              # [M]
    sk, sx, sy, sz, order = jax.lax.sort(
        (keys, tvx.reshape(-1), tvy.reshape(-1), tvz.reshape(-1),
         jnp.arange(M, dtype=jnp.int32)), num_keys=1)

    first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    first = first & (sk != 2 ** 31 - 1)
    vid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1  # [M]
    n_verts = jnp.maximum(vid_sorted[-1] + 1, 0)

    # gather-formulation of the vertex table: positions of first
    # occurrences compact into [max_verts], then verts come as gathers.
    # (Measured on v5e: top_k compaction beats a searchsorted binary
    # search here — 21 serial gather rounds over the 3*max_tris array lose
    # to one fused sort.)
    vpos, _, _ = _compact_indices(first, max_verts)
    verts_x = sx[vpos]
    verts_y = sy[vpos]
    verts_z = sz[vpos]

    # faces: scatter sorted vertex ids back to original soup order; `order`
    # is a permutation, so the scatter indices are provably unique
    soup_vid = jnp.zeros((M,), jnp.int32).at[order].set(
        vid_sorted, unique_indices=True)
    faces = soup_vid.reshape(-1, 3)
    faces = jnp.where(tri_alive[:, None], faces, 0)

    return MarchOut(verts_x, verts_y, verts_z, faces,
                    jnp.minimum(n_verts, max_verts), n_tris,
                    n_cells, n_tris_total, n_cells_total)


# ---------------------------------------------------------------------------
# Lattice codec: the serving-path wire format.
#
# The tunneled host link moves ~30 MB/s with a ~28 ms fixed round-trip per
# fetch (measured r5; post-computation copies DO overlap device compute,
# but the per-frame bytes and sync latency still bill the sequential
# serving path directly), so transferred bytes are first-order serving
# cost. Instead of explicit verts + faces (~3.3 MB at 295k tris), transfer
# the marching-tetrahedra *generators* and rebuild on host:
#
#   - unique vertices as (lattice edge id, fraction-from-lo-end u8): every
#     MT vertex lies on a unique lattice edge, so the edge id both names the
#     vertex and locates it; u8 along the edge is <= 1/510 of an edge —
#     tighter than the 10.6 fixed-point of the explicit path.
#   - active cells as (cell id, 8 corner-inside bits): faces are a pure
#     function of the corner bits through the same (tet, case) tables the
#     device uses, so no face indices cross the link at all.
#
# ~1.3 MB for the same mesh (2.5x fewer bytes). Wire v2 ("implicit eid",
# the serving default) drops the edge-id block too — every transmitted
# vertex is an owned crossing edge of a mixed cell, so the host recovers
# the sorted-unique edge-id list from the cell bits alone — ~0.5 MB
# (6.3x fewer bytes than explicit; measured 56 -> 36 ms/frame transfer at
# 295k tris). Host decode is numpy table gathers + one searchsorted (edge
# id -> vertex rank) — or the native C++ single-pass rebuild — and faces
# come out in table order, identical as a SET to the explicit path's.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _host_tables():
    """Host twins of the device tables for lattice decode.

    Returns (tet_case [256, 6] u8: per-tet 4-bit case for each 8-bit cell
    corner config; corners [96, 2, 3, 2] u8: local corner ids (a, b) per
    (tet*16+case, tri, vert) in device winding order; valid [96, 2] bool)."""
    tet_case = np.zeros((256, 6), np.uint8)
    for bits in range(256):
        for t, tet in enumerate(_TETS):
            c = 0
            for i in range(4):
                if bits >> int(tet[i]) & 1:
                    c |= 1 << i
            tet_case[bits, t] = c
    A = _SEL_A.argmax(-1).astype(np.uint8)      # [6, 16, 2, 3]
    B = _SEL_B.argmax(-1).astype(np.uint8)
    corners = np.zeros((96, 2, 3, 2), np.uint8)
    valid = np.zeros((96, 2), bool)
    for t in range(6):
        for case in range(16):
            e = t * 16 + case
            corners[e, :, :, 0] = A[t, case]
            corners[e, :, :, 1] = B[t, case]
            valid[e] = _TRI_VALID[t, case]
    return tet_case, corners, valid


@functools.lru_cache(maxsize=1)
def _host_tables_flat():
    """Flat u8 tables for the native (C++) lattice decoder: per-slot
    min-corner local ids + direction codes instead of corner pairs (the
    min end is static — lattice order is lexicographic in (z, y, x), and
    corner offsets are 0/1)."""
    tet_case, corners, valid = _host_tables()
    a = corners[..., 0].astype(np.int64)        # [96, 2, 3] local ids
    b = corners[..., 1].astype(np.int64)
    offs = _CORNER_OFF                          # [8, 3] (x, y, z)

    def zyx_key(c):
        return (offs[c][..., 2] << 2) | (offs[c][..., 1] << 1) | offs[c][..., 0]

    lo = np.where(zyx_key(a) <= zyx_key(b), a, b).astype(np.uint8)
    d = np.abs(offs[a] - offs[b])
    dcode = (d[..., 0] + 2 * d[..., 1] + 4 * d[..., 2]).astype(np.uint8)
    return (np.ascontiguousarray(tet_case.reshape(-1)),
            np.ascontiguousarray(lo.reshape(-1)),
            np.ascontiguousarray(dcode.reshape(-1)),
            np.ascontiguousarray(valid.reshape(-1).astype(np.uint8)))


class LatticeOut(NamedTuple):
    vert_eid: jnp.ndarray      # [max_verts] int32 sorted unique edge ids
    vert_s: jnp.ndarray        # [max_verts] f32 fraction from the LO edge end
    cell_id: jnp.ndarray       # [max_cells] int32 linear cell ids (compact)
    cell_bits: jnp.ndarray     # [max_cells] int32 (low 8 bits: corner config)
    n_verts: jnp.ndarray       # scalar int32 (clamped to max_verts)
    n_cells: jnp.ndarray       # scalar int32 (clamped to max_cells)
    n_verts_total: jnp.ndarray  # true count; > n_verts = overflow
    n_cells_total: jnp.ndarray


def _build_edge_slots():
    """The 19 (lo corner, hi corner, direction) edge slots a cell can OWN.

    Kuhn's 6-tet subdivision contains every edge (o, o + d) with
    o + d <= 1 per axis (verified exhaustively by the vertex-parity test
    against the indexed path), so a cell can enumerate every marching
    vertex it is canonically responsible for straight from its 8 corner
    values — no (tet, case) tables on the device at all. Interior cells own
    the 7 edges rooted at their origin; cells on a max boundary also own
    the o != 0 edges whose lo lattice point has no cell of its own
    (ownership rule: per axis, o_a == 0 OR the cell is the last one)."""
    slots = []
    for o in range(8):
        for d in range(1, 8):
            hi = ((o & 1) + (d & 1), ((o >> 1) & 1) + ((d >> 1) & 1),
                  ((o >> 2) & 1) + ((d >> 2) & 1))
            if max(hi) <= 1:
                slots.append((o, hi[0] | (hi[1] << 1) | (hi[2] << 2), d))
    assert len(slots) == 19
    return np.array(slots, np.int32)


_EDGE_SLOTS = _build_edge_slots()


@functools.partial(jax.jit, static_argnames=("max_cells", "max_verts",
                                             "max_candidates"))
def marching_lattice(occ: jnp.ndarray, iso: float = 0.5,
                     max_cells: int = 1 << 18,
                     max_verts: int = 1 << 19,
                     coarse_occ: Optional[jnp.ndarray] = None,
                     max_candidates: Optional[int] = None) -> LatticeOut:
    """Marching tetrahedra emitting the lattice codec (see section comment):
    unique vertices as (edge id, fraction) + active cells as (id, corner
    bits); faces never materialize on device — the host derives them from
    the corner bits. Dedup is BY CONSTRUCTION (each lattice edge has
    exactly one owner cell, see _build_edge_slots), so the whole triangle
    stage of the indexed path — one-hot table matmuls, a 2M-slot
    compaction, triangle gathers, and the 1.2M-element dedup sort — is
    replaced by one [cells, 19] crossing test and one compaction; with the
    exact mixed-cell filter in _active_cells this measures 2x faster than
    the indexed kernel at 256^3 serving buckets on v5e (82 -> 42 ms)."""
    D, H, W = occ.shape
    cw, ch = W - 1, H - 1

    cx, cy, cz, cell_idx, alive_cells, n_cells, n_cells_total = \
        _active_cells(occ, iso, max_cells, coarse_occ, max_candidates)

    occ_flat = occ.reshape(-1)
    lin = ((cz[:, None] + _CORNER_OFF[:, 2][None]) * H +
           (cy[:, None] + _CORNER_OFF[:, 1][None])) * W + \
        (cx[:, None] + _CORNER_OFF[:, 0][None])
    cvals = occ_flat[lin]                               # [NC, 8]
    return _lattice_emit(cvals, cx, cy, cz, cell_idx, alive_cells,
                         n_cells, n_cells_total, (D, H, W), iso, max_verts)


def _lattice_emit(cvals, cx, cy, cz, cell_idx, alive_cells, n_cells,
                  n_cells_total, fine_shape, iso, max_verts) -> LatticeOut:
    """Shared lattice-codec emit: per-cell corner values -> owned crossing
    edges -> (edge id, fraction) vertices + (cell id, corner bits)."""
    D, H, W = fine_shape
    cw, ch = W - 1, H - 1
    max_cells = cx.shape[0]
    cbits = (cvals > iso).astype(jnp.int32)

    slots = jnp.asarray(_EDGE_SLOTS)                    # [19, 3]
    v_lo = cvals[:, _EDGE_SLOTS[:, 0]]                  # [NC, 19]
    v_hi = cvals[:, _EDGE_SLOTS[:, 1]]
    crossing = (v_lo > iso) != (v_hi > iso)
    olo = _CORNER_OFF[_EDGE_SLOTS[:, 0]]                # [19, 3] (x, y, z)
    own = (((olo[None, :, 0] == 0) | (cx[:, None] == cw - 1)) &
           ((olo[None, :, 1] == 0) | (cy[:, None] == ch - 1)) &
           ((olo[None, :, 2] == 0) | (cz[:, None] == D - 2)))
    valid = crossing & own & alive_cells[:, None]

    denom = v_hi - v_lo
    s = jnp.clip((iso - v_lo) / jnp.where(denom == 0, 1.0, denom), 0.0, 1.0)
    plin = ((cz[:, None] + olo[None, :, 2]) * H +
            (cy[:, None] + olo[None, :, 1])) * W + \
        (cx[:, None] + olo[None, :, 0])
    eid = plin * 8 + slots[None, :, 2]                  # [NC, 19]

    vpos, n_verts, n_verts_total = _compact_indices(
        valid.reshape(-1), max_verts)
    vert_eid = eid.reshape(-1)[vpos]
    vert_s = s.reshape(-1)[vpos]
    # canonical wire order (ascending edge id — matches the indexed path's
    # vertex order and keeps the numpy decode a plain searchsorted); dead
    # padded slots sort to the tail as sentinels
    vert_eid = jnp.where(jnp.arange(max_verts) < n_verts, vert_eid,
                         jnp.int32(2 ** 31 - 1))
    vert_eid, vert_s = jax.lax.sort((vert_eid, vert_s), num_keys=1)

    # the cell list arrives compact from _active_cells in both modes; padded
    # slots past n_cells carry clamped garbage the decoder never reads
    cbyte = (cbits * jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128])).sum(-1)

    return LatticeOut(vert_eid, vert_s, cell_idx, cbyte,
                      jnp.minimum(n_verts, max_verts),
                      jnp.minimum(n_cells, max_cells),
                      n_verts_total, n_cells_total)


@functools.partial(jax.jit, static_argnames=("max_cells", "max_verts",
                                             "max_candidates"))
def marching_lattice_virtual(coarse_occ: jnp.ndarray, iso: float = 0.5,
                             max_cells: int = 1 << 18,
                             max_verts: int = 1 << 19,
                             max_candidates: Optional[int] = None
                             ) -> LatticeOut:
    """:func:`marching_lattice` over the VIRTUAL 2x align_corners upsample
    of ``coarse_occ``, sliced by one (the engine's faster-mode final level
    + export convention): fine corner values are interpolated ON THE FLY at
    candidate cells, so the dense fine grid never materializes.

    When to use: MEMORY scaling, not speed. At 257^3 the dense path is
    FASTER on v5e (45 ms vs 84 ms measured on the bench body: the dense
    upsample is a ~0.1 ms fused bandwidth op that TPUs love, while this
    path's per-candidate block gathers + tiny batched [2x2] weight matmuls
    don't tile onto the MXU) — so the serving bench keeps the materialized
    path. The virtual path's value is the dense grid it DOESN'T allocate:
    at 1025^3 the fine grid alone is 4.3 GB; this marches it from the
    0.5 GB coarse grid with surface-bound memory.

    Equivalent to
    ``marching_lattice(upsample2x(coarse)[1:,1:,1:], coarse_occ=coarse)``
    up to interpolation ULP (tests/test_marching.py pins it).

    Math: with align_corners 2x upsampling, the unsliced fine value at
    index v is ``coarse[v/2]`` for even v and the midpoint of the two
    neighbors for odd v, so a fine cell's 8 corners are separable
    2-tap-per-axis combinations of ONE coarse 2^3 block at
    ``floor((fine_sliced + 1) / 2)``.
    """
    Dc, Hc, Wc = coarse_occ.shape
    D, H, W = 2 * Dc - 2, 2 * Hc - 2, 2 * Wc - 2   # sliced fine dims
    cw, ch = W - 1, H - 1

    # candidate fine cells from mixed coarse cells (same expansion as
    # _active_cells' coarse path: coarse cell c covers sliced fine cells
    # {2c-1, 2c} per axis)
    in_c = coarse_occ > iso

    def corner(arr, c, d_, h_, w_):
        dx, dy, dz = _CORNER_OFF[c]
        return arr[dz:dz + d_ - 1, dy:dy + h_ - 1, dx:dx + w_ - 1]

    cntc = sum(corner(in_c, c, Dc, Hc, Wc).astype(jnp.int8)
               for c in range(8))
    mixed = (cntc > 0) & (cntc < 8)
    mcand = max_candidates or max_cells
    nc_budget = mcand // 8
    idxc, n_c, n_mixed_total = _compact_indices(mixed.reshape(-1),
                                                nc_budget)
    ccz = idxc // ((Hc - 1) * (Wc - 1))
    ccy = (idxc // (Wc - 1)) % (Hc - 1)
    ccx = idxc % (Wc - 1)
    offs = jnp.asarray(_CORNER_OFF)                     # [8, 3] (x, y, z)
    fx = 2 * ccx[:, None] - 1 + offs[None, :, 0]
    fy = 2 * ccy[:, None] - 1 + offs[None, :, 1]
    fz = 2 * ccz[:, None] - 1 + offs[None, :, 2]
    valid = ((fx >= 0) & (fx < cw) & (fy >= 0) & (fy < ch) &
             (fz >= 0) & (fz < D - 1) &
             (jnp.arange(nc_budget)[:, None] < n_c))
    kx = jnp.clip(fx, 0, cw - 1).reshape(-1)            # [mcand]
    ky = jnp.clip(fy, 0, ch - 1).reshape(-1)
    kz = jnp.clip(fz, 0, D - 2).reshape(-1)
    cand_idx = (kz * ch + ky) * cw + kx

    # virtual fine corner values: one coarse 2^3 block per candidate cell
    ux, uy, uz = kx + 1, ky + 1, kz + 1                 # unsliced base
    bx, by, bz = ux // 2, uy // 2, uz // 2              # block base taps
    px, py, pz = ux & 1, uy & 1, uz & 1                 # base parity
    cf = coarse_occ.reshape(-1)
    off1 = jnp.arange(2)
    blin = (((bz[:, None, None, None] + off1[None, :, None, None]) * Hc +
             (by[:, None, None, None] + off1[None, None, :, None])) * Wc +
            (bx[:, None, None, None] + off1[None, None, None, :]))
    blk = cf[blin]                                      # [mcand, 2, 2, 2]

    # per-axis corner->tap weights: even base -> corner0 exact, corner1
    # midpoint; odd base -> corner0 midpoint, corner1 exact
    w_even = jnp.asarray([[1.0, 0.0], [0.5, 0.5]], coarse_occ.dtype)
    w_odd = jnp.asarray([[0.5, 0.5], [0.0, 1.0]], coarse_occ.dtype)

    def wsel(p):
        return jnp.where((p == 0)[:, None, None], w_even[None], w_odd[None])

    t = jnp.einsum("nct,ntyx->ncyx", wsel(pz), blk)
    t = jnp.einsum("nbs,ncsx->ncbx", wsel(py), t)
    t = jnp.einsum("nar,ncbr->ncba", wsel(px), t)
    cvals8 = t.reshape(-1, 8)                 # corner order c = x + 2y + 4z

    ins = cvals8 > iso
    mixed_f = valid.reshape(-1) & ins.any(-1) & (~ins).any(-1)
    cpos, n_cells, n_alive_total = _compact_indices(mixed_f, max_cells)
    cell_idx = cand_idx[cpos]
    cx, cy, cz = kx[cpos], ky[cpos], kz[cpos]
    cvals = cvals8[cpos]
    alive_cells = jnp.arange(max_cells) < n_cells
    n_cells_total = n_alive_total + 8 * jnp.maximum(
        n_mixed_total - nc_budget, 0)
    return _lattice_emit(cvals, cx, cy, cz, cell_idx, alive_cells,
                         n_cells, n_cells_total, (D, H, W), iso, max_verts)


@functools.lru_cache(maxsize=64)
def _pack_lattice_fn(nv: int, nc: int, implicit_eid: bool = False):
    """Jitted lattice packer (one int32 buffer; bucketed sizes, see
    _pack_fn): [header 4 | vert_eid nv | vert_s u8 x4/word | cell_id nc |
    cell_bits u8 x4/word]. With ``implicit_eid`` the vert_eid block is
    omitted (wire v2): the host derives the sorted-unique edge-id list from
    (cell_id, cell_bits) — every transmitted vertex is an owned crossing
    edge of a mixed cell, hence referenced by that cell's own triangles, so
    unique(face edge ids) reproduces vert_eid exactly. Drops 4 B/vertex
    (~40% of the frame) off the non-overlapping tunnel link."""

    def pack(vert_eid, vert_s, cell_id, cell_bits, counts):
        s8 = jnp.clip(jnp.round(
            jax.lax.slice(vert_s, (0,), (nv,)) * 255.0), 0, 255) \
            .astype(jnp.int32)
        cid = jax.lax.slice(cell_id, (0,), (nc,))
        cb = jax.lax.slice(cell_bits, (0,), (nc,)) & 0xFF

        def pack4(b, n):
            pad = (-n) % 4
            b = jnp.concatenate([b, jnp.zeros((pad,), jnp.int32)])
            b = b.reshape(-1, 4)
            return (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
                    | (b[:, 3] << 24))

        parts = [counts]
        if not implicit_eid:
            parts.append(jax.lax.slice(vert_eid, (0,), (nv,)))
        parts += [pack4(s8, nv), cid, pack4(cb, nc)]
        return jnp.concatenate(parts)

    return jax.jit(pack)


def pack_lattice(out: LatticeOut, bucket: int = 16384,
                 sizes: Optional[Tuple[int, int]] = None,
                 implicit_eid: bool = False):
    """Device-side lattice-codec pack; non-blocking (header counts, see
    :func:`pack_mesh`). ``sizes`` = (n_verts, n_cells) upper bounds.
    ``implicit_eid`` selects wire v2 (no edge-id block, see
    :func:`_pack_lattice_fn`); the format rides header word 2 so
    :func:`decode_lattice` auto-dispatches."""
    cap_v = out.vert_eid.shape[0]
    cap_c = out.cell_id.shape[0]
    want_v, want_c = sizes if sizes is not None else (cap_v, cap_c)
    if want_v <= 0 or want_c <= 0:
        want_v, want_c = cap_v, cap_c
    nvb = min(-(-want_v // bucket) * bucket, cap_v)
    ncb = min(-(-want_c // bucket) * bucket, cap_c)
    counts = jnp.stack([out.n_verts, out.n_cells,
                        jnp.full((), int(implicit_eid), jnp.int32),
                        jnp.zeros((), jnp.int32)]).astype(jnp.int32)
    buf = _pack_lattice_fn(nvb, ncb, implicit_eid)(
        out.vert_eid, out.vert_s, out.cell_id, out.cell_bits, counts)
    return buf, nvb, ncb


def decode_lattice(packed, H: int, W: int, return_overflow: bool = False):
    """Blocking transfer + host rebuild of a :func:`pack_lattice` buffer:
    verts from (edge id, fraction), faces from (cell id, corner bits)
    through the host twin tables. ``H``/``W`` are the marched grid's dims
    (occ.shape[1], occ.shape[2]). Returns (verts [V, 3] f32 grid coords,
    faces [F, 3] i64) (+ overflow flag). The wire format (v1 explicit edge
    ids / v2 implicit) is read from header word 2.

    The rebuild runs in the native C++ decoder when available
    (icon_tpu/native: ~10 ms/frame, GIL-free) and falls back to the numpy
    path below (~0.5 s/frame of fancy-indexing temporaries — correct, but
    only suitable for tests and one-shot exports)."""
    empty = (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
    if packed is None:
        return empty + (False,) if return_overflow else empty
    buf, nvb, ncb = packed
    host = np.asarray(buf)
    implicit = bool(host[2] & 1)

    from icon_tpu import native
    if native.available():
        res = native.lattice_decode(host, nvb, ncb, H, W,
                                    *_host_tables_flat(), implicit=implicit)
        if res is not None:
            verts, faces, info = res
            out = (verts, faces.astype(np.int64))
            return out + (bool(info[2]),) if return_overflow else out
    nv_true, nc_true = int(host[0]), int(host[1])
    overflow = nv_true > nvb or nc_true > ncb
    nv = min(nv_true, nvb)
    nc = min(nc_true, ncb)
    if nv == 0 or nc == 0 or (implicit and overflow):
        # v2 cannot best-effort decode a truncated frame: the s-fraction
        # array aligns to the FULL device vertex set, so a subset-derived
        # edge list would misalign every rank — signal repack instead.
        return empty + (overflow,) if return_overflow else empty
    off = 4
    if implicit:
        eid = None
    else:
        eid = host[off:off + nvb][:nv]
        off += nvb
    s_words = host[off:off + (nvb + 3) // 4].view(np.uint32)
    off += (nvb + 3) // 4
    cid = host[off:off + ncb][:nc]
    off += ncb
    cb_words = host[off:off + (ncb + 3) // 4].view(np.uint32)

    def unpack4(words, n):
        b = np.empty(len(words) * 4, np.uint8)
        b[0::4] = words & 0xFF
        b[1::4] = (words >> 8) & 0xFF
        b[2::4] = (words >> 16) & 0xFF
        b[3::4] = (words >> 24) & 0xFF
        return b[:n]

    s = unpack4(s_words, nv).astype(np.float32) / 255.0
    cbits = unpack4(cb_words, nc)

    # faces: corner bits -> per-tet cases -> triangle corner pairs
    tet_case, corners, valid = _host_tables()
    cw, ch = W - 1, H - 1
    ccx = cid % cw
    ccy = (cid // cw) % ch
    ccz = cid // (cw * ch)
    e96 = tet_case[cbits].astype(np.int64) + 16 * np.arange(6)  # [NC, 6]
    corn = corners[e96]                     # [NC, 6, 2, 3, 2] local ids
    val = valid[e96]                        # [NC, 6, 2]
    offs = _CORNER_OFF                      # [8, 3] (x, y, z)
    gx = ccx[:, None, None, None, None] + offs[corn][..., 0]
    gy = ccy[:, None, None, None, None] + offs[corn][..., 1]
    gz = ccz[:, None, None, None, None] + offs[corn][..., 2]
    glin = ((gz.astype(np.int64) * H + gy) * W + gx)    # [NC, 6, 2, 3, 2]
    a_lin, b_lin = glin[..., 0], glin[..., 1]
    d = np.abs(offs[corn[..., 1]] - offs[corn[..., 0]])  # [NC, 6, 2, 3, 3]
    dcode = d[..., 0] + 2 * d[..., 1] + 4 * d[..., 2]
    feid = np.minimum(a_lin, b_lin) * 8 + dcode         # [NC, 6, 2, 3]
    feid = feid[val].reshape(-1, 3)                     # [F, 3] edge ids

    if implicit:
        # wire v2: the sorted-unique face edge ids ARE the device vertex
        # list (every owned crossing edge is referenced by its owner cell's
        # triangles); a count mismatch means truncation -> repack
        eid = np.unique(feid)
        if len(eid) != nv:
            return empty + (True,) if return_overflow else empty

    # verts: edge id -> lo lattice point + direction, walk s along it
    lo = eid >> 3
    dirc = eid & 7
    x0 = (lo % W).astype(np.float32)
    y0 = ((lo // W) % H).astype(np.float32)
    z0 = (lo // (W * H)).astype(np.float32)
    verts = np.stack([x0 + s * (dirc & 1), y0 + s * ((dirc >> 1) & 1),
                      z0 + s * ((dirc >> 2) & 1)], axis=-1)

    # edge id -> vertex rank (vert_eid is sorted by construction)
    pos = np.searchsorted(eid, feid)
    pos = np.minimum(pos, nv - 1)
    found = eid[pos] == feid
    faces = pos[found.all(axis=1)].astype(np.int64)
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) &
            (faces[:, 0] != faces[:, 2]))
    out = (verts.astype(np.float32), faces[good])
    return out + (overflow,) if return_overflow else out


class AutoMarcher:
    """Steady-state buffer autotuning for marching (the engine's
    ``auto_budget`` pattern): the sort/compaction cost of
    :func:`marching_tetrahedra_indexed` scales with the *static* buffer
    sizes, so each frame sizes its buffers from the previous frame's
    measured ``n_cells_total`` / ``n_tris_total`` x headroom, snapped to a
    geometric bucket ladder (one executable per bucket, compile-cached).
    The first frame and any frame after an overflow use the configured cap
    sizes, so a scene change degrades at most one frame before re-upsizing.
    """

    def __init__(self, max_cells: int = 1 << 18, max_tris: int = 1 << 20,
                 max_verts: Optional[int] = None, iso: float = 0.5,
                 headroom: float = 1.3, use_coarse: bool = True,
                 slice_one: bool = False, codec: str = "indexed",
                 virtual: bool = False, implicit_eid: bool = True):
        """``slice_one``: drop the first slice of each axis inside the
        jitted call (the engine/export grid convention,
        seg3d_lossless.py:585) instead of paying an eager slice op.

        ``codec``: the wire format :meth:`pack`/:meth:`unpack` use.
        ``"indexed"`` transfers explicit quantized verts + faces
        (:func:`pack_mesh`); ``"lattice"`` transfers marching generators
        (edge ids + fractions + cells) and rebuilds faces on host
        (:func:`pack_lattice`) — 2.4x fewer bytes, the serving default when
        the host link is the bottleneck. ``implicit_eid`` further drops the
        edge-id block from the lattice wire (another ~1.7x, wire v2 — the
        host derives the vertex list from the cell bits); a frame whose
        derived list mismatches falls back to an explicit-eid repack, so
        the option is safe to leave on.

        ``virtual``: ``__call__`` receives the engine's COARSE final grid
        (``ReconEngine(virtual_final=True)``) and marches its virtual 2x
        upsample via :func:`marching_lattice_virtual` — the dense fine grid
        never materializes. Implies codec='lattice'; slice-one semantics
        are built into the virtual lattice mapping."""
        assert codec in ("indexed", "lattice")
        assert not virtual or codec == "lattice", \
            "virtual upsample marching emits the lattice codec"
        self.virtual = virtual
        self.caps = (max_cells, max_tris,
                     max_verts or min(2 * max_tris, 1 << 21))
        self.iso = iso
        self.headroom = headroom
        self.use_coarse = use_coarse
        self.slice_one = slice_one
        self.codec = codec
        self.implicit_eid = implicit_eid
        # device [4]: (n_cells_total, n_tris_total, n_verts, n_tris) —
        # measured last frame, prefetched async, read lazily next frame
        self._last = None
        self._counts_host = None   # last LANDED counts (host ints)
        self._dims = None          # (H, W) of the marched grid, for decode
        self._jit_cache = {}

    @staticmethod
    def _bucket(want: int, cap: int) -> int:
        b = 8192
        while b < want:
            b = -(-int(b * 1.25) // 8192) * 8192
        return min(b, cap)

    def _counts(self) -> Optional[Tuple[int, int, int, int]]:
        """Counts of the last LANDED frame; blocks only once at startup
        (ReconEngine._bucket's pattern). :meth:`pack` calls this right
        after :meth:`__call__` enqueued the march, so a blocking read here
        chains every frame's Python dispatch to its own march execution —
        measured at 257^3 on a tunneled v5e: bench pipelined
        0.181 -> 0.159 s/image (and sequential latency 0.182 -> 0.157)
        with the lazy read.
        Until a newer copy lands, the previous landed counts are reused;
        the packed-buffer header still polices overflow."""
        arr = self._last
        if arr is not None:
            try:
                if self._counts_host is None or \
                        getattr(arr, "is_ready", lambda: True)():
                    self._counts_host = tuple(int(v)
                                              for v in np.asarray(arr))
                    self._last = None       # consumed; next frame re-stamps
            except Exception:
                pass
        return self._counts_host

    def _sizes(self) -> Tuple[int, int, int]:
        c = self._counts()
        if c is None:
            return self.caps
        if self.codec == "lattice":
            # lattice measures (n_cells_total, n_verts_total) directly;
            # there is no triangle buffer to size
            ncells, nverts = c[0], c[1]
            if ncells <= 0 or nverts <= 0 or ncells > self.caps[0] \
                    or nverts > self.caps[2]:
                return self.caps                   # overflow -> reset
            mc = self._bucket(int(ncells * self.headroom), self.caps[0])
            mv = self._bucket(int(nverts * self.headroom), self.caps[2])
            return mc, self.caps[1], mv
        ncells, ntris = c[0], c[1]
        if ncells <= 0 or ntris <= 0 or ncells > self.caps[0] \
                or ntris > self.caps[1]:
            return self.caps                       # overflow -> reset
        mc = self._bucket(int(ncells * self.headroom), self.caps[0])
        mt = self._bucket(int(ntris * self.headroom), self.caps[1])
        # MT produces ~1 shared vertex per 2 triangles
        mv = self._bucket(int(ntris * 0.75 * self.headroom), self.caps[2])
        return mc, mt, mv

    def __call__(self, occ: jnp.ndarray,
                 coarse_occ: Optional[jnp.ndarray] = None):
        mc, mt, mv = self._sizes()
        if self.virtual:
            # `occ` IS the coarse grid; fine dims derive from it
            Dc, Hc, Wc = occ.shape
            self._dims = (2 * Hc - 2, 2 * Wc - 2)
            out = marching_lattice_virtual(occ, iso=self.iso, max_cells=mc,
                                           max_verts=mv,
                                           max_candidates=self.caps[0])
            self._last = jnp.stack([out.n_cells_total, out.n_verts_total,
                                    out.n_verts, out.n_cells])
            try:
                self._last.copy_to_host_async()
            except Exception:
                pass
            return out
        key = (mc, mt, mv, occ.shape, coarse_occ is not None, self.codec)
        if key not in self._jit_cache:
            kernel = marching_lattice if self.codec == "lattice" \
                else marching_tetrahedra_indexed

            def fn(occ, coarse_occ, mc=mc, mt=mt, mv=mv, kernel=kernel):
                if self.slice_one:
                    occ = occ[1:, 1:, 1:]
                # the candidate (pre-exact-filter) buffer stays at the cap:
                # autotuned mc tracks the ~2.5x smaller exact mixed set, and
                # shrinking the candidate stage with it would overflow the
                # coarse expansion
                mcand = self.caps[0]
                if kernel is marching_lattice:
                    return kernel(occ, iso=self.iso, max_cells=mc,
                                  max_verts=mv, coarse_occ=coarse_occ,
                                  max_candidates=mcand)
                return kernel(
                    occ, iso=self.iso, max_cells=mc, max_tris=mt,
                    max_verts=mv, coarse_occ=coarse_occ,
                    max_candidates=mcand)
            self._jit_cache[key] = jax.jit(fn)
        d0 = 1 if self.slice_one else 0
        self._dims = (occ.shape[1] - d0, occ.shape[2] - d0)
        out = self._jit_cache[key](
            occ, coarse_occ=coarse_occ if self.use_coarse else None)
        # counts are read lazily NEXT frame (and pre-fetched async) so this
        # call never blocks — autotuning must not serialize the pipeline
        if self.codec == "lattice":
            self._last = jnp.stack([out.n_cells_total, out.n_verts_total,
                                    out.n_verts, out.n_cells])
        else:
            self._last = jnp.stack([out.n_cells_total, out.n_tris_total,
                                    out.n_verts, out.n_tris])
        try:
            self._last.copy_to_host_async()
        except Exception:
            pass
        return out

    def pack(self, out, quantize: bool = True):
        """Non-blocking device-side pack sized from the previous frame's
        measured counts x headroom (first frame: the full buffers). Returns
        a token for :meth:`unpack`; nothing here waits on the device, so a
        serving loop can enqueue the next frame's compute before blocking
        on this frame's transfer. The wire format follows ``self.codec``."""
        c = self._counts()
        if self.codec == "lattice":
            sizes = (int(c[1] * self.headroom),
                     int(c[0] * self.headroom)) if c is not None else None
            packed = pack_lattice(out, sizes=sizes,
                                  implicit_eid=self.implicit_eid)
            try:
                # start the d2h copy NOW: by unpack time (a frame later in
                # a pipelined loop) the bytes are already host-side, so the
                # blocking fetch pays only the decode (measured: the copy
                # otherwise starts at np.asarray and strictly serializes
                # with the next frame's compute on the tunneled link)
                packed[0].copy_to_host_async()
            except Exception:
                pass
            return packed, out, self._dims
        sizes = (int(c[2] * self.headroom), int(c[3] * self.headroom)) \
            if c is not None else None
        packed = pack_mesh(out, quantize=quantize, sizes=sizes)
        try:
            packed[0].copy_to_host_async()  # see the lattice branch
        except Exception:
            pass
        return packed, out, quantize

    def unpack(self, token) -> Tuple[np.ndarray, np.ndarray]:
        """Blocking transfer + decode of a :meth:`pack` token. If the scene
        grew past the hinted sizes (header counts exceed the packed sizes)
        the mesh re-packs at full buffer size and transfers again — one
        extra copy on that rare frame instead of a silent truncation."""
        if self.codec == "lattice":
            packed, out, (H, W) = token
            verts, faces, overflow = decode_lattice(packed, H, W,
                                                    return_overflow=True)
            if overflow:
                verts, faces = decode_lattice(pack_lattice(out), H, W)
            return verts, faces
        packed, out, quantize = token
        verts, faces, overflow = unpack_mesh(packed, quantize=quantize,
                                             return_overflow=True)
        if overflow:
            verts, faces = unpack_mesh(
                pack_mesh(out, quantize=quantize), quantize=quantize)
        return verts, faces


def marching_tetrahedra(occ: jnp.ndarray, iso: float = 0.5,
                        max_cells: int = 1 << 18,
                        max_tris: int = 1 << 20):
    """Triangle-soup compatibility wrapper: returns
    (tri_verts [max_tris, 3, 3], tri_mask [max_tris], n_cells, n_tris)."""
    out = marching_tetrahedra_indexed(occ, iso, max_cells=max_cells,
                                      max_tris=max_tris,
                                      max_verts=min(2 * max_tris, 1 << 21))
    tri = jnp.stack([out.verts_x[out.faces], out.verts_y[out.faces],
                     out.verts_z[out.faces]], axis=-1)   # [mt, 3, 3]
    mask = jnp.arange(out.faces.shape[0]) < out.n_tris
    tri = jnp.where(mask[:, None, None], tri, 0.0)
    return tri, mask, out.n_cells, out.n_tris


@functools.lru_cache(maxsize=64)
def _pack_fn(nv: int, nt: int, quantize: bool):
    """Jitted packer for bucketed (nv, nt) sizes — eager per-op dispatch on
    the tunneled device costs ~20 ms each, so the pack must be ONE
    executable; bucketing the sizes keeps the executable count small and
    lets stable scenes reuse one compile.

    The TRUE counts ride the buffer as a 2-word header written on device,
    so packing never reads a device scalar back to the host (two blocking
    ``int(out.n_verts)``-style round trips on the tunneled link cost
    ~50-80 ms per frame and serialized the serving pipeline on every
    frame's marching pass — measured in scripts/profile_human_frame.py)."""

    def pack(vx, vy, vz, faces, counts):
        vx = jax.lax.slice(vx, (0,), (nv,))
        vy = jax.lax.slice(vy, (0,), (nv,))
        vz = jax.lax.slice(vz, (0,), (nv,))
        f = jax.lax.slice(faces, (0, 0), (nt, 3))
        if not quantize:
            return jnp.concatenate([
                jax.lax.bitcast_convert_type(counts, jnp.float32),
                vx, vy, vz,
                jax.lax.bitcast_convert_type(f.reshape(-1), jnp.float32)])

        def q(v):
            return jnp.clip(jnp.round(v * 64.0), 0, 65535).astype(jnp.int32)

        xq, yq, zq = q(vx), q(vy), q(vz)
        w_xy = xq | (yq << 16)
        zpad = jnp.concatenate([zq, jnp.zeros((nv % 2,), jnp.int32)])
        w_zz = zpad[0::2] | (zpad[1::2] << 16)
        f0, f1, f2 = f[:, 0], f[:, 1], f[:, 2]
        w0 = f0 | ((f1 & 0x7FF) << 21)
        w1 = (f1 >> 11) | (f2 << 10)
        return jnp.concatenate([counts, w_xy, w_zz, w0, w1])

    return jax.jit(pack)


def pack_mesh(out: MarchOut, quantize: bool = True, bucket: int = 16384,
              sizes: Optional[Tuple[int, int]] = None):
    """Device-side packing of the compact mesh into ONE int32 buffer for a
    single host transfer (the tunneled host link here moves ~20 MB/s, so
    bytes are the cost). Returns ``(packed device array, nvb, ntb)`` — the
    transfer itself happens in :func:`unpack_mesh`, so callers can enqueue
    the next frame's compute before blocking on the copy. The true counts
    travel inside the buffer (2-word device-written header), so this call
    never blocks on the device.

    ``sizes``: static (n_verts, n_tris) upper bounds to pack, e.g. the
    previous frame's measured counts x headroom (:meth:`AutoMarcher.pack`).
    ``None`` packs the full buffers — always correct, ~1.3-2x more bytes on
    a steady scene. If the true counts exceed ``sizes`` the transfer is
    truncated; :func:`unpack_mesh` detects this from the header
    (``return_overflow=True``) and the caller re-packs at full size.

    ``quantize``: verts as 10.6 fixed point (uint16 per coordinate, max grid
    1023, error <= 1/128 voxel — at 256^3 that is 6e-5 in world units) and
    faces as 2x21-bit packed indices: 6 B/vertex + 8 B/face instead of
    12 B each, ~1.7x fewer bytes end to end. ``quantize=False`` transfers
    exact float32 coords + int32 faces.

    Counts round up to ``bucket`` so the jitted packer compiles once per
    size class; the decoder drops the padding via the header counts.
    """
    cap_v = out.verts_x.shape[0]
    cap_t = out.faces.shape[0]
    if quantize:
        assert cap_v <= (1 << 21), "21-bit face index packing"
    want_v, want_t = sizes if sizes is not None else (cap_v, cap_t)
    if want_v <= 0 or want_t <= 0:          # unknown -> full buffers
        want_v, want_t = cap_v, cap_t
    nvb = min(-(-want_v // bucket) * bucket, cap_v)
    ntb = min(-(-want_t // bucket) * bucket, cap_t)
    counts = jnp.stack([out.n_verts, out.n_tris]).astype(jnp.int32)
    packed = _pack_fn(nvb, ntb, quantize)(out.verts_x, out.verts_y,
                                          out.verts_z, out.faces, counts)
    return packed, nvb, ntb


def unpack_mesh(packed, quantize: bool = True, return_overflow: bool = False):
    """Blocking host transfer + decode of a :func:`pack_mesh` buffer.
    Returns ``(verts [V, 3] f32, faces [F, 3] i64)`` — plus an overflow
    flag with ``return_overflow`` (true counts exceeded the packed sizes:
    the mesh is truncated; re-pack with larger ``sizes``)."""
    empty = (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
    if packed is None:
        return empty + (False,) if return_overflow else empty
    buf, nvb, ntb = packed
    host = np.asarray(buf)
    hdr = host[:2].view(np.int32)
    nv_true, nt_true = int(hdr[0]), int(hdr[1])
    overflow = nv_true > nvb or nt_true > ntb
    nv = min(nv_true, nvb)
    nt = min(nt_true, ntb)
    host = host[2:]
    if nv == 0 or nt == 0:
        return empty + (overflow,) if return_overflow else empty
    if not quantize:
        vx = host[:nvb][:nv]
        vy = host[nvb:2 * nvb][:nv]
        vz = host[2 * nvb:3 * nvb][:nv]
        faces = host[3 * nvb:].view(np.int32).reshape(-1, 3)[:nt]
        verts = np.stack([vx, vy, vz], axis=-1).astype(np.float32)
    else:
        u = host.view(np.uint32)
        w_xy = u[:nvb][:nv]
        nz = (nvb + 1) // 2
        w_zz = u[nvb:nvb + nz]
        x = (w_xy & 0xFFFF).astype(np.float32) / 64.0
        y = (w_xy >> 16).astype(np.float32) / 64.0
        zfull = np.empty(nz * 2, np.float32)
        zfull[0::2] = (w_zz & 0xFFFF).astype(np.float32) / 64.0
        zfull[1::2] = (w_zz >> 16).astype(np.float32) / 64.0
        verts = np.stack([x, y, zfull[:nv]], axis=-1)
        w0 = u[nvb + nz:nvb + nz + ntb][:nt]
        w1 = u[nvb + nz + ntb:][:nt]
        f0 = w0 & 0x1FFFFF
        f1 = (w0 >> 21) | ((w1 & 0x3FF) << 11)
        f2 = w1 >> 10
        faces = np.stack([f0, f1, f2], axis=-1).astype(np.int64)
    # a truncated vertex table can leave face indices past nv: drop those
    # faces (the caller re-packs anyway when overflow is reported)
    if overflow:
        faces = faces[(faces < nv).all(axis=1)]
    # drop degenerate faces (dedup can merge a triangle's vertices when the
    # iso value sits exactly on a lattice vertex)
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) &
            (faces[:, 0] != faces[:, 2]))
    out = (verts, faces[good].astype(np.int64))
    return out + (overflow,) if return_overflow else out


def fetch_mesh(out: MarchOut,
               quantize: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """pack + transfer + decode in one call (see pack_mesh/unpack_mesh;
    split them to overlap the host copy with the next frame's compute)."""
    return unpack_mesh(pack_mesh(out, quantize=quantize), quantize=quantize)


def dedup_triangle_soup(tri_verts: np.ndarray, tri_mask: np.ndarray):
    """Host-side exact dedup of a triangle soup into (verts [V,3],
    faces [F,3]) — kept for tests and CPU paths."""
    tris = np.asarray(tri_verts)[np.asarray(tri_mask)]
    flat = tris.reshape(-1, 3)
    uniq, inv = np.unique(flat.view([("x", np.float32), ("y", np.float32),
                                     ("z", np.float32)]),
                          return_inverse=True)
    verts = np.stack([uniq["x"], uniq["y"], uniq["z"]], axis=-1)
    faces = inv.reshape(-1, 3).astype(np.int64)
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) &
            (faces[:, 0] != faces[:, 2]))
    return verts, faces[good]
