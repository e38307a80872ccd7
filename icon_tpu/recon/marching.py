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


@functools.partial(jax.jit, static_argnames=("max_cells", "max_tris",
                                             "max_verts"))
def marching_tetrahedra_indexed(occ: jnp.ndarray, iso: float = 0.5,
                                max_cells: int = 1 << 18,
                                max_tris: int = 1 << 20,
                                max_verts: int = 1 << 19,
                                coarse_occ: Optional[jnp.ndarray] = None
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
    inside = occ > iso
    cw, ch = W - 1, H - 1

    # ---- 1. active cells --------------------------------------------------
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
        nc_budget = max_cells // 8
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
        cx = jnp.clip(fx, 0, cw - 1).reshape(-1)
        cy = jnp.clip(fy, 0, ch - 1).reshape(-1)
        cz = jnp.clip(fz, 0, D - 2).reshape(-1)
        cell_idx = (cz * ch + cy) * cw + cx
        alive_cells = valid.reshape(-1)
        n_cells = jnp.sum(alive_cells.astype(jnp.int32))
        # each dropped mixed coarse cell hides up to 8 fine candidates —
        # count them so callers see coarse-candidate overflow
        n_cells_total = n_cells + 8 * jnp.maximum(n_mixed_total - nc_budget,
                                                  0)

    occ_flat = occ.reshape(-1)
    lin = ((cz[:, None] + _CORNER_OFF[:, 2][None]) * H +
           (cy[:, None] + _CORNER_OFF[:, 1][None])) * W + \
        (cx[:, None] + _CORNER_OFF[:, 0][None])
    cvals = occ_flat[lin]                               # [NC, 8]
    cbits = (cvals > iso).astype(jnp.int32)

    # ---- 2. dense per-cell table application (one-hot matmuls) ------------
    tet_bits = cbits[:, _TETS]                          # [NC, 6, 4]
    case = (tet_bits * jnp.array([1, 2, 4, 8])).sum(-1)  # [NC, 6]
    onehot = jax.nn.one_hot(case, 16, dtype=dt)         # [NC, 6, 16]

    sel_a = jnp.asarray(_SEL_A.reshape(6, 16, 48))      # 2*3*8 = 48
    sel_b = jnp.asarray(_SEL_B.reshape(6, 16, 48))
    # W*: [NC, 6, 48] -> [NC, 36, 8]  (vertex-slot axis = tet*6 + k*3 + j)
    Wa = jnp.einsum("nte,tew->ntw", onehot, sel_a,
                    preferred_element_type=dt).reshape(-1, 36, 8)
    Wb = jnp.einsum("nte,tew->ntw", onehot, sel_b,
                    preferred_element_type=dt).reshape(-1, 36, 8)

    va = jnp.einsum("nsc,nc->ns", Wa, cvals)            # [NC, 36]
    vb = jnp.einsum("nsc,nc->ns", Wb, cvals)

    offs = jnp.asarray(_CORNER_OFF.astype(np.float32))  # [8, 3]
    ax = Wa @ offs[:, 0]
    ay = Wa @ offs[:, 1]
    az = Wa @ offs[:, 2]
    bx = Wb @ offs[:, 0]
    by = Wb @ offs[:, 1]
    bz = Wb @ offs[:, 2]

    denom = vb - va
    t = jnp.where(jnp.abs(denom) < 1e-12, 0.5, (iso - va) / denom)
    t = jnp.clip(t, 0.0, 1.0)                           # [NC, 36]

    px = cx[:, None].astype(dt) + ax + t * (bx - ax)
    py = cy[:, None].astype(dt) + ay + t * (by - ay)
    pz = cz[:, None].astype(dt) + az + t * (bz - az)

    # exact lattice-edge id per vertex slot (for dedup): every MT vertex lies
    # on the edge (corner_a, corner_b) of its cell; global id =
    # lattice_vertex_id(min end) * 8 + direction code (dx + 2dy + 4dz).
    ca_off_x = Wa @ offs[:, 0]
    ga_x = cx[:, None] + ca_off_x.astype(jnp.int32)
    ga_y = cy[:, None] + (Wa @ offs[:, 1]).astype(jnp.int32)
    ga_z = cz[:, None] + (Wa @ offs[:, 2]).astype(jnp.int32)
    gb_x = cx[:, None] + (Wb @ offs[:, 0]).astype(jnp.int32)
    gb_y = cy[:, None] + (Wb @ offs[:, 1]).astype(jnp.int32)
    gb_z = cz[:, None] + (Wb @ offs[:, 2]).astype(jnp.int32)
    a_lin = (ga_z * H + ga_y) * W + ga_x
    b_lin = (gb_z * H + gb_y) * W + gb_x
    lo = jnp.minimum(a_lin, b_lin)
    dx = jnp.abs(gb_x - ga_x)
    dy = jnp.abs(gb_y - ga_y)
    dz = jnp.abs(gb_z - ga_z)
    dir_code = dx + 2 * dy + 4 * dz                     # in [1, 7]
    edge_id = lo * 8 + dir_code                         # [NC, 36] int32

    # ---- 3. triangle validity + compaction ---------------------------------
    valid_tbl = jnp.asarray(_TRI_VALID)                 # [6, 16, 2]
    slot_valid = jnp.einsum("nte,tek->ntk", onehot,
                            valid_tbl.astype(dt)) > 0.5  # [NC, 6, 2]
    slot_valid = (slot_valid &
                  alive_cells[:, None, None]).reshape(-1)  # [NC*12]

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
    M = max_tris * 3
    keys = teid.reshape(-1)                              # [M]
    order = jnp.argsort(keys)
    sk = keys[order]
    sx = tvx.reshape(-1)[order]
    sy = tvy.reshape(-1)[order]
    sz = tvz.reshape(-1)[order]

    first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    first = first & (sk != 2 ** 31 - 1)
    vid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1  # [M]
    n_verts = jnp.maximum(vid_sorted[-1] + 1, 0)

    # gather-formulation of the vertex table: positions of first
    # occurrences compact into [max_verts], then verts come as gathers
    # (TPU gathers beat 3 large scatters)
    vpos, _, _ = _compact_indices(first, max_verts)
    verts_x = sx[vpos]
    verts_y = sy[vpos]
    verts_z = sz[vpos]

    # faces: scatter sorted vertex ids back to original soup order
    soup_vid = jnp.zeros((M,), jnp.int32).at[order].set(vid_sorted)
    faces = soup_vid.reshape(-1, 3)
    faces = jnp.where(tri_alive[:, None], faces, 0)

    return MarchOut(verts_x, verts_y, verts_z, faces,
                    jnp.minimum(n_verts, max_verts), n_tris,
                    n_cells, n_tris_total, n_cells_total)


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


def fetch_mesh(out: MarchOut) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal-transfer host fetch: slices the compact buffers to their true
    sizes and moves ONE packed buffer over the (slow) host link — each
    separate np.asarray costs a ~30 ms round trip on the tunneled device.
    Face indices bitcast to float32 losslessly."""
    nv = int(out.n_verts)
    nt = int(out.n_tris)
    if nv == 0 or nt == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    packed = jnp.concatenate([
        jax.lax.slice(out.verts_x, (0,), (nv,)),
        jax.lax.slice(out.verts_y, (0,), (nv,)),
        jax.lax.slice(out.verts_z, (0,), (nv,)),
        jax.lax.bitcast_convert_type(
            jax.lax.slice(out.faces, (0, 0), (nt, 3)).reshape(-1),
            jnp.float32)])
    host = np.asarray(packed)
    vx, vy, vz = host[:nv], host[nv:2 * nv], host[2 * nv:3 * nv]
    faces = host[3 * nv:].view(np.int32).reshape(-1, 3)
    verts = np.stack([vx, vy, vz], axis=-1)
    # drop degenerate faces (dedup can merge a triangle's vertices when the
    # iso value sits exactly on a lattice vertex)
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) &
            (faces[:, 0] != faces[:, 2]))
    return verts.astype(np.float32), faces[good].astype(np.int64)


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
