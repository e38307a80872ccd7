"""On-device iso-surface extraction via vectorized marching tetrahedra.

Replaces the reference's CPU PyMCubes / kaolin ``voxelgrids_to_trianglemeshes``
(lib/common/seg3d_lossless.py:583-604) — the reference falls back to CPU above
256^3 because GPU MC needs >9 GB there; this implementation stays on device at
512^3 by never materializing per-cell triangle buffers:

1. **Active cells**: one pass over the grid marks cells whose 8 corners mix
   inside/outside; a cumsum-compaction (no data-dependent shapes) packs the
   first ``max_cells`` linear indices into a fixed buffer.
2. **Valid triangles**: each cell spawns 6 tetrahedra (Kuhn subdivision);
   per-tet sign cases index a table generated *programmatically* at import
   (including winding orientation, checked geometrically at build time), so
   triangle validity is a cheap lookup. A second cumsum-compaction packs
   valid (cell, slot) pairs into a fixed ``max_tris`` buffer.
3. **Vertex interpolation** runs only on compacted triangles: gather the two
   cube-corner endpoints of each tet edge and lerp to the iso value.

Output is a triangle soup ``(tri_verts [max_tris, 3, 3], valid [max_tris])``
in grid coordinates (x, y, z); shared edge vertices are bitwise identical
across cells, so exact dedup on host is lossless. Faces wind
counter-clockwise seen from outside (occ < iso side).
"""

from __future__ import annotations

import functools
from typing import Tuple

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

_TET_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _build_tet_tables() -> Tuple[np.ndarray, np.ndarray]:
    """Per-(tet, case) triangle table.

    Returns:
      tri_corners: [6, 16, 2, 3, 2] int32 — for each tet id and 4-bit inside
        case, up to two triangles; each vertex is a (cornerA, cornerB) pair of
        *cube* corner indices whose connecting edge holds the vertex; -1 pads.
      tri_valid: [6, 16, 2] bool.
    """
    tri_corners = np.full((6, 16, 2, 3, 2), -1, np.int32)
    tri_valid = np.zeros((6, 16, 2), bool)

    for t, tet in enumerate(_TETS):
        pos = _CORNER_OFF[tet].astype(np.float64)      # [4, 3]
        for case in range(1, 15):
            inside = [i for i in range(4) if case & (1 << i)]
            outside = [i for i in range(4) if not case & (1 << i)]

            def cross_edges(ins, outs):
                return [(i, o) for i in ins for o in outs]

            tris = []
            if len(inside) == 1:
                i = inside[0]
                e = cross_edges([i], outside)           # 3 edges
                tris = [(e[0], e[1], e[2])]
            elif len(inside) == 3:
                o = outside[0]
                e = cross_edges(inside, [o])
                tris = [(e[0], e[1], e[2])]
            else:  # 2-2: quad over 4 cross edges
                i0, i1 = inside
                o0, o1 = outside
                a, b, c, d = ((i0, o0), (i0, o1), (i1, o1), (i1, o0))
                tris = [(a, b, c), (a, c, d)]

            outward = (pos[outside].mean(0) - pos[inside].mean(0))
            for k, tri in enumerate(tris):
                mids = np.array([(pos[i] + pos[o]) / 2 for i, o in tri])
                n = np.cross(mids[1] - mids[0], mids[2] - mids[0])
                v0, v1, v2 = tri
                if np.dot(n, outward) < 0:
                    v1, v2 = v2, v1
                # map local tet vertex ids to cube corner ids
                tri_corners[t, case, k, 0] = (tet[v0[0]], tet[v0[1]])
                tri_corners[t, case, k, 1] = (tet[v1[0]], tet[v1[1]])
                tri_corners[t, case, k, 2] = (tet[v2[0]], tet[v2[1]])
                tri_valid[t, case, k] = True
    return tri_corners, tri_valid


_TRI_CORNERS, _TRI_VALID = _build_tet_tables()


def _compact_indices(mask_flat: jnp.ndarray, budget: int):
    """Pack indices of true entries into a fixed-size buffer (first `budget`
    in linear order). Returns (idx [budget] int32, count int32)."""
    pos = jnp.cumsum(mask_flat.astype(jnp.int32)) - 1
    take = mask_flat & (pos < budget)
    scatter_to = jnp.where(take, pos, budget)          # drop overflow
    src = jnp.arange(mask_flat.shape[0], dtype=jnp.int32)
    idx = jnp.zeros((budget,), jnp.int32).at[scatter_to].set(
        src, mode="drop")
    count = jnp.minimum(pos[-1] + 1, budget)
    return idx, count


@functools.partial(jax.jit, static_argnames=("max_cells", "max_tris"))
def marching_tetrahedra(occ: jnp.ndarray, iso: float = 0.5,
                        max_cells: int = 1 << 18,
                        max_tris: int = 1 << 20):
    """Extract the iso-surface triangle soup of ``occ [D, H, W]`` (z, y, x
    layout).

    Returns:
      tri_verts: ``[max_tris, 3, 3]`` float32 (x, y, z) in grid coords.
      tri_mask: ``[max_tris]`` bool.
      n_cells, n_tris: int32 true counts (for overflow detection).
    """
    D, H, W = occ.shape
    inside = occ > iso

    # ---- 1. active cells --------------------------------------------------
    def corner(arr, c):
        dx, dy, dz = _CORNER_OFF[c]
        return arr[dz:dz + D - 1, dy:dy + H - 1, dx:dx + W - 1]

    cnt = sum(corner(inside, c).astype(jnp.int32) for c in range(8))
    active = (cnt > 0) & (cnt < 8)                      # [D-1, H-1, W-1]
    cell_idx, n_cells = _compact_indices(active.reshape(-1), max_cells)

    cw, ch = W - 1, H - 1
    cz = cell_idx // (ch * cw)
    cy = (cell_idx // cw) % ch
    cx = cell_idx % cw

    # corner values per selected cell: [max_cells, 8]
    occ_flat = occ.reshape(-1)
    lin = ((cz[:, None] + _CORNER_OFF[:, 2][None]) * H +
           (cy[:, None] + _CORNER_OFF[:, 1][None])) * W + \
        (cx[:, None] + _CORNER_OFF[:, 0][None])
    cvals = occ_flat[lin]                               # [max_cells, 8]
    cbits = (cvals > iso).astype(jnp.int32)

    # ---- 2. valid triangle slots ------------------------------------------
    # per-tet case: [max_cells, 6]
    tet_bits = cbits[:, _TETS]                          # [max_cells, 6, 4]
    case = (tet_bits * jnp.array([1, 2, 4, 8])).sum(-1)  # [max_cells, 6]
    valid_tbl = jnp.asarray(_TRI_VALID)                 # [6, 16, 2]
    slot_valid = valid_tbl[jnp.arange(6)[None, :], case]  # [mc, 6, 2]
    # dead cells (idx buffer padding beyond n_cells) must not emit
    alive = (jnp.arange(max_cells) < n_cells)[:, None, None]
    slot_valid = slot_valid & alive

    tri_slot_idx, n_tris = _compact_indices(slot_valid.reshape(-1), max_tris)
    t_cell = tri_slot_idx // 12
    t_tet = (tri_slot_idx // 2) % 6
    t_k = tri_slot_idx % 2

    # ---- 3. vertex interpolation on compacted triangles -------------------
    corners_tbl = jnp.asarray(_TRI_CORNERS)             # [6, 16, 2, 3, 2]
    t_case = case[t_cell, t_tet]
    pair = corners_tbl[t_tet, t_case, t_k]              # [max_tris, 3, 2]
    ca, cb = pair[..., 0], pair[..., 1]                 # cube corner ids

    v_a = jnp.take_along_axis(cvals[t_cell], ca, axis=1)  # [max_tris, 3]
    v_b = jnp.take_along_axis(cvals[t_cell], cb, axis=1)
    denom = v_b - v_a
    t = jnp.where(jnp.abs(denom) < 1e-12, 0.5, (iso - v_a) / denom)
    t = jnp.clip(t, 0.0, 1.0)

    off = jnp.asarray(_CORNER_OFF, occ.dtype)           # [8, 3]
    base = jnp.stack([cx[t_cell], cy[t_cell], cz[t_cell]],
                     axis=-1).astype(occ.dtype)
    p_a = base[:, None, :] + off[ca]                    # [max_tris, 3, 3]
    p_b = base[:, None, :] + off[cb]
    tri_verts = p_a + t[..., None] * (p_b - p_a)

    tri_mask = jnp.arange(max_tris) < n_tris
    tri_verts = jnp.where(tri_mask[:, None, None], tri_verts, 0.0)
    return tri_verts, tri_mask, n_cells, n_tris


def dedup_triangle_soup(tri_verts: np.ndarray, tri_mask: np.ndarray):
    """Host-side exact dedup of the triangle soup into (verts [V,3],
    faces [F,3]). Shared vertices are bitwise identical by construction."""
    tris = np.asarray(tri_verts)[np.asarray(tri_mask)]
    flat = tris.reshape(-1, 3)
    uniq, inv = np.unique(flat.view([("x", np.float32), ("y", np.float32),
                                     ("z", np.float32)]),
                          return_inverse=True)
    verts = np.stack([uniq["x"], uniq["y"], uniq["z"]], axis=-1)
    faces = inv.reshape(-1, 3).astype(np.int64)
    # drop degenerate faces (repeated vertex after dedup)
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) &
            (faces[:, 0] != faces[:, 2]))
    return verts, faces[good]
