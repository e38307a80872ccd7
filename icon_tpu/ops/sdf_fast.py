"""Production point->body-mesh feature kernel (the ICON hot path).

The exact sweep in ops/sdf.py is O(N·F) VPU work — at the recon engine's
~500k boundary points against SMPL-X's ~20k faces that's ~10^10 point-face
pairs per frame. This module reformulates it TPU-first:

1. **Nearest vertices ride the MXU**: squared distances to all V vertices are
   one ``points @ verts.T`` matmul per point chunk (plus norms), then
   ``top_k`` picks k nearest vertices. 500k x 10k matmul = 30 GFLOP ->
   milliseconds on the MXU, vs ~1 TFLOP of VPU work for the brute sweep.
2. **Exact distance on a candidate set**: the true closest triangle is (with
   overwhelming probability on a body mesh) incident to one of the k nearest
   vertices; candidates come from a precomputed vertex->incident-face table
   (host, static). Exact point-triangle distance runs only on k*deg ~ 16
   candidates per point (k=2, deg=8 measures exact to ~1e-7 against the full
   sweep on body meshes; k=1 admits rare 3e-4 outliers).
3. **Sign via +z ray-crossing parity over host-binned xy tiles** (when the
   caller supplies ray bins; see build_ray_bins) — the reference's exact
   ``check_sign`` semantics (mesh_util.py:393), correct under
   self-contact, ~20 mul/add per candidate face and no transcendentals.
   A clustered fast-winding evaluation (build_winding_clusters) is kept
   as a z-agnostic near-exact alternative; without either, a clamped
   pseudo-normal test (lib/dataset/hoppeMesh.py:73-116 construction)
   signs as a fallback.

**TPU layout**: all per-candidate math is structure-of-arrays ``[N, C]``
planes (point axis in sublanes, candidate axis in lanes) — a ``[N, C, 3, 3]``
AoS tensor would be tile-padded 3->128 by the TPU layout (tens of GB at
recon-engine point counts).

Feature outputs (sdf/normal/cmap/vis) match ``cal_sdf_batch``
(mesh_util.py:357-396) including the (-1, 1, -1) normal flip and the 0.1
visibility threshold.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from icon_tpu.ops.mesh import vertex_normals


def build_vertex_face_table(faces: np.ndarray, n_verts: int,
                            max_degree: int = 8) -> np.ndarray:
    """Host-precomputed ``[V, max_degree]`` incident-face ids (padded by
    repeating the first incident face; isolated vertices get face 0)."""
    faces = np.asarray(faces)
    table = np.zeros((n_verts, max_degree), np.int32)
    counts = np.zeros(n_verts, np.int32)
    for fi, tri in enumerate(faces):
        for v in tri:
            c = counts[v]
            if c < max_degree:
                table[v, c] = fi
                counts[v] = c + 1
    for v in range(n_verts):
        c = max(counts[v], 1)
        table[v, c:] = table[v, 0]
    return table


@functools.partial(jax.jit, static_argnames=("k", "point_chunk", "approx"))
def _nearest_vertices(points: jnp.ndarray, verts: jnp.ndarray,
                      k: int = 4, point_chunk: int = 16384,
                      approx: bool = True) -> jnp.ndarray:
    """Indices ``[N, k]`` of the k nearest vertices per point (MXU matmul).

    ``approx`` uses the TPU-native ``approx_max_k`` (1.9x faster than the
    exact sort at k=2 on v5e, measured 99.999% top-1 agreement on body
    meshes); the union of incident-face candidates absorbs a rare swapped
    neighbor, and the exact-distance step downstream is unaffected.

    ``ICON_TPU_PALLAS=1`` swaps in the fused Pallas kernel
    (ops/pallas/knn.py) on a TPU backend. Opt-IN because the winner is
    context-dependent (measured on v5e, 98k points x 10.5k verts): called
    standalone, XLA spills the [chunk, V] distance matrix to HBM and the
    Pallas kernel is 3.7x faster (58 -> 16 ms, exact top-1 vs
    approx_max_k's 0.83 on random clouds); inside the recon engine's jit,
    XLA fuses the reduction into the matmul consumer and beats the
    VPU-bound kernel (engine 26.9 -> 18.6 fps with Pallas). The bench
    perf gate catches either choice regressing."""
    import os
    if approx and k <= 8 and os.environ.get("ICON_TPU_PALLAS", "0") == "1" \
            and jax.default_backend() == "tpu":
        try:
            from icon_tpu.ops.pallas.knn import nearest_vertices_pallas
            return nearest_vertices_pallas(points, verts, k=k)
        except Exception:
            pass                        # fall through to the XLA path
    N = points.shape[0]
    pc = min(point_chunk, max(N, 1))
    n_pad = (-N) % pc
    pts = jnp.concatenate(
        [points, jnp.zeros((n_pad, 3), points.dtype)]).reshape(-1, pc, 3)
    v_norm2 = jnp.sum(verts * verts, axis=-1)           # [V]

    def block(_, p):
        d2 = v_norm2[None] - 2.0 * (p @ verts.T)        # [pc, V] (+|p|² const)
        if approx:
            _, idx = jax.lax.approx_max_k(-d2, k)
        else:
            _, idx = jax.lax.top_k(-d2, k)
        return None, idx.astype(jnp.int32)

    _, idx = jax.lax.scan(block, None, pts)
    return idx.reshape(-1, k)[:N]


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


# ---------------------------------------------------------------------------
# Device fast winding numbers (secondary sign path).
#
# Generalized winding numbers in the spirit of Barill et al. 2018: faces
# are grouped into K *equal-size* spatially-compact clusters (balanced k-d
# splits => static shapes, no padding waste); each point evaluates the
# exact van Oosterom-Strackee solid angle for its m nearest clusters and a
# dipole approximation A_k.(c_k - p)/4pi|c_k - p|^3 for the rest. For
# SMPL-X (~21k faces, K=256, m=16) that is ~1k triangle evaluations per
# point instead of 21k — dense [chunk, m, M] VPU math.
#
# Winding counts *wraps*: in self-overlap regions of a posed body
# (interpenetrating thighs, w = 2) it reads "inside" where the reference's
# kaolin ``check_sign`` ray parity reads "outside". The parity paths above
# are the production reference-semantics sign; this stays as a z-agnostic
# alternative (and the geometric ground truth when overlap should count as
# flesh).
# ---------------------------------------------------------------------------


def build_winding_clusters(verts: np.ndarray, faces: np.ndarray,
                           n_clusters: int = 256
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Host precompute: balanced k-d face clustering for the posed body.

    Returns (cluster_faces [K, M] int32, cluster_mask [K, M] bool) with
    K*M >= F, balanced (M = ceil(F/K)); padding slots mask out.
    Recompute per posed body (clusters follow vertex positions).

    Clusters are built by recursive median splits along the widest axis
    (balanced k-d partition) rather than Morton-order slicing: Morton
    runs can snake across the body and produce spatially *elongated*
    clusters whose bounding spheres overlap many query points, which both
    blows up the dipole far-field (centroid distance ~ 0) and exhausts
    the ``m_near`` exact-evaluation budget (measured on a posed body:
    141/32768 wrong signs near the surface at K=256, m=16 with Morton;
    0 with k-d splits at half the m budget)."""
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    cent = verts[faces].mean(1)
    F = len(faces)
    K = 1 << max(int(np.ceil(np.log2(min(n_clusters, F)))), 0)
    M = -(-F // K)

    groups = [np.arange(F, dtype=np.int32)]
    while len(groups) < K:
        nxt = []
        for g in groups:
            c = cent[g]
            axis = int(np.argmax(c.max(0) - c.min(0)))
            half = len(g) // 2
            part = np.argpartition(c[:, axis], half)
            nxt.append(g[part[:half]])
            nxt.append(g[part[half:]])
        groups = nxt

    cluster_faces = np.zeros((K, M), np.int32)
    mask = np.zeros((K, M), bool)
    for i, g in enumerate(groups):
        cluster_faces[i, :len(g)] = g
        mask[i, :len(g)] = True
    return cluster_faces, mask


def fast_winding(points: jnp.ndarray, verts: jnp.ndarray,
                 faces: jnp.ndarray, cluster_faces: jnp.ndarray,
                 cluster_mask: jnp.ndarray, m_near: int = 16,
                 chunk: int = 2048) -> jnp.ndarray:
    """Generalized winding number [N] of ``points [N, 3]`` wrt the mesh
    (inside ~ 1): exact solid angles for each point's ``m_near`` nearest
    clusters, dipole far field for the rest."""
    tri = verts[faces]                                   # [F, 3, 3]
    ctri = tri[cluster_faces]                            # [K, M, 3, 3]
    msk = cluster_mask[..., None]
    e1 = ctri[:, :, 1] - ctri[:, :, 0]
    e2 = ctri[:, :, 2] - ctri[:, :, 0]
    an = 0.5 * jnp.cross(e1, e2) * msk                   # [K, M, 3]
    A = an.sum(1)                                        # [K, 3] dipoles
    fc = ctri.mean(2) * msk                              # [K, M, 3]
    cnt = jnp.maximum(cluster_mask.sum(1, keepdims=True), 1)
    cent = fc.sum(1) / cnt                               # [K, 3]
    # conservative bounding radius: farthest triangle corner from the
    # centroid — Morton clusters can be spatially elongated, so near-
    # cluster selection must rank by distance to the bounding sphere,
    # not the centroid (a centroid-far cluster may still touch the point)
    corner_d = jnp.linalg.norm(
        ctri - cent[:, None, None], axis=-1)             # [K, M, 3]
    radius = (corner_d * msk[..., 0:1]).max((1, 2))      # [K]

    K, M = cluster_faces.shape
    m = min(m_near, K)

    def body(p):                                         # [c, 3]
        rel = cent[None] - p[:, None]                    # [c, K, 3]
        d2 = jnp.maximum(jnp.sum(rel * rel, -1), 1e-12)  # [c, K]
        w_dip = jnp.einsum("ckj,kj->ck", rel, A) / \
            (4.0 * jnp.pi * d2 * jnp.sqrt(d2))
        gap = jnp.sqrt(d2) - radius[None]                # [c, K]
        _, idx = jax.lax.top_k(-gap, m)                  # [c, m]

        t = ctri[idx]                                    # [c, m, M, 3, 3]
        va = t[..., 0, :] - p[:, None, None]
        vb = t[..., 1, :] - p[:, None, None]
        vc = t[..., 2, :] - p[:, None, None]
        la = jnp.linalg.norm(va, axis=-1)
        lb = jnp.linalg.norm(vb, axis=-1)
        lc = jnp.linalg.norm(vc, axis=-1)
        num = jnp.einsum("cmfj,cmfj->cmf", va, jnp.cross(vb, vc))
        den = (la * lb * lc
               + jnp.einsum("cmfj,cmfj->cmf", va, vb) * lc
               + jnp.einsum("cmfj,cmfj->cmf", vb, vc) * la
               + jnp.einsum("cmfj,cmfj->cmf", vc, va) * lb)
        omega = jnp.arctan2(num, den) * cluster_mask[idx]
        w_exact = omega.sum(-1) / (2.0 * jnp.pi)         # [c, m]

        w_dip_sel = jnp.take_along_axis(w_dip, idx, 1)   # [c, m]
        return w_dip.sum(-1) + (w_exact - w_dip_sel).sum(-1)

    N = points.shape[0]
    c = min(chunk, max(N, 1))
    pad = (-N) % c
    pts = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)])
    w = jax.lax.map(body, pts.reshape(-1, c, 3))
    return w.reshape(-1)[:N]


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


# ---------------------------------------------------------------------------
# Exact inside test via +z ray-crossing parity with host-binned xy tiles.
#
# The production sign path. The reference signs queries with kaolin's
# ``check_sign`` (mesh_util.py:393) — ray-stabbing parity against the
# watertight SMPL body. TPU formulation: the xy plane is cut into
# ``n_tiles^2`` tiles; a host pass bins every face into the tiles its xy
# AABB overlaps (balanced [n_tiles^2, T] table, T = max occupancy rounded
# to a power of two). A query then tests ONLY its tile's faces with a
# division-free 2D-orientation crossing test — ~20 mul/add per face, no
# transcendentals, no top_k — and reduces crossing parity. Exact for any
# query point (not just lattice points), measured ~6x faster than the
# clustered fast-winding evaluation it replaces (15 ms vs 125 ms per 98k
# points on v5e) with zero sign mismatches vs the dense winding reference.
# ---------------------------------------------------------------------------


def build_ray_bins(verts: np.ndarray, faces: np.ndarray,
                   n_tiles: int = 128, min_cap: int = 32,
                   cap: int = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Host precompute: xy-tile face bins for ray-parity inside tests.

    Returns (bins [n_tiles^2, T] int32 storing ``face_id + 1`` with 0 =
    empty slot, grid [6] f32 = (lo_x, lo_y, scale_x, scale_y, eps,
    n_tiles)). Recompute per posed body.

    ``cap``: force T to a fixed width (for batched/dataset use where every
    item must collate to the same shape); raises if any tile overflows —
    a z-aligned face stack denser than ``cap`` would silently corrupt the
    parity, so fail loudly instead."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces)
    tri = verts[faces]                                   # [F, 3, 3]
    lo = verts[:, :2].min(0) - 1e-4
    hi = verts[:, :2].max(0) + 1e-4
    scale = n_tiles / np.maximum(hi - lo, 1e-6)
    t0 = np.clip(np.floor((tri[:, :, :2].min(1) - lo) * scale),
                 0, n_tiles - 1).astype(np.int64)
    t1 = np.clip(np.floor((tri[:, :, :2].max(1) - lo) * scale),
                 0, n_tiles - 1).astype(np.int64)
    span = t1 - t0 + 1                                   # [F, 2]

    # precise footprint binning: a tile in the AABB is kept only if its
    # center is within the tile half-diagonal of the projected triangle
    # (signed edge-distance test; conservative, never drops a touched
    # tile). AABB-only binning puts a sheared LBS triangle into every
    # tile its box covers — measured 258 faces/tile mean on a posed body
    # vs ~40 with the footprint test.
    a2, b2, c2 = tri[:, 0, :2], tri[:, 1, :2], tri[:, 2, :2]
    e1, e2 = b2 - a2, c2 - a2
    den = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]      # [F] 2x area
    orient = np.where(den >= 0, 1.0, -1.0).astype(np.float32)
    edges = []
    for p0, p1 in ((a2, b2), (b2, c2), (c2, a2)):
        e = p1 - p0
        nrm = np.stack([-e[:, 1], e[:, 0]], -1) * orient[:, None]
        ln = np.linalg.norm(nrm, axis=-1, keepdims=True)
        nrm = nrm / np.maximum(ln, 1e-12)
        edges.append((p0, nrm))
    degen = np.abs(den) < 1e-12
    tile_wh = 1.0 / scale
    half_diag = 0.5 * float(np.hypot(tile_wh[0], tile_wh[1])) + 1e-6

    # flat candidate list (face, tile) over each AABB — O(sum span^2),
    # not O(F * max_span^2): vectorized repeat instead of a dense loop
    F = len(faces)
    counts_f = (span[:, 0] * span[:, 1]).astype(np.int64)
    face_rep = np.repeat(np.arange(F, dtype=np.int32), counts_f)
    local = np.arange(len(face_rep)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts_f)[:-1]]), counts_f)
    sx = span[face_rep, 0]
    dx = (local % sx).astype(np.int64)
    dy = (local // sx).astype(np.int64)
    tx = t0[face_rep, 0] + dx
    ty = t0[face_rep, 1] + dy
    cxy = np.stack([(tx + 0.5) * tile_wh[0] + lo[0],
                    (ty + 0.5) * tile_wh[1] + lo[1]], -1)
    mind = np.minimum.reduce([
        np.einsum("ec,ec->e", cxy - p0[face_rep], nrm[face_rep])
        for p0, nrm in edges])
    keep = degen[face_rep] | (mind >= -half_diag)
    tile_ids = (ty * n_tiles + tx)[keep]
    face_ids = face_rep[keep]

    n2 = n_tiles * n_tiles
    counts = np.bincount(tile_ids, minlength=n2)
    if cap is not None:
        if counts.max() > cap:
            raise ValueError(
                f"ray-bin tile overflow: {int(counts.max())} faces in one "
                f"xy tile > cap {cap}; raise cap or n_tiles")
        T = cap
    else:
        T = max(min_cap, 1 << int(np.ceil(np.log2(max(counts.max(), 1)))))
    order = np.argsort(tile_ids, kind="stable")
    tile_sorted = tile_ids[order]
    start = np.zeros(n2 + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    slot = np.arange(len(tile_sorted)) - start[tile_sorted]
    bins = np.zeros((n2, T), np.int32)
    bins[tile_sorted, slot] = face_ids[order] + 1        # 0 = empty
    # eps: consistent tie-break shift for queries exactly on an edge's xy
    # projection (measure-zero for generic points; keeps parity watertight)
    eps = 1e-6 * float((hi - lo).max())
    grid = np.array([lo[0], lo[1], scale[0], scale[1], eps,
                     float(n_tiles)], np.float32)
    return bins, grid


def build_crossing_columns(verts: jnp.ndarray, faces: jnp.ndarray,
                           bins: jnp.ndarray, grid: jnp.ndarray,
                           col_x: jnp.ndarray, col_y: jnp.ndarray,
                           max_cross: int = 32, chunk: int = 4096
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize the body once per frame into per-xy-column +z crossing
    depths (device, jittable).

    The recon engine evaluates every query on a fixed lattice, so the ray
    test (ray_parity_inside) pays its [N, T] tile gather per *query* even
    though queries share xy columns; this pays it per *column* instead:
    for each (col_x[i], col_y[j]) the crossing z's are computed once and
    the per-query sign collapses to one [max_cross] row gather + compares
    (column_parity_inside). ~66k columns vs ~400k+ engine queries per
    frame at 256^3 => ~6x fewer ray-triangle tests, and each query is
    ~free.

    Returns (cross_z [H*W, max_cross] — crossing depths, +inf padded,
    row-major j*W+i — and counts [H*W] int32; counts > max_cross flags
    overflow, police it like the engine's level budgets)."""
    tri = verts[faces]
    i_from = faces
    i_to = faces[:, jnp.array([1, 2, 0])]
    swap = i_from > i_to
    lo_idx = jnp.where(swap, i_to, i_from)
    hi_idx = jnp.where(swap, i_from, i_to)
    sgn = jnp.where(swap, -1.0, 1.0).astype(verts.dtype)
    lo = verts[lo_idx]
    hi = verts[hi_idx]
    zs = tri[..., 2]
    packed = jnp.concatenate([
        lo[..., 0], lo[..., 1], hi[..., 0], hi[..., 1], sgn, zs], axis=-1)

    side = int(np.sqrt(bins.shape[0]))
    W = col_x.shape[0]
    H = col_y.shape[0]
    ii, jj = jnp.meshgrid(jnp.arange(W), jnp.arange(H), indexing="xy")
    cols = jnp.stack([col_x[ii.reshape(-1)], col_y[jj.reshape(-1)]], -1)

    def body(q):                                          # [c, 2]
        qx = q[:, 0] + grid[4]
        qy = q[:, 1] + grid[4]
        tx = jnp.clip(jnp.floor((qx - grid[0]) * grid[2]).astype(jnp.int32),
                      0, side - 1)
        ty = jnp.clip(jnp.floor((qy - grid[1]) * grid[3]).astype(jnp.int32),
                      0, side - 1)
        slot = bins[ty * side + tx]
        fmsk = slot > 0
        t = packed[jnp.maximum(slot - 1, 0)]              # [c, T, 18]
        qxb = qx[:, None]
        qyb = qy[:, None]

        def edge(e):
            lx, ly = t[..., e], t[..., 3 + e]
            hx, hy = t[..., 6 + e], t[..., 9 + e]
            return t[..., 12 + e] * ((hx - lx) * (qyb - ly)
                                     - (hy - ly) * (qxb - lx))

        d1, d2, d3 = edge(0), edge(1), edge(2)
        den = d1 + d2 + d3
        in2d = ((jnp.minimum(jnp.minimum(d1, d2), d3) > 0) |
                (jnp.maximum(jnp.maximum(d1, d2), d3) < 0))
        hit = in2d & fmsk
        zc = (d2 * t[..., 15] + d3 * t[..., 16] + d1 * t[..., 17]) / \
            jnp.where(den == 0, 1.0, den)
        zpad = jnp.where(hit, zc, jnp.inf)
        small, _ = jax.lax.top_k(-zpad, max_cross)        # largest of -z
        return -small, hit.sum(-1).astype(jnp.int32)

    n = cols.shape[0]
    c = min(chunk, max(n, 1))
    pad = (-n) % c
    colsp = jnp.concatenate([cols, jnp.full((pad, 2), 1e9, cols.dtype)])
    zv, cnt = jax.lax.map(body, colsp.reshape(-1, c, 2))
    return (zv.reshape(-1, max_cross)[:n], cnt.reshape(-1)[:n])


def build_column_bins(verts: np.ndarray, faces: np.ndarray,
                      col_x: np.ndarray, col_y: np.ndarray, G: int = 4,
                      min_cap: int = 32, compact: bool = False):
    """Host precompute for the tile-blocked column rasterizer: face bins
    over G x G blocks of the *column lattice* itself (so the device build
    needs one face-list gather per tile, shared by its G^2 columns,
    instead of one per column).

    col_x [W] / col_y [H] must be uniform (linspace; descending ok).
    Returns (bins [n_tiles, T] int32 face_id+1, meta [6] f32 =
    (x0, y0, inv_step_x, inv_step_y, eps, G)).

    ``compact``: additionally drop empty tiles — a human body projects
    onto ~10% of the 257^2 lattice tiles (measured 498/4225 nonzero at
    G=4 on the bench body), so the dense pass burns ~8x its useful
    compute on all-padding tiles. Returns (bins [Nt, T], meta,
    tile_ids [Nt] int32) where Nt is the nonzero-tile count padded to a
    multiple of 32 with id -1; feed tile_ids straight to
    :func:`build_crossing_columns_blocked`, which scatters the per-tile
    results back into the full lattice (empty columns: +inf depths,
    count 0 — parity over the even max_cross pad stays correct)."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces)
    col_x = np.asarray(col_x, np.float64)
    col_y = np.asarray(col_y, np.float64)
    W, H = len(col_x), len(col_y)
    sx = float(col_x[1] - col_x[0]) if W > 1 else 1.0
    sy = float(col_y[1] - col_y[0]) if H > 1 else 1.0
    n_x = -(-W // G)
    n_y = -(-H // G)

    # work in column-index space: u = (x - col_x[0]) / step (+0.5 so tile
    # t covers u in [tG-0.5, tG+G-0.5) — columns are tile centers' grid)
    tri = verts[faces]
    u = (tri[:, :, 0] - col_x[0]) / sx                   # [F, 3]
    v = (tri[:, :, 1] - col_y[0]) / sy
    uv = np.stack([u, v], -1).astype(np.float32)         # [F, 3, 2]
    lo_f = uv.min(1) + 0.5
    hi_f = uv.max(1) + 0.5
    t0 = np.clip(np.floor(lo_f / G), 0,
                 [n_x - 1, n_y - 1]).astype(np.int64)
    t1 = np.clip(np.floor(hi_f / G), 0,
                 [n_x - 1, n_y - 1]).astype(np.int64)
    span = t1 - t0 + 1

    a2, b2, c2 = uv[:, 0], uv[:, 1], uv[:, 2]
    e1, e2 = b2 - a2, c2 - a2
    den = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    orient = np.where(den >= 0, 1.0, -1.0).astype(np.float32)
    edges = []
    for p0, p1 in ((a2, b2), (b2, c2), (c2, a2)):
        e = p1 - p0
        nrm = np.stack([-e[:, 1], e[:, 0]], -1) * orient[:, None]
        ln = np.linalg.norm(nrm, axis=-1, keepdims=True)
        edges.append((p0, nrm / np.maximum(ln, 1e-12)))
    degen = np.abs(den) < 1e-12
    half_diag = 0.5 * G * np.sqrt(2.0) + 1e-6            # index units

    F = len(faces)
    counts_f = (span[:, 0] * span[:, 1]).astype(np.int64)
    face_rep = np.repeat(np.arange(F, dtype=np.int32), counts_f)
    local = np.arange(len(face_rep)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts_f)[:-1]]), counts_f)
    spx = span[face_rep, 0]
    dx = (local % spx).astype(np.int64)
    dy = (local // spx).astype(np.int64)
    tx = t0[face_rep, 0] + dx
    ty = t0[face_rep, 1] + dy
    # tile center in index space
    cxy = np.stack([tx * G + 0.5 * (G - 1), ty * G + 0.5 * (G - 1)],
                   -1).astype(np.float32)
    mind = np.minimum.reduce([
        np.einsum("ec,ec->e", cxy - p0[face_rep], nrm[face_rep])
        for p0, nrm in edges])
    keep = degen[face_rep] | (mind >= -half_diag)
    tile_ids = (ty * n_x + tx)[keep]
    face_ids = face_rep[keep]

    n2 = n_x * n_y
    counts = np.bincount(tile_ids, minlength=n2)
    T = max(min_cap, 1 << int(np.ceil(np.log2(max(counts.max(), 1)))))
    order = np.argsort(tile_ids, kind="stable")
    tile_sorted = tile_ids[order]
    start = np.zeros(n2 + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    slot = np.arange(len(tile_sorted)) - start[tile_sorted]
    bins = np.zeros((n2, T), np.int32)
    bins[tile_sorted, slot] = face_ids[order] + 1
    eps = 1e-6 * float(max(abs(sx) * W, abs(sy) * H))
    meta = np.array([col_x[0], col_y[0], 1.0 / sx, 1.0 / sy, eps,
                     float(G)], np.float32)
    if not compact:
        return bins, meta
    nz = np.nonzero(counts > 0)[0].astype(np.int32)
    nt = max(len(nz), 1)
    npad = -(-nt // 32) * 32
    tile_ids = np.full((npad,), -1, np.int32)
    tile_ids[:len(nz)] = nz
    bins_c = np.zeros((npad, T), np.int32)
    bins_c[:len(nz)] = bins[nz]
    return bins_c, meta, tile_ids


def build_crossing_columns_blocked(verts: jnp.ndarray, faces: jnp.ndarray,
                                   bins: jnp.ndarray, meta: jnp.ndarray,
                                   col_x: jnp.ndarray, col_y: jnp.ndarray,
                                   max_cross: int = 32, G: int = 4,
                                   tiles_per_step: int = 64,
                                   tile_ids: Optional[jnp.ndarray] = None
                                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tile-blocked per-frame rasterization: one face-list gather per
    G x G column block (build_column_bins), dense crossing math for the
    block's columns. Returns (cross_z [H*W, C] row-major iy*W+ix,
    counts [H*W] int32). ~10x fewer gathered rows than the per-column
    build (measured 218 ms -> ~20 ms per 257^2 frame on v5e).

    ``tile_ids`` (from ``build_column_bins(..., compact=True)``): run the
    crossing math only over the listed nonzero tiles — ``bins`` row i
    belongs to lattice tile ``tile_ids[i]``; ids of -1 are padding. The
    per-tile results scatter back into the full lattice (+inf depths /
    zero counts elsewhere). A human body leaves ~90% of lattice tiles
    empty, so this is ~5x faster end to end (measured 41 ms -> 8 ms at
    257^2 / 20480 faces on v5e)."""
    W = col_x.shape[0]
    H = col_y.shape[0]
    n_x = -(-W // G)
    n_y = -(-H // G)

    i_from = faces
    i_to = faces[:, jnp.array([1, 2, 0])]
    swap = i_from > i_to
    lo_idx = jnp.where(swap, i_to, i_from)
    hi_idx = jnp.where(swap, i_from, i_to)
    sgn = jnp.where(swap, -1.0, 1.0).astype(verts.dtype)
    lo = verts[lo_idx]
    hi = verts[hi_idx]
    zs = verts[faces][..., 2]
    packed = jnp.concatenate([
        lo[..., 0], lo[..., 1], hi[..., 0], hi[..., 1], sgn, zs], axis=-1)

    # per-tile column coordinates (static offsets into the lattice)
    offs = jnp.arange(G)
    colx_pad = jnp.concatenate([col_x, jnp.full((n_x * G - W,), 1e9,
                                                col_x.dtype)])
    coly_pad = jnp.concatenate([col_y, jnp.full((n_y * G - H,), 1e9,
                                                col_y.dtype)])
    eps = meta[4]

    def tiles_batch(rows_ts):                     # [B, 2] (bins row, tile id)
        rows, ts = rows_ts[:, 0], jnp.maximum(rows_ts[:, 1], 0)
        ti = ts % n_x
        tj = ts // n_x
        xs = colx_pad[ti[:, None] * G + offs[None]] + eps   # [B, G]
        ys = coly_pad[tj[:, None] * G + offs[None]] + eps
        qx = jnp.tile(xs, (1, G))[..., None]              # [B, G*G, 1]
        qy = jnp.repeat(ys, G, axis=1)[..., None]
        slot = bins[rows]                                 # [B, T]
        fmsk = slot > 0
        p = packed[jnp.maximum(slot - 1, 0)]              # [B, T, 18]

        def edge(e):
            lx, ly = p[:, None, :, e], p[:, None, :, 3 + e]
            hx, hy = p[:, None, :, 6 + e], p[:, None, :, 9 + e]
            return p[:, None, :, 12 + e] * ((hx - lx) * (qy - ly)
                                            - (hy - ly) * (qx - lx))

        d1, d2, d3 = edge(0), edge(1), edge(2)            # [B, G*G, T]
        den = d1 + d2 + d3
        in2d = ((jnp.minimum(jnp.minimum(d1, d2), d3) > 0) |
                (jnp.maximum(jnp.maximum(d1, d2), d3) < 0))
        hit = in2d & fmsk[:, None]
        zc = (d2 * p[:, None, :, 15] + d3 * p[:, None, :, 16]
              + d1 * p[:, None, :, 17]) / jnp.where(den == 0, 1.0, den)
        zpad = jnp.where(hit, zc, jnp.inf)
        small, _ = jax.lax.top_k(-zpad, min(max_cross, zpad.shape[-1]))
        return -small, hit.sum(-1).astype(jnp.int32)

    n_total = n_x * n_y
    if tile_ids is None:
        TB = tiles_per_step       # tiles per map step (parallelism vs VMEM)
        padt = (-n_total) % TB
        ids = jnp.concatenate([jnp.arange(n_total),
                               jnp.zeros((padt,), jnp.int32)])
        rows_ts = jnp.stack([ids, ids], -1)
        zv, cnt = jax.lax.map(tiles_batch, rows_ts.reshape(-1, TB, 2))
        zv = zv.reshape(-1, G * G, zv.shape[-1])[:n_total]
        cnt = cnt.reshape(-1, G * G)[:n_total]
    elif tile_ids.shape[0] == 0:
        # degenerate compact input (the documented producer pads to >=32,
        # but an empty array must not ZeroDivisionError): empty lattice
        C = min(max_cross, bins.shape[-1]) if bins.size else max_cross
        return (jnp.full((H * W, C), jnp.inf, verts.dtype),
                jnp.zeros((H * W,), jnp.int32))
    else:
        nt = tile_ids.shape[0]
        TB = min(tiles_per_step, nt)
        padt = (-nt) % TB
        ids = jnp.concatenate([tile_ids,
                               jnp.full((padt,), -1, jnp.int32)])
        rows = jnp.arange(nt + padt, dtype=jnp.int32)     # bins row order
        rows_ts = jnp.stack([jnp.minimum(rows, nt - 1), ids], -1)
        zb, cb = jax.lax.map(tiles_batch, rows_ts.reshape(-1, TB, 2))
        C = zb.shape[-1]
        zb = zb.reshape(-1, G * G, C)
        cb = cb.reshape(-1, G * G)
        safe = jnp.where(ids < 0, n_total, ids)           # pad -> dropped
        zv = jnp.full((n_total, G * G, C), jnp.inf,
                      zb.dtype).at[safe].set(zb, mode="drop")
        cnt = jnp.zeros((n_total, G * G),
                        jnp.int32).at[safe].set(cb, mode="drop")
    # [n_tiles = tj*n_x+ti, G*G = gy*G+gx, C] -> [H*W] row-major iy*W+ix
    C = zv.shape[-1]
    zv = zv.reshape(n_y, n_x, G, G, C)          # (tj, ti, gy, gx, C)
    zv = jnp.transpose(zv, (0, 2, 1, 3, 4)).reshape(n_y * G, n_x * G, C)
    cnt = cnt.reshape(n_y, n_x, G, G)
    cnt = jnp.transpose(cnt, (0, 2, 1, 3)).reshape(n_y * G, n_x * G)
    return (zv[:H, :W].reshape(H * W, C),
            cnt[:H, :W].reshape(H * W))


def column_parity_inside(points: jnp.ndarray, cross_z: jnp.ndarray,
                         meta: jnp.ndarray) -> jnp.ndarray:
    """Inside test [N] for points on (or near) the rasterized lattice:
    parity of crossings above the point in its column.

    meta [6] f32 = (x0, y0, inv_dx, inv_dy, W, H): x -> column index
    round((x - x0) * inv_dx). Points off-lattice snap to the nearest
    column (error bounded by half a lattice step in xy)."""
    W = jnp.asarray(meta[4], jnp.int32)
    H = jnp.asarray(meta[5], jnp.int32)
    ix = jnp.clip(jnp.round((points[:, 0] - meta[0]) * meta[2])
                  .astype(jnp.int32), 0, W - 1)
    iy = jnp.clip(jnp.round((points[:, 1] - meta[1]) * meta[3])
                  .astype(jnp.int32), 0, H - 1)
    col = cross_z[iy * W + ix]                            # [N, C]
    above = (col > points[:, 2:3]).sum(-1)
    return above % 2 == 1


def ray_parity_inside_np(points: np.ndarray, verts: np.ndarray,
                         faces: np.ndarray, n_tiles: int = 32,
                         chunk: int = 4096) -> np.ndarray:
    """Host (numpy) twin of :func:`ray_parity_inside` for dataset labels:
    the reference's ``pts_signs`` come from kaolin ``check_sign``
    (PIFuDataset.py:418) — ray-stabbing parity, which this reproduces so
    training labels and the in-net sign share one semantics."""
    points = np.asarray(points, np.float32)
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces)
    bins, grid = build_ray_bins(verts, faces, n_tiles=n_tiles)
    side = int(np.sqrt(bins.shape[0]))
    tri = verts[faces]
    lo_i = np.minimum(faces, faces[:, [1, 2, 0]])
    hi_i = np.maximum(faces, faces[:, [1, 2, 0]])
    sgn = np.where(faces > faces[:, [1, 2, 0]], -1.0, 1.0).astype(np.float32)
    lo_xy = verts[lo_i][..., :2]                         # [F, 3, 2]
    hi_xy = verts[hi_i][..., :2]
    zs = tri[..., 2]                                     # [F, 3]

    out = np.zeros(len(points), bool)
    for i in range(0, len(points), chunk):
        p = points[i:i + chunk]
        px = p[:, 0] + grid[4]
        py = p[:, 1] + grid[4]
        tx = np.clip(np.floor((px - grid[0]) * grid[2]).astype(np.int64),
                     0, side - 1)
        ty = np.clip(np.floor((py - grid[1]) * grid[3]).astype(np.int64),
                     0, side - 1)
        slot = bins[ty * side + tx]                      # [c, T]
        fmsk = slot > 0
        fi = np.maximum(slot - 1, 0)
        lxy, hxy = lo_xy[fi], hi_xy[fi]                  # [c, T, 3, 2]
        q = np.stack([px, py], -1)[:, None, None]        # [c, 1, 1, 2]
        d = sgn[fi] * ((hxy[..., 0] - lxy[..., 0]) * (q[..., 1] - lxy[..., 1])
                       - (hxy[..., 1] - lxy[..., 1])
                       * (q[..., 0] - lxy[..., 0]))      # [c, T, 3]
        d1, d2, d3 = d[..., 0], d[..., 1], d[..., 2]
        den = d1 + d2 + d3
        in2d = (d.min(-1) > 0) | (d.max(-1) < 0)
        z = zs[fi]
        zsum = d2 * z[..., 0] + d3 * z[..., 1] + d1 * z[..., 2]
        above = (zsum - p[:, 2:3] * den) * den > 0
        out[i:i + chunk] = (in2d & above & fmsk).sum(-1) % 2 == 1
    return out


def ray_parity_inside(points: jnp.ndarray, verts: jnp.ndarray,
                      faces: jnp.ndarray, bins: jnp.ndarray,
                      grid: jnp.ndarray,
                      chunk: int = 4096) -> jnp.ndarray:
    """Inside test [N] bool of ``points [N, 3]`` wrt the watertight mesh:
    parity of +z ray crossings, testing only the point's tile's faces.

    Watertight under fp32: each projected edge function is evaluated
    *canonically* — from the lower-indexed endpoint — so the two faces
    sharing an edge see bit-identical magnitudes and a ray passing near a
    shared edge is counted by exactly one of them (or both at a silhouette
    fold, which is parity-neutral). A per-face formulation would double- or
    zero-count under rounding noise: measured 1983/32768 wrong signs near
    the surface of a posed body, vs 0 with canonical edges."""
    # canonical per-edge endpoints: edges (a,b), (b,c), (c,a)
    i_from = faces                                        # [F, 3]
    i_to = faces[:, jnp.array([1, 2, 0])]
    swap = i_from > i_to
    lo_idx = jnp.where(swap, i_to, i_from)
    hi_idx = jnp.where(swap, i_from, i_to)
    sgn = jnp.where(swap, -1.0, 1.0).astype(verts.dtype)  # [F, 3]
    lo = verts[lo_idx]                                    # [F, 3, 3]
    hi = verts[hi_idx]
    zs = verts[faces][..., 2]                             # [F, 3] (az,bz,cz)
    # packed [F, 16]: lo.xy*3, hi.xy*3, sgn*3, z*3, pad
    packed = jnp.concatenate([
        lo[..., 0], lo[..., 1], hi[..., 0], hi[..., 1], sgn, zs],
        axis=-1)                                          # [F, 18]

    side = int(np.sqrt(bins.shape[0]))

    def body(p):                                          # [c, 3]
        px = p[:, 0] + grid[4]
        py = p[:, 1] + grid[4]
        pz = p[:, 2]
        tx = jnp.clip(jnp.floor((px - grid[0]) * grid[2]).astype(jnp.int32),
                      0, side - 1)
        ty = jnp.clip(jnp.floor((py - grid[1]) * grid[3]).astype(jnp.int32),
                      0, side - 1)
        tid = ty * side + tx                              # [c]
        slot = bins[tid]                                  # [c, T] (fid+1)
        fmsk = slot > 0
        t = packed[jnp.maximum(slot - 1, 0)]              # [c, T, 18]
        qx = px[:, None]
        qy = py[:, None]

        def edge(e):
            lx, ly = t[..., e], t[..., 3 + e]
            hx, hy = t[..., 6 + e], t[..., 9 + e]
            return t[..., 12 + e] * ((hx - lx) * (qy - ly)
                                     - (hy - ly) * (qx - lx))

        d1, d2, d3 = edge(0), edge(1), edge(2)
        den = d1 + d2 + d3
        in2d = ((jnp.minimum(jnp.minimum(d1, d2), d3) > 0) |
                (jnp.maximum(jnp.maximum(d1, d2), d3) < 0))
        # crossing z from area-weighted depths; division-free z > pz test
        zsum = d2 * t[..., 15] + d3 * t[..., 16] + d1 * t[..., 17]
        above = (zsum - pz[:, None] * den) * den > 0
        hits = in2d & above & fmsk
        return jnp.sum(hits, axis=-1) % 2 == 1

    N = points.shape[0]
    c = min(chunk, max(N, 1))
    pad = (-N) % c
    pts = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)])
    inside = jax.lax.map(body, pts.reshape(-1, c, 3))
    return inside.reshape(-1)[:N]


def point_body_features(points: jnp.ndarray,
                        verts: jnp.ndarray,
                        faces: jnp.ndarray,
                        vert_face_table: jnp.ndarray,
                        cmaps: jnp.ndarray,
                        vis: jnp.ndarray,
                        k: int = 2,
                        cluster_faces: jnp.ndarray = None,
                        cluster_mask: jnp.ndarray = None,
                        ray_bins: jnp.ndarray = None,
                        ray_grid: jnp.ndarray = None,
                        cross_z: jnp.ndarray = None,
                        cross_meta: jnp.ndarray = None,
                        known_inside: jnp.ndarray = None
                        ) -> Tuple[jnp.ndarray, ...]:
    """Single-example SMPL-local features at query points.

    Args:
      points ``[N, 3]``; verts ``[V, 3]``; faces ``[F, 3]`` int;
      vert_face_table ``[V, deg]`` int (build_vertex_face_table);
      cmaps ``[V, 3]``; vis ``[V, 1]``;
      known_inside [N] bool: precomputed inside mask (training path — the
      dataset knows the query points ahead of the step and runs the
      parity test on host, ray_parity_inside_np);
      cross_z/cross_meta: per-column crossing depths
      (build_crossing_columns) — the serving path for lattice queries;
      ray_bins/ray_grid: xy-tile face bins (build_ray_bins) —
      the production sign path: exact ray-crossing parity, the
      reference's check_sign semantics (mesh_util.py:393), correct under
      self-contact and ~6x cheaper than the winding clusters;
      cluster_faces/cluster_mask: winding clusters
      (build_winding_clusters) — near-exact fast winding sign, kept for
      callers without a z-axis convention;
      with neither, a pseudo-normal heuristic signs (fast, but undefined
      in self-contact regions).

    Returns: (sdf [N,1] positive inside, normal [N,3], cmap [N,3], vis [N,1]).
    """
    N = points.shape[0]
    normals = vertex_normals(verts[None], faces)[0]     # [V, 3]

    nn = _nearest_vertices(points, verts, k=k)          # [N, k]
    cand = vert_face_table[nn].reshape(N, -1)           # [N, C]
    C = cand.shape[1]

    # ONE wide gather for the 9 coordinate planes: gathering verts[fv[:,j]]
    # per corner issues ~4x N*C narrow [3]-wide row gathers, each padded
    # to a full 128-lane register by the TPU layout — measured 176 ms of
    # the 193 ms kernel at 393k points. Packing each face's corners into a
    # single [F, 9] row makes it one gather of N*C wide rows (~3x faster
    # end to end).
    packed_tri = jnp.concatenate(
        [verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]],
        axis=-1)                                        # [F, 9]
    tri_block = packed_tri[cand]                        # [N, C, 9]
    (v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z) = (
        tri_block[..., kk] for kk in range(9))

    px = points[:, 0:1]
    py = points[:, 1:2]
    pz = points[:, 2:3]

    ux, uy, uz = v1x - v0x, v1y - v0y, v1z - v0z
    vx, vy, vz = v2x - v0x, v2y - v0y, v2z - v0z
    nx, ny, nz = _cross(ux, uy, uz, vx, vy, vz)
    n2 = jnp.maximum(_dot(nx, ny, nz, nx, ny, nz), 1e-12)
    wx, wy, wz = px - v0x, py - v0y, pz - v0z

    cx, cy, cz = _cross(ux, uy, uz, wx, wy, wz)
    b2 = _dot(cx, cy, cz, nx, ny, nz) / n2
    cx, cy, cz = _cross(wx, wy, wz, vx, vy, vz)
    b1 = _dot(cx, cy, cz, nx, ny, nz) / n2
    b0 = 1.0 - b1 - b2
    inside = (b0 >= 0) & (b0 <= 1) & (b1 >= 0) & (b1 <= 1) & \
        (b2 >= 0) & (b2 <= 1)

    # plane projection closest point
    pn = _dot(wx, wy, wz, nx, ny, nz) / n2
    prx, pry, prz = px - pn * nx, py - pn * ny, pz - pn * nz
    d_in = (px - prx) ** 2 + (py - pry) ** 2 + (pz - prz) ** 2

    def seg(ax_, ay_, az_, bx_, by_, bz_):
        ex, ey, ez = bx_ - ax_, by_ - ay_, bz_ - az_
        sx, sy, sz = px - ax_, py - ay_, pz - az_
        tt = jnp.clip(_dot(sx, sy, sz, ex, ey, ez) /
                      jnp.maximum(_dot(ex, ey, ez, ex, ey, ez), 1e-12),
                      0.0, 1.0)
        qx, qy, qz = ax_ + tt * ex, ay_ + tt * ey, az_ + tt * ez
        d = (px - qx) ** 2 + (py - qy) ** 2 + (pz - qz) ** 2
        return d, qx, qy, qz

    d01, q01x, q01y, q01z = seg(v0x, v0y, v0z, v1x, v1y, v1z)
    d12, q12x, q12y, q12z = seg(v1x, v1y, v1z, v2x, v2y, v2z)
    d20, q20x, q20y, q20z = seg(v2x, v2y, v2z, v0x, v0y, v0z)

    e_first = (d01 <= d12) & (d01 <= d20)
    e_second = (d12 <= d20) & ~e_first
    d_edge = jnp.minimum(jnp.minimum(d01, d12), d20)
    qex = jnp.where(e_first, q01x, jnp.where(e_second, q12x, q20x))
    qey = jnp.where(e_first, q01y, jnp.where(e_second, q12y, q20y))
    qez = jnp.where(e_first, q01z, jnp.where(e_second, q12z, q20z))

    d2 = jnp.where(inside, d_in, d_edge)                # [N, C]
    qx = jnp.where(inside, prx, qex)
    qy = jnp.where(inside, pry, qey)
    qz = jnp.where(inside, prz, qez)

    best = jnp.argmin(d2, axis=1)                       # [N]
    pick = lambda arr: jnp.take_along_axis(arr, best[:, None], 1)[:, 0]
    d2b = pick(d2)
    cpx, cpy, cpz = pick(qx), pick(qy), pick(qz)
    best_face = pick(cand)

    # features from the winning face (small [N, 3] gathers are fine),
    # interpolated at the reference's weights: the *unclamped* plane
    # projection of the raw query point
    # (barycentric_coordinates_of_projection, mesh_util.py:384-391).
    # All winning-face attributes ride ONE wide row gather: the naive
    # form (faces[best] -> verts/normals/cmaps/vis fancy-indexed per
    # corner) issues 5x N narrow [3]-wide row gathers, measured 8.1 ms
    # of the 19.2 ms kernel at 98k points — packing the 30 floats per
    # face once (F-sized work) and gathering [N, 30] rows cuts it to ~1 ms
    # (same fix as packed_tri above).
    packed_attr = jnp.concatenate(
        [packed_tri] +
        [normals[faces[:, j]] for j in range(3)] +
        [cmaps[faces[:, j]] for j in range(3)] +
        [vis[faces[:, j]] for j in range(3)], axis=-1)  # [F, 30]
    row = packed_attr[best_face]                        # [N, 30]
    tri = row[:, 0:9].reshape(-1, 3, 3)
    n_f = row[:, 9:18].reshape(-1, 3, 3)
    cm_f = row[:, 18:27].reshape(-1, 3, 3)
    vi_f = row[:, 27:30].reshape(-1, 3, 1)
    from icon_tpu.ops.mesh import barycentric_projection_weights
    bary = barycentric_projection_weights(points, tri)
    w = bary[..., None]

    n_interp = jnp.sum(n_f * w, axis=1)                 # [N, 3]
    cmap_q = jnp.sum(cm_f * w, axis=1)
    vis_q = (jnp.sum(vi_f * w, axis=1) >= 0.1).astype(points.dtype)

    flip = jnp.array([-1.0, 1.0, -1.0], points.dtype)
    normal_q = n_interp * flip

    dist = jnp.sqrt(jnp.maximum(d2b, 0.0)) / math.sqrt(3.0)
    if known_inside is not None:
        inside_pt = known_inside
    elif cross_z is not None:
        # exact sign for lattice queries: parity of the precomputed
        # column crossings (check_sign semantics, mesh_util.py:393)
        inside_pt = column_parity_inside(points, cross_z, cross_meta)
    elif ray_bins is not None:
        # exact sign (reference check_sign, mesh_util.py:393): +z
        # ray-crossing parity over the point's xy tile
        inside_pt = ray_parity_inside(points, verts, faces, ray_bins,
                                      ray_grid)
    elif cluster_faces is not None:
        # exact sign (reference check_sign, mesh_util.py:393): winding
        # number > 0.5 is inside — correct under self-contact, where any
        # surface-normal heuristic mislabels (measured 22.6% wrong signs
        # on near-surface samples of a posed body)
        inside_pt = fast_winding(points, verts, faces, cluster_faces,
                                 cluster_mask) > 0.5
    else:
        # fallback pseudo-normal sign: interpolate the normal at the
        # CLAMPED closest-point barycentrics (the unclamped feature
        # weights extrapolate and flip signs for edge-closest queries)
        cp = jnp.stack([cpx, cpy, cpz], axis=-1)
        bary_cp = jnp.clip(barycentric_projection_weights(cp, tri),
                           0.0, 1.0)
        bary_cp = bary_cp / jnp.maximum(
            bary_cp.sum(-1, keepdims=True), 1e-9)
        n_sign = jnp.sum(n_f * bary_cp[..., None], axis=1)
        gap = points - cp
        inside_pt = jnp.sum(gap * n_sign, axis=-1) < 0.0
    sdf = jnp.where(inside_pt, dist, -dist)[..., None]

    return sdf, normal_q, cmap_q, vis_q


def cal_sdf_batch_fast(verts: jnp.ndarray, faces: jnp.ndarray,
                       cmaps: jnp.ndarray, vis: jnp.ndarray,
                       points: jnp.ndarray,
                       vert_face_table: jnp.ndarray,
                       k: int = 2,
                       cluster_faces: jnp.ndarray = None,
                       cluster_mask: jnp.ndarray = None,
                       ray_bins: jnp.ndarray = None,
                       ray_grid: jnp.ndarray = None,
                       cross_z: jnp.ndarray = None,
                       cross_meta: jnp.ndarray = None,
                       known_inside: jnp.ndarray = None):
    """Batched drop-in for ops.sdf.cal_sdf_batch using the fast kernel.

    The batch axis unrolls as a Python loop (B is static and small) rather
    than ``jax.vmap``: vmapping the kernel turns its row gathers into batched
    gathers, which XLA:TPU lowers ~7x slower — measured 4.58 s vs 0.61 s at
    N=400k, B=1 on v5e."""
    B = points.shape[0]

    def cl(arr, b, per_item_ndim):
        if arr is None:
            return None
        return arr[b] if arr.ndim == per_item_ndim + 1 else arr

    outs = [point_body_features(points[b], verts[b], faces,
                                vert_face_table, cmaps[b], vis[b], k=k,
                                cluster_faces=cl(cluster_faces, b, 2),
                                cluster_mask=cl(cluster_mask, b, 2),
                                ray_bins=cl(ray_bins, b, 2),
                                ray_grid=cl(ray_grid, b, 1),
                                cross_z=cl(cross_z, b, 2),
                                cross_meta=cl(cross_meta, b, 1),
                                known_inside=cl(known_inside, b, 1))
            for b in range(B)]
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(4))
