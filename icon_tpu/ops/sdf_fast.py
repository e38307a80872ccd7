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
3. **Sign via the smooth-normal (Hoppe) test**: sign(dot(p - closest_point,
   interpolated vertex normal)) — the same construction the reference uses
   for its GT sampling (lib/dataset/hoppeMesh.py:73-116). The generalized
   winding number (ops/sdf.py) remains the exact/offline reference; tests
   quantify agreement.

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
from typing import Tuple

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
    neighbor, and the exact-distance step downstream is unaffected."""
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
# Device fast winding numbers (the sign oracle).
#
# The reference signs every query with kaolin's exact ``check_sign``
# (mesh_util.py:393) — a winding-style inside test that stays correct under
# self-contact, where any surface-normal heuristic is undefined (a point
# inside both thighs is "outside" each local surface). TPU-native
# formulation in the spirit of Barill et al. 2018 fast winding numbers:
# faces are chunked into K spatially-coherent *equal-size* clusters by
# Morton order (balanced => static shapes, no padding waste); each point
# evaluates the exact van Oosterom-Strackee solid angle for its m nearest
# clusters and a dipole approximation A_k.(c_k - p)/4pi|c_k - p|^3 for the
# rest. For SMPL-X (~21k faces, K=256, m=12) that is ~1k triangle
# evaluations per point instead of 21k — and all of it dense [chunk, m, M]
# elementwise math the VPU eats.
# ---------------------------------------------------------------------------


def build_winding_clusters(verts: np.ndarray, faces: np.ndarray,
                           n_clusters: int = 256
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Host precompute: Morton-order face clustering for the posed body.

    Returns (cluster_faces [K, M] int32, cluster_mask [K, M] bool) with
    K*M >= F, balanced (M = ceil(F/K)); padding slots mask out.
    Recompute per posed body (clusters follow vertex positions)."""
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    cent = verts[faces].mean(1)
    lo, hi = cent.min(0), cent.max(0)
    q = ((cent - lo) / np.maximum(hi - lo, 1e-9) * 1023).astype(np.uint32)

    def spread(x):                    # 10 bits -> every 3rd bit
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | \
        (spread(q[:, 2]) << 2)
    order = np.argsort(morton).astype(np.int32)
    F = len(faces)
    K = min(n_clusters, F)
    M = -(-F // K)
    pad = K * M - F
    cluster_faces = np.concatenate(
        [order, np.zeros(pad, np.int32)]).reshape(K, M)
    mask = np.concatenate([np.ones(F, bool),
                           np.zeros(pad, bool)]).reshape(K, M)
    return cluster_faces, mask


def fast_winding(points: jnp.ndarray, verts: jnp.ndarray,
                 faces: jnp.ndarray, cluster_faces: jnp.ndarray,
                 cluster_mask: jnp.ndarray, m_near: int = 12,
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

    K, M = cluster_faces.shape
    m = min(m_near, K)

    def body(p):                                         # [c, 3]
        rel = cent[None] - p[:, None]                    # [c, K, 3]
        d2 = jnp.maximum(jnp.sum(rel * rel, -1), 1e-12)  # [c, K]
        w_dip = jnp.einsum("ckj,kj->ck", rel, A) / \
            (4.0 * jnp.pi * d2 * jnp.sqrt(d2))
        _, idx = jax.lax.top_k(-d2, m)                   # [c, m]

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


def point_body_features(points: jnp.ndarray,
                        verts: jnp.ndarray,
                        faces: jnp.ndarray,
                        vert_face_table: jnp.ndarray,
                        cmaps: jnp.ndarray,
                        vis: jnp.ndarray,
                        k: int = 2,
                        cluster_faces: jnp.ndarray = None,
                        cluster_mask: jnp.ndarray = None
                        ) -> Tuple[jnp.ndarray, ...]:
    """Single-example SMPL-local features at query points.

    Args:
      points ``[N, 3]``; verts ``[V, 3]``; faces ``[F, 3]`` int;
      vert_face_table ``[V, deg]`` int (build_vertex_face_table);
      cmaps ``[V, 3]``; vis ``[V, 1]``;
      cluster_faces/cluster_mask: optional winding clusters
      (build_winding_clusters) — when given, the sign comes from the exact
      fast winding number (the reference's check_sign semantics,
      mesh_util.py:393, correct under self-contact); otherwise the
      pseudo-normal heuristic signs (fast, but undefined in self-contact
      regions).

    Returns: (sdf [N,1] positive inside, normal [N,3], cmap [N,3], vis [N,1]).
    """
    N = points.shape[0]
    normals = vertex_normals(verts[None], faces)[0]     # [V, 3]

    nn = _nearest_vertices(points, verts, k=k)          # [N, k]
    cand = vert_face_table[nn].reshape(N, -1)           # [N, C]
    C = cand.shape[1]

    # SoA gather: 9 coordinate planes [N, C]
    fv = faces[cand.reshape(-1)]                        # [N*C, 3]
    planes = []
    for j in range(3):
        vj = verts[fv[:, j]]                            # [N*C, 3]
        for kk in range(3):
            planes.append(vj[:, kk].reshape(N, C))
    v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = planes

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

    # features from the winning face (small [N, 3] gathers are fine).
    # Barycentrics are taken at the CLOSEST point on the face — not the
    # query point's raw plane projection, whose unclamped weights
    # extrapolate outside the triangle for edge/vertex-closest queries and
    # flip the interpolated normal's sign (measured: 22.6% wrong signs on
    # near-surface samples before this fix; tests/test_sdf_fast.py).
    f = faces[best_face]                                # [N, 3]
    tri = verts[f]                                      # [N, 3, 3]
    from icon_tpu.ops.mesh import barycentric_projection_weights
    cp = jnp.stack([cpx, cpy, cpz], axis=-1)            # [N, 3] on-face
    bary = barycentric_projection_weights(cp, tri)
    bary = jnp.clip(bary, 0.0, 1.0)
    bary = bary / jnp.maximum(bary.sum(-1, keepdims=True), 1e-9)
    w = bary[..., None]

    n_interp = jnp.sum(normals[f] * w, axis=1)          # [N, 3]
    cmap_q = jnp.sum(cmaps[f] * w, axis=1)
    vis_q = (jnp.sum(vis[f] * w, axis=1) >= 0.1).astype(points.dtype)

    flip = jnp.array([-1.0, 1.0, -1.0], points.dtype)
    normal_q = n_interp * flip

    dist = jnp.sqrt(jnp.maximum(d2b, 0.0)) / math.sqrt(3.0)
    if cluster_faces is not None:
        # exact sign (reference check_sign): winding > 0.5 is inside
        inside_pt = fast_winding(points, verts, faces, cluster_faces,
                                 cluster_mask) > 0.5
    else:
        # pseudo-normal sign: positive inside (normal points outward)
        gap = jnp.stack([points[:, 0] - cpx, points[:, 1] - cpy,
                         points[:, 2] - cpz], axis=-1)
        inside_pt = jnp.sum(gap * n_interp, axis=-1) < 0.0
    sdf = jnp.where(inside_pt, dist, -dist)[..., None]

    return sdf, normal_q, cmap_q, vis_q


def cal_sdf_batch_fast(verts: jnp.ndarray, faces: jnp.ndarray,
                       cmaps: jnp.ndarray, vis: jnp.ndarray,
                       points: jnp.ndarray,
                       vert_face_table: jnp.ndarray,
                       k: int = 2,
                       cluster_faces: jnp.ndarray = None,
                       cluster_mask: jnp.ndarray = None):
    """Batched drop-in for ops.sdf.cal_sdf_batch using the fast kernel.

    The batch axis unrolls as a Python loop (B is static and small) rather
    than ``jax.vmap``: vmapping the kernel turns its row gathers into batched
    gathers, which XLA:TPU lowers ~7x slower — measured 4.58 s vs 0.61 s at
    N=400k, B=1 on v5e."""
    B = points.shape[0]

    def cl(arr, b):
        if arr is None:
            return None
        return arr[b] if arr.ndim == 3 else arr     # per-item or shared

    outs = [point_body_features(points[b], verts[b], faces,
                                vert_face_table, cmaps[b], vis[b], k=k,
                                cluster_faces=cl(cluster_faces, b),
                                cluster_mask=cl(cluster_mask, b))
            for b in range(B)]
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(4))
