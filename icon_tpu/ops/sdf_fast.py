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


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def point_body_features(points: jnp.ndarray,
                        verts: jnp.ndarray,
                        faces: jnp.ndarray,
                        vert_face_table: jnp.ndarray,
                        cmaps: jnp.ndarray,
                        vis: jnp.ndarray,
                        k: int = 2) -> Tuple[jnp.ndarray, ...]:
    """Single-example SMPL-local features at query points.

    Args:
      points ``[N, 3]``; verts ``[V, 3]``; faces ``[F, 3]`` int;
      vert_face_table ``[V, deg]`` int (build_vertex_face_table);
      cmaps ``[V, 3]``; vis ``[V, 1]``.

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

    # features from the winning face (small [N, 3] gathers are fine)
    f = faces[best_face]                                # [N, 3]
    tri = verts[f]                                      # [N, 3, 3]
    from icon_tpu.ops.mesh import barycentric_projection_weights
    bary = barycentric_projection_weights(points, tri)
    w = bary[..., None]

    n_interp = jnp.sum(normals[f] * w, axis=1)          # [N, 3]
    cmap_q = jnp.sum(cmaps[f] * w, axis=1)
    vis_q = (jnp.sum(vis[f] * w, axis=1) >= 0.1).astype(points.dtype)

    flip = jnp.array([-1.0, 1.0, -1.0], points.dtype)
    normal_q = n_interp * flip

    dist = jnp.sqrt(jnp.maximum(d2b, 0.0)) / math.sqrt(3.0)
    # Hoppe sign: positive inside (normal points outward)
    gap = jnp.stack([points[:, 0] - cpx, points[:, 1] - cpy,
                     points[:, 2] - cpz], axis=-1)
    inside_pt = jnp.sum(gap * n_interp, axis=-1) < 0.0
    sdf = jnp.where(inside_pt, dist, -dist)[..., None]

    return sdf, normal_q, cmap_q, vis_q


def cal_sdf_batch_fast(verts: jnp.ndarray, faces: jnp.ndarray,
                       cmaps: jnp.ndarray, vis: jnp.ndarray,
                       points: jnp.ndarray,
                       vert_face_table: jnp.ndarray,
                       k: int = 2):
    """Batched drop-in for ops.sdf.cal_sdf_batch using the fast kernel.

    The batch axis unrolls as a Python loop (B is static and small) rather
    than ``jax.vmap``: vmapping the kernel turns its row gathers into batched
    gathers, which XLA:TPU lowers ~7x slower — measured 4.58 s vs 0.61 s at
    N=400k, B=1 on v5e."""
    B = points.shape[0]
    outs = [point_body_features(points[b], verts[b], faces,
                                vert_face_table, cmaps[b], vis[b], k=k)
            for b in range(B)]
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(4))
