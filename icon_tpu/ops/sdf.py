"""Point→mesh signed distance + closest-surface feature interpolation.

This replaces the reference's CUDA hot path (kaolin ``point_to_mesh_distance``
+ ``check_sign`` inside ``cal_sdf_batch``, lib/dataset/mesh_util.py:357-396)
with a TPU-native formulation:

- Exact point→triangle distance as min(plane-projection-if-inside, three
  edge-segment distances) — fully branch-free, VPU-friendly.
- Inside/outside sign via the *generalized winding number* (van Oosterom &
  Strackee solid angles), the robust alternative to kaolin's ray test; the
  reference itself carries a winding-number fallback
  (lib/common/render_utils.py:29-131).
- Both quantities are accumulated in a single ``lax.scan`` over fixed-size
  face chunks: each triangle is read once from HBM, carry is (min-d², argmin,
  winding-sum) per point. Static shapes throughout; faces are padded to a
  chunk multiple with far-away degenerate triangles that can't win the min
  and contribute ~0 solid angle.

A fused Pallas kernel (ops/pallas/sdf.py) replaces the scan on TPU for
production throughput; this module is the numerics reference and the
autodiff-friendly path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from icon_tpu.ops.mesh import (barycentric_projection_weights, face_vertices,
                               vertex_normals)

_FAR = 1e8  # padding triangles live here: huge distance, ~zero solid angle


def _point_tri_dist_sq(p: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Squared distance from points to triangles, broadcast over leading dims.

    p: ``[..., 3]``, tri: ``[..., 3, 3]`` -> ``[...]``.
    """
    v0, v1, v2 = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]

    # plane projection distance, valid only when the projection is inside
    bary = barycentric_projection_weights(p, tri)
    inside = jnp.all((bary >= 0.0) & (bary <= 1.0), axis=-1)
    u = v1 - v0
    v = v2 - v0
    n = jnp.cross(u, v)
    n2 = jnp.sum(n * n, axis=-1)
    degenerate = n2 <= 1e-12
    pv = p - v0
    d_plane = jnp.sum(pv * n, axis=-1) ** 2 / jnp.maximum(n2, 1e-12)
    d_plane = jnp.where(inside & ~degenerate, d_plane, jnp.inf)

    def seg_dist_sq(a, b):
        e = b - a
        w = p - a
        t = jnp.clip(jnp.sum(w * e, axis=-1) /
                     jnp.maximum(jnp.sum(e * e, axis=-1), 1e-12), 0.0, 1.0)
        diff = w - t[..., None] * e
        return jnp.sum(diff * diff, axis=-1)

    d = jnp.minimum(d_plane, seg_dist_sq(v0, v1))
    d = jnp.minimum(d, seg_dist_sq(v1, v2))
    return jnp.minimum(d, seg_dist_sq(v2, v0))


def _solid_angle(p: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Signed solid angle subtended by triangles at points
    (van Oosterom–Strackee). p: ``[..., 3]``, tri: ``[..., 3, 3]`` -> ``[...]``."""
    a = tri[..., 0, :] - p
    b = tri[..., 1, :] - p
    c = tri[..., 2, :] - p
    la = jnp.linalg.norm(a, axis=-1)
    lb = jnp.linalg.norm(b, axis=-1)
    lc = jnp.linalg.norm(c, axis=-1)
    det = jnp.sum(a * jnp.cross(b, c), axis=-1)
    den = (la * lb * lc + jnp.sum(a * b, axis=-1) * lc +
           jnp.sum(b * c, axis=-1) * la + jnp.sum(c * a, axis=-1) * lb)
    return 2.0 * jnp.arctan2(det, den)


def _pad_tris(tris: jnp.ndarray, chunk: int) -> jnp.ndarray:
    F = tris.shape[0]
    pad = (-F) % chunk
    if pad:
        filler = jnp.full((pad, 3, 3), _FAR, tris.dtype)
        tris = jnp.concatenate([tris, filler], axis=0)
    return tris


@functools.partial(jax.jit, static_argnames=("chunk",))
def point_mesh_dist_winding(points: jnp.ndarray, triangles: jnp.ndarray,
                            chunk: int = 512):
    """Fused brute-force sweep: for each point, the squared distance to the
    mesh, the index of the closest triangle, and the winding number.

    Args:
      points: ``[N, 3]``; triangles: ``[F, 3, 3]``.

    Returns: ``(dist_sq [N], tri_idx [N] int32, winding [N])``.
    """
    N = points.shape[0]
    F = triangles.shape[0]
    tris = _pad_tris(triangles, chunk).reshape(-1, chunk, 3, 3)

    def body(carry, inputs):
        best_d2, best_idx, wind = carry
        tri_chunk, base = inputs                      # [chunk,3,3], scalar
        p = points[:, None, :]                        # [N,1,3]
        d2 = _point_tri_dist_sq(p, tri_chunk[None])   # [N,chunk]
        omega = _solid_angle(p, tri_chunk[None])      # [N,chunk]
        cmin = jnp.min(d2, axis=1)
        cidx = jnp.argmin(d2, axis=1).astype(jnp.int32) + base
        better = cmin < best_d2
        return ((jnp.where(better, cmin, best_d2),
                 jnp.where(better, cidx, best_idx),
                 wind + jnp.sum(omega, axis=1)), None)

    bases = jnp.arange(tris.shape[0], dtype=jnp.int32) * chunk
    init = (jnp.full((N,), jnp.inf, points.dtype),
            jnp.zeros((N,), jnp.int32),
            jnp.zeros((N,), points.dtype))
    (d2, idx, wind), _ = jax.lax.scan(body, init, (tris, bases))
    return d2, jnp.clip(idx, 0, F - 1), wind / (4.0 * math.pi)


def cal_sdf_batch(verts: jnp.ndarray, faces: jnp.ndarray, cmaps: jnp.ndarray,
                  vis: jnp.ndarray, points: jnp.ndarray, chunk: int = 512):
    """SMPL-guided local features for ICON's implicit query.

    Equivalent to the reference ``cal_sdf_batch`` (mesh_util.py:357-396):
    signed distance (positive inside), barycentric-interpolated body normal
    (with the reference's (-x, y, -z) flip), vertex colormap, and visibility
    (thresholded at 0.1), all at the closest surface point.

    Args:
      verts: ``[B, V, 3]``; faces: ``[F, 3]`` int (shared across batch);
      cmaps: ``[B, V, 3]``; vis: ``[B, V, 1]``; points: ``[B, N, 3]``.

    Returns: ``(sdf [B,N,1], normal [B,N,3], cmap [B,N,3], vis [B,N,1])``.
    """
    normals = vertex_normals(verts, faces)

    tris = face_vertices(verts, faces)          # [B, F, 3, 3]
    tri_norm = face_vertices(normals, faces)    # [B, F, 3, 3]
    tri_cmap = face_vertices(cmaps, faces)      # [B, F, 3, 3]
    tri_vis = face_vertices(vis, faces)         # [B, F, 3, 1]

    d2, idx, wind = jax.vmap(
        lambda p, t: point_mesh_dist_winding(p, t, chunk))(points, tris)

    def gather(tri_attr, idx_b):
        return jnp.take_along_axis(
            tri_attr, idx_b[:, None, None].astype(jnp.int32), axis=0)

    closest_tris = jax.vmap(gather)(tris, idx)          # [B, N, 3, 3]
    closest_norm = jax.vmap(gather)(tri_norm, idx)      # [B, N, 3, 3]
    closest_cmap = jax.vmap(gather)(tri_cmap, idx)      # [B, N, 3, 3]
    closest_vis = jax.vmap(gather)(tri_vis, idx)        # [B, N, 3, 1]

    bary = barycentric_projection_weights(points, closest_tris)  # [B, N, 3]
    w = bary[..., None]

    flip = jnp.array([-1.0, 1.0, -1.0], verts.dtype)
    pts_norm = jnp.sum(closest_norm * w, axis=-2) * flip
    pts_cmap = jnp.sum(closest_cmap * w, axis=-2)
    pts_vis = (jnp.sum(closest_vis * w, axis=-2) >= 0.1).astype(verts.dtype)

    pts_dist = jnp.sqrt(d2) / math.sqrt(3.0)
    inside = jnp.abs(wind) > 0.5
    pts_sdf = jnp.where(inside, pts_dist, -pts_dist)[..., None]
    # reference convention: positive inside (check_sign -> +1 inside)

    return pts_sdf, pts_norm, pts_cmap, pts_vis


def check_inside(verts: jnp.ndarray, faces: jnp.ndarray,
                 points: jnp.ndarray, chunk: int = 512) -> jnp.ndarray:
    """Winding-number inside test (kaolin ``check_sign`` / pyembree
    ``contains`` equivalent). Returns bool ``[B, N]``."""
    tris = face_vertices(verts, faces)

    def one(p, t):
        _, _, w = point_mesh_dist_winding(p, t, chunk)
        return jnp.abs(w) > 0.5

    return jax.vmap(one)(points, tris)
