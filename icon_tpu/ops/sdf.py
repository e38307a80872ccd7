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

**TPU layout**: all inner math is structure-of-arrays — 2-D ``[points,
faces]`` planes only, one per scalar component. Any ``[..., 3]`` trailing
axis on a large tensor would be tile-padded 3→128 by the TPU layout (42x
memory); SoA keeps the face axis in lanes and the point axis in sublanes.

A fused Pallas kernel (ops/pallas/) can replace the scan on TPU for further
fusion control; this module is the numerics reference and the
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


# ---------------------------------------------------------------------------
# SoA primitives: p* are [N, 1] point planes, v* are [1, C] triangle planes;
# every temp is a [N, C] tile.
# ---------------------------------------------------------------------------

def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _tri_dist_sq_soa(px, py, pz, t):
    """Squared point-triangle distance. t = 9 planes (v0x..v2z)."""
    v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = t
    ux, uy, uz = v1x - v0x, v1y - v0y, v1z - v0z
    vx, vy, vz = v2x - v0x, v2y - v0y, v2z - v0z
    nx, ny, nz = _cross3(ux, uy, uz, vx, vy, vz)
    n2 = _dot3(nx, ny, nz, nx, ny, nz)
    degenerate = n2 <= 1e-12
    wx, wy, wz = px - v0x, py - v0y, pz - v0z

    # barycentric coords of the plane projection (Heidrich)
    s = jnp.where(degenerate, 1e-6, n2)
    cx, cy, cz = _cross3(ux, uy, uz, wx, wy, wz)
    b2 = _dot3(cx, cy, cz, nx, ny, nz) / s
    cx, cy, cz = _cross3(wx, wy, wz, vx, vy, vz)
    b1 = _dot3(cx, cy, cz, nx, ny, nz) / s
    b0 = 1.0 - b1 - b2
    inside = (b0 >= 0) & (b0 <= 1) & (b1 >= 0) & (b1 <= 1) & \
        (b2 >= 0) & (b2 <= 1)

    pn = _dot3(wx, wy, wz, nx, ny, nz)
    d_plane = jnp.where(inside & ~degenerate,
                        pn * pn / jnp.maximum(n2, 1e-12), jnp.inf)

    def seg(ax_, ay_, az_, bx_, by_, bz_):
        ex, ey, ez = bx_ - ax_, by_ - ay_, bz_ - az_
        sx, sy, sz = px - ax_, py - ay_, pz - az_
        tt = jnp.clip(_dot3(sx, sy, sz, ex, ey, ez) /
                      jnp.maximum(_dot3(ex, ey, ez, ex, ey, ez), 1e-12),
                      0.0, 1.0)
        dx, dy, dz = sx - tt * ex, sy - tt * ey, sz - tt * ez
        return _dot3(dx, dy, dz, dx, dy, dz)

    d = jnp.minimum(d_plane, seg(v0x, v0y, v0z, v1x, v1y, v1z))
    d = jnp.minimum(d, seg(v1x, v1y, v1z, v2x, v2y, v2z))
    return jnp.minimum(d, seg(v2x, v2y, v2z, v0x, v0y, v0z))


def _solid_angle_soa(px, py, pz, t):
    """van Oosterom–Strackee signed solid angle, SoA planes."""
    v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = t
    ax, ay, az = v0x - px, v0y - py, v0z - pz
    bx, by, bz = v1x - px, v1y - py, v1z - pz
    cx, cy, cz = v2x - px, v2y - py, v2z - pz
    la = jnp.sqrt(_dot3(ax, ay, az, ax, ay, az))
    lb = jnp.sqrt(_dot3(bx, by, bz, bx, by, bz))
    lc = jnp.sqrt(_dot3(cx, cy, cz, cx, cy, cz))
    kx, ky, kz = _cross3(bx, by, bz, cx, cy, cz)
    det = _dot3(ax, ay, az, kx, ky, kz)
    den = (la * lb * lc + _dot3(ax, ay, az, bx, by, bz) * lc +
           _dot3(bx, by, bz, cx, cy, cz) * la +
           _dot3(cx, cy, cz, ax, ay, az) * lb)
    return 2.0 * jnp.arctan2(det, den)


def _tri_planes(triangles: jnp.ndarray, chunk: int):
    """[F, 3, 3] -> 9 planes [n_chunks, chunk] (padded with _FAR)."""
    F = triangles.shape[0]
    pad = (-F) % chunk
    if pad:
        filler = jnp.full((pad, 3, 3), _FAR, triangles.dtype)
        triangles = jnp.concatenate([triangles, filler], axis=0)
    t = triangles.reshape(-1, chunk, 3, 3)
    return tuple(t[:, :, j, k] for j in range(3) for k in range(3))


@functools.partial(jax.jit, static_argnames=("chunk", "point_chunk"))
def point_mesh_dist_winding(points: jnp.ndarray, triangles: jnp.ndarray,
                            chunk: int = 1024, point_chunk: int = 8192):
    """Fused brute-force sweep: for each point, the squared distance to the
    mesh, the index of the closest triangle, and the winding number.

    Both axes are tiled (outer scan over point chunks, inner scan over face
    chunks) so live memory stays at ``point_chunk x chunk`` 2-D planes.

    Args:
      points: ``[N, 3]``; triangles: ``[F, 3, 3]``.

    Returns: ``(dist_sq [N], tri_idx [N] int32, winding [N])``.
    """
    N = points.shape[0]
    F = triangles.shape[0]
    planes = _tri_planes(triangles, chunk)            # 9 x [nc, chunk]
    bases = jnp.arange(planes[0].shape[0], dtype=jnp.int32) * chunk

    pc = min(point_chunk, N)
    n_pad = (-N) % pc
    pts = jnp.concatenate(
        [points, jnp.zeros((n_pad, 3), points.dtype)])
    # SoA point planes [n_blocks, pc, 1]
    pxs = pts[:, 0].reshape(-1, pc, 1)
    pys = pts[:, 1].reshape(-1, pc, 1)
    pzs = pts[:, 2].reshape(-1, pc, 1)

    def point_block(_, blk):
        px, py, pz = blk

        def body(carry, inputs):
            best_d2, best_idx, wind = carry
            t9, base = inputs                          # 9 x [chunk], scalar
            t = tuple(x[None, :] for x in t9)          # [1, chunk]
            d2 = _tri_dist_sq_soa(px, py, pz, t)       # [pc, chunk]
            omega = _solid_angle_soa(px, py, pz, t)
            cmin = jnp.min(d2, axis=1)
            cidx = jnp.argmin(d2, axis=1).astype(jnp.int32) + base
            better = cmin < best_d2
            return ((jnp.where(better, cmin, best_d2),
                     jnp.where(better, cidx, best_idx),
                     wind + jnp.sum(omega, axis=1)), None)

        init = (jnp.full((pc,), jnp.inf, points.dtype),
                jnp.zeros((pc,), jnp.int32),
                jnp.zeros((pc,), points.dtype))
        (d2, idx, wind), _ = jax.lax.scan(body, init, (planes, bases))
        return None, (d2, idx, wind)

    _, (d2, idx, wind) = jax.lax.scan(point_block, None, (pxs, pys, pzs))
    d2 = d2.reshape(-1)[:N]
    idx = idx.reshape(-1)[:N]
    wind = wind.reshape(-1)[:N]
    return d2, jnp.clip(idx, 0, F - 1), wind / (4.0 * math.pi)


def cal_sdf_batch(verts: jnp.ndarray, faces: jnp.ndarray, cmaps: jnp.ndarray,
                  vis: jnp.ndarray, points: jnp.ndarray, chunk: int = 1024):
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
                 points: jnp.ndarray, chunk: int = 1024) -> jnp.ndarray:
    """Winding-number inside test (kaolin ``check_sign`` / pyembree
    ``contains`` equivalent). Returns bool ``[B, N]``."""
    tris = face_vertices(verts, faces)

    def one(p, t):
        _, _, w = point_mesh_dist_winding(p, t, chunk)
        return jnp.abs(w) > 0.5

    return jax.vmap(one)(points, tris)
