"""Differentiable tile-based mesh rasterizer.

Replaces PyTorch3D's CUDA rasterizer for everything the reference uses it
for: normal/depth images and soft silhouettes in the SMPL & cloth refinement
loops (lib/common/render.py:111-387, apps/infer.py:200-239) and vertex
visibility (lib/dataset/mesh_util.py:280-316).

TPU-first design (two-level binning, the classic tile raster pipeline):

1. **Bin**: a dense [tiles, F] overlap matrix (cheap: conservative bbox vs
   tile test, ~5M bools for 512^2/20k faces) is compacted per tile into a
   static [tiles, K] face list via row-wise cumsum + one scatter. No
   data-dependent shapes; overflow counts are returned for diagnostics.
2. **Raster**: ``lax.map`` over tile chunks evaluates edge functions for
   (pixel, face) pairs inside each tile, z-buffers via argmin depth, and
   interpolates vertex attributes barycentrically. Gradients flow to vertex
   positions through the barycentric weights and to attributes through the
   interpolation — the same differentiability contract as PyTorch3D's hard
   rasterizer + SoftSilhouetteShader combo the reference relies on.

Conventions: verts in NDC [-1, 1], x right / y DOWN (image row = (y+1)/2 * H),
z toward the viewer NEGATIVE... no — smaller z is CLOSER (camera looks along
+z). Callers adapt signs (the reference scatters sign flips through calibs;
we centralize them in icon_tpu.render).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class RasterOut(NamedTuple):
    attr: jnp.ndarray          # [H, W, C] interpolated attributes
    depth: jnp.ndarray         # [H, W] z of closest face (BIG where empty)
    mask: jnp.ndarray          # [H, W] hard coverage (0/1 float)
    silhouette: jnp.ndarray    # [H, W] soft coverage (differentiable)
    pix_to_face: jnp.ndarray   # [H, W] int32, -1 where empty
    bin_overflow: jnp.ndarray  # scalar int32: dropped (tile,face) pairs


_BIG = 1e9


def _bin_faces(xy: jnp.ndarray, tiles_x: int, tiles_y: int, tile: int,
               H: int, W: int, K: int):
    """Conservative face->tile binning. xy: [F, 3, 2] pixel coords."""
    F = xy.shape[0]
    fx_min = jnp.min(xy[..., 0], axis=1)
    fx_max = jnp.max(xy[..., 0], axis=1)
    fy_min = jnp.min(xy[..., 1], axis=1)
    fy_max = jnp.max(xy[..., 1], axis=1)

    tx0 = jnp.clip(jnp.floor(fx_min / tile), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(fx_max / tile), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(fy_min / tile), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(fy_max / tile), 0, tiles_y - 1).astype(jnp.int32)
    offscreen = (fx_max < 0) | (fx_min > W) | (fy_max < 0) | (fy_min > H)

    ty = jax.lax.broadcasted_iota(jnp.int32, (tiles_y * tiles_x, F), 0) \
        // tiles_x
    tx = jax.lax.broadcasted_iota(jnp.int32, (tiles_y * tiles_x, F), 0) \
        % tiles_x
    overlap = ((tx >= tx0[None]) & (tx <= tx1[None]) &
               (ty >= ty0[None]) & (ty <= ty1[None]) &
               ~offscreen[None])                        # [T, F]

    pos = jnp.cumsum(overlap.astype(jnp.int32), axis=1) - 1   # [T, F]
    take = overlap & (pos < K)
    n_tiles = tiles_y * tiles_x
    flat_to = jnp.where(take, pos, K) + \
        jax.lax.broadcasted_iota(jnp.int32, (n_tiles, F), 0) * (K + 1)
    face_ids = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, F), 1)
    buf = jnp.full((n_tiles * (K + 1),), -1, jnp.int32)
    buf = buf.at[flat_to.reshape(-1)].set(face_ids.reshape(-1), mode="drop")
    face_list = buf.reshape(n_tiles, K + 1)[:, :K]
    overflow = jnp.sum(jnp.maximum(pos[:, -1] + 1 - K, 0))
    return face_list, overflow


@functools.partial(jax.jit, static_argnames=("H", "W", "tile", "K",
                                             "tiles_per_step"))
def rasterize(verts_ndc: jnp.ndarray, faces: jnp.ndarray,
              attrs: jnp.ndarray, H: int = 512, W: int = 512,
              tile: int = 32, K: int = 256, sigma: float = 1e-4,
              tiles_per_step: int = 16) -> RasterOut:
    """Rasterize one mesh.

    Args:
      verts_ndc: ``[V, 3]`` (x, y in [-1,1], z depth — smaller is closer).
      faces: ``[F, 3]`` int32.
      attrs: ``[V, C]`` per-vertex attributes to interpolate.
      sigma: softness of the silhouette sigmoid in NDC^2 units (PyTorch3D's
        blend sigma; 1e-4 default matches its SoftSilhouetteShader).

    Returns: RasterOut with [H, W, ...] images.
    """
    V = verts_ndc.shape[0]
    F = faces.shape[0]
    C = attrs.shape[-1]

    # pixel coords: pixel center (i + 0.5) ; x = (ndc+1)/2 * W
    xy_pix = (verts_ndc[:, :2] + 1.0) * 0.5 * jnp.array([W, H])
    z = verts_ndc[:, 2]

    tri_xy = xy_pix[faces]                         # [F, 3, 2]
    tri_z = z[faces]                               # [F, 3]
    tri_attr = attrs[faces]                        # [F, 3, C]

    tiles_x = (W + tile - 1) // tile
    tiles_y = (H + tile - 1) // tile
    n_tiles = tiles_x * tiles_y
    face_list, overflow = _bin_faces(tri_xy, tiles_x, tiles_y, tile, H, W, K)

    # per-pixel offsets within a tile
    py = (jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 0) + 0.5)
    px = (jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 1) + 0.5)

    def raster_tiles(tile_ids):                    # [nt]
        t_faces = face_list[tile_ids]              # [nt, K]
        valid_f = t_faces >= 0
        tf = jnp.maximum(t_faces, 0)
        xy = tri_xy[tf]                            # [nt, K, 3, 2]
        zz = tri_z[tf]                             # [nt, K, 3]
        aa = tri_attr[tf]                          # [nt, K, 3, C]

        ty = (tile_ids // tiles_x).astype(jnp.float32) * tile
        tx = (tile_ids % tiles_x).astype(jnp.float32) * tile
        pxx = px[None] + tx[:, None, None]         # [nt, tile, tile]
        pyy = py[None] + ty[:, None, None]
        p = jnp.stack([pxx, pyy], -1).reshape(-1, tile * tile, 1, 2)

        v0 = xy[:, None, :, 0]                     # [nt, 1, K, 2]
        v1 = xy[:, None, :, 1]
        v2 = xy[:, None, :, 2]

        def edge(a, b):
            return ((b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) -
                    (b[..., 1] - a[..., 1]) * (p[..., 0] - a[..., 0]))

        e0 = edge(v1, v2)                          # [nt, P, K]
        e1 = edge(v2, v0)
        e2 = edge(v0, v1)
        area = ((v1[..., 0] - v0[..., 0]) * (v2[..., 1] - v0[..., 1]) -
                (v1[..., 1] - v0[..., 1]) * (v2[..., 0] - v0[..., 0]))
        area = jnp.where(jnp.abs(area) < 1e-9, 1e-9, area)

        w0 = e0 / area                             # barycentric (two-sided)
        w1 = e1 / area
        w2 = e2 / area
        # -1e-6 tolerance: on a shared edge fp error can push BOTH adjacent
        # triangles' edge tests slightly negative, opening 1px cracks that
        # let occluded geometry bleed through (breaks face-id visibility);
        # slight double-coverage instead is resolved by the z-buffer.
        inside = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6) & \
            valid_f[:, None, :]

        zpix = w0 * zz[:, None, :, 0] + w1 * zz[:, None, :, 1] + \
            w2 * zz[:, None, :, 2]                 # [nt, P, K]
        zsel = jnp.where(inside, zpix, _BIG)
        best = jnp.argmin(zsel, axis=2)            # [nt, P]
        bdepth = jnp.take_along_axis(zsel, best[..., None], 2)[..., 0]
        bmask = (bdepth < _BIG).astype(jnp.float32)

        take = lambda arr: jnp.take_along_axis(arr, best[..., None], 2)[..., 0]
        bw0, bw1, bw2 = take(w0), take(w1), take(w2)
        bf = jnp.take_along_axis(tf[:, None, :].repeat(tile * tile, 1),
                                 best[..., None], 2)[..., 0]
        battr = (bw0[..., None] *
                 jnp.take_along_axis(aa[:, None, :, 0],
                                     best[..., None, None], 2)[:, :, 0] +
                 bw1[..., None] *
                 jnp.take_along_axis(aa[:, None, :, 1],
                                     best[..., None, None], 2)[:, :, 0] +
                 bw2[..., None] *
                 jnp.take_along_axis(aa[:, None, :, 2],
                                     best[..., None, None], 2)[:, :, 0])
        battr = battr * bmask[..., None]
        bface = jnp.where(bmask > 0, bf, -1)

        # soft silhouette: signed 2D distance (normalized edge functions),
        # sigmoid-blended over faces (SoftRas aggregation)
        def elen(a, b):
            return jnp.sqrt(jnp.sum((b - a) ** 2, axis=-1) + 1e-12)

        scale = 0.5 * jnp.array([W + H], jnp.float32)  # px -> ~ndc units
        d0 = e0 / elen(v1, v2)
        d1 = e1 / elen(v2, v0)
        d2 = e2 / elen(v0, v1)
        sgn = jnp.sign(area)
        sdist = jnp.minimum(jnp.minimum(d0 * sgn, d1 * sgn), d2 * sgn) \
            / scale                                # [nt, P, K], + inside
        z = jnp.sign(sdist) * sdist * sdist / sigma
        z = jnp.where(valid_f[:, None, :], z, -jnp.inf)
        # SoftRas aggregation 1 - prod(1 - sigmoid(z)) in log space:
        # prod(1-p) = exp(-sum softplus(z)); jnp.prod's VJP divides by its
        # inputs, which NaNs as soon as one sigmoid saturates to 1.
        log1mp = -jax.nn.softplus(z)               # log(1 - p), stable
        log1mp = jnp.where(jnp.isfinite(z), log1mp, 0.0)
        sil = -jnp.expm1(jnp.sum(log1mp, axis=2))

        return battr, bdepth, bmask, sil, bface

    step = min(tiles_per_step, n_tiles)
    n_pad = (-n_tiles) % step
    tile_ids = jnp.concatenate(
        [jnp.arange(n_tiles, dtype=jnp.int32),
         jnp.zeros((n_pad,), jnp.int32)]).reshape(-1, step)
    battr, bdepth, bmask, sil, bface = jax.lax.map(raster_tiles, tile_ids)

    def untile(x):
        # [steps, step, tile*tile, ...] -> [H, W, ...]
        x = x.reshape(-1, *x.shape[2:])[:n_tiles]
        x = x.reshape(tiles_y, tiles_x, tile, tile, *x.shape[2:])
        x = jnp.moveaxis(x, 2, 1).reshape(tiles_y * tile, tiles_x * tile,
                                          *x.shape[4:])
        return x[:H, :W]

    return RasterOut(attr=untile(battr), depth=untile(bdepth),
                     mask=untile(bmask), silhouette=untile(sil),
                     pix_to_face=untile(bface), bin_overflow=overflow)


def vertex_visibility(verts_ndc: jnp.ndarray, faces: jnp.ndarray,
                      res: int = 1024) -> jnp.ndarray:
    """Per-vertex visibility with the reference's face-id semantics
    (mesh_util.py:280-316, rasterize + unique(pix_to_face) -> the vertices of
    every front-most face are visible): one scatter over the pix_to_face
    image — no depth-epsilon tuning. The reference rasterizes at 4096^2;
    at SMPL face density 1024^2 already gives every front face tens of
    pixels, and ``res`` scales up for exactness. Returns ``[V, 1]``."""
    V = verts_ndc.shape[0]
    out = rasterize(verts_ndc, faces, jnp.zeros((V, 1)),
                    H=res, W=res, K=512)
    pf = out.pix_to_face.reshape(-1)                  # [res*res]
    fv = faces[jnp.maximum(pf, 0)]                    # [P, 3] vertex ids
    fv = jnp.where(pf[:, None] >= 0, fv, V)           # invalid -> OOB slot
    vis = jnp.zeros((V,), jnp.float32).at[fv.reshape(-1)].set(
        1.0, mode="drop")
    return vis[:, None]


@functools.partial(jax.jit, static_argnames=("res",))
def vertex_visibility_depth(verts_ndc: jnp.ndarray, faces: jnp.ndarray,
                            res: int = 512,
                            eps_px: float = 1.0) -> jnp.ndarray:
    """Per-vertex *point* visibility by shadow-map depth compare.

    ``vertex_visibility``'s face-id semantics (visible iff an adjoining face
    wins a pixel) is the right match for the reference's color-query
    visibility, but it leaks light in creases: a face straddling a concavity
    wins pixels on its lit side and drags its shadowed vertices along.
    PRT transport (prt_util.py computePRT casts per-vertex embree rays)
    needs the point test. Here: one depth raster per direction, then each
    vertex — offset along its face normals' average like the reference's
    ``delta`` ray-origin offset — passes iff its depth reaches the buffer,
    PCF-filtered over the 2x2 neighboring texels (binary compare per texel,
    bilinear blend of the results; interpolating depth itself would mix in
    background BIG values). On the test snowman this correlates 0.9995 with
    the literal ray-cast algorithm vs 0.913 for face-id semantics
    (tests/test_prt.py).

    Returns ``[V]`` fractional visibility in [0, 1].
    """
    from icon_tpu.ops.mesh import vertex_normals

    V = verts_ndc.shape[0]
    out = rasterize(verts_ndc, faces, jnp.zeros((V, 1)), H=res, W=res,
                    K=512)
    vn = vertex_normals(verts_ndc[None], faces)[0]
    ext = jnp.min(jnp.max(verts_ndc, 0) - jnp.min(verts_ndc, 0))
    q = verts_ndc + (1e-3 * ext) * vn          # prt_util.py's delta offset
    xy = (q[:, :2] + 1.0) * 0.5 * res - 0.5    # pixel-center coords
    zq = q[:, 2]
    x0 = jnp.floor(xy[:, 0]).astype(jnp.int32)
    y0 = jnp.floor(xy[:, 1]).astype(jnp.int32)
    fx = xy[:, 0] - x0
    fy = xy[:, 1] - y0
    eps = eps_px * (2.0 / res)                 # ~a pixel of surface slope
    vis = jnp.zeros((V,), jnp.float32)
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            xi = jnp.clip(x0 + dx, 0, res - 1)
            yi = jnp.clip(y0 + dy, 0, res - 1)
            d = out.depth[yi, xi]
            vis = vis + (wx * wy) * (zq <= d + eps)
    return vis
