"""Mesh rendering utilities (reference lib/common/render.py:111-387).

The reference's Render class wraps PyTorch3D: normals as vertex colors,
soft silhouettes, depth maps, and per-vertex RGB querying (query_color,
render.py:60-84). Here each is a thin functional wrapper over the tile
rasterizer; all are jittable and differentiable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from icon_tpu.ops.grid_sample import grid_sample_2d
from icon_tpu.ops.mesh import vertex_normals
from icon_tpu.ops.raster import rasterize
from icon_tpu.render.camera import verts_to_ndc


def render_normal(verts: jnp.ndarray, faces: jnp.ndarray,
                  size: int = 512, azimuth: float = 0.0,
                  K: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normal image in [-1, 1] (reference get_rgb_image w/ normal shader:
    colors = vertex normals in the view frame — x right, y up, z toward the
    viewer). Returns (normal [H,W,3], mask [H,W])."""
    from icon_tpu.render.camera import view_matrix
    vn = vertex_normals(verts[None], faces)[0]          # [V, 3] world
    R = jnp.asarray(view_matrix(azimuth))
    vn_view = vn @ R.T                                  # rotate into view
    ndc = verts_to_ndc(verts, azimuth)
    out = rasterize(ndc, faces, vn_view, H=size, W=size, K=K)
    return out.attr, out.mask


def render_normal_sil(verts: jnp.ndarray, faces: jnp.ndarray,
                      size: int = 512, azimuth: float = 0.0,
                      K: int = 256):
    """One rasterization for both fitting targets: (normal [H,W,3],
    mask [H,W], soft silhouette [H,W]). The SMPL fit loss needs normals
    AND silhouettes per view; rasterizing once halves the differentiable
    raster work (and its grad graph) in the jitted fit step."""
    from icon_tpu.render.camera import view_matrix
    vn = vertex_normals(verts[None], faces)[0]
    R = jnp.asarray(view_matrix(azimuth))
    ndc = verts_to_ndc(verts, azimuth)
    out = rasterize(ndc, faces, vn @ R.T, H=size, W=size, K=K)
    return out.attr, out.mask, out.silhouette


def render_silhouette(verts: jnp.ndarray, faces: jnp.ndarray,
                      size: int = 512, azimuth: float = 0.0,
                      K: int = 256) -> jnp.ndarray:
    """Soft silhouette [H, W] (reference get_silhouette_image,
    render.py:376-387)."""
    ndc = verts_to_ndc(verts, azimuth)
    out = rasterize(ndc, faces, jnp.zeros((verts.shape[0], 1)),
                    H=size, W=size, K=K)
    return out.silhouette


def render_depth(verts: jnp.ndarray, faces: jnp.ndarray,
                 size: int = 512, azimuth: float = 0.0,
                 K: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ndc = verts_to_ndc(verts, azimuth)
    out = rasterize(ndc, faces, jnp.zeros((verts.shape[0], 1)),
                    H=size, W=size, K=K)
    return out.depth, out.mask


def render_color(verts: jnp.ndarray, faces: jnp.ndarray,
                 colors: jnp.ndarray, size: int = 512,
                 azimuth: float = 0.0, K: int = 256,
                 bg: float = 0.5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vertex-colored render on a gray background (reference
    get_rendered_video's clean_mesh shader, render.py:327-374 — there the
    colors are (normal+1)/2; we pass query_color's RGB texture).
    Returns (rgb [H,W,3] in [0,1], mask [H,W])."""
    ndc = verts_to_ndc(verts, azimuth)
    out = rasterize(ndc, faces, colors, H=size, W=size, K=K)
    m = out.mask[..., None]
    return out.attr * m + bg * (1.0 - m), out.mask


def make_turntable_renderer(faces: jnp.ndarray, colors: jnp.ndarray,
                            size: int = 512, K: int = 256, bg: float = 0.5):
    """One jitted executable for every turntable frame: the azimuth enters
    as a pre-rotated vertex array (a [V,3]@[3,3] host matmul), so 360
    frames share a single compile instead of retracing per angle."""
    faces = jnp.asarray(faces)
    colors = jnp.asarray(colors)
    flip = jnp.asarray(np.array([1.0, -1.0, -1.0], np.float32))

    @jax.jit
    def render(v_rot):
        out = rasterize(v_rot * flip, faces, colors, H=size, W=size, K=K)
        m = out.mask[..., None]
        return out.attr * m + bg * (1.0 - m)

    return render


def query_color(verts: jnp.ndarray, faces: jnp.ndarray,
                image: jnp.ndarray,
                visibility: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-vertex RGB from the input image (reference query_color,
    render.py:60-84): visible vertices sample the image bilinearly;
    invisible ones get their (normal+1)/2 color.

    Args:
      verts: [V, 3] in [-1, 1] (y up, +z toward camera);
      image: [H, W, 3] in [-1, 1];
      visibility: optional [V, 1] (computed via raster if absent).

    Returns: [V, 3] colors in [0, 1].
    """
    from icon_tpu.ops.raster import vertex_visibility
    ndc = verts_to_ndc(verts)
    if visibility is None:
        visibility = vertex_visibility(ndc, faces)
    uv = ndc[None, :, :2]                               # x right, y down
    rgb = (grid_sample_2d(image[None], uv)[0] + 1.0) * 0.5
    vn = vertex_normals(verts[None], faces)[0]
    fallback = (vn + 1.0) * 0.5
    return jnp.where(visibility > 0.5, rgb, fallback)
