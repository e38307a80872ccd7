"""Mesh tensor utilities: face gathering, vertex normals, barycentric weights.

References: ``face_vertices`` (lib/common/render_utils.py:149),
PyTorch3D ``Meshes.verts_normals_padded`` semantics used by ``cal_sdf_batch``
(lib/dataset/mesh_util.py:357-396), and
``barycentric_coordinates_of_projection`` (lib/dataset/mesh_util.py:319-354,
after Heidrich JGT'05).

TPU notes: vertex normals are a segment-sum (scatter-add) over faces — XLA
lowers ``.at[].add`` to an efficient sorted-scatter; everything is static
shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def face_vertices(attrs: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Gather per-vertex attributes onto faces.

    Args:
      attrs: ``[B, V, C]`` per-vertex attributes (positions, normals, ...).
      faces: ``[F, 3]`` or ``[B, F, 3]`` int vertex indices.

    Returns: ``[B, F, 3, C]``.
    """
    if faces.ndim == 2:
        return attrs[:, faces]                     # [B, F, 3, C]
    return jax.vmap(lambda a, f: a[f])(attrs, faces)


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray,
                 normalize: bool = True, eps: float = 1e-8) -> jnp.ndarray:
    """Per-face normals ``[B, F, 3]`` (right-hand rule over (v0, v1, v2))."""
    tris = face_vertices(verts, faces)
    n = jnp.cross(tris[..., 1, :] - tris[..., 0, :],
                  tris[..., 2, :] - tris[..., 0, :])
    if normalize:
        n2 = jnp.sum(n * n, axis=-1, keepdims=True)
        n = n / jnp.sqrt(jnp.maximum(n2, eps * eps))
    return n


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray,
                   eps: float = 1e-8) -> jnp.ndarray:
    """Area-weighted vertex normals, PyTorch3D ``verts_normals_padded``
    semantics: accumulate the *un-normalized* face cross products at each
    incident vertex, then L2-normalize.

    Args:
      verts: ``[B, V, 3]``; faces: ``[F, 3]`` shared across the batch.

    Returns: ``[B, V, 3]`` unit normals (zero stays zero).
    """
    fn = face_normals(verts, faces, normalize=False)      # [B, F, 3]
    V = verts.shape[1]

    def accumulate(fn_b):
        out = jnp.zeros((V, 3), fn_b.dtype)
        for k in range(3):
            out = out.at[faces[:, k]].add(fn_b)
        return out

    vn = jax.vmap(accumulate)(fn)
    # safe normalize: sqrt(max(n2, eps^2)) keeps the gradient finite at zero
    # (jnp.linalg.norm has a NaN gradient at exactly 0)
    n2 = jnp.sum(vn * vn, axis=-1, keepdims=True)
    return vn / jnp.sqrt(jnp.maximum(n2, eps * eps))


def barycentric_projection_weights(points: jnp.ndarray,
                                   triangles: jnp.ndarray,
                                   eps: float = 1e-6) -> jnp.ndarray:
    """Barycentric coordinates of each point's projection onto its triangle's
    plane (Heidrich JGT'05). Weights may lie outside [0,1] when the projection
    falls outside the triangle — by design, matching the reference's use for
    feature extrapolation.

    Args:
      points: ``[..., 3]``; triangles: ``[..., 3, 3]`` (matching batch dims).

    Returns: ``[..., 3]`` weights (w0, w1, w2).
    """
    v0 = triangles[..., 0, :]
    u = triangles[..., 1, :] - v0
    v = triangles[..., 2, :] - v0
    n = jnp.cross(u, v)
    s = jnp.sum(n * n, axis=-1)
    s = jnp.where(s == 0, eps, s)
    w = points - v0
    b2 = jnp.sum(jnp.cross(u, w) * n, axis=-1) / s
    b1 = jnp.sum(jnp.cross(w, v) * n, axis=-1) / s
    return jnp.stack([1.0 - b1 - b2, b1, b2], axis=-1)
