"""Rotation / camera math for PyMAF (reference lib/pymaf/utils/geometry.py).

All pure jnp; used by the regressor (rot6d) and the mesh-aligned feature
projection (weak-perspective camera).
"""

from __future__ import annotations

import jax.numpy as jnp


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> [N, 3, 3] (Zhou et al. CVPR'19;
    reference geometry.py:229-247 Gram-Schmidt)."""
    x = x.reshape(-1, 3, 2)
    a1 = x[:, :, 0]
    a2 = x[:, :, 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=1, keepdims=True), 1e-8)
    dot = jnp.sum(b1 * a2, axis=1, keepdims=True)
    b2u = a2 - dot * b1
    b2 = b2u / jnp.maximum(jnp.linalg.norm(b2u, axis=1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_angle_axis(R: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """[N, 3, 3] -> [N, 3] axis-angle (log map; reference uses
    rotation_matrix_to_angle_axis from kornia-style quaternion path)."""
    trace = R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0 + eps, 1.0 - eps)
    angle = jnp.arccos(cos)
    axis = jnp.stack([R[:, 2, 1] - R[:, 1, 2],
                      R[:, 0, 2] - R[:, 2, 0],
                      R[:, 1, 0] - R[:, 0, 1]], axis=1)
    sin = jnp.sin(angle)[:, None]
    axis = axis / jnp.maximum(2.0 * sin, eps)
    return axis * angle[:, None]


def identity_rot6d(n_joints: int) -> jnp.ndarray:
    """[n_joints*6] 6D encoding of identity rotations (mean-params
    fallback when data/smpl_mean_params.npz is absent)."""
    # layout matches the (3, 2)-reshape in rot6d_to_rotmat: entries
    # interleave as [a1x, a2x, a1y, a2y, a1z, a2z]
    one = jnp.array([1.0, 0.0, 0.0, 1.0, 0.0, 0.0])
    return jnp.tile(one, (n_joints,))


def weak_perspective_projection(points: jnp.ndarray,
                                cam: jnp.ndarray,
                                focal: float = 5000.0,
                                img_res: float = 224.0) -> jnp.ndarray:
    """[B, N, 3] + cam [B, 3] (s, tx, ty) -> [B, N, 2] in [-1, 1].

    Exact reference formula (geometry.py:246-264 ``projection``): a
    *perspective* camera at t = (tx, ty, 2*focal/(img_res*s)) with focal
    5000 px on a 224 px image, normalized by img_res/2 — not the s*(x+t)
    weak-perspective limit (which deviates ~Z*s/45, ~2% over a body)."""
    s = cam[:, 0]
    tz = 2.0 * focal / (img_res * s + 1e-9)
    X = points[..., 0] + cam[:, None, 1]
    Y = points[..., 1] + cam[:, None, 2]
    Z = points[..., 2] + tz[:, None]
    xy = jnp.stack([focal * X / Z, focal * Y / Z], axis=-1)
    return xy / (img_res / 2.0)
