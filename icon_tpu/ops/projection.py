"""Calibration-matrix projections of 3D points into the image plane.

Equivalent math to the reference's ``lib/net/geometry.py:46-82``
(``orthogonal``/``perspective``), with points channel-last ``[B, N, 3]``
instead of ``[B, 3, N]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def orthogonal(points: jnp.ndarray,
               calibrations: jnp.ndarray,
               transforms: jnp.ndarray | None = None) -> jnp.ndarray:
    """Orthogonal projection by a ``[B, 3or4, 4]`` calibration matrix.

    Args:
      points: ``[B, N, 3]`` 3D points.
      calibrations: ``[B, 3, 4]`` or ``[B, 4, 4]`` projection matrices.
      transforms: optional ``[B, 2, 3]`` image-space affine.

    Returns:
      ``[B, N, 3]`` xyz in normalized image coordinates.
    """
    rot = calibrations[:, :3, :3]                     # [B, 3, 3]
    trans = calibrations[:, :3, 3]                    # [B, 3]
    pts = jnp.einsum("bij,bnj->bni", rot, points, precision=jax.lax.Precision.HIGHEST) + trans[:, None, :]
    if transforms is not None:
        scale = transforms[:, :2, :2]
        shift = transforms[:, :2, 2]
        xy = jnp.einsum("bij,bnj->bni", scale, pts[..., :2], precision=jax.lax.Precision.HIGHEST) + shift[:, None, :]
        pts = jnp.concatenate([xy, pts[..., 2:3]], axis=-1)
    return pts


def perspective(points: jnp.ndarray,
                calibrations: jnp.ndarray,
                transforms: jnp.ndarray | None = None) -> jnp.ndarray:
    """Perspective projection; returns ``[B, N, 3]`` = (x/z, y/z, z)."""
    rot = calibrations[:, :3, :3]
    trans = calibrations[:, :3, 3]
    homo = jnp.einsum("bij,bnj->bni", rot, points, precision=jax.lax.Precision.HIGHEST) + trans[:, None, :]
    xy = homo[..., :2] / homo[..., 2:3]
    if transforms is not None:
        scale = transforms[:, :2, :2]
        shift = transforms[:, :2, 2]
        xy = jnp.einsum("bij,bnj->bni", scale, xy, precision=jax.lax.Precision.HIGHEST) + shift[:, None, :]
    return jnp.concatenate([xy, homo[..., 2:3]], axis=-1)


def project(points: jnp.ndarray,
            calibrations: jnp.ndarray,
            transforms: jnp.ndarray | None = None,
            mode: str = "orthogonal") -> jnp.ndarray:
    if mode == "orthogonal":
        return orthogonal(points, calibrations, transforms)
    if mode == "perspective":
        return perspective(points, calibrations, transforms)
    raise ValueError(f"unknown projection mode {mode!r}")
