"""Orthographic camera conventions for turntable rendering.

The reference uses PyTorch3D FoVOrthographicCameras at azimuths
(0, 90, 180, 270) with R, T from look_at_view_transform(dist=100)
(lib/common/render.py:120-180). We reproduce the same image-space mapping
with plain matrices: meshes live in [-1, 1]^3, y up; image rows run top-down.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp


def view_matrix(azimuth_deg: float) -> np.ndarray:
    """Rotation bringing world verts into camera frame for a given azimuth
    (y-axis turntable)."""
    a = math.radians(azimuth_deg)
    # rotate mesh by -azimuth about y, camera looks along +z
    c, s = math.cos(a), math.sin(a)
    return np.array([[c, 0.0, -s],
                     [0.0, 1.0, 0.0],
                     [s, 0.0, c]], np.float32)


def verts_to_ndc(verts: jnp.ndarray, azimuth_deg: float = 0.0) -> jnp.ndarray:
    """World verts [V, 3] (y up) -> rasterizer NDC: x right, y DOWN, smaller
    z closer (camera at +z looking toward -z for azimuth 0, i.e. front view
    matches the reference's image orientation)."""
    R = jnp.asarray(view_matrix(azimuth_deg))
    v = verts @ R.T
    # flip y (image rows top-down), flip z so the front (+z) is closer
    return v * jnp.array([1.0, -1.0, -1.0], verts.dtype)


def ortho_views() -> Tuple[float, ...]:
    """The reference's four evaluation azimuths (render.py:150)."""
    return (0.0, 90.0, 180.0, 270.0)
