"""Occupancy grid -> mesh, reproducing the reference export conventions.

Reference (seg3d_lossless.py:583-604 + apps/ICON.py:755-759): drop the first
slice along each axis, run marching at iso 0.5 in (x, y, z) vertex order,
then normalize vertices to [-1, 1] by (R-1)/2.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from icon_tpu.recon.marching import dedup_triangle_soup, marching_tetrahedra


def extract_mesh(occ: jnp.ndarray, iso: float = 0.5,
                 max_cells: int = 1 << 19, max_tris: int = 1 << 21,
                 normalize: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Extract (verts [V,3] float32, faces [F,3] int64) from ``occ [R,R,R]``
    ([z,y,x] layout). Vertices are in [-1, 1] when ``normalize`` (the
    reference's test_single rescale, using the *full* resolution R)."""
    R = occ.shape[0]
    final = occ[1:, 1:, 1:]
    tri_verts, tri_mask, n_cells, n_tris = marching_tetrahedra(
        final, iso, max_cells=max_cells, max_tris=max_tris)
    verts, faces = dedup_triangle_soup(np.asarray(tri_verts),
                                       np.asarray(tri_mask))
    if normalize:
        half = (R - 1) / 2.0
        verts = (verts - half) / half
    return verts.astype(np.float32), faces
