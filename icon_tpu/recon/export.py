"""Occupancy grid -> mesh, following the reference export conventions.

Reference (seg3d_lossless.py:583-604 + apps/ICON.py:446-450): drop the
first slice along each axis, run marching at iso 0.5 in (x, y, z) vertex
order, then normalize vertices to [-1, 1] by (R-1)/2.

One deliberate deviation: the reference normalizes the *sliced*-grid vertex
indices directly, so its meshes sit one voxel (2/(R-1), ~0.78 x100-chamfer
units at 257) below/left/behind the true level set — the dropped first
slice shifts every index by +1. We add that +1 back before normalizing;
the fidelity gate (tests/test_recon_fidelity.py) pins the resulting
sub-voxel accuracy against an analytic surface.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from icon_tpu.recon.marching import (AutoMarcher, fetch_mesh,
                                     marching_tetrahedra_indexed)


def make_marcher(max_cells: int = 1 << 18, max_tris: int = 1 << 20,
                 iso: float = 0.5) -> AutoMarcher:
    """A serving-loop marcher for :func:`extract_mesh`: lattice wire
    (v2 implicit edge ids — ~6x fewer bytes over the tunneled host link
    than the explicit indexed mesh), buffer autotuning across frames, and
    the engine's dropped-first-slice convention built into the jitted
    kernel. Hold ONE of these across a run so the bucket executables and
    measured-count prefetches amortize."""
    return AutoMarcher(max_cells=max_cells, max_tris=max_tris,
                       max_verts=min(2 * max_tris, 1 << 21), iso=iso,
                       slice_one=True, codec="lattice")


def extract_mesh(occ: jnp.ndarray, iso: float = 0.5,
                 max_cells: int = 1 << 18, max_tris: int = 1 << 20,
                 normalize: bool = True,
                 marcher: AutoMarcher = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract (verts [V,3] float32, faces [F,3] int64) from ``occ [R,R,R]``
    ([z,y,x] layout). Vertices are in [-1, 1] when ``normalize`` (the
    reference's test_single rescale, using the *full* resolution R).

    Mesh extraction and vertex dedup run fully on device; only the compact
    vertex/face buffers are fetched. Pass a persistent ``marcher``
    (:func:`make_marcher`) to use the autotuned lattice wire — the serving
    configuration; the default one-shot path transfers the explicit
    indexed mesh (simpler, no cross-frame state, ~6x more bytes)."""
    R = occ.shape[0]
    if marcher is not None:
        assert marcher.slice_one, "extract_mesh marchers drop slice 0"
        out = marcher(occ)
        verts, faces = marcher.unpack(marcher.pack(out))
    else:
        final = occ[1:, 1:, 1:]
        out = marching_tetrahedra_indexed(
            final, iso, max_cells=max_cells, max_tris=max_tris,
            max_verts=min(2 * max_tris, 1 << 21))
        verts, faces = fetch_mesh(out)
    if normalize and len(verts):
        half = (R - 1) / 2.0
        # +1: sliced-grid index -> full-grid index (see module docstring)
        verts = (verts + 1.0 - half) / half
    return verts.astype(np.float32), np.asarray(faces, np.int64)
