"""Synthetic geometry for tests and benchmarks (no SMPL assets required).

The benchmark body is an icosphere subdivided to SMPL-X-like complexity
(10242 verts / 20480 faces vs SMPL-X's 10475 / 20908) so point->mesh kernels
see realistic workloads.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def icosphere(subdiv: int = 5, radius: float = 1.0):
    """Unit icosphere; subdiv 5 -> 10242 verts, 20480 faces."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)

    for _ in range(subdiv):
        cache = {}
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2
                m = m / np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c],
                          [ab, bc, ca]]
        faces = np.array(new_faces, np.int64)
        verts = np.array(verts)

    return (verts * radius).astype(np.float32), faces.astype(np.int32)


def synthetic_body(subdiv: int = 5, scale: float = 0.55,
                   squash: Tuple[float, float, float] = (0.45, 1.0, 0.3)):
    """A body-proportioned ellipsoid mesh at SMPL-X face count."""
    v, f = icosphere(subdiv)
    v = v * np.array(squash, np.float32) * scale
    return v, f


def synthetic_icon_batch(rng: np.random.RandomState, B: int = 1,
                         image_size: int = 512, n_samples: int = 8000,
                         subdiv: int = 5) -> Dict[str, np.ndarray]:
    """A full ICON-style in_tensor batch with a synthetic body prior."""
    v, f = synthetic_body(subdiv)
    V = len(v)
    batch = {
        "image": rng.randn(B, image_size, image_size, 3).astype(np.float32),
        "normal_F": rng.randn(B, image_size, image_size,
                              3).astype(np.float32),
        "normal_B": rng.randn(B, image_size, image_size,
                              3).astype(np.float32),
        "sample": (rng.rand(B, n_samples, 3) * 2 - 1).astype(np.float32),
        "label": (rng.rand(B, n_samples, 1) > 0.5).astype(np.float32),
        "calib": np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1)),
        "smpl_verts": np.tile(v[None], (B, 1, 1)),
        "smpl_faces": f,
        "smpl_cmap": np.tile(((v - v.min(0)) /
                              (v.max(0) - v.min(0)))[None], (B, 1, 1)),
        "smpl_vis": (np.tile(v[None, :, 2:3], (B, 1, 1)) > 0).astype(
            np.float32),
    }
    return batch
