"""Mesh regularization losses for the cloth-refinement loop.

Equivalents of the PyTorch3D losses the reference uses in
``update_mesh_shape_prior_losses`` (lib/dataset/mesh_util.py:168-184):
uniform Laplacian smoothing, mean edge length, and normal consistency —
all pure gather/segment-sum ops on static topology.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from icon_tpu.ops.mesh import face_normals


def mesh_edges(faces: np.ndarray) -> np.ndarray:
    """Unique undirected edges [E, 2] (host precompute, static)."""
    f = np.asarray(faces)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


def edge_face_adjacency(faces: np.ndarray) -> np.ndarray:
    """[Ei, 2] pairs of face indices sharing an interior edge (host)."""
    f = np.asarray(faces)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    e = np.sort(e, axis=1)
    order = np.lexsort((e[:, 1], e[:, 0]))
    e_sorted = e[order]
    # rows are stacked per edge-slot: [0,F) slot0, [F,2F) slot1, [2F,3F) slot2
    face_of_row = np.tile(np.arange(len(f)), 3)[order]
    same = np.all(e_sorted[1:] == e_sorted[:-1], axis=1)
    pairs = np.stack([face_of_row[:-1][same], face_of_row[1:][same]], axis=1)
    return pairs.astype(np.int32)


def laplacian_loss(verts: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """Uniform Laplacian smoothing: mean ||v_i - mean(neighbors)||
    (pytorch3d mesh_laplacian_smoothing, 'uniform')."""
    V = verts.shape[0]
    i, j = edges[:, 0], edges[:, 1]
    acc = jnp.zeros((V, 3), verts.dtype)
    deg = jnp.zeros((V, 1), verts.dtype)
    acc = acc.at[i].add(verts[j]).at[j].add(verts[i])
    ones = jnp.ones((edges.shape[0], 1), verts.dtype)
    deg = deg.at[i].add(ones).at[j].add(ones)
    lap = verts - acc / jnp.maximum(deg, 1.0)
    return jnp.mean(jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-12))


def edge_length_loss(verts: jnp.ndarray, edges: jnp.ndarray,
                     target: float = 0.0) -> jnp.ndarray:
    """Mean squared edge length (pytorch3d mesh_edge_loss)."""
    d = verts[edges[:, 0]] - verts[edges[:, 1]]
    return jnp.mean((jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12) - target) ** 2)


def normal_consistency_loss(verts: jnp.ndarray, faces: jnp.ndarray,
                            face_pairs: jnp.ndarray) -> jnp.ndarray:
    """1 - cos between adjacent face normals (pytorch3d
    mesh_normal_consistency)."""
    fn = face_normals(verts[None], faces)[0]
    n0 = fn[face_pairs[:, 0]]
    n1 = fn[face_pairs[:, 1]]
    return jnp.mean(1.0 - jnp.sum(n0 * n1, axis=-1))
