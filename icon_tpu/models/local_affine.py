"""Per-vertex local affine deformation for cloth refinement.

Reference: lib/net/local_affine.py (pytorch-nicp) — each vertex owns a 3x3
matrix A_v and translation t_v; the deformed vertex is A_v v + t_v. Two
regularizers: *stiffness* (neighboring vertices should deform similarly) and
*rigidity* (A^T A ~ I). Functional here: params are a pytree, losses pure.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def init_local_affine(n_verts: int) -> Dict[str, jnp.ndarray]:
    return {
        "A": jnp.tile(jnp.eye(3)[None], (n_verts, 1, 1)),
        "t": jnp.zeros((n_verts, 3)),
    }


def apply_local_affine(params: Dict[str, jnp.ndarray],
                       verts: jnp.ndarray) -> jnp.ndarray:
    """[V, 3] -> [V, 3]."""
    return jnp.einsum("vij,vj->vi", params["A"], verts) + params["t"]


def stiffness_loss(params: Dict[str, jnp.ndarray],
                   edges: jnp.ndarray) -> jnp.ndarray:
    """Mean squared difference of the full affine transform across edges
    (local_affine.py:45-53)."""
    A, t = params["A"], params["t"]
    dA = A[edges[:, 0]] - A[edges[:, 1]]
    dt = t[edges[:, 0]] - t[edges[:, 1]]
    return jnp.mean(jnp.sum(dA ** 2, axis=(1, 2)) + jnp.sum(dt ** 2, axis=1))


def rigid_loss(params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """||A^T A - I||^2 per vertex (keeps the deformation near-rotational)."""
    A = params["A"]
    AtA = jnp.einsum("vji,vjk->vik", A, A)
    eye = jnp.eye(3)[None]
    return jnp.mean(jnp.sum((AtA - eye) ** 2, axis=(1, 2)))
