"""HybrIK's hybrid analytical-neural inverse kinematics
(reference lib/hybrik/models/layers/smpl/lbs.py:559-771,
batch_inverse_kinematics_transform).

Given predicted joint locations and per-bone twist angles (phi), recover the
SMPL joint rotation matrices: each joint's swing aligns the rest-pose bone
to the predicted bone direction (Rodrigues between vectors), the twist
rotates about the bone axis by phi, and multi-child joints (pelvis/spine)
solve a small orthogonal-Procrustes (SVD) over their children offsets.
Pure jnp; the per-joint loop unrolls over the static (<=29) joint count.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _rodrigues_between(u: jnp.ndarray, t: jnp.ndarray,
                       eps: float = 1e-8) -> jnp.ndarray:
    """[B, 3] rest bone u -> target bone t rotation matrices [B, 3, 3]."""
    un = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + eps)
    tn = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + eps)
    axis = jnp.cross(un, tn)
    sin = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    cos = jnp.sum(un * tn, axis=-1, keepdims=True)
    axis = axis / (sin + eps)
    K = _skew(axis)
    eye = jnp.eye(3)[None]
    return eye + sin[..., None] * K + \
        ((1.0 - cos)[..., None]) * (K @ K)


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1)], -2)


def _twist_about(axis: jnp.ndarray, cos: jnp.ndarray,
                 sin: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rotation about (normalized) axis with angle given by (cos, sin)."""
    an = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + eps)
    K = _skew(an)
    eye = jnp.eye(3)[None]
    return eye + sin[..., None, None] * K + \
        (1.0 - cos)[..., None, None] * (K @ K)


def _procrustes(targets: jnp.ndarray, templates: jnp.ndarray) -> jnp.ndarray:
    """Best rotation mapping templates -> targets: [B, K, 3] x2 -> [B, 3, 3]
    (batch_get_pelvis_orient_svd / batch_get_3children_orient_svd)."""
    M = jnp.einsum("bkc,bkd->bcd", targets, templates)
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate([jnp.broadcast_to(jnp.eye(3)[:2][None],
                                          (U.shape[0], 2, 3)),
                         (jnp.eye(3)[2][None, None] *
                          det[:, None, None])], axis=1)
    return U @ D @ Vt


def children_map(parents: Sequence[int]) -> List[List[int]]:
    out: List[List[int]] = [[] for _ in parents]
    for j, p in enumerate(parents):
        if j > 0:
            out[p].append(j)
    return out


def hybrik_ik(pose_skeleton: jnp.ndarray,
              phis: jnp.ndarray,
              rest_pose: jnp.ndarray,
              parents: Sequence[int]) -> jnp.ndarray:
    """Recover local joint rotations [B, J, 3, 3] from predicted joints.

    Args:
      pose_skeleton: [B, J, 3] predicted joints (root-relative).
      phis: [B, J-1, 2] (cos, sin) twist parameters per non-root joint.
      rest_pose: [B, J, 3] template joints.
      parents: length-J kinematic tree.
    """
    B, J, _ = pose_skeleton.shape
    parents = [int(p) for p in parents]
    kids = children_map(parents)

    rel_rest = rest_pose.at[:, 1:].add(
        -rest_pose[:, [parents[i] for i in range(1, J)]])
    rel_pose = pose_skeleton.at[:, 1:].add(
        -pose_skeleton[:, [parents[i] for i in range(1, J)]])
    final = pose_skeleton - pose_skeleton[:, :1] + rest_pose[:, :1]

    phis = phis / (jnp.linalg.norm(phis, axis=-1, keepdims=True) + 1e-8)

    # pelvis orientation from its children via Procrustes
    root_kids = kids[0]
    R0 = _procrustes(
        jnp.stack([rel_pose[:, c] for c in root_kids], 1),
        jnp.stack([rel_rest[:, c] for c in root_kids], 1))

    chain: List = [None] * J
    local: List = [None] * J
    pos: List = [None] * J
    chain[0] = R0
    local[0] = R0
    pos[0] = rel_rest[:, 0]

    for i in range(1, J):
        p = parents[i]
        pos[i] = pos[p] + jnp.einsum("bcd,bd->bc", chain[p], rel_rest[:, i])
        cs = kids[i]
        if len(cs) == 0:                 # leaf: identity local rotation
            local[i] = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
            chain[i] = chain[p]
            continue
        if len(cs) > 1:                  # spine-like: Procrustes over kids
            tgt = jnp.stack(
                [jnp.einsum("bdc,bd->bc", chain[p], final[:, c] - pos[i])
                 for c in cs], 1)
            tpl = jnp.stack([rel_rest[:, c] for c in cs], 1)
            R = _procrustes(tgt, tpl)
        else:
            c = cs[0]
            # target bone in the parent's accumulated frame
            t = jnp.einsum("bdc,bd->bc", chain[p], final[:, c] - pos[i])
            u = rel_rest[:, c]
            swing = _rodrigues_between(u, t)
            twist = _twist_about(u, phis[:, i - 1, 0], phis[:, i - 1, 1])
            R = swing @ twist
        local[i] = R
        chain[i] = chain[p] @ R

    return jnp.stack(local, axis=1)
