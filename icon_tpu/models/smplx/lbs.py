"""Linear blend skinning — the SMPL math (reference lib/smplx/lbs.py).

All functions are pure jnp and differentiable; the kinematic-chain
composition unrolls over the (static, <=55) joint count, which XLA turns
into a short chain of batched 4x4 matmuls.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def batch_rodrigues(rot_vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle ``[N, 3]`` -> rotation matrices ``[N, 3, 3]``
    (lbs.py:299-347)."""
    angle = jnp.linalg.norm(rot_vecs + eps, axis=1, keepdims=True)
    rot_dir = rot_vecs / angle

    cos = jnp.cos(angle)[:, None]
    sin = jnp.sin(angle)[:, None]

    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros],
                  axis=1).reshape(-1, 3, 3)
    ident = jnp.eye(3)[None]
    return ident + sin * K + (1 - cos) * (K @ K)


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    """``[B, n]`` x ``[V, 3, n]`` -> per-vertex displacement ``[B, V, 3]``."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps)


def vertices2joints(J_regressor: jnp.ndarray,
                    vertices: jnp.ndarray) -> jnp.ndarray:
    """``[J, V]`` x ``[B, V, 3]`` -> ``[B, J, 3]``."""
    return jnp.einsum("jv,bvk->bjk", J_regressor, vertices)


def _make_tf(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] + [..., 3] -> homogeneous [..., 4, 4]."""
    pad = jnp.zeros(R.shape[:-2] + (1, 4))
    pad = pad.at[..., 0, 3].set(1.0)
    Rt = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([Rt, pad], axis=-2)


def batch_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                          parents) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics (lbs.py:349-419).

    Args:
      rot_mats: ``[B, J, 3, 3]`` local joint rotations.
      joints: ``[B, J, 3]`` rest-pose joint locations.
      parents: length-J int array; parents[0] is the root (ignored).

    Returns: (posed_joints [B, J, 3], rel_transforms [B, J, 4, 4]).
    """
    parents = [int(p) for p in parents]
    J = joints.shape[1]
    rel_joints = jnp.concatenate(
        [joints[:, :1],
         joints[:, 1:] - joints[:, [p for p in parents[1:]], :]], axis=1)

    local = _make_tf(rot_mats, rel_joints)          # [B, J, 4, 4]

    world = [local[:, 0]]
    for j in range(1, J):
        world.append(world[parents[j]] @ local[:, j])
    world = jnp.stack(world, axis=1)                # [B, J, 4, 4]

    posed_joints = world[..., :3, 3]

    # A = world . translate(-rest_joint): subtract rotated rest joints
    joints_h = jnp.concatenate(
        [joints, jnp.zeros(joints.shape[:-1] + (1,))], axis=-1)
    corr = jnp.einsum("bjmn,bjn->bjm", world, joints_h)  # [B, J, 4]
    rel_tf = world - jnp.concatenate(
        [jnp.zeros(world.shape[:-1] + (3,)), corr[..., None]], axis=-1)
    return posed_joints, rel_tf


def lbs(betas: jnp.ndarray,
        pose: jnp.ndarray,
        v_template: jnp.ndarray,
        shapedirs: jnp.ndarray,
        posedirs: jnp.ndarray,
        J_regressor: jnp.ndarray,
        parents,
        lbs_weights: jnp.ndarray,
        pose2rot: bool = True):
    """SMPL forward (lbs.py:152-253).

    Args:
      betas: ``[B, n_betas]``; pose: ``[B, (J+1)*3]`` axis-angle (or
        ``[B, J+1, 3, 3]`` rotmats when not pose2rot);
      v_template ``[V, 3]``; shapedirs ``[V, 3, n_betas]``;
      posedirs ``[P, V*3]`` (P = 9*J); J_regressor ``[J+1, V]``;
      lbs_weights ``[V, J+1]``.

    Returns: (verts [B, V, 3], joints [B, J+1, 3]).
    """
    B = max(betas.shape[0], pose.shape[0])

    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    J = vertices2joints(J_regressor, v_shaped)

    ident = jnp.eye(3)
    if pose2rot:
        rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(B, -1, 3, 3)
    else:
        rot_mats = pose.reshape(B, -1, 3, 3)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    J_transformed, A = batch_rigid_transform(rot_mats, J, parents)

    W = lbs_weights                                  # [V, J+1]
    T = jnp.einsum("vj,bjmn->bvmn", W, A)            # [B, V, 4, 4]

    v_h = jnp.concatenate([v_posed, jnp.ones(v_posed.shape[:-1] + (1,))],
                          axis=-1)
    verts = jnp.einsum("bvmn,bvn->bvm", T, v_h)[..., :3]
    return verts, J_transformed
