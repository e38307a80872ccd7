"""Body model container + asset loading (reference lib/smplx/body_models.py).

``BodyModel`` is an immutable pytree of the model arrays with a jittable
``forward``; it covers SMPL (69-dof body pose) and SMPL-X (body+jaw+eyes+
hands, expressions) parameterizations, including the kid-template shape blend
(body_models.py:50-60 via apps/ICON.py:97-109).

Assets are the standard SMPL/SMPL-X release files (.pkl or .npz); no assets
ship with this repo — tests use synthetic models (utils/synthetic_body).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from icon_tpu.models.smplx.lbs import lbs


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class BodyModel:
    """SMPL-family model arrays. All jnp arrays; faces/parents static."""

    v_template: jnp.ndarray        # [V, 3]
    shapedirs: jnp.ndarray         # [V, 3, n_betas(+n_expr)]
    posedirs: jnp.ndarray          # [9*J, V*3]
    J_regressor: jnp.ndarray       # [J+1, V]
    lbs_weights: jnp.ndarray       # [V, J+1]
    faces: np.ndarray              # [F, 3] int (static / host)
    parents: Tuple[int, ...]       # length J+1 (static)
    model_type: str = "smpl"       # smpl | smplx (static)
    num_betas: int = 10

    # -- pytree protocol (faces/parents/meta are aux data) ---------------
    def tree_flatten(self):
        children = (self.v_template, self.shapedirs, self.posedirs,
                    self.J_regressor, self.lbs_weights)
        aux = (self.faces, self.parents, self.model_type, self.num_betas)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # --------------------------------------------------------------------

    @property
    def num_joints(self) -> int:
        return len(self.parents)

    def forward(self,
                betas: Optional[jnp.ndarray] = None,
                global_orient: Optional[jnp.ndarray] = None,
                body_pose: Optional[jnp.ndarray] = None,
                transl: Optional[jnp.ndarray] = None,
                pose2rot: bool = True,
                extra_pose: Optional[jnp.ndarray] = None,
                scale: Optional[jnp.ndarray] = None):
        """Returns (verts [B, V, 3], joints [B, J+1, 3]).

        ``body_pose``: ``[B, (J_body)*3]`` axis-angle (or rotmats flattened
        when not pose2rot); ``extra_pose`` appends jaw/eye/hand pose for
        SMPL-X if the caller manages them; missing parts default to zeros.
        """
        nj = self.num_joints
        B = 1
        for a in (betas, global_orient, body_pose):
            if a is not None:
                B = max(B, a.shape[0])
        if betas is None:
            betas = jnp.zeros((B, self.num_betas))
        if global_orient is None:
            global_orient = jnp.zeros((B, 3))
        pose_parts = [global_orient]
        if body_pose is not None:
            pose_parts.append(body_pose.reshape(B, -1))
        if extra_pose is not None:
            pose_parts.append(extra_pose.reshape(B, -1))
        pose = jnp.concatenate(pose_parts, axis=1)
        missing = nj * 3 - pose.shape[1]
        if missing > 0:
            pose = jnp.concatenate([pose, jnp.zeros((B, missing))], axis=1)

        nb = betas.shape[-1]
        verts, joints = lbs(betas, pose, self.v_template,
                            self.shapedirs[..., :nb], self.posedirs,
                            self.J_regressor, self.parents, self.lbs_weights)
        if scale is not None:
            verts = verts * scale[:, None, :] if scale.ndim == 2 \
                else verts * scale
            joints = joints * scale[:, None, :] if scale.ndim == 2 \
                else joints * scale
        if transl is not None:
            verts = verts + transl[:, None, :]
            joints = joints + transl[:, None, :]
        return verts, joints

    __call__ = forward


def _to_np(x) -> np.ndarray:
    """Convert possibly-chumpy / scipy-sparse entries to dense numpy."""
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    if hasattr(x, "r"):          # chumpy
        return np.asarray(x.r)
    return np.asarray(x)


def load_body_model(path: str, model_type: Optional[str] = None,
                    num_betas: int = 10,
                    kid_template_path: Optional[str] = None,
                    age: str = "adult",
                    v_template: Optional[np.ndarray] = None) -> BodyModel:
    """Load a SMPL/SMPL-X asset file (.pkl or .npz).

    ``kid_template_path`` + age == 'kid' appends the kid blend shape
    (v_template_kid - v_template) as an extra beta direction, matching the
    reference's smil/kid handling."""
    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")

    if model_type is None:
        model_type = "smplx" if os.path.basename(path).lower().startswith(
            "smplx") else "smpl"

    vt = _to_np(data["v_template"]).astype(np.float32) \
        if v_template is None else np.asarray(v_template, np.float32)
    shapedirs = _to_np(data["shapedirs"]).astype(np.float32)
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    # reference layout: posedirs [V, 3, P] -> [P, V*3]
    if posedirs.ndim == 3:
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    J_regressor = _to_np(data["J_regressor"]).astype(np.float32)
    weights = _to_np(data["weights"]).astype(np.float32)
    faces = _to_np(data.get("f", data.get("faces"))).astype(np.int32)
    parents = _to_np(data["kintree_table"])[0].astype(np.int64)
    parents[0] = 0

    if age == "kid" and kid_template_path:
        v_kid = np.load(kid_template_path)
        v_kid = v_kid - np.mean(v_kid, axis=0, keepdims=True) + \
            np.mean(vt, axis=0, keepdims=True)
        kid_dir = (v_kid - vt)[:, :, None].astype(np.float32)
        shapedirs = np.concatenate(
            [shapedirs[:, :, :num_betas], kid_dir], axis=-1)
        num_betas = num_betas + 1

    return BodyModel(
        v_template=jnp.asarray(vt),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(weights),
        faces=faces,
        parents=tuple(int(p) for p in parents),
        model_type=model_type,
        num_betas=num_betas)


def synthetic_body_model(n_verts: int = 128, n_joints: int = 4,
                         n_betas: int = 10,
                         seed: int = 0) -> BodyModel:
    """Random-but-consistent small model for tests (no real assets)."""
    rng = np.random.RandomState(seed)
    V, J = n_verts, n_joints
    v_template = rng.randn(V, 3).astype(np.float32) * 0.3
    shapedirs = rng.randn(V, 3, n_betas).astype(np.float32) * 0.01
    posedirs = (rng.randn(9 * (J - 1), V * 3) * 0.001).astype(np.float32)
    J_regressor = rng.rand(J, V).astype(np.float32)
    J_regressor /= J_regressor.sum(1, keepdims=True)
    w = rng.rand(V, J).astype(np.float32) ** 2
    w /= w.sum(1, keepdims=True)
    faces = np.stack([np.arange(V - 2), np.arange(1, V - 1),
                      np.arange(2, V)], axis=1).astype(np.int32)
    parents = tuple([0] + list(range(J - 1)))
    return BodyModel(jnp.asarray(v_template), jnp.asarray(shapedirs),
                     jnp.asarray(posedirs), jnp.asarray(J_regressor),
                     jnp.asarray(w), faces, parents, "smpl", n_betas)
