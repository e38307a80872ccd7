"""Body model container + asset loading (reference lib/smplx/body_models.py).

``BodyModel`` is an immutable pytree of the model arrays with a jittable
``forward``; it covers the SMPL family:

- SMPL: 23-joint body, ``betas`` shape space (body_models.py:52-392).
- SMPL-X: 54-joint body+jaw+eyes+hands, separate expression space, and
  optional PCA-compressed hand poses with the hand-mean offset
  (body_models.py:966-1389; lbs drives everything).
- kid-template shape blend (body_models.py:50-60 via apps/ICON.py:97-109).

SMPL-X full-pose joint order (the convention every fit file follows):
``global_orient(1) | body(21) | jaw(1) | leye(1) | reye(1) | left_hand(15) |
right_hand(15)`` = 55 joints.

Assets are the standard SMPL/SMPL-X release files (.pkl or .npz); no assets
ship with this repo — tests use synthetic models (``synthetic_body_model``).
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

# SMPL-X body layout constants (body_models.py NUM_BODY_JOINTS etc.)
SMPLX_NUM_BODY_JOINTS = 21
SMPLX_NUM_HAND_JOINTS = 15
SMPLX_JAW, SMPLX_LEYE, SMPLX_REYE = 22, 23, 24
SMPLX_LHAND_START = 25                     # joints 25..39
SMPLX_RHAND_START = 40                     # joints 40..54


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class BodyModel:
    """SMPL-family model arrays. All jnp arrays; faces/parents static."""

    v_template: jnp.ndarray        # [V, 3]
    shapedirs: jnp.ndarray         # [V, 3, n_betas(+kid)]
    posedirs: jnp.ndarray          # [9*J, V*3]
    J_regressor: jnp.ndarray       # [J+1, V]
    lbs_weights: jnp.ndarray       # [V, J+1]
    faces: np.ndarray              # [F, 3] int (static / host)
    parents: Tuple[int, ...]       # length J+1 (static)
    model_type: str = "smpl"       # smpl | smplx (static)
    num_betas: int = 10
    # SMPL-X extras (None for plain SMPL)
    expr_dirs: Optional[jnp.ndarray] = None        # [V, 3, n_expr]
    hands_components_l: Optional[jnp.ndarray] = None  # [n_pca, 45]
    hands_components_r: Optional[jnp.ndarray] = None
    hands_mean_l: Optional[jnp.ndarray] = None     # [45]
    hands_mean_r: Optional[jnp.ndarray] = None
    flat_hand_mean: bool = False

    # -- pytree protocol (faces/parents/meta are aux data) ---------------
    def tree_flatten(self):
        children = (self.v_template, self.shapedirs, self.posedirs,
                    self.J_regressor, self.lbs_weights, self.expr_dirs,
                    self.hands_components_l, self.hands_components_r,
                    self.hands_mean_l, self.hands_mean_r)
        aux = (self.faces, self.parents, self.model_type, self.num_betas,
               self.flat_hand_mean)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (v_template, shapedirs, posedirs, J_regressor, lbs_weights,
         expr_dirs, hcl, hcr, hml, hmr) = children
        faces, parents, model_type, num_betas, flat = aux
        return cls(v_template, shapedirs, posedirs, J_regressor, lbs_weights,
                   faces, parents, model_type, num_betas, expr_dirs,
                   hcl, hcr, hml, hmr, flat)

    # --------------------------------------------------------------------

    @property
    def num_joints(self) -> int:
        return len(self.parents)

    def _hand_pose(self, pose: Optional[jnp.ndarray], B: int,
                   side: str) -> jnp.ndarray:
        """Decode a hand pose to 45-dof axis-angle: PCA coefficients are
        expanded with the hand components, and the hand mean is added unless
        flat_hand_mean (body_models.py hand-pose handling)."""
        comps = self.hands_components_l if side == "l" \
            else self.hands_components_r
        mean = self.hands_mean_l if side == "l" else self.hands_mean_r
        if pose is None:
            full = jnp.zeros((B, SMPLX_NUM_HAND_JOINTS * 3))
        else:
            pose = pose.reshape(B, -1)
            if pose.shape[-1] == SMPLX_NUM_HAND_JOINTS * 3:
                full = pose
            else:                                    # PCA coefficients
                assert comps is not None, "model has no hand PCA components"
                full = pose @ comps[:pose.shape[-1]]
        if mean is not None and not self.flat_hand_mean:
            full = full + mean[None]
        return full

    def forward(self,
                betas: Optional[jnp.ndarray] = None,
                global_orient: Optional[jnp.ndarray] = None,
                body_pose: Optional[jnp.ndarray] = None,
                transl: Optional[jnp.ndarray] = None,
                pose2rot: bool = True,
                extra_pose: Optional[jnp.ndarray] = None,
                scale: Optional[jnp.ndarray] = None,
                expression: Optional[jnp.ndarray] = None,
                jaw_pose: Optional[jnp.ndarray] = None,
                leye_pose: Optional[jnp.ndarray] = None,
                reye_pose: Optional[jnp.ndarray] = None,
                left_hand_pose: Optional[jnp.ndarray] = None,
                right_hand_pose: Optional[jnp.ndarray] = None):
        """Returns (verts [B, V, 3], joints [B, J+1, 3]).

        ``body_pose``: ``[B, (J_body)*3]`` axis-angle (or rotmats flattened
        when not pose2rot). For SMPL-X the face/hand kwargs follow the
        reference model exactly: hand poses may be PCA coefficients (any
        count up to the stored components) or full 45-dof axis-angle; the
        stored hand mean is added unless ``flat_hand_mean``. ``extra_pose``
        is the legacy escape hatch that appends raw dofs after body_pose —
        mutually exclusive with the named face/hand kwargs.
        """
        nj = self.num_joints
        B = 1
        for a in (betas, global_orient, body_pose, expression):
            if a is not None:
                B = max(B, a.shape[0])
        if betas is None:
            betas = jnp.zeros((B, self.num_betas))
        if global_orient is None:
            global_orient = jnp.zeros((B, 3))
        pose_parts = [global_orient]
        if body_pose is not None:
            pose_parts.append(body_pose.reshape(B, -1))
        elif pose2rot:
            n_body = SMPLX_NUM_BODY_JOINTS if self.model_type == "smplx" \
                else nj - 1
            pose_parts.append(jnp.zeros((B, n_body * 3)))

        has_face_hands = any(p is not None for p in (
            jaw_pose, leye_pose, reye_pose, left_hand_pose, right_hand_pose))
        if self.model_type == "smplx" and pose2rot and (has_face_hands or
                                                        extra_pose is None):
            assert extra_pose is None, \
                "extra_pose conflicts with named face/hand kwargs"
            for p in (jaw_pose, leye_pose, reye_pose):
                pose_parts.append(jnp.zeros((B, 3)) if p is None
                                  else p.reshape(B, 3))
            pose_parts.append(self._hand_pose(left_hand_pose, B, "l"))
            pose_parts.append(self._hand_pose(right_hand_pose, B, "r"))
        elif extra_pose is not None:
            pose_parts.append(extra_pose.reshape(B, -1))
        pose = jnp.concatenate(pose_parts, axis=1)
        dof = 9 if not pose2rot else 3      # rotmats vs axis-angle per joint
        missing = nj * dof - pose.shape[1]
        if missing > 0:
            if pose2rot:
                pad = jnp.zeros((B, missing))
            else:                            # pad with identity rotations
                pad = jnp.tile(jnp.eye(3).reshape(-1), (B, missing // 9))
            pose = jnp.concatenate([pose, pad], axis=1)

        nb = betas.shape[-1]
        shapedirs = self.shapedirs[..., :nb]
        if expression is not None and self.expr_dirs is not None:
            ne = expression.shape[-1]
            shapedirs = jnp.concatenate(
                [shapedirs, self.expr_dirs[..., :ne]], axis=-1)
            betas = jnp.concatenate(
                [betas, jnp.broadcast_to(expression, (B, ne))], axis=-1)
        verts, joints = lbs(betas, pose, self.v_template,
                            shapedirs, self.posedirs,
                            self.J_regressor, self.parents, self.lbs_weights,
                            pose2rot=pose2rot)
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


# SMPL-X release files keep 300 shape columns then expression columns
SMPLX_SHAPE_SPACE_DIM = 300


def load_body_model(path: str, model_type: Optional[str] = None,
                    num_betas: int = 10,
                    num_expression_coeffs: int = 10,
                    kid_template_path: Optional[str] = None,
                    age: str = "adult",
                    v_template: Optional[np.ndarray] = None,
                    flat_hand_mean: bool = False) -> BodyModel:
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
        base = os.path.basename(path).lower()
        for t in ("smplx", "smplh", "mano", "flame"):
            if base.startswith(t):
                model_type = t
                break
        else:
            model_type = "smpl"

    vt = _to_np(data["v_template"]).astype(np.float32) \
        if v_template is None else np.asarray(v_template, np.float32)
    shapedirs_all = _to_np(data["shapedirs"]).astype(np.float32)
    expr_dirs = None
    # SMPL-X and FLAME store 300 shape columns then expression columns
    if model_type in ("smplx", "flame") and \
            shapedirs_all.shape[-1] > SMPLX_SHAPE_SPACE_DIM:
        expr_dirs = shapedirs_all[
            :, :, SMPLX_SHAPE_SPACE_DIM:
            SMPLX_SHAPE_SPACE_DIM + num_expression_coeffs]
        shapedirs = shapedirs_all[:, :, :num_betas]
    else:
        shapedirs = shapedirs_all[:, :, :num_betas]
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    # reference layout: posedirs [V, 3, P] -> [P, V*3]
    if posedirs.ndim == 3:
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    J_regressor = _to_np(data["J_regressor"]).astype(np.float32)
    weights = _to_np(data["weights"]).astype(np.float32)
    faces = _to_np(data.get("f", data.get("faces"))).astype(np.int32)
    parents = _to_np(data["kintree_table"])[0].astype(np.int64)
    parents[0] = 0

    hc_l = hc_r = hm_l = hm_r = None
    if "hands_componentsl" in data:
        hc_l = jnp.asarray(_to_np(data["hands_componentsl"]), jnp.float32)
        hc_r = jnp.asarray(_to_np(data["hands_componentsr"]), jnp.float32)
        hm_l = jnp.asarray(_to_np(data["hands_meanl"]), jnp.float32)
        hm_r = jnp.asarray(_to_np(data["hands_meanr"]), jnp.float32)
    elif "hands_components" in data:   # MANO single-hand PCA
        hc_l = hc_r = jnp.asarray(_to_np(data["hands_components"]),
                                  jnp.float32)
        hm_l = hm_r = jnp.asarray(_to_np(data["hands_mean"]), jnp.float32)

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
        num_betas=num_betas,
        expr_dirs=None if expr_dirs is None else jnp.asarray(expr_dirs),
        hands_components_l=hc_l, hands_components_r=hc_r,
        hands_mean_l=hm_l, hands_mean_r=hm_r,
        flat_hand_mean=flat_hand_mean)


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


def synthetic_smplx_model(subdiv: int = 3, n_betas: int = 10,
                          n_expr: int = 10, n_pca: int = 12,
                          seed: int = 0) -> BodyModel:
    """A small watertight "SMPL-X": icosphere template with the full 55-joint
    SMPL-X pose layout, expression dirs, and hand PCA — shape/skeleton are
    synthetic but every code path (hands PCA + mean, expressions, jaw/eyes)
    is exercised. Used by fixtures when the licensed assets are absent."""
    from icon_tpu.utils.synthetic import synthetic_body
    rng = np.random.RandomState(seed)
    v, faces = synthetic_body(subdiv=subdiv)
    V = len(v)
    J = 55
    shapedirs = rng.randn(V, 3, n_betas).astype(np.float32) * 0.01
    expr_dirs = rng.randn(V, 3, n_expr).astype(np.float32) * 0.003
    posedirs = (rng.randn(9 * (J - 1), V * 3) * 0.0005).astype(np.float32)
    J_regressor = rng.rand(J, V).astype(np.float32) ** 4
    J_regressor /= J_regressor.sum(1, keepdims=True)
    w = rng.rand(V, J).astype(np.float32) ** 4
    w /= w.sum(1, keepdims=True)
    # SMPL-X kinematic tree shape: chain with hand/face branches off late
    parents = [0] * J
    for j in range(1, SMPLX_NUM_BODY_JOINTS + 1):
        parents[j] = j - 1
    for j in (SMPLX_JAW, SMPLX_LEYE, SMPLX_REYE):
        parents[j] = 12
    for j in range(SMPLX_LHAND_START, SMPLX_LHAND_START + 15):
        parents[j] = 20 if j == SMPLX_LHAND_START else j - 1
    for j in range(SMPLX_RHAND_START, SMPLX_RHAND_START + 15):
        parents[j] = 21 if j == SMPLX_RHAND_START else j - 1
    hc = rng.randn(n_pca, 45).astype(np.float32) * 0.1
    hm = (rng.randn(45) * 0.05).astype(np.float32)
    return BodyModel(jnp.asarray(v), jnp.asarray(shapedirs),
                     jnp.asarray(posedirs), jnp.asarray(J_regressor),
                     jnp.asarray(w), faces, tuple(parents), "smplx", n_betas,
                     expr_dirs=jnp.asarray(expr_dirs),
                     hands_components_l=jnp.asarray(hc),
                     hands_components_r=jnp.asarray(hc[::-1].copy()),
                     hands_mean_l=jnp.asarray(hm),
                     hands_mean_r=jnp.asarray(-hm))
