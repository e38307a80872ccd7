"""Tetrahedral SMPL for PaMIR's semantic voxelization
(reference lib/dataset/body_model.py:234-494, TetraSMPLModel).

The tetra model is the base SMPL plus extra interior vertices (the
``*_added`` arrays in the reference's preprocessed asset); both vertex sets
share the same LBS, so we simply concatenate templates/shapedirs/posedirs/
weights and run the standard jittable LBS from icon_tpu.models.smplx.lbs.
"""

from __future__ import annotations

import pickle
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from icon_tpu.models.smplx.body import BodyModel, _to_np


def load_tetra_body_model(model_path: str, addition_path: str,
                          age: str = "adult",
                          v_template: Optional[np.ndarray] = None
                          ) -> Tuple[BodyModel, dict]:
    """Load SMPL + tetra additions.

    Returns (model, extras): ``model.v_template`` holds surface + added
    vertices concatenated (surface first, matching the reference's voxel_verts
    convention); extras carries ``n_surface`` and ``tetrahedrons``.
    """
    with open(model_path, "rb") as f:
        params = pickle.load(f, encoding="latin1")
    added = np.load(addition_path)

    vt = (_to_np(params["v_template"]) if v_template is None
          else np.asarray(v_template)).astype(np.float32)
    n_surface = len(vt)

    v_template = np.concatenate(
        [vt, added["v_template_added"].astype(np.float32)])
    shapedirs = np.concatenate(
        [_to_np(params["shapedirs"]).astype(np.float32),
         added["shapedirs_added"].astype(np.float32)])
    weights = np.concatenate(
        [_to_np(params["weights"]).astype(np.float32),
         added["weights_added"].astype(np.float32)])

    posedirs = _to_np(params["posedirs"]).astype(np.float32)   # [V, 3, P]
    posedirs_added = added["posedirs_added"].astype(np.float32)
    posedirs_all = np.concatenate([posedirs, posedirs_added])
    posedirs_flat = posedirs_all.reshape(-1, posedirs_all.shape[-1]).T

    J_reg = _to_np(params["J_regressor"]).astype(np.float32)
    # regressor only sees surface verts: pad zeros for added verts
    J_reg_full = np.concatenate(
        [J_reg, np.zeros((J_reg.shape[0], len(v_template) - J_reg.shape[1]),
                         np.float32)], axis=1)

    parents = _to_np(params["kintree_table"])[0].astype(np.int64)
    parents[0] = 0

    model = BodyModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs_flat),
        J_regressor=jnp.asarray(J_reg_full),
        lbs_weights=jnp.asarray(weights),
        faces=_to_np(params["f"]).astype(np.int32),
        parents=tuple(int(p) for p in parents),
        model_type="tetra_smpl",
        num_betas=10)
    extras = {
        "n_surface": n_surface,
        "tetrahedrons": added["tetrahedrons"].astype(np.int32),
    }
    return model, extras
