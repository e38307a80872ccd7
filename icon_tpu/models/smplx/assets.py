"""SMPL-related asset registry + fitted-body loading.

Mirrors the reference's ``SMPLX`` registry (lib/dataset/mesh_util.py:830-886)
and ``load_fit_body`` (lib/renderer/mesh.py:57-88). The on-disk layout is the
reference's ``data/smpl_related`` tree so a user's downloaded assets drop in
unchanged:

    data/smpl_related/smpl_data/{smpl,smplx}_verts.npy, smplx_faces.npy,
                                smplx_cmap.npy
    data/smpl_related/models/{smpl,smplx}/...
    data/tedra_data/tetra_*_smpl.npz, tetrahedrons_*_adult.txt

The root is ``$ICON_TPU_DATA_DIR`` (default ``<repo>/data``). Fits created by
the reference pipeline pickle trimesh arrays; ``load_smplx_param`` unpickles
them without a trimesh dependency (unknown classes degrade to ndarray).
"""

from __future__ import annotations

import functools
import io
import os
import os.path as osp
import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np


def data_root() -> str:
    here = osp.dirname(osp.dirname(osp.dirname(osp.dirname(
        osp.abspath(__file__)))))
    return os.environ.get("ICON_TPU_DATA_DIR", osp.join(here, "data"))


class SMPLX:
    """Lazy paths + arrays for the SMPL-X helper assets."""

    def __init__(self, root: Optional[str] = None):
        self.current_dir = osp.join(root or data_root(), "smpl_related")
        sd = osp.join(self.current_dir, "smpl_data")
        self.smpl_verts_path = osp.join(sd, "smpl_verts.npy")
        self.smplx_verts_path = osp.join(sd, "smplx_verts.npy")
        self.faces_path = osp.join(sd, "smplx_faces.npy")
        self.cmap_vert_path = osp.join(sd, "smplx_cmap.npy")
        self.model_dir = osp.join(self.current_dir, "models")
        self.tedra_dir = osp.join(osp.dirname(self.current_dir),
                                  "tedra_data")

    @functools.cached_property
    def faces(self) -> np.ndarray:
        return np.load(self.faces_path)

    @functools.cached_property
    def verts(self) -> np.ndarray:
        return np.load(self.smplx_verts_path)

    @functools.cached_property
    def smpl_verts(self) -> np.ndarray:
        return np.load(self.smpl_verts_path)

    @functools.cached_property
    def cmap(self) -> np.ndarray:
        return np.load(self.cmap_vert_path).astype(np.float32)

    def cmap_smpl_vids(self, type_: str = "smplx") -> np.ndarray:
        """Per-vertex color map; for type 'smpl' remapped through the
        nearest-smplx-vertex correspondence (mesh_util.py cmap use)."""
        if type_ == "smplx":
            return self.cmap
        from scipy.spatial import cKDTree
        tree = cKDTree(self.verts, leafsize=1)
        _, ind = tree.query(self.smpl_verts, k=1)
        return self.cmap[ind]


class _TolerantUnpickler(pickle.Unpickler):
    """Fits pickled with trimesh reference classes (TrackedArray) load as
    plain ndarrays; anything else unknown degrades the same way."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except Exception:
            return np.ndarray


def load_smplx_param(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        raw = _TolerantUnpickler(f).load()
    return {k: np.asarray(v) for k, v in raw.items()}


@functools.lru_cache(maxsize=4)
def get_smpl_model(model_type: str = "smplx", gender: str = "male",
                   root: Optional[str] = None):
    """Load (and cache) a body model from the registry's model dir, matching
    the reference's model_init_params (lib/renderer/mesh.py:25-43):
    num_pca_comps=12 hands, male SMPL-X by default.

    Falls back to the synthetic SMPL-X stand-in when the licensed asset files
    are absent (they cannot be redistributed), so fixtures and tests run
    everywhere; real deployments drop the official files into
    ``data/smpl_related/models``.
    """
    from icon_tpu.models.smplx.body import (load_body_model,
                                            synthetic_smplx_model)
    reg = SMPLX(root)
    mdir = osp.join(reg.model_dir, model_type)
    for ext in ("npz", "pkl"):
        p = osp.join(mdir, f"{model_type.upper()}_{gender.upper()}.{ext}")
        if osp.exists(p):
            return load_body_model(p, model_type=model_type)
    return synthetic_smplx_model(subdiv=4)


_FIT_FWD_CACHE: Dict[int, Any] = {}


def _jitted_forward(model):
    """Per-model jitted forward: dataloader workers call this once per item;
    untraced jnp would re-trace the whole LBS every call (~1-2 s on CPU)."""
    import jax
    key = id(model)
    if key not in _FIT_FWD_CACHE:
        # close over the model (its static faces array is pytree metadata
        # and cannot cross the jit boundary as an argument)
        _FIT_FWD_CACHE[key] = jax.jit(lambda kw: model.forward(**kw))
    return _FIT_FWD_CACHE[key]


def load_fit_body(fitted_path: str, scale: float,
                  smpl_type: str = "smplx", smpl_gender: str = "male",
                  noise_dict: Optional[Dict[str, np.ndarray]] = None,
                  root: Optional[str] = None
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fitted SMPL-X body in scan space (lib/renderer/mesh.py:57-88).

    Returns (verts [V, 3], joints [J, 3], faces [F, 3]).
    """
    import jax.numpy as jnp
    param = load_smplx_param(fitted_path)
    model = get_smpl_model(smpl_type, smpl_gender, root)

    kwargs: Dict[str, Any] = dict(
        betas=param["betas"],
        global_orient=param["global_orient"],
        body_pose=param["body_pose"],
        left_hand_pose=param.get("left_hand_pose"),
        right_hand_pose=param.get("right_hand_pose"),
        jaw_pose=param.get("jaw_pose"),
        leye_pose=param.get("leye_pose"),
        reye_pose=param.get("reye_pose"),
        expression=param.get("expression"))
    if noise_dict:
        kwargs.update(noise_dict)
    kwargs = {k: jnp.asarray(np.asarray(v, np.float32)).reshape(1, -1)
              for k, v in kwargs.items() if v is not None}

    verts, joints = _jitted_forward(model)(kwargs)
    fit_scale = float(np.asarray(param.get("scale", 1.0)).reshape(()))
    transl = np.asarray(param.get("translation", np.zeros(3)),
                        np.float32).reshape(3)
    verts = (np.asarray(verts[0]) * fit_scale + transl) * scale
    joints = (np.asarray(joints[0]) * fit_scale + transl) * scale
    return verts.astype(np.float32), joints.astype(np.float32), model.faces
