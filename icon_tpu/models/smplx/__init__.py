"""SMPL-family body models in JAX (reference lib/smplx/, ~3.3k LoC torch).

Functional core: ``icon_tpu.models.smplx.lbs`` implements the standard linear
blend skinning math (reference lib/smplx/lbs.py:152-253); ``body`` wraps asset
loading (same .pkl/.npz files) into an immutable ``BodyModel`` pytree with a
jittable ``forward``.
"""

from icon_tpu.models.smplx.lbs import (batch_rigid_transform, batch_rodrigues,
                                       blend_shapes, lbs, vertices2joints)
from icon_tpu.models.smplx.body import BodyModel, load_body_model


def create(model_path: str, model_type: str = "smpl", gender: str = "neutral",
           num_betas: int = 10, num_expression_coeffs: int = 10,
           age: str = "adult", kid_template_path: str = "",
           flat_hand_mean: bool = False, **unused) -> BodyModel:
    """Factory mirroring the reference's ``smplx.create``
    (lib/smplx/body_models.py:2358): ``model_path`` may be the models
    directory (resolves ``{type}/{TYPE}_{GENDER}.{npz|pkl}``) or a file.
    Covers SMPL / SMPL-H / SMPL-X / MANO / FLAME (same LBS core)."""
    import os.path as osp
    path = model_path
    if osp.isdir(model_path):
        for ext in ("npz", "pkl"):
            cand = osp.join(model_path, model_type,
                            f"{model_type.upper()}_{gender.upper()}.{ext}")
            if osp.exists(cand):
                path = cand
                break
    return load_body_model(
        path, model_type=model_type, num_betas=num_betas,
        num_expression_coeffs=num_expression_coeffs, age=age,
        kid_template_path=kid_template_path or None,
        flat_hand_mean=flat_hand_mean)
