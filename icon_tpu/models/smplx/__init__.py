"""SMPL-family body models in JAX (reference lib/smplx/, ~3.3k LoC torch).

Functional core: ``icon_tpu.models.smplx.lbs`` implements the standard linear
blend skinning math (reference lib/smplx/lbs.py:152-253); ``body`` wraps asset
loading (same .pkl/.npz files) into an immutable ``BodyModel`` pytree with a
jittable ``forward``.
"""

from icon_tpu.models.smplx.lbs import (batch_rigid_transform, batch_rodrigues,
                                       blend_shapes, lbs, vertices2joints)
from icon_tpu.models.smplx.body import BodyModel, load_body_model
