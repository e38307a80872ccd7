"""Visibility-gated front/back feature selection.

Reference: ``feat_select`` (lib/dataset/mesh_util.py:266-277) — given a
concatenated [front_feat, back_feat] vector per point and a per-point
visibility bit, pick the front half where visible, the back half otherwise.

The reference builds an integer gather index; on TPU a masked ``where`` over
the two halves is branch-free, fuses into neighbours, and never materializes
indices.
"""

from __future__ import annotations

import jax.numpy as jnp


def feat_select(feat: jnp.ndarray, select: jnp.ndarray) -> jnp.ndarray:
    """Args:
      feat: ``[B, N, 2*Cf]`` front features in channels [0, Cf), back in [Cf, 2Cf).
      select: ``[B, N, 1]`` visibility in {0, 1} (1 -> front).

    Returns: ``[B, N, Cf]``.
    """
    dim = feat.shape[-1] // 2
    front = feat[..., :dim]
    back = feat[..., dim:]
    return jnp.where(select > 0.5, front, back)
