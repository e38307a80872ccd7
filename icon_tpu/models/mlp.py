"""Per-point implicit-occupancy regressor (reference lib/net/MLP.py).

A 1x1-Conv1d stack in the reference == per-point Dense stack here: input
``[B, N, C_in]`` -> ``[B, N, C_out]``. On TPU the N axis becomes the matmul
M-dimension, so the whole MLP is a chain of large MXU matmuls — this is the
hot op of the recon engine (millions of points per frame).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from icon_tpu.models.layers import apply_norm, make_norm


class MLP(nn.Module):
    filter_channels: Sequence[int]
    res_layers: Sequence[int] = ()
    norm: str = "group"
    last_sigmoid: bool = True

    @nn.compact
    def __call__(self, feature: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        y = feature
        tmpy = feature
        n_layers = len(self.filter_channels) - 1
        for i in range(n_layers):
            if i in self.res_layers:
                y = jnp.concatenate([y, tmpy], axis=-1)
            y = nn.Dense(self.filter_channels[i + 1], name=f"conv{i}")(y)
            if i != n_layers - 1:
                if self.norm in ("batch", "group", "instance"):
                    y = apply_norm(make_norm(self.norm, f"norm{i}"), y, train)
                y = nn.leaky_relu(y, 0.01)
        if self.last_sigmoid:
            y = nn.sigmoid(y)
        return y
