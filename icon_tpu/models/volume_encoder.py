"""3D CNN over PaMIR's semantic voxel volume (reference lib/net/VE.py).

Input ``[B, D, H, W, 3]`` (128^3 semantic volume), output list of
``num_stacks`` maps ``[B, 32, 32, 32, voxel_dim]`` (two stride-2 dilated
convs then Residual3D stacks).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn


class Residual3D(nn.Module):
    num_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        num_in = x.shape[-1]
        out = nn.Conv(self.num_out, (3, 3, 3), padding=2,
                      kernel_dilation=(2, 2, 2), name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.num_out, (3, 3, 3), padding=1, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, name="bn2")(out)
        residual = x
        if num_in != self.num_out:
            residual = nn.Conv(self.num_out, (1, 1, 1), name="conv4")(x)
        return out + residual


class VolumeEncoder(nn.Module):
    num_out: int = 32
    num_stacks: int = 2
    num_inter: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False,
                 intermediate_output: bool = True) -> List[jnp.ndarray]:
        out = nn.Conv(self.num_inter, (5, 5, 5), strides=(2, 2, 2),
                      padding=4, kernel_dilation=(2, 2, 2), name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.num_out, (5, 5, 5), strides=(2, 2, 2),
                      padding=4, kernel_dilation=(2, 2, 2), name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, name="bn2")(out)
        out = nn.relu(out)

        outs = []
        for i in range(self.num_stacks):
            out = Residual3D(self.num_out, name=f"res{i}")(out, train)
            outs.append(out)
        return outs if intermediate_output else [outs[-1]]
