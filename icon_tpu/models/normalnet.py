"""Front/back clothed-normal prediction net (reference lib/net/NormalNet.py).

Two GlobalGenerators: netF sees [image, T_normal_F(, other *_F inputs)], netB
sees [image, T_normal_B, ...]. Outputs are unit-normalized per pixel and
masked by the image foreground (NormalNet.py:74-99).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from icon_tpu.models.pix2pix import GlobalGenerator


class NormalNet(nn.Module):
    in_nml: Tuple[Tuple[str, int], ...] = (
        ("image", 3), ("T_normal_F", 3), ("T_normal_B", 3))
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9

    @property
    def front_keys(self):
        return [n for n, _ in self.in_nml if "_F" in n or n == "image"]

    @property
    def back_keys(self):
        return [n for n, _ in self.in_nml if "_B" in n or n == "image"]

    @nn.compact
    def __call__(self, in_tensor: Dict[str, jnp.ndarray],
                 train: bool = False):
        inF = jnp.concatenate([in_tensor[k] for k in self.front_keys], -1)
        inB = jnp.concatenate([in_tensor[k] for k in self.back_keys], -1)

        kw = dict(ngf=self.ngf, n_downsampling=self.n_downsampling,
                  n_blocks=self.n_blocks)
        nmlF = GlobalGenerator(name="netF", **kw)(inF, train)
        nmlB = GlobalGenerator(name="netB", **kw)(inB, train)

        nmlF = nmlF / jnp.sqrt(jnp.sum(nmlF * nmlF, -1, keepdims=True)
                               + 1e-12)
        nmlB = nmlB / jnp.sqrt(jnp.sum(nmlB * nmlB, -1, keepdims=True)
                               + 1e-12)

        mask = (jnp.sum(jnp.abs(in_tensor["image"]), axis=-1,
                        keepdims=True) != 0.0).astype(nmlF.dtype)
        return nmlF * mask, nmlB * mask
