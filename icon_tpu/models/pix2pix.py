"""pix2pixHD-style GlobalGenerator — the backbone of the normal-map nets.

Reference: ``GlobalGenerator``/``ResnetBlock`` (lib/net/FBNet.py:202-317),
instantiated via ``define_G(in, 3, 64, "global", 4, 9, 1, 3, "instance")``
(lib/net/NormalNet.py:67-70): ngf=64, 4 downsamplings, 9 resnet blocks,
instance norm, reflect padding, Tanh output.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from icon_tpu.models.layers import (ConvTranspose2dTorch, apply_norm,
                                    make_norm, reflect_pad2d)


class ResnetBlock(nn.Module):
    dim: int
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = reflect_pad2d(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding=0, name="conv1")(h)
        h = apply_norm(make_norm(self.norm, "norm1"), h, train)
        h = nn.relu(h)
        h = reflect_pad2d(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding=0, name="conv2")(h)
        h = apply_norm(make_norm(self.norm, "norm2"), h, train)
        return x + h


class GlobalGenerator(nn.Module):
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    norm: str = "instance"
    use_tanh: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = reflect_pad2d(x, 3)
        h = nn.Conv(self.ngf, (7, 7), padding=0, name="conv_in")(h)
        h = apply_norm(make_norm(self.norm, "norm_in"), h, train)
        h = nn.relu(h)

        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=1, name=f"down{i}")(h)
            h = apply_norm(make_norm(self.norm, f"down_norm{i}"), h, train)
            h = nn.relu(h)

        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 2 ** self.n_downsampling, self.norm,
                            name=f"res{i}")(h, train)

        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = ConvTranspose2dTorch(self.ngf * mult // 2,
                                     name=f"up{i}")(h)
            h = apply_norm(make_norm(self.norm, f"up_norm{i}"), h, train)
            h = nn.relu(h)

        h = reflect_pad2d(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding=0, name="conv_out")(h)
        if self.use_tanh:
            h = jnp.tanh(h)
        return h
