"""pix2pixHD-style GlobalGenerator — the backbone of the normal-map nets.

Reference: ``GlobalGenerator``/``ResnetBlock`` (lib/net/FBNet.py:202-317),
instantiated via ``define_G(in, 3, 64, "global", 4, 9, 1, 3, "instance")``
(lib/net/NormalNet.py:67-70): ngf=64, 4 downsamplings, 9 resnet blocks,
instance norm, reflect padding, Tanh output.

The 9 identical resblocks run as ONE ``nn.scan`` body with stacked
[9, ...] params instead of 9 inlined copies: the traced graph shrinks ~6x,
which cuts XLA compile time for the 512^2 NormalNet (the demo's cold-start
bottleneck — the remote-compile service was intermittently dying on the
inlined 9-block module, round-3 notes in infer/refine.py:159-174).
Instance norm carries no state, so the scan is purely structural. The
torch-port ordered matcher stacks the reference's nine per-block tensors
into the leading axis (utils/torch_port.py:port_by_order stacked_prefixes).
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

        dim = self.ngf * 2 ** self.n_downsampling
        scan = nn.scan(
            lambda block, carry, _: (block(carry, train), None),
            variable_axes={"params": 0}, split_rngs={"params": True},
            length=self.n_blocks)
        h, _ = scan(ResnetBlock(dim, self.norm, name="res_stack"), h, None)

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
