"""ResNet-50 backbone for PyMAF (reference lib/pymaf/models/hmr.py:63-174).

NHWC flax re-implementation of the torchvision-style bottleneck stack the
reference uses; returns the stage-4 spatial feature map plus the
globally-pooled feature vector, matching ``ResNet_Backbone.forward``'s
``(x_featmap, xf)`` contract (hmr.py:155-174). Weight layout follows
torchvision names so checkpoints port mechanically (see convert.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, name=name)
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=1, use_bias=False, name="conv2")(out)
        out = norm("bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = norm("bn3")(out)
        if self.downsample:
            res = nn.Conv(self.planes * self.expansion, (1, 1),
                          strides=self.stride, use_bias=False,
                          name="downsample_conv")(x)
            res = norm("downsample_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class ResNetBackbone(nn.Module):
    """layers=(3,4,6,3) -> ResNet-50. ``width`` scales channels for tests."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = self.width
        x = nn.Conv(w, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = (w, 2 * w, 4 * w, 8 * w)
        for si, (p, n) in enumerate(zip(planes, self.layers)):
            stride = 1 if si == 0 else 2
            for bi in range(n):
                x = Bottleneck(planes=p,
                               stride=stride if bi == 0 else 1,
                               downsample=bi == 0,
                               name=f"layer{si + 1}_{bi}")(x, train)
        s_feat = x                                     # [B, 7, 7, 8w*4]
        g_feat = jnp.mean(x, axis=(1, 2))              # global average pool
        return s_feat, g_feat
