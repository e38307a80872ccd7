"""Stacked-hourglass image filter (reference lib/net/HGFilters.py).

Produces ``num_stack`` feature maps of ``hourglass_dim`` channels at 1/4 input
resolution (512 -> 128). Bicubic align_corners upsampling inside the hourglass
is the exact-parity MXU matmul form (icon_tpu.ops.resize).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from icon_tpu.models.layers import ConvBlock, apply_norm, avg_pool2, make_norm
from icon_tpu.ops.resize import upsample2x_bicubic


class HourGlass(nn.Module):
    """Recursive hourglass of ConvBlocks (HGFilters.py:23-79)."""

    depth: int
    features: int
    norm: str = "group"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def level(inp, lv):
            up1 = ConvBlock(self.features, self.features, self.norm,
                            name=f"b1_{lv}")(inp, train)
            low1 = avg_pool2(inp)
            low1 = ConvBlock(self.features, self.features, self.norm,
                             name=f"b2_{lv}")(low1, train)
            if lv > 1:
                low2 = level(low1, lv - 1)
            else:
                low2 = ConvBlock(self.features, self.features, self.norm,
                                 name=f"b2_plus_{lv}")(low1, train)
            low3 = ConvBlock(self.features, self.features, self.norm,
                             name=f"b3_{lv}")(low2, train)
            up2 = upsample2x_bicubic(low3)
            return up1 + up2

        return level(x, self.depth)


class HGFilter(nn.Module):
    """Stacked hourglass encoder (HGFilters.py:82-197).

    in: ``[B, H, W, C_in]`` (H=W=512 typical);
    out: list of ``num_stack`` maps ``[B, H/4, W/4, hourglass_dim]``.
    """

    num_stack: int = 2
    depth: int = 2            # opt.num_hourglass
    hourglass_dim: int = 6
    norm: str = "group"
    hg_down: str = "ave_pool"
    conv1_ksdp: Tuple[int, int, int, int] = (7, 2, 1, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False) -> List[jnp.ndarray]:
        k, s, d, p = self.conv1_ksdp
        x = nn.Conv(64, (k, k), strides=(s, s), kernel_dilation=(d, d),
                    padding=p, name="conv1")(x)
        x = nn.relu(apply_norm(make_norm(self.norm, "bn1"), x, train))

        if self.hg_down == "ave_pool":
            x = ConvBlock(64, 128, self.norm, name="conv2")(x, train)
            x = avg_pool2(x)
        elif self.hg_down in ("conv64", "conv128"):
            mid = 64 if self.hg_down == "conv64" else 128
            x = ConvBlock(64, mid, self.norm, name="conv2")(x, train)
            x = nn.Conv(128, (3, 3), strides=(2, 2), padding=1,
                        name="down_conv2")(x)
        else:
            raise ValueError(f"unknown hg_down {self.hg_down!r}")

        x = ConvBlock(128, 128, self.norm, name="conv3")(x, train)
        x = ConvBlock(128, 256, self.norm, name="conv4")(x, train)

        previous = x
        outputs = []
        for i in range(self.num_stack):
            hg = HourGlass(self.depth, 256, self.norm,
                           name=f"m{i}")(previous, train)
            ll = ConvBlock(256, 256, self.norm, name=f"top_m_{i}")(hg, train)
            ll = nn.Conv(256, (1, 1), name=f"conv_last{i}")(ll)
            ll = nn.relu(apply_norm(make_norm(self.norm, f"bn_end{i}"), ll,
                                    train))
            tmp_out = nn.Conv(self.hourglass_dim, (1, 1), name=f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < self.num_stack - 1:
                ll = nn.Conv(256, (1, 1), name=f"bl{i}")(ll)
                tmp_out_ = nn.Conv(256, (1, 1), name=f"al{i}")(tmp_out)
                previous = previous + ll + tmp_out_
        return outputs
