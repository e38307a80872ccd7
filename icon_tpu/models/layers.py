"""Shared layer primitives: norms, the hourglass ConvBlock, and torch-parity
convolution wrappers.

References: ``ConvBlock``/``get_norm_layer`` (lib/net/net_util.py:196-280).
All modules are NHWC; BatchNorm state lives in the standard flax
``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def make_norm(norm: str, name: str) -> Optional[nn.Module]:
    """Normalization factory matching the reference's choices.

    group    -> GroupNorm(32) (affine)
    batch    -> BatchNorm (running stats)
    instance -> per-channel GroupNorm, no affine (InstanceNorm2d defaults)
    none     -> None
    """
    if norm == "group":
        # epsilon matches torch nn.GroupNorm (1e-5) so published reference
        # weights reproduce bit-comparable activations (flax default is 1e-6)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)
    if norm == "batch":
        return nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=name)
    if norm == "instance":
        return nn.GroupNorm(group_size=1, num_groups=None, use_bias=False,
                            use_scale=False, epsilon=1e-5, name=name)
    if norm in ("none", None):
        return None
    raise ValueError(f"unknown norm {norm!r}")


def apply_norm(norm_mod, x, train: bool):
    if norm_mod is None:
        return x
    if isinstance(norm_mod, nn.BatchNorm):
        return norm_mod(x, use_running_average=not train)
    return norm_mod(x)


class ConvBlock(nn.Module):
    """The hourglass residual block (net_util.py:224-280): three 3x3 convs
    producing C/2 + C/4 + C/4 channels concatenated, plus a (norm,relu,1x1)
    shortcut when channel counts differ."""

    in_planes: int
    out_planes: int
    norm: str = "group"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        half = self.out_planes // 2
        quarter = self.out_planes // 4

        out1 = apply_norm(make_norm(self.norm, "bn1"), x, train)
        out1 = nn.relu(out1)
        out1 = nn.Conv(half, (3, 3), padding=1, use_bias=False,
                       name="conv1")(out1)

        out2 = apply_norm(make_norm(self.norm, "bn2"), out1, train)
        out2 = nn.relu(out2)
        out2 = nn.Conv(quarter, (3, 3), padding=1, use_bias=False,
                       name="conv2")(out2)

        out3 = apply_norm(make_norm(self.norm, "bn3"), out2, train)
        out3 = nn.relu(out3)
        out3 = nn.Conv(quarter, (3, 3), padding=1, use_bias=False,
                       name="conv3")(out3)

        out = jnp.concatenate([out1, out2, out3], axis=-1)

        if self.in_planes != self.out_planes:
            res = apply_norm(make_norm(self.norm, "bn4"), x, train)
            res = nn.relu(res)
            res = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                          name="downsample")(res)
        else:
            res = x
        return out + res


def reflect_pad2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """ReflectionPad2d on NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="reflect")


class ConvTranspose2dTorch(nn.Module):
    """ConvTranspose2d(k=3, s=2, p=1, output_padding=1) parity: exact 2x
    upsampling transposed conv matching torch's geometry (dilate input by
    stride, pad (k-1-p) top/left and (k-1-p+op) bottom/right, correlate with
    the kernel transposed)."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p, op = self.kernel, self.stride, self.padding, \
            self.output_padding
        lo = k - 1 - p
        hi = k - 1 - p + op
        y = nn.ConvTranspose(
            self.features, (k, k), strides=(s, s),
            padding=((lo, hi), (lo, hi)),
            transpose_kernel=True, name="tconv")(x)
        return y


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """F.avg_pool2d(x, 2, stride=2) on NHWC."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def avg_pool3_count_exclude(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False)."""
    ones = jnp.ones_like(x[..., :1])
    s = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    c = nn.avg_pool(ones, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    # avg_pool divides by the full window; rescale by the valid-pixel ratio
    return s / c
