"""HRNet backbone for PARE (reference lib/pare/pare/models/backbone/hrnet.py).

High-resolution net: a stem downsamples 4x, then parallel multi-resolution
branches exchange information through fuse layers after every module. The
'-conv' variant PARE deploys returns all four branches resampled to the
1/4-resolution grid and concatenated (32+64+128+256 = 480 channels at 56^2
for a 224^2 input). NHWC flax; ``width`` = 32 for HRNet-W32.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        name=name)


class BasicBlock(nn.Module):
    planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv1")(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv2")(out)
        out = _bn(train, "bn2")(out)
        return nn.relu(out + x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv2")(out)
        out = _bn(train, "bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = _bn(train, "bn3")(out)
        if self.downsample:
            res = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                          use_bias=False, name="downsample_conv")(x)
            res = _bn(train, "downsample_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class HRModule(nn.Module):
    """One exchange module: ``num_blocks`` BasicBlocks per branch, then a
    full fuse (every output branch sums resampled inputs from every
    branch)."""

    channels: Sequence[int]         # per-branch widths
    num_blocks: int = 4

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        n = len(self.channels)
        outs = []
        for b, x in enumerate(xs):
            h = x
            for k in range(self.num_blocks):
                h = BasicBlock(self.channels[b],
                               name=f"branch{b}_block{k}")(h, train)
            outs.append(h)

        fused = []
        for i in range(n):                       # output branch
            acc = None
            for j in range(n):                   # input branch
                h = outs[j]
                if j > i:                        # upsample j -> i
                    h = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                name=f"fuse{i}_{j}_conv")(h)
                    h = _bn(train, f"fuse{i}_{j}_bn")(h)
                    tgt = outs[i].shape[1:3]
                    h = jax.image.resize(
                        h, (h.shape[0], tgt[0], tgt[1], h.shape[-1]),
                        "nearest")
                elif j < i:                      # downsample j -> i
                    for s in range(i - j):
                        last = s == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        h = nn.Conv(ch, (3, 3), strides=2, padding=1,
                                    use_bias=False,
                                    name=f"fuse{i}_{j}_conv{s}")(h)
                        h = _bn(train, f"fuse{i}_{j}_bn{s}")(h)
                        if not last:
                            h = nn.relu(h)
                acc = h if acc is None else acc + h
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """HRNet-W{width}; returns the '-conv' concat feature map
    ([B, H/4, W/4, 15*width])."""

    width: int = 32
    stage_modules: Tuple[int, int, int] = (1, 4, 3)

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        w = self.width
        # stem: two stride-2 3x3 convs
        x = nn.Conv(64, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv1")(x)
        x = _bn(train, "bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv2")(x)
        x = _bn(train, "bn2")(x)
        x = nn.relu(x)

        # layer1: 4 bottlenecks at 64 -> 256 channels
        for k in range(4):
            x = Bottleneck(64, downsample=k == 0,
                           name=f"layer1_{k}")(x, train)

        widths = (w, 2 * w, 4 * w, 8 * w)
        # transition1: branch 0 conv, branch 1 stride-2 conv
        b0 = nn.relu(_bn(train, "t1_bn0")(nn.Conv(
            widths[0], (3, 3), padding=1, use_bias=False, name="t1_conv0")(x)))
        b1 = nn.relu(_bn(train, "t1_bn1")(nn.Conv(
            widths[1], (3, 3), strides=2, padding=1, use_bias=False,
            name="t1_conv1")(x)))
        xs = [b0, b1]

        for m in range(self.stage_modules[0]):
            xs = HRModule(widths[:2], name=f"stage2_{m}")(xs, train)

        b2 = nn.relu(_bn(train, "t2_bn")(nn.Conv(
            widths[2], (3, 3), strides=2, padding=1, use_bias=False,
            name="t2_conv")(xs[-1])))
        xs = xs + [b2]
        for m in range(self.stage_modules[1]):
            xs = HRModule(widths[:3], name=f"stage3_{m}")(xs, train)

        b3 = nn.relu(_bn(train, "t3_bn")(nn.Conv(
            widths[3], (3, 3), strides=2, padding=1, use_bias=False,
            name="t3_conv")(xs[-1])))
        xs = xs + [b3]
        for m in range(self.stage_modules[2]):
            xs = HRModule(widths, name=f"stage4_{m}")(xs, train)

        # '-conv' output (reference hrnet.py:447-466, 543-547
        # upsample_stage_{2,3,4}): each lower branch climbs to branch-0
        # resolution through repeated (bilinear align_corners x2 -> conv3x3
        # -> BN -> ReLU) steps, then all four concatenate. These upsample
        # convs are learned weights in the published checkpoint — a plain
        # resize would both miss them and break weight-port parity.
        from icon_tpu.ops.resize import resize_align_corners
        ups = [xs[0]]
        for b in range(1, 4):
            h = xs[b]
            for s in range(b):
                h = resize_align_corners(
                    h, (2 * h.shape[1], 2 * h.shape[2]), "linear")
                h = nn.Conv(h.shape[-1], (3, 3), padding=1, use_bias=False,
                            name=f"up{b}_conv{s}")(h)
                h = _bn(train, f"up{b}_bn{s}")(h)
                h = nn.relu(h)
            ups.append(h)
        return jnp.concatenate(ups, axis=-1)
