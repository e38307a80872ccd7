"""HRNet-W48 body encoder for PIXIE (reference lib/pixielib/models/
hrnet.py:14-34 ``load_HRNet`` + encoders.py:51-72 ``HRNEncoder``).

Same multi-resolution exchange trunk as PARE's backbone (stage modules
1/4/3, four branches) but W48 widths and a different aggregation head: each
branch is *subsampled* to the 1/32 grid through stride-2 conv+BN+ReLU steps
(hrnet.py:381-395 ``_make_subsample_layer``), concatenated (4x8w channels),
pushed through five bottlenecks with a bare 1x1 downsample conv — the
reference passes a raw ``nn.Conv2d`` as the bottleneck's downsample, no BN
(hrnet.py:368-379 ``_make_conv_layer``) — and globally mean-pooled into the
2048-d 'concat' feature (hrnet.py:470-490). NHWC flax; ``width`` scales for
tests (48 = the deployed W48).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from icon_tpu.models.pare.hrnet import Bottleneck, HRModule, _bn


class HeadBottleneck(nn.Module):
    """Bottleneck whose residual path is a bare 1x1 conv (no BN), matching
    ``_make_conv_layer``'s ``downsample = nn.Conv2d(...)``."""

    planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv2")(out)
        out = _bn(train, "bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = _bn(train, "bn3")(out)
        res = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name="downsample_conv")(x)
        return nn.relu(out + res)


class PixieHRNet(nn.Module):
    """HRNet-W{width} with the PIXIE 'concat' head -> [B, 16*width] global
    feature (2048 for W48... the head's feat_dim is 2048 independent of
    width in the reference; here feat_dim defaults accordingly and scales
    for tests)."""

    width: int = 48
    stem: int = 64
    feat_dim: int = 2048
    stage_modules: Tuple[int, int, int] = (1, 4, 3)

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        w = self.width
        x = nn.Conv(self.stem, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv1")(x)
        x = _bn(train, "bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.stem, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv2")(x)
        x = _bn(train, "bn2")(x)
        x = nn.relu(x)

        for k in range(4):
            x = Bottleneck(self.stem, downsample=k == 0,
                           name=f"layer1_{k}")(x, train)

        widths = (w, 2 * w, 4 * w, 8 * w)
        b0 = nn.relu(_bn(train, "t1_bn0")(nn.Conv(
            widths[0], (3, 3), padding=1, use_bias=False,
            name="t1_conv0")(x)))
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

        # subsample head: every branch marches to the 1/32 grid at 8w
        # channels via stride-2 conv(ch doubling)+BN+ReLU steps
        # (subsample_4 / subsample_3 / subsample_2 in the checkpoint)
        feats = []
        for b, nsteps in ((0, 3), (1, 2), (2, 1)):
            h = xs[b]
            ch = widths[b]
            for s in range(nsteps):
                ch *= 2
                h = nn.Conv(ch, (3, 3), strides=2, padding=1,
                            name=f"subsample{4 - b}_conv{s}")(h)
                h = _bn(train, f"subsample{4 - b}_bn{s}")(h)
                h = nn.relu(h)
            feats.append(h)
        feats.append(xs[3])
        h = jnp.concatenate(feats, axis=-1)              # [B, H/32, W/32, 32w]

        for i in range(5):
            h = HeadBottleneck(self.feat_dim // 4,
                               name=f"convlayers_{i}")(h, train)
        return jnp.mean(h, axis=(1, 2))                  # [B, feat_dim]
