"""U^2-Net salient-object matting (the reference's ``rembg`` background
removal, lib/pymaf/utils/imutils.py:11,132-136).

Standard U^2-Net: nested U-blocks (RSU-7..RSU-4 + dilated RSU-4F) in a
6-stage encoder/decoder with six side outputs fused by a 1x1 conv. NHWC
flax; ``u2net`` (full, 44M params) and ``u2netp`` (lite, 1.1M) configs match
the public checkpoints so ``port_u2net`` can load them by deterministic
name mapping (weights are fetched by the user; none ship here).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


class REBNCONV(nn.Module):
    out_ch: int
    dirate: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (3, 3), padding=self.dirate,
                    kernel_dilation=self.dirate, name="conv_s1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn_s1")(x)
        return nn.relu(x)


def _up_to(x, ref):
    """Bilinear upsample x to ref's spatial size (torch F.upsample)."""
    B, H, W, C = ref.shape
    return jax.image.resize(x, (x.shape[0], H, W, x.shape[-1]), "bilinear")


class RSU(nn.Module):
    """Residual U-block of height L."""

    height: int
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNCONV(self.out_ch, name="rebnconvin")(x, train)
        L = self.height

        enc = [REBNCONV(self.mid_ch, name="rebnconv1")(hxin, train)]
        h = enc[0]
        for i in range(2, L):
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = REBNCONV(self.mid_ch, name=f"rebnconv{i}")(h, train)
            enc.append(h)
        bottom = REBNCONV(self.mid_ch, dirate=2,
                          name=f"rebnconv{L}")(enc[-1], train)

        h = bottom
        for i in range(L - 1, 1, -1):
            h = REBNCONV(self.mid_ch, name=f"rebnconv{i}d")(
                jnp.concatenate([h, enc[i - 1]], -1), train)
            h = _up_to(h, enc[i - 2])
        h = REBNCONV(self.out_ch, name="rebnconv1d")(
            jnp.concatenate([h, enc[0]], -1), train)
        return h + hxin


class RSU4F(nn.Module):
    """Dilation-only residual block (no pooling)."""

    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNCONV(self.out_ch, name="rebnconvin")(x, train)
        h1 = REBNCONV(self.mid_ch, dirate=1, name="rebnconv1")(hxin, train)
        h2 = REBNCONV(self.mid_ch, dirate=2, name="rebnconv2")(h1, train)
        h3 = REBNCONV(self.mid_ch, dirate=4, name="rebnconv3")(h2, train)
        h4 = REBNCONV(self.mid_ch, dirate=8, name="rebnconv4")(h3, train)
        h3d = REBNCONV(self.mid_ch, dirate=4, name="rebnconv3d")(
            jnp.concatenate([h4, h3], -1), train)
        h2d = REBNCONV(self.mid_ch, dirate=2, name="rebnconv2d")(
            jnp.concatenate([h3d, h2], -1), train)
        h1d = REBNCONV(self.out_ch, dirate=1, name="rebnconv1d")(
            jnp.concatenate([h2d, h1], -1), train)
        return h1d + hxin


# (block type, height, mid, out) per stage; u2net full vs lite
U2NET_FULL = (
    ("rsu", 7, 32, 64), ("rsu", 6, 32, 128), ("rsu", 5, 64, 256),
    ("rsu", 4, 128, 512), ("rsu4f", 0, 256, 512), ("rsu4f", 0, 256, 512),
    # decoder
    ("rsu4f", 0, 256, 512), ("rsu", 4, 128, 256), ("rsu", 5, 64, 128),
    ("rsu", 6, 32, 64), ("rsu", 7, 16, 64),
)
U2NET_LITE = (
    ("rsu", 7, 16, 64), ("rsu", 6, 16, 64), ("rsu", 5, 16, 64),
    ("rsu", 4, 16, 64), ("rsu4f", 0, 16, 64), ("rsu4f", 0, 16, 64),
    ("rsu4f", 0, 16, 64), ("rsu", 4, 16, 64), ("rsu", 5, 16, 64),
    ("rsu", 6, 16, 64), ("rsu", 7, 16, 64),
)


class U2NET(nn.Module):
    config: Sequence = U2NET_LITE

    def _block(self, spec, name):
        kind, height, mid, out = spec
        if kind == "rsu":
            return RSU(height=height, mid_ch=mid, out_ch=out, name=name)
        return RSU4F(mid_ch=mid, out_ch=out, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        """x [B, H, W, 3] in [0,1] -> fused saliency [B, H, W, 1] in [0,1]."""
        cfg = tuple(self.config)
        encs = []
        h = x
        for i in range(6):
            h = self._block(cfg[i], f"stage{i + 1}")(h, train)
            encs.append(h)
            if i < 5:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))

        sides = [encs[5]]
        h = _up_to(encs[5], encs[4])
        for i in range(5):
            h = self._block(cfg[6 + i], f"stage{5 - i}d")(
                jnp.concatenate([h, encs[4 - i]], -1), train)
            sides.append(h)
            if i < 4:
                h = _up_to(h, encs[3 - i])

        outs = []
        for i, s in enumerate(reversed(sides)):       # d1..d6
            o = nn.Conv(1, (3, 3), padding=1, name=f"side{i + 1}")(s)
            outs.append(_up_to(o, x))
        fused = nn.Conv(1, (1, 1), name="outconv")(
            jnp.concatenate(outs, -1))
        return nn.sigmoid(fused)


def port_u2net(torch_state: Dict[str, np.ndarray],
               variables: Dict[str, Any]) -> Dict[str, Any]:
    """Port a public u2net/u2netp checkpoint by name mapping (torch module
    names match ours one-to-one: stageX[.d].rebnconvY[d].conv_s1/bn_s1,
    sideN, outconv)."""
    from icon_tpu.utils.torch_port import convert_conv2d

    def to_mutable(t):
        if hasattr(t, "items"):
            return {k: to_mutable(v) for k, v in t.items()}
        return np.asarray(t)

    new = {"params": to_mutable(variables["params"]),
           "batch_stats": to_mutable(variables.get("batch_stats", {}))}
    for tk, tv in torch_state.items():
        parts = tk.split(".")
        if parts[-2:] == ["conv_s1", "weight"]:
            coll, leaf, conv = "params", "kernel", True
        elif parts[-2:] == ["conv_s1", "bias"]:
            coll, leaf, conv = "params", "bias", False
        elif parts[-1] == "weight" and parts[-2].startswith("bn"):
            coll, leaf, conv = "params", "scale", False
        elif parts[-1] == "bias" and parts[-2].startswith("bn"):
            coll, leaf, conv = "params", "bias", False
        elif parts[-1] == "running_mean":
            coll, leaf, conv = "batch_stats", "mean", False
        elif parts[-1] == "running_var":
            coll, leaf, conv = "batch_stats", "var", False
        elif parts[-1] == "weight" and parts[0].startswith(("side", "out")):
            coll, leaf, conv = "params", "kernel", True
        elif parts[-1] == "bias" and parts[0].startswith(("side", "out")):
            coll, leaf, conv = "params", "bias", False
        else:
            continue
        path = parts[:-1] if parts[-2].startswith(("conv", "bn")) and \
            len(parts) > 2 else parts[:-1]
        # torch name stage1.rebnconv1.conv_s1.weight ->
        #   params/stage1/rebnconv1/conv_s1/kernel
        node = new[coll]
        ok = True
        for p in path:
            if p not in node:
                ok = False
                break
            node = node[p]
        if not ok or leaf not in node:
            continue
        w = convert_conv2d(np.asarray(tv)) if conv else np.asarray(tv)
        if w.shape == np.asarray(node[leaf]).shape:
            node[leaf] = w.astype(np.asarray(node[leaf]).dtype)
    return new


def build_segmenter(ckpt_path: str = "", lite: bool = True):
    """Callable [H, W, 3] float -> alpha [H, W]; random weights when no
    checkpoint is installed (data/HPS/u2net.pth)."""
    net = U2NET(config=U2NET_LITE if lite else U2NET_FULL)
    x0 = jnp.zeros((1, 320, 320, 3))
    variables = jax.jit(lambda k, x: net.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)
    import os.path as osp
    if ckpt_path and osp.exists(ckpt_path):
        from icon_tpu.utils.torch_port import load_torch_state
        variables = port_u2net(load_torch_state(ckpt_path), variables)
    fwd = jax.jit(lambda v, x: net.apply(v, x, train=False))

    def segment(rgb: np.ndarray) -> np.ndarray:
        from PIL import Image
        H, W = rgb.shape[:2]
        small = np.asarray(Image.fromarray(
            (np.clip(rgb, 0, 1) * 255).astype(np.uint8)).resize(
                (320, 320), Image.BILINEAR), np.float32) / 255.0
        mean = small.mean(axis=(0, 1), keepdims=True)
        std = small.std(axis=(0, 1), keepdims=True) + 1e-6
        alpha = np.asarray(fwd(variables, jnp.asarray(
            ((small - mean) / std)[None])))[0, ..., 0]
        alpha = np.asarray(Image.fromarray(
            (alpha * 255).astype(np.uint8)).resize(
                (W, H), Image.BILINEAR), np.float32) / 255.0
        return alpha

    return segment
