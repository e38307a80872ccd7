"""VGG19 perceptual features + loss (reference lib/net/net_util.py:283-329).

The reference's ``VGGLoss`` runs torchvision's pretrained VGG19 over five
relu slices (relu1_1..relu5_1) and L1-compares them with weights
[1/32, 1/16, 1/8, 1/4, 1]. It contributes to the *value* of the normal-net
loss under ``no_grad`` (NormalNet.py:113-120), which drives Lightning's
val-loss checkpoint selection — so loss values are only comparable to the
reference's when this term is present.

Weights: the published ``vgg19-dcbb9e9d.pth`` (torchvision layout,
``features.{i}.weight``) converts by name via :func:`port_vgg19`. Place it
at ``data/vgg/vgg19.pth`` (or pass an explicit path). Inputs are taken
as-is in [-1, 1] — the reference applies no ImageNet normalization either.
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Dict, List, Optional

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

# torchvision VGG19 `features` conv indices and their output channels;
# the five slice boundaries are the reference's relu1_1/2_1/3_1/4_1/5_1
_CONV_CH = {0: 64, 2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256,
            16: 256, 19: 512, 21: 512, 23: 512, 25: 512, 28: 512}
_SLICE_END = (0, 5, 10, 19, 28)       # conv index whose relu ends each slice
_POOL_BEFORE = (5, 10, 19, 28)        # maxpool precedes these convs
VGG_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)

DEFAULT_VGG_PATH = "data/vgg/vgg19.pth"


class Vgg19Features(nn.Module):
    """The five relu-slice feature maps, channel-last."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        h = x
        for i, ch in _CONV_CH.items():
            if i in _POOL_BEFORE:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.relu(nn.Conv(ch, (3, 3), padding=1, name=f"conv{i}")(h))
            if i in _SLICE_END:
                outs.append(h)
        return outs


def vgg_perceptual_loss(apply_fn, vgg_params, x: jnp.ndarray,
                        y: jnp.ndarray) -> jnp.ndarray:
    """Reference VGGLoss.forward: weighted L1 over the five slices."""
    fx = apply_fn({"params": vgg_params}, x)
    fy = apply_fn({"params": vgg_params}, y)
    loss = 0.0
    for w, a, b in zip(VGG_WEIGHTS, fx, fy):
        loss = loss + w * jnp.mean(jnp.abs(a - b))
    return loss


def port_vgg19(torch_state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision ``features.{i}.{weight,bias}`` -> Vgg19Features params."""
    from icon_tpu.utils.torch_port import convert_conv2d
    params: Dict[str, Any] = {}
    for i in _CONV_CH:
        w = torch_state[f"features.{i}.weight"]
        b = torch_state[f"features.{i}.bias"]
        params[f"conv{i}"] = {"kernel": convert_conv2d(np.asarray(w)),
                              "bias": np.asarray(b)}
    return params


def load_vgg19(path: Optional[str] = None):
    """(apply_fn, params) when weights exist, else None with a warning.

    A random-init VGG would make the logged loss values noise, so absent
    weights the perceptual term is skipped entirely (and the trainer says
    so) rather than silently polluting checkpoint selection.
    """
    path = path or DEFAULT_VGG_PATH
    if not osp.exists(path):
        return None
    from icon_tpu.utils.torch_port import load_torch_state
    params = port_vgg19(load_torch_state(path))
    net = Vgg19Features()
    return net.apply, params
