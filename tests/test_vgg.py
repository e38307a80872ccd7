"""VGG19 perceptual-loss parity (reference lib/net/net_util.py:283-329).

A torch twin with torchvision's exact ``features.{i}`` layout (random
weights saved under the published key names) ports via port_vgg19; the
five slice outputs and the weighted VGGLoss value must match.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from icon_tpu.models.vgg import (Vgg19Features, VGG_WEIGHTS, port_vgg19,
                                 vgg_perceptual_loss)

_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _torch_vgg_features():
    layers, cin = [], 3
    for v in _CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU(True)]
            cin = v
    return nn.Sequential(*layers)


class TorchVgg19Slices(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.slices = nn.ModuleList()
        for a, b in ((0, 2), (2, 7), (7, 12), (12, 21), (21, 30)):
            self.slices.append(nn.Sequential(*[features[i]
                                               for i in range(a, b)]))

    def forward(self, x):
        outs = []
        for s in self.slices:
            x = s(x)
            outs.append(x)
        return outs


@pytest.fixture(scope="module")
def twins():
    torch.manual_seed(0)
    feats = _torch_vgg_features()
    state = {f"features.{i}.{leaf}": p.detach().numpy()
             for i, m in enumerate(feats)
             if isinstance(m, nn.Conv2d)
             for leaf, p in (("weight", m.weight), ("bias", m.bias))}
    params = port_vgg19(state)
    return TorchVgg19Slices(feats).eval(), Vgg19Features(), params


def test_vgg_slices_parity(twins):
    tnet, fnet, params = twins
    rs = np.random.RandomState(1)
    x = rs.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    outs = fnet.apply({"params": params}, jnp.asarray(x))
    assert len(outs) == 5
    for o, r in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(o),
                                   r.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-4)


def test_vgg_loss_parity(twins):
    tnet, fnet, params = twins
    rs = np.random.RandomState(2)
    x = rs.randn(1, 64, 64, 3).astype(np.float32)
    y = rs.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        fx = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
        fy = tnet(torch.from_numpy(y).permute(0, 3, 1, 2))
        ref = sum(w * torch.mean(torch.abs(a - b))
                  for w, a, b in zip(VGG_WEIGHTS, fx, fy))
    got = vgg_perceptual_loss(fnet.apply, params, jnp.asarray(x),
                              jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)
