"""Architecture + weight-port parity: a torch GlobalGenerator built to the
reference's spec (FBNet.py define_G 'global': reflect pad, 4x stride-2 down,
9 resnet blocks, instance norm w/o affine, convtranspose up, tanh) must
produce the same output as our flax GlobalGenerator after port_by_order."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from icon_tpu.models.pix2pix import GlobalGenerator
from icon_tpu.utils.torch_port import load_torch_state, port_by_order


def torch_global_generator(input_nc, output_nc=3, ngf=8, n_down=2,
                           n_blocks=2):
    norm = lambda c: nn.InstanceNorm2d(c, affine=False)
    layers = [nn.ReflectionPad2d(3),
              nn.Conv2d(input_nc, ngf, 7, padding=0), norm(ngf),
              nn.ReLU(True)]
    for i in range(n_down):
        m = 2 ** i
        layers += [nn.Conv2d(ngf * m, ngf * m * 2, 3, stride=2, padding=1),
                   norm(ngf * m * 2), nn.ReLU(True)]
    dim = ngf * 2 ** n_down
    for _ in range(n_blocks):
        layers += [TorchResnetBlock(dim)]
    for i in range(n_down):
        m = 2 ** (n_down - i)
        layers += [nn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, stride=2,
                                      padding=1, output_padding=1),
                   norm(ngf * m // 2), nn.ReLU(True)]
    layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7, padding=0),
               nn.Tanh()]
    return nn.Sequential(*layers)


class TorchResnetBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, padding=0),
            nn.InstanceNorm2d(dim), nn.ReLU(True),
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, padding=0),
            nn.InstanceNorm2d(dim))

    def forward(self, x):
        return x + self.block(x)


def test_global_generator_port_parity(tmp_path):
    torch.manual_seed(0)
    tnet = torch_global_generator(input_nc=6)
    tnet.eval()

    x = np.random.RandomState(0).randn(1, 32, 32, 6).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()

    fnet = GlobalGenerator(output_nc=3, ngf=8, n_downsampling=2, n_blocks=2)
    variables = fnet.init(jax.random.PRNGKey(0), jnp.asarray(x))

    ckpt = str(tmp_path / "g.ckpt")
    torch.save({"state_dict": tnet.state_dict()}, ckpt)
    tstate = load_torch_state(ckpt)

    new_params, log = port_by_order(tstate, variables["params"])
    out = fnet.apply({"params": new_params}, jnp.asarray(x))

    assert len(log) > 0
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_port_rejects_unknown_netg_keys():
    """A published checkpoint with netG tensors the port does not map must
    refuse to load (silent drops hide module-tree mismatches; VERDICT r4
    #10). Non-netG bookkeeping keys stay ignorable."""
    import pytest
    from icon_tpu.utils.torch_port import port_icon_checkpoint

    params = {"other": {"w": np.ones((2, 2), np.float32)}}
    state = {"netG.mystery_module.weight": np.zeros((4, 4), np.float32)}
    with pytest.raises(ValueError, match="mystery_module"):
        port_icon_checkpoint(params, icon_state=state)

    # explicit allow-list drops them; non-netG keys are always ignorable
    state["epoch"] = np.zeros((1,), np.float32)
    new, stats, log = port_icon_checkpoint(
        params, icon_state=state, allow_unknown=("netG.mystery_module.",))
    assert any("epoch" in l and "ignored" in l for l in log)


def test_scope_summary():
    from icon_tpu.utils.torch_port import scope_summary
    params = {"F_filter": {"conv1": {"kernel": np.ones((3, 3), np.float32)},
                           "conv2": {"kernel": np.ones((2,), np.float32)}},
              "mlp": {"d0": {"bias": np.zeros((4,), np.float32)}}}
    lines = scope_summary(params)
    assert any(l.startswith("F_filter/conv1: 1 tensors, 9 params")
               for l in lines)
    assert any(l.startswith("mlp/d0: 1 tensors, 4 params, L2=0.000")
               for l in lines)
