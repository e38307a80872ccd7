"""Shape/behavior tests for the network stack, plus torch-parity checks for
the conv primitives that must match for weight porting."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp
import torch

from icon_tpu.config import Config, load_config
from icon_tpu.models.hgpifu import HGPIFuNet, channel_split, mlp_first_dim
from icon_tpu.models.hourglass import HGFilter
from icon_tpu.models.layers import ConvTranspose2dTorch
from icon_tpu.models.mlp import MLP
from icon_tpu.models.normalnet import NormalNet
from icon_tpu.models.volume_encoder import VolumeEncoder

RNG = np.random.RandomState(3)
KEY = jax.random.PRNGKey(0)


def icon_cfg(**kw):
    cfg = load_config("/root/reference/configs/icon-filter.yaml")
    return cfg.replace(**kw) if kw else cfg


def test_channel_plumbing_matches_reference():
    cfg = icon_cfg()
    assert channel_split(cfg) == [[0, 1, 2], [3, 4, 5]]
    # icon-filter: hourglass_dim 6 + smpl_dim 7 = 13
    assert mlp_first_dim(cfg) == 13
    pifu = load_config("/root/reference/configs/pifu.yaml")
    assert mlp_first_dim(pifu) == pifu.net.hourglass_dim + 1
    pamir = load_config("/root/reference/configs/pamir.yaml")
    assert mlp_first_dim(pamir) == pamir.net.hourglass_dim + pamir.net.voxel_dim


def test_mlp_shapes_and_sigmoid():
    mlp = MLP(filter_channels=(13, 64, 32, 1), res_layers=(2,), norm="batch")
    x = jnp.array(RNG.randn(2, 100, 13), jnp.float32)
    params = mlp.init(KEY, x, train=False)
    y = mlp.apply(params, x, train=False)
    assert y.shape == (2, 100, 1)
    assert float(y.min()) >= 0 and float(y.max()) <= 1


def test_hgfilter_output_shapes():
    hg = HGFilter(num_stack=2, depth=2, hourglass_dim=6)
    x = jnp.array(RNG.randn(1, 64, 64, 6), jnp.float32)
    params = hg.init(KEY, x, train=False)
    outs = hg.apply(params, x, train=False)
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (1, 16, 16, 6)


def test_conv_transpose_matches_torch():
    """ConvTranspose2d(k3, s2, p1, op1) parity with shared weights."""
    Cin, Cout, H = 4, 3, 7
    x = RNG.randn(1, H, H, Cin).astype(np.float32)
    mod = ConvTranspose2dTorch(Cout)
    params = mod.init(KEY, jnp.array(x))
    ours = np.asarray(mod.apply(params, jnp.array(x)))

    tconv = torch.nn.ConvTranspose2d(Cin, Cout, 3, stride=2, padding=1,
                                     output_padding=1)
    # flax transpose_kernel=True kernel layout [kh, kw, Cout, Cin];
    # torch ConvTranspose2d weight [Cin, Cout, kh, kw]
    k = np.asarray(params["params"]["tconv"]["kernel"])
    tconv.weight.data = torch.from_numpy(k.transpose(3, 2, 0, 1))
    tconv.bias.data = torch.from_numpy(np.asarray(
        params["params"]["tconv"]["bias"]))
    ref = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).detach()
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape == (1, 2 * H, 2 * H, Cout)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_normalnet_masking_and_unit_norm():
    net = NormalNet()
    img = RNG.randn(1, 32, 32, 3).astype(np.float32)
    img[:, :8] = 0.0  # background rows
    t = {
        "image": jnp.array(img),
        "T_normal_F": jnp.array(RNG.randn(1, 32, 32, 3), jnp.float32),
        "T_normal_B": jnp.array(RNG.randn(1, 32, 32, 3), jnp.float32),
    }
    params = net.init(KEY, t, train=False)
    nF, nB = net.apply(params, t, train=False)
    assert nF.shape == (1, 32, 32, 3)
    # masked rows are zero
    assert float(jnp.abs(nF[:, :8]).max()) == 0.0
    # foreground: unit normals
    norms = np.linalg.norm(np.asarray(nF[:, 8:]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_volume_encoder_shapes():
    ve = VolumeEncoder(num_out=8, num_stacks=2)
    x = jnp.array(RNG.randn(1, 32, 32, 32, 3), jnp.float32)
    params = ve.init(KEY, x, train=False)
    outs = ve.apply(params, x, train=False)
    assert len(outs) == 2 and outs[0].shape == (1, 8, 8, 8, 8)


def _cube_smpl_feat(B=1):
    v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                  for z in (-1, 1)], np.float32) * 0.5
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return {
        "smpl_verts": jnp.array(np.tile(v[None], (B, 1, 1))),
        "smpl_faces": jnp.array(f),
        "smpl_cmap": jnp.array(np.tile((v[None] + 1) / 2, (B, 1, 1))),
        "smpl_vis": jnp.ones((B, 8, 1)),
    }


def test_hgpifu_icon_end_to_end_small():
    cfg = icon_cfg()
    net = HGPIFuNet(cfg)
    B, N = 1, 64
    in_t = {
        "image": jnp.array(RNG.randn(B, 64, 64, 3), jnp.float32),
        "normal_F": jnp.array(RNG.randn(B, 64, 64, 3), jnp.float32),
        "normal_B": jnp.array(RNG.randn(B, 64, 64, 3), jnp.float32),
        "sample": jnp.array(RNG.rand(B, N, 3) * 2 - 1, jnp.float32),
        "calib": jnp.eye(4)[None],
        "label": jnp.array(RNG.rand(B, N, 1), jnp.float32),
        **_cube_smpl_feat(B),
    }
    variables = net.init(KEY, in_t, train=False)
    pred, err = net.apply(variables, in_t, train=False)
    assert pred.shape == (B, N, 1)

    # training mode: batch_stats get updated, error is scalar
    pred, err = net.apply(variables, in_t, train=True,
                          mutable=["batch_stats"])[0]
    assert err.shape == ()


def test_hgpifu_pifu_prior():
    cfg = load_config("/root/reference/configs/pifu.yaml")
    net = HGPIFuNet(cfg)
    B, N = 1, 32
    in_t = {
        "image": jnp.array(RNG.randn(B, 64, 64, 3), jnp.float32),
        "normal_F": jnp.array(RNG.randn(B, 64, 64, 3), jnp.float32),
        "normal_B": jnp.array(RNG.randn(B, 64, 64, 3), jnp.float32),
        "sample": jnp.array(RNG.rand(B, N, 3) * 2 - 1, jnp.float32),
        "calib": jnp.eye(4)[None],
    }
    variables = net.init(KEY, in_t, train=False)
    pred, _ = net.apply(variables, in_t, train=False)
    assert pred.shape == (B, N, 1)


def test_hgpifu_points_outside_cube_are_zero():
    cfg = icon_cfg()
    net = HGPIFuNet(cfg)
    in_t = {
        "image": jnp.array(RNG.randn(1, 64, 64, 3), jnp.float32),
        "normal_F": jnp.array(RNG.randn(1, 64, 64, 3), jnp.float32),
        "normal_B": jnp.array(RNG.randn(1, 64, 64, 3), jnp.float32),
        "sample": jnp.full((1, 8, 3), 2.0),   # all outside
        "calib": jnp.eye(4)[None],
        **_cube_smpl_feat(1),
    }
    variables = net.init(KEY, in_t, train=False)
    pred, _ = net.apply(variables, in_t, train=False)
    assert float(jnp.abs(pred).max()) == 0.0
