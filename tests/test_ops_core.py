"""Golden tests for core ops against torch reference semantics.

The torch calls here define the *convention* the reference depends on
(grid_sample align_corners=True + zeros padding, baddbmm projection); we
verify our JAX ops reproduce them to float32 tolerance.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from icon_tpu.ops import (feat_select, grid_sample_2d, grid_sample_3d, index,
                          orthogonal, perspective)

RNG = np.random.RandomState(0)


def test_grid_sample_2d_matches_torch():
    B, H, W, C, N = 2, 13, 17, 5, 101
    feat = RNG.randn(B, H, W, C).astype(np.float32)
    # include far out-of-range points to check zero padding
    uv = (RNG.rand(B, N, 2).astype(np.float32) * 3.0 - 1.5)

    ours = np.asarray(grid_sample_2d(jnp.array(feat), jnp.array(uv)))

    t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)        # [B,C,H,W]
    t_grid = torch.from_numpy(uv).unsqueeze(2)                 # [B,N,1,2]
    ref = F.grid_sample(t_feat, t_grid, align_corners=True,
                        padding_mode="zeros")                  # [B,C,N,1]
    ref = ref.squeeze(-1).permute(0, 2, 1).numpy()             # [B,N,C]

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_2d_exact_corners():
    feat = np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1)
    # uv = (-1,-1) -> pixel (0,0); (1,1) -> pixel (3,2)
    uv = np.array([[[-1.0, -1.0], [1.0, 1.0]]], np.float32)
    out = np.asarray(grid_sample_2d(jnp.array(feat), jnp.array(uv)))
    assert out[0, 0, 0] == feat[0, 0, 0, 0]
    assert out[0, 1, 0] == feat[0, 2, 3, 0]


def test_grid_sample_3d_matches_torch():
    B, D, H, W, C, N = 2, 7, 9, 11, 4, 67
    vol = RNG.randn(B, D, H, W, C).astype(np.float32)
    xyz = (RNG.rand(B, N, 3).astype(np.float32) * 2.6 - 1.3)

    ours = np.asarray(grid_sample_3d(jnp.array(vol), jnp.array(xyz)))

    t_vol = torch.from_numpy(vol).permute(0, 4, 1, 2, 3)       # [B,C,D,H,W]
    t_grid = torch.from_numpy(xyz)[:, :, None, None, :]        # [B,N,1,1,3]
    ref = F.grid_sample(t_vol, t_grid, align_corners=True,
                        padding_mode="zeros")                  # [B,C,N,1,1]
    ref = ref.squeeze(-1).squeeze(-1).permute(0, 2, 1).numpy()

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_index_dispatch():
    feat2d = jnp.zeros((1, 4, 4, 3))
    feat3d = jnp.zeros((1, 4, 4, 4, 3))
    assert index(feat2d, jnp.zeros((1, 5, 2))).shape == (1, 5, 3)
    assert index(feat3d, jnp.zeros((1, 5, 3))).shape == (1, 5, 3)


def test_orthogonal_matches_torch_baddbmm():
    B, N = 3, 50
    pts = RNG.randn(B, N, 3).astype(np.float32)
    calib = RNG.randn(B, 4, 4).astype(np.float32)

    ours = np.asarray(orthogonal(jnp.array(pts), jnp.array(calib)))

    t_pts = torch.from_numpy(pts).permute(0, 2, 1)             # [B,3,N]
    t_calib = torch.from_numpy(calib)
    rot = t_calib[:, :3, :3]
    trans = t_calib[:, :3, 3:4]
    ref = torch.baddbmm(trans, rot, t_pts).permute(0, 2, 1).numpy()

    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_perspective_matches_reference_math():
    B, N = 2, 20
    pts = RNG.randn(B, N, 3).astype(np.float32)
    pts[..., 2] += 5.0  # keep z away from 0
    calib = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
    calib[:, 2, 3] = 2.0

    out = np.asarray(perspective(jnp.array(pts), jnp.array(calib)))
    z = pts[..., 2] + 2.0
    np.testing.assert_allclose(out[..., 0], pts[..., 0] / z, rtol=1e-5)
    np.testing.assert_allclose(out[..., 1], pts[..., 1] / z, rtol=1e-5)
    np.testing.assert_allclose(out[..., 2], z, rtol=1e-6)


def test_feat_select_matches_torch_gather():
    B, N, C2 = 2, 33, 12
    feat = RNG.randn(B, N, C2).astype(np.float32)
    sel = (RNG.rand(B, N, 1) > 0.5).astype(np.float32)

    ours = np.asarray(feat_select(jnp.array(feat), jnp.array(sel)))

    # reference gather formulation (mesh_util.py:266-277), channels-first
    t_feat = torch.from_numpy(feat).permute(0, 2, 1)           # [B, 2C, N]
    t_sel = torch.from_numpy(sel).permute(0, 2, 1)             # [B, 1, N]
    dim = C2 // 2
    idx = torch.tile((1 - t_sel), (1, dim, 1)) * dim + \
        torch.arange(0, dim).unsqueeze(0).unsqueeze(2)
    ref = torch.gather(t_feat, 1, idx.long()).permute(0, 2, 1).numpy()

    np.testing.assert_allclose(ours, ref)
