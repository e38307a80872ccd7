"""align_corners resize parity vs torch F.interpolate."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from icon_tpu.ops.resize import (resize3d_trilinear_align_corners,
                                 resize_align_corners, upsample2x_bicubic)

RNG = np.random.RandomState(2)


def test_bicubic_2x_matches_torch():
    x = RNG.randn(2, 16, 24, 5).astype(np.float32)
    ours = np.asarray(upsample2x_bicubic(jnp.array(x)))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        scale_factor=2, mode="bicubic", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_bilinear_arbitrary_matches_torch():
    x = RNG.randn(1, 33, 33, 2).astype(np.float32)
    ours = np.asarray(resize_align_corners(jnp.array(x), (65, 129), "linear"))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(65, 129), mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_trilinear_matches_torch():
    x = RNG.randn(1, 9, 9, 9, 1).astype(np.float32)
    ours = np.asarray(resize3d_trilinear_align_corners(jnp.array(x),
                                                       (17, 17, 17)))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                        size=(17, 17, 17), mode="trilinear",
                        align_corners=True)
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
