"""Pixel-aligned feature sampling — the ``index`` primitive of PIFu-style nets.

Bilinear (2D) / trilinear (3D) sampling at continuous normalized coordinates,
matching ``torch.nn.functional.grid_sample(align_corners=True,
padding_mode='zeros')`` bit-for-bit (the reference relies on this exact
convention: ``lib/net/geometry.py:21-43``, SURVEY.md §"Hard parts" #5).

TPU-first design: a sample at N points over a ``[B, H, W, C]`` feature map is
one flattened gather (``take_along_axis`` over ``H*W``) per corner plus a
weighted sum — XLA lowers this to an efficient dynamic-gather and fuses the
lerp arithmetic into it. Channel-last keeps the gathered vectors contiguous in
lanes (C is the fastest-varying axis), which is the layout the VPU wants.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """align_corners=True: [-1, 1] -> [0, size-1]."""
    return (coord + 1.0) * 0.5 * (size - 1)


def _gather_corner_2d(feat_flat, ix, iy, W, H, valid_w):
    """Gather feat at integer (ix, iy) with zero padding outside."""
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    lin = iyc * W + ixc                                 # [B, N]
    g = jnp.take_along_axis(feat_flat, lin[..., None], axis=1)  # [B, N, C]
    w = jnp.where(valid, valid_w, 0.0)
    return g, w


def grid_sample_2d(feat: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of ``feat [B, H, W, C]`` at ``uv [B, N, 2]`` in [-1, 1].

    ``uv[..., 0]`` indexes W (x), ``uv[..., 1]`` indexes H (y) — the
    torch.grid_sample convention. Returns ``[B, N, C]``.
    """
    B, H, W, C = feat.shape
    x = _unnormalize(uv[..., 0].astype(feat.dtype), W)
    y = _unnormalize(uv[..., 1].astype(feat.dtype), H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    feat_flat = feat.reshape(B, H * W, C)
    g00, w00 = _gather_corner_2d(feat_flat, x0i, y0i, W, H, (1 - wx) * (1 - wy))
    g01, w01 = _gather_corner_2d(feat_flat, x0i + 1, y0i, W, H, wx * (1 - wy))
    g10, w10 = _gather_corner_2d(feat_flat, x0i, y0i + 1, W, H, (1 - wx) * wy)
    g11, w11 = _gather_corner_2d(feat_flat, x0i + 1, y0i + 1, W, H, wx * wy)

    return (g00 * w00[..., None] + g01 * w01[..., None] +
            g10 * w10[..., None] + g11 * w11[..., None])


def _gather_corner_3d(vol_flat, ix, iy, iz, W, H, D, valid_w):
    valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) &
             (iz >= 0) & (iz < D))
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    izc = jnp.clip(iz, 0, D - 1)
    lin = (izc * H + iyc) * W + ixc
    g = jnp.take_along_axis(vol_flat, lin[..., None], axis=1)
    w = jnp.where(valid, valid_w, 0.0)
    return g, w


def grid_sample_3d(vol: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of ``vol [B, D, H, W, C]`` at ``xyz [B, N, 3]``.

    ``xyz[..., 0]`` indexes W, ``xyz[..., 1]`` H, ``xyz[..., 2]`` D (torch's
    5D grid_sample convention). Returns ``[B, N, C]``.
    """
    B, D, H, W, C = vol.shape
    x = _unnormalize(xyz[..., 0].astype(vol.dtype), W)
    y = _unnormalize(xyz[..., 1].astype(vol.dtype), H)
    z = _unnormalize(xyz[..., 2].astype(vol.dtype), D)

    x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
    wx = x - x0; wy = y - y0; wz = z - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    vol_flat = vol.reshape(B, D * H * W, C)
    out = jnp.zeros((B, xyz.shape[1], C), vol.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = ((wx if dx else 1 - wx) * (wy if dy else 1 - wy) *
                     (wz if dz else 1 - wz))
                g, wv = _gather_corner_3d(vol_flat, x0i + dx, y0i + dy,
                                          z0i + dz, W, H, D, w)
                out = out + g * wv[..., None]
    return out


def index(feat: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """The PIFu ``index`` op (reference ``lib/net/geometry.py:21``):
    dispatches on coordinate dimensionality (2 -> image, 3 -> volume)."""
    if uv.shape[-1] == 2:
        return grid_sample_2d(feat, uv)
    if uv.shape[-1] == 3:
        return grid_sample_3d(feat, uv)
    raise ValueError(f"uv last dim must be 2 or 3, got {uv.shape}")
