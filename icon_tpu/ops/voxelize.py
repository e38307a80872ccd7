"""Differentiable semantic voxelization of the (Tetra-)SMPL body for PaMIR.

Replaces the reference's ``voxelize_cuda`` extension
(lib/net/voxelize.py:17-61): each SMPL surface vertex splats its 3-channel
semantic code into a ``res^3`` volume with gaussian weights, followed by a
box-smooth normalization — on TPU this is one trilinear scatter-add
(``.at[].add`` lowers to XLA scatter) plus a separable depthwise conv, both
static-shape and fully differentiable w.r.t. vertex positions.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp


def _blur_axis_pad(vol: jnp.ndarray, axis: int, k: int) -> jnp.ndarray:
    """Normalized box blur along one axis with zero padding (no wrap)."""
    half = k // 2
    pad = [(0, 0)] * vol.ndim
    pad[axis] = (half, half)
    vp = jnp.pad(vol, pad)
    out = jnp.zeros_like(vol)
    for off in range(k):
        idx = [slice(None)] * vol.ndim
        idx[axis] = slice(off, off + vol.shape[axis])
        out = out + vp[tuple(idx)]
    return out / k


def smooth_conv3d(vol: jnp.ndarray, k: int) -> jnp.ndarray:
    """Separable normalized box filter over the three spatial axes of
    ``[B, D, H, W, C]`` (the reference's SmoothConv3D,
    lib/common/seg3d_utils.py:169)."""
    for axis in (1, 2, 3):
        vol = _blur_axis_pad(vol, axis, k)
    return vol


@functools.partial(jax.jit,
                   static_argnames=("res", "sigma", "smooth_kernel"))
def voxelize_semantic(verts: jnp.ndarray, codes: jnp.ndarray,
                      res: int = 128, sigma: float = 0.05,
                      smooth_kernel: int = None) -> jnp.ndarray:
    """Splat per-vertex semantic codes into a ``res^3`` volume.

    Args:
      verts: ``[B, V, 3]`` vertices in [-1, 1] (calib space; y-up).
      codes: ``[V, 3]`` or ``[B, V, 3]`` semantic vertex codes.
      res: volume resolution (128 in the reference).
      sigma: gaussian splat stddev in [-1,1] units (0.05 reference).
      smooth_kernel: box-smooth size; default derives from sigma so the
        total splat spread (trilinear ~0.4 cell + box k/sqrt(12) cells)
        matches the reference gaussian's sigma at ANY resolution — a
        fixed kernel width only tracks sigma at one res.

    Returns: ``[B, res, res, res, 3]`` volume indexed [z, y, x]
      (matching the reference's bzyxc -> bcdhw permute at voxelize.py:137).
    """
    if smooth_kernel is None:
        sig_cells = sigma * (res - 1) / 2.0
        k2 = max(12.0 * (sig_cells * sig_cells - 0.16) + 1.0, 1.0)
        smooth_kernel = max(int(round(np.sqrt(k2))) | 1, 1)
    B, V, _ = verts.shape
    if codes.ndim == 2:
        codes = jnp.broadcast_to(codes[None], (B, V, codes.shape[-1]))
    C = codes.shape[-1]

    # continuous voxel coords (align_corners: -1 -> 0, 1 -> res-1)
    g = (verts + 1.0) * 0.5 * (res - 1)                  # [B, V, 3] (x, y, z)
    base = jnp.floor(g).astype(jnp.int32)
    frac = g - base

    vol = jnp.zeros((B, res * res * res, C), verts.dtype)
    wsum = jnp.zeros((B, res * res * res, 1), verts.dtype)

    def splat(vol, wsum, offset):
        dx, dy, dz = offset
        idx = base + jnp.array([dx, dy, dz])
        w = (jnp.abs(1 - dx - frac[..., 0]) * jnp.abs(1 - dy - frac[..., 1]) *
             jnp.abs(1 - dz - frac[..., 2]))
        valid = jnp.all((idx >= 0) & (idx < res), axis=-1)
        w = jnp.where(valid, w, 0.0)[..., None]          # [B, V, 1]
        idxc = jnp.clip(idx, 0, res - 1)
        lin = (idxc[..., 2] * res + idxc[..., 1]) * res + idxc[..., 0]

        def one(v, ws, l, wt, cd):
            v = v.at[l].add(wt * cd)
            ws = ws.at[l].add(wt)
            return v, ws

        return jax.vmap(one)(vol, wsum, lin, w, codes)

    for off in ((0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
                (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)):
        vol, wsum = splat(vol, wsum, off)

    vol = vol.reshape(B, res, res, res, C)
    wsum = wsum.reshape(B, res, res, res, 1)

    # gaussian-ish spatial spread: box-smooth both accumulators, then
    # normalize (matches the CUDA kernel's sigma-splat + smooth semantics)
    k = smooth_kernel
    vol = smooth_conv3d(vol, k)
    wsum = smooth_conv3d(wsum, k)
    return vol / jnp.maximum(wsum, 1e-3)
