"""Exact image resizing with torch ``align_corners=True`` semantics.

``jax.image.resize`` uses half-pixel sampling, which does NOT match
``F.interpolate(..., align_corners=True)`` — the convention the reference's
hourglass upsampling (lib/net/HGFilters.py:70-73, bicubic) and recon engine
(trilinear, lib/common/seg3d_lossless.py:190-200) depend on (SURVEY.md
"Hard parts" #5).

TPU-first design: separable interpolation as two dense matmuls — for an
(H_in -> H_out) resize the weights form a static ``[H_out, H_in]`` matrix, so
``out = W_r @ img @ W_c^T`` rides the MXU instead of doing gather arithmetic
on the VPU. Weight matrices are computed in numpy at trace time and baked
into the graph as constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# interpolation weights are exact convex combinations; on TPU the default
# bf16 matmul precision breaks that (and torch parity) — force fp32
_PREC = jax.lax.Precision.HIGHEST


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys); torch uses a = -0.75."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(ax <= 1, (a + 2) * ax3 - (a + 3) * ax2 + 1,
                 np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a,
                          0.0))
    return w


@functools.lru_cache(maxsize=None)
def _resize_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """[out_size, in_size] interpolation matrix, align_corners=True."""
    if out_size == 1:
        src = np.zeros((1,))
    else:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    W = np.zeros((out_size, in_size), np.float32)
    if mode == "linear":
        lo = np.floor(src).astype(int)
        frac = src - lo
        hi = np.minimum(lo + 1, in_size - 1)
        for i in range(out_size):
            W[i, lo[i]] += 1 - frac[i]
            W[i, hi[i]] += frac[i]
    elif mode == "cubic":
        lo = np.floor(src).astype(int)
        frac = src - lo
        for t in range(-1, 3):
            idx = np.clip(lo + t, 0, in_size - 1)
            w = _cubic_kernel(t - frac)
            for i in range(out_size):
                W[i, idx[i]] += w[i]
    else:
        raise ValueError(mode)
    return W


def resize_align_corners(x: jnp.ndarray, out_hw, mode: str = "linear"):
    """Resize ``[B, H, W, C]`` to ``out_hw = (H', W')``; torch
    ``align_corners=True`` parity for 'linear' (bilinear) and 'cubic'."""
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    Wr = jnp.asarray(_resize_matrix(H, Ho, mode))
    Wc = jnp.asarray(_resize_matrix(W, Wo, mode))
    x = jnp.einsum("oh,bhwc->bowc", Wr, x.astype(jnp.float32),
                   precision=_PREC)
    x = jnp.einsum("ow,bhwc->bhoc", Wc, x, precision=_PREC)
    return x


def upsample2x_bicubic(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``F.interpolate(scale_factor=2, mode='bicubic',
    align_corners=True)`` on ``[B, H, W, C]``."""
    B, H, W, C = x.shape
    return resize_align_corners(x, (2 * H, 2 * W), "cubic")


def resize3d_trilinear_align_corners(x: jnp.ndarray, out_dhw) -> jnp.ndarray:
    """torch trilinear align_corners=True on ``[B, D, H, W, C]``."""
    B, D, H, W, C = x.shape
    Do, Ho, Wo = out_dhw
    Wd = jnp.asarray(_resize_matrix(D, Do, "linear"))
    Wh = jnp.asarray(_resize_matrix(H, Ho, "linear"))
    Ww = jnp.asarray(_resize_matrix(W, Wo, "linear"))
    x = jnp.einsum("od,bdhwc->bohwc", Wd, x.astype(jnp.float32),
                   precision=_PREC)
    x = jnp.einsum("oh,bdhwc->bdowc", Wh, x, precision=_PREC)
    x = jnp.einsum("ow,bdhwc->bdhoc", Ww, x, precision=_PREC)
    return x
