"""Screened Poisson surface reconstruction on a regular grid (device).

Replaces the reference's pymeshlab ``possion`` utility
(lib/dataset/mesh_util.py:123-133, ``surface_reconstruction_screened_
poisson(depth=10)``) with a TPU-native formulation: instead of the octree
multigrid of Kazhdan et al., the indicator field solves on a dense regular
grid — which is exactly what XLA wants (static shapes, stencil convs, CG
iterations of fused elementwise + conv work):

1. oriented samples = face centroids with area-weighted normals;
2. the normal field V splats trilinearly into a [R^3, 3] grid;
3. solve the screened Poisson equation  (div grad - alpha W) chi = div V
   by conjugate gradients, where W is the splatted sample-weight grid (the
   "screen" pulls chi toward the iso value at the samples);
4. the reconstructed surface is the iso level set of chi at the
   sample-weighted mean, extractable with recon/marching.

All device math: the Laplacian and divergence are 1D stencil rolls that
XLA fuses; a 128^3 solve (100 CG iters) runs in a few hundred ms on one
v5e chip.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _splat(points01: jnp.ndarray, values: jnp.ndarray, res: int
           ) -> jnp.ndarray:
    """Trilinear scatter of ``values [N, C]`` at ``points01 [N, 3]`` (unit
    cube) into a ``[res, res, res, C]`` grid."""
    p = jnp.clip(points01, 0.0, 1.0) * (res - 1)
    i0 = jnp.floor(p).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, res - 2)
    f = p - i0
    grid = jnp.zeros((res, res, res, values.shape[-1]), values.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                     * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                     * jnp.where(dz, f[:, 2], 1 - f[:, 2]))[:, None]
                grid = grid.at[i0[:, 0] + dx, i0[:, 1] + dy,
                               i0[:, 2] + dz].add(w * values)
    return grid


def _sample(grid: jnp.ndarray, points01: jnp.ndarray) -> jnp.ndarray:
    """Trilinear gather from ``grid [R, R, R]`` at unit-cube points."""
    res = grid.shape[0]
    p = jnp.clip(points01, 0.0, 1.0) * (res - 1)
    i0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, res - 2)
    f = p - i0
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                     * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                     * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                out = out + w * grid[i0[:, 0] + dx, i0[:, 1] + dy,
                                     i0[:, 2] + dz]
    return out


def _shift(x: jnp.ndarray, ax: int, d: int) -> jnp.ndarray:
    """Neighbor in +-ax with edge-clamped (Neumann) boundaries — a
    periodic ``roll`` would couple opposite box faces."""
    pad = [(0, 0)] * x.ndim
    pad[ax] = (1, 1)
    xp = jnp.pad(x, pad, mode="edge")
    idx = [slice(None)] * x.ndim
    idx[ax] = slice(1 + d, 1 + d + x.shape[ax])
    return xp[tuple(idx)]


def _div(v: jnp.ndarray) -> jnp.ndarray:
    """Central-difference divergence of ``v [R, R, R, 3]`` (unit spacing)."""
    out = 0.0
    for ax in range(3):
        out = out + 0.5 * (_shift(v[..., ax], ax, 1)
                           - _shift(v[..., ax], ax, -1))
    return out


def _laplace(x: jnp.ndarray) -> jnp.ndarray:
    """7-point Laplacian, Neumann boundaries."""
    out = -6.0 * x
    for ax in range(3):
        out = out + _shift(x, ax, 1) + _shift(x, ax, -1)
    return out


def sample_surface(verts: np.ndarray, faces: np.ndarray,
                   per_area: float, seed: int = 0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Area-stratified oriented samples: ~``per_area`` samples per unit
    area per face (>= 1 each), barycentric-uniform, each carrying the face
    normal weighted by area/count so the splatted field integrates the
    surface measure. Returns (points [N, 3], weighted_normals [N, 3])."""
    rng = np.random.RandomState(seed)
    tri = verts[faces]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area2 = np.linalg.norm(fn, axis=1)
    counts = np.maximum(np.ceil(per_area * 0.5 * area2).astype(np.int64), 1)
    fidx = np.repeat(np.arange(len(faces)), counts)
    u = rng.rand(len(fidx), 2).astype(np.float32)
    flip = u.sum(1) > 1
    u[flip] = 1.0 - u[flip]
    t = tri[fidx]
    pts = (t[:, 0] * (1 - u[:, :1] - u[:, 1:])
           + t[:, 1] * u[:, :1] + t[:, 2] * u[:, 1:])
    w = (0.5 * area2[fidx] / counts[fidx])[:, None]
    n = fn[fidx] / np.maximum(area2[fidx][:, None], 1e-12)
    return pts.astype(np.float32), (n * w).astype(np.float32)


def poisson_reconstruct(verts: np.ndarray, faces: np.ndarray,
                        res: int = 128, screen: float = 4.0,
                        cg_iters: int = None, pad: float = 0.08,
                        max_cells: int = 1 << 18, max_tris: int = 1 << 19
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Watertight surface from an (arbitrarily dirty) input mesh.

    Returns (verts, faces) of the reconstructed iso surface in the input's
    coordinate frame. ``screen`` weights the data-fit term at the samples
    (0 = classic Poisson)."""
    from icon_tpu.recon.export import extract_mesh

    if cg_iters is None:
        # the Laplacian's condition number grows ~res^2; CG error decays
        # ~((k-1)/(k+1))^iters, so iterations must scale ~res (measured:
        # 300 iters converge a 64^3 sphere to the extraction noise floor,
        # 400 iters at 128^3 do not)
        cg_iters = 5 * res
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces)
    lo = verts.min(0)
    hi = verts.max(0)
    size = float((hi - lo).max()) * (1.0 + 2.0 * pad)
    origin = (lo + hi) / 2.0 - size / 2.0

    # ~2 samples per surface cell so the splatted field has no holes
    cell = size / res
    pts, wnrm = sample_surface(verts, faces, per_area=2.0 / (cell * cell))
    p01j = jnp.asarray((pts - origin) / size)
    # area weights -> per-index-unit field density: a flat patch through a
    # cell carries ~cell^2 of area and must read |V| ~= 1 so the indicator
    # jumps by ~1 across one grid step (chi solves in index units)
    nrm = jnp.asarray(wnrm / (cell * cell))

    @jax.jit
    def solve(p, n):
        v = _splat(p, n, res)                          # normal field
        wgt = _splat(p, jnp.linalg.norm(n, axis=-1, keepdims=True),
                     res)[..., 0]
        wgt = wgt / jnp.maximum(wgt.mean(), 1e-12)
        rhs = _div(v)

        def matvec(x):
            return _laplace(x) - screen * wgt * x

        chi, _ = jax.scipy.sparse.linalg.cg(
            matvec, rhs, x0=jnp.zeros_like(rhs), maxiter=cg_iters)
        iso = jnp.sum(_sample(chi, p)
                      * jnp.linalg.norm(n, axis=-1)) / \
            jnp.maximum(jnp.sum(jnp.linalg.norm(n, axis=-1)), 1e-12)
        return chi, iso

    chi, iso = solve(p01j, nrm)
    # orient: chi at the (padded, guaranteed-outside) corner must read
    # "outside" regardless of the input's normal orientation
    corner = float(chi[0, 0, 0])
    sgn = -1.0 if corner > float(iso) else 1.0
    # extract_mesh expects [z, y, x] occupancy with iso 0.5, vertices
    # normalized to [-1, 1] over the grid; remap into the input frame
    occ = jnp.transpose(sgn * (chi - iso), (2, 1, 0)) + 0.5
    v_out, f_out = extract_mesh(occ, max_cells=max_cells,
                                max_tris=max_tris)
    if len(v_out):
        v_out = (v_out * 0.5 + 0.5) * size + origin
    return np.asarray(v_out, np.float32), np.asarray(f_out)
