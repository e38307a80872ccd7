"""Pallas TPU kernel: fused k-nearest-vertices for the body-feature path.

The XLA formulation (ops/sdf_fast.py:_nearest_vertices) computes the
point-chunk x vertex squared-distance matrix with one matmul and hands it
to ``approx_max_k``. When XLA cannot fuse that reduction into the matmul
(measured: the op called standalone under its own jit), the [16384, 10475]
f32 intermediate (~686 MB per chunk) spills to HBM and the reduction reads
it back. This kernel never materializes the matrix: each point tile walks
the vertex list in VMEM-resident lanes tiles, keeps one (min, argmin)
bucket per vertex tile in registers, and reduces the buckets to the k best
at the end — the only HBM traffic is the points, the vertices, and the
[N, k] output.

Measured on v5e at 98304 points x 10475 verts: 3.7x faster than the
standalone XLA path (58 -> 16 ms at k=2 or k=4) with exact top-1. Inside
the recon engine's jit, however, XLA fuses the reduction into the matmul
consumer and its MXU formulation beats this VPU-bound kernel (engine
26.9 -> 18.6 fps), so sdf_fast keeps XLA by default and enables this
kernel only under ``ICON_TPU_PALLAS=1`` — profile your composition.

Approximation class: identical to ``jax.lax.approx_max_k`` — the k results
are the best of per-tile (bucket) minima, so two of the true top-k can
collide in one 512-lane bucket and the later one is replaced by the next
bucket's minimum. On body meshes (smooth vertex density) the downstream
union of incident faces absorbs this exactly the way it absorbs
approx_max_k's bucket collisions (sdf_fast.py measures 99.999% top-1
agreement; top-1 here is EXACT because every bucket minimum is exact).
Ties across buckets resolve to the lowest vertex index; a tie inside a
bucket resolves to the lowest lane, and a cross-bucket duplicate can at
worst repeat a candidate vertex, which the incident-face union dedups.
tests/test_pallas_knn.py pins the semantics against a numpy bucket
reference and the downstream feature parity.

Layout notes (pallas_guide.md): points ride SUBLANES ([TILE_N, 1] blocks,
so the [TILE_N, TILE_V] distance tile needs no relayout), vertices ride
LANES ([1, Vpad] VMEM-resident SoA planes), and block shapes keep the last
two dims (8x, 128x)-aligned or equal to the array dims.

Reference: lib/dataset/mesh_util.py:357-396 (cal_sdf_batch) is the torch
op this feeds; see ops/sdf_fast.py for the full feature kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

TILE_N = 256           # points per grid step (sublane-mult of 8)
TILE_V = 512           # vertices per lanes tile (mult of 128)
MAX_BUCKETS = 128      # lanes width of the bucket accumulator


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _knn_kernel(px_ref, py_ref, pz_ref, vx_ref, vy_ref, vz_ref, vn_ref,
                out_ref, *, k: int, n_vtiles: int):
    """One grid step: TILE_N points against the full padded vertex list."""
    px = px_ref[0]                                        # [TILE_N, 1]
    py = py_ref[0]
    pz = pz_ref[0]

    vals = []
    idxs = []
    for j in range(n_vtiles):
        sl = slice(j * TILE_V, (j + 1) * TILE_V)
        vx = vx_ref[0, sl].reshape(1, TILE_V)
        vy = vy_ref[0, sl].reshape(1, TILE_V)
        vz = vz_ref[0, sl].reshape(1, TILE_V)
        vn = vn_ref[0, sl].reshape(1, TILE_V)
        # |v|^2 - 2 p.v  (the |p|^2 term is constant per row: rank-free)
        d2 = vn - 2.0 * (px * vx + py * vy + pz * vz)     # [TILE_N, TILE_V]
        m = jnp.min(d2, axis=1)                           # [TILE_N]
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, TILE_V), 1)
        a = jnp.min(jnp.where(d2 == m[:, None], lane, TILE_V), axis=1)
        vals.append(m)
        idxs.append(a + j * TILE_V)
    bv = jnp.stack(vals, axis=1)                          # [TILE_N, n_vtiles]
    bi = jnp.stack(idxs, axis=1)
    pad = MAX_BUCKETS - n_vtiles
    if pad > 0:
        bv = jnp.concatenate(
            [bv, jnp.full((TILE_N, pad), jnp.inf, bv.dtype)], axis=1)
        bi = jnp.concatenate(
            [bi, jnp.zeros((TILE_N, pad), jnp.int32)], axis=1)

    # k rounds of (row min -> lowest-index winner -> retire the bucket)
    for kk in range(k):
        m = jnp.min(bv, axis=1)                           # [TILE_N]
        win = bv == m[:, None]
        gi = jnp.min(jnp.where(win, bi, jnp.int32(2 ** 31 - 1)), axis=1)
        out_ref[0, :, kk] = gi
        # retire ONLY the winning bucket (lowest index among ties), keeping
        # an equal-valued other bucket eligible for the next round
        first = win & (bi == gi[:, None])
        bv = jnp.where(first, jnp.inf, bv)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def nearest_vertices_pallas(points: jnp.ndarray, verts: jnp.ndarray,
                            k: int = 4, interpret: bool = False
                            ) -> jnp.ndarray:
    """Indices [N, k] of (bucketed-)nearest vertices per point.

    Drop-in for ops/sdf_fast.py:_nearest_vertices(approx=True); requires
    V <= MAX_BUCKETS * TILE_V = 65536 vertices (every SMPL-family body
    fits; SMPL-X is 10475)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = points.shape[0]
    V = verts.shape[0]
    n_vtiles = max(_cdiv(V, TILE_V), 1)
    assert n_vtiles <= MAX_BUCKETS, "vertex list exceeds kernel capacity"
    assert k <= 8
    vpad = n_vtiles * TILE_V - V
    g = max(_cdiv(N, TILE_N), 1)
    npad = g * TILE_N - N

    pts = points.astype(jnp.float32)
    if npad:
        pts = jnp.concatenate([pts, jnp.zeros((npad, 3), jnp.float32)])
    vs = verts.astype(jnp.float32)
    vn = jnp.sum(vs * vs, axis=-1)
    if vpad:
        vs = jnp.concatenate([vs, jnp.zeros((vpad, 3), jnp.float32)])
        # padded vertices can never win a bucket minimum
        vn = jnp.concatenate([vn, jnp.full((vpad,), jnp.inf, jnp.float32)])

    # points sublane-major: [G, TILE_N, 1] blocks need no in-kernel relayout
    px = pts[:, 0].reshape(g, TILE_N, 1)
    py = pts[:, 1].reshape(g, TILE_N, 1)
    pz = pts[:, 2].reshape(g, TILE_N, 1)
    vx = vs[:, 0].reshape(1, -1)
    vy = vs[:, 1].reshape(1, -1)
    vz = vs[:, 2].reshape(1, -1)
    vn = vn.reshape(1, -1)

    pspec = pl.BlockSpec((1, TILE_N, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, n_vtiles * TILE_V), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n_vtiles=n_vtiles),
        grid=(g,),
        in_specs=[pspec, pspec, pspec, vspec, vspec, vspec, vspec],
        out_specs=pl.BlockSpec((1, TILE_N, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, TILE_N, k), jnp.int32),
        interpret=interpret,
    )(px, py, pz, vx, vy, vz, vn)
    return out.reshape(-1, k)[:N]
