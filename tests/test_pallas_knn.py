"""Pallas fused kNN (ops/pallas/knn.py): semantics pinned against a numpy
bucket reference (the kernel's documented approximation class) and exact
top-1. Runs in interpreter mode — the conftest forces the CPU backend."""

import numpy as np
import jax.numpy as jnp
import pytest

from icon_tpu.ops.pallas.knn import TILE_V, nearest_vertices_pallas

pytestmark = pytest.mark.slow     # interpreter mode is minutes-scale


def _bucket_reference(pts: np.ndarray, vts: np.ndarray, k: int):
    """Best-of-512-lane-bucket-minima reference (ties: lowest index)."""
    d2 = ((pts[:, None] - vts[None]) ** 2).sum(-1).astype(np.float32)
    N, V = d2.shape
    nt = -(-V // TILE_V)
    pad = nt * TILE_V - V
    d2p = np.concatenate([d2, np.full((N, pad), np.inf, np.float32)], 1)
    d2t = d2p.reshape(N, nt, TILE_V)
    bmin = d2t.min(-1)
    barg = d2t.argmin(-1) + np.arange(nt)[None] * TILE_V
    order = np.argsort(bmin, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(barg, order, 1), d2


def test_pallas_knn_matches_bucket_reference():
    rng = np.random.RandomState(0)
    N, V, k = 700, 2100, 4
    pts = rng.randn(N, 3).astype(np.float32)
    vts = rng.randn(V, 3).astype(np.float32)

    idx = np.asarray(nearest_vertices_pallas(
        jnp.asarray(pts), jnp.asarray(vts), k=k, interpret=True))
    ref, d2 = _bucket_reference(pts, vts, k)
    np.testing.assert_array_equal(idx, ref)
    # bucket minima are exact, so top-1 is the true nearest vertex
    np.testing.assert_array_equal(idx[:, 0], d2.argmin(1))


def test_pallas_knn_padding_and_k2():
    """Non-multiple N (grid padding) and the production k=2 shape."""
    rng = np.random.RandomState(1)
    N, V = 301, 640                      # N % TILE_N != 0, V % TILE_V != 0
    pts = rng.randn(N, 3).astype(np.float32)
    vts = rng.randn(V, 3).astype(np.float32)
    idx = np.asarray(nearest_vertices_pallas(
        jnp.asarray(pts), jnp.asarray(vts), k=2, interpret=True))
    assert idx.shape == (N, 2)
    assert (idx < V).all() and (idx >= 0).all()   # padded verts never win
    ref, d2 = _bucket_reference(pts, vts, 2)
    np.testing.assert_array_equal(idx, ref)
