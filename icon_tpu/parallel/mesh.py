"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first ``n_devices`` local devices."""
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_for_batch(batch_size: int, n_devices: Optional[int] = None,
                        axis: str = "data") -> Mesh:
    """1-D mesh whose size divides the batch (largest usable device count)."""
    avail = n_devices or len(jax.devices())
    d = max(g for g in range(1, avail + 1) if batch_size % g == 0)
    return make_mesh(d, axis)


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data",
                  dim: int = 0) -> NamedSharding:
    """NamedSharding that splits dimension ``dim`` of an ndim-array."""
    spec = [None] * ndim
    spec[dim] = axis
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every array in a pytree along its leading (batch) axis."""
    def put(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim, axis))
    return jax.tree_util.tree_map(put, batch)


def shard_points(points: jax.Array, mesh: Mesh, axis: str = "data"):
    """Shard a ``[B, N, ...]`` point array along N (inference point
    parallelism). N must divide by the mesh size."""
    return jax.device_put(points, data_sharding(mesh, points.ndim, axis,
                                                dim=1))


def global_batch_from_local(batch: Any, mesh: Mesh, axis: str = "data",
                            shared_keys: Sequence[str] = ()) -> Any:
    """Assemble a globally-sharded batch from per-process LOCAL arrays
    (multi-host input pipeline, SURVEY §2.4): each host passes only its
    B/process_count slice (DataLoader(process_index=..., process_count=...))
    and ``jax.make_array_from_process_local_data`` stitches the global
    array with no cross-host data movement — host input work stays constant
    with world size (reference DistributedSampler semantics under Lightning
    DDP, apps/train.py:117-121).

    Keys in ``shared_keys`` must hold the FULL (identical) array on every
    host and come out replicated. Works single-process too, where it reduces
    to shard_batch + replicate."""
    def put(k, v):
        v = np.asarray(v)
        sh = NamedSharding(mesh, P()) if k in shared_keys \
            else data_sharding(mesh, v.ndim, axis)
        return jax.make_array_from_process_local_data(sh, v)
    return {k: put(k, v) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_query(query_fn, mesh: Mesh, axis: str = "data"):
    """Point-parallel occupancy queries (SURVEY §2.4): split the [1, N, 3]
    point axis across the mesh with shard_map — every device evaluates its
    slice against the replicated network/body, and the per-device [1, N/d, 1]
    outputs concatenate back along N (XLA inserts the all-gather). Pass the
    wrapped fn to ``ReconEngine(..., pad_multiple=mesh.size)`` so static
    budgets divide evenly.

    Exactness: per-point math (grid_sample, SMPL sdf features, batch-norm
    MLP in eval mode) is bit-identical per point, so sharded == unsharded
    up to matmul ULP (tests/test_dist.py pins this). A ``norm_mlp: group``
    MLP however normalizes over the POINT axis (torch GroupNorm over
    [B, C, N] — MLP.py:8-72), so its statistics change with the shard size;
    the reference has the same property across its own per-level point sets
    (batch_eval evaluates whole levels at once, seg3d_lossless.py:125-144).
    All published reference checkpoints use ``norm_mlp: batch``."""
    from jax.experimental.shard_map import shard_map

    fn = shard_map(query_fn, mesh=mesh,
                   in_specs=P(None, axis, None),
                   out_specs=P(None, axis, None),
                   check_rep=False)

    def wrapped(pts):
        assert pts.shape[1] % mesh.size == 0, \
            f"point count {pts.shape[1]} not divisible by mesh {mesh.size}"
        return fn(pts)

    return wrapped
