"""Micro-bench: crossing-column rasterization (the per-frame sign pass).

Times build_crossing_columns_blocked on the bench body (20480 faces,
257^2 lattice) across tiles_per_step settings — it is a lax.map over tile
batches, so the batch size trades sequential steps against per-step VMEM.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from icon_tpu.utils.jax_cache import enable; enable()
from icon_tpu.utils.synthetic import synthetic_icon_batch
from icon_tpu.ops.sdf_fast import (build_column_bins,
                                   build_crossing_columns_blocked)

rng = np.random.RandomState(0)
batch = synthetic_icon_batch(rng, B=1, image_size=64, n_samples=8, subdiv=5)
verts = np.asarray(batch["smpl_verts"][0])
faces = np.asarray(batch["smpl_faces"])
res1 = 257
cx = np.linspace(-1.0, 1.0, res1, dtype=np.float32)
cy = np.linspace(1.0, -1.0, res1, dtype=np.float32)
cb, cm = build_column_bins(verts, faces, cx, cy)
print("bins:", cb.shape, "faces:", len(faces))
cbj, cmj = jnp.asarray(cb), jnp.asarray(cm)
cxj, cyj = jnp.asarray(cx), jnp.asarray(cy)
vj, fj = jnp.asarray(verts), jnp.asarray(faces)

for tb in (32, 64, 128, 256, 512):
    fn = jax.jit(lambda v, tb=tb: build_crossing_columns_blocked(
        v, fj, cbj, cmj, cxj, cyj, tiles_per_step=tb))
    z, c = fn(vj); jax.block_until_ready(z)
    t0 = time.perf_counter()
    for _ in range(10):
        z, c = fn(vj)
    jax.block_until_ready(z)
    dt = (time.perf_counter() - t0) / 10
    print(f"tiles_per_step={tb:4d}: {dt*1e3:7.2f} ms")
