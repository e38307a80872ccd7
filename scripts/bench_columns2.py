"""Microbench: build_crossing_columns_blocked on the bench body at 257^2,
sweeping tiles_per_step / G, to size the column-rasterization stage."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp
from icon_tpu.utils.jax_cache import enable; enable()
from icon_tpu.utils.synthetic import synthetic_icon_batch
from icon_tpu.ops.sdf_fast import (build_column_bins,
                                   build_crossing_columns_blocked)

rng = np.random.RandomState(0)
batch = synthetic_icon_batch(rng, B=1, image_size=64, n_samples=8, subdiv=5)
verts = np.asarray(batch["smpl_verts"][0])
faces = np.asarray(batch["smpl_faces"])
print("faces", faces.shape)

res1 = 257
cx = np.linspace(-1.0, 1.0, res1, dtype=np.float32)
cy = np.linspace(1.0, -1.0, res1, dtype=np.float32)

for G in (4, 8):
    t0 = time.perf_counter()
    bins, meta = build_column_bins(verts, faces, cx, cy, G=G)
    t_host = time.perf_counter() - t0
    print(f"G={G}: bins {bins.shape} (T={bins.shape[1]}), host build "
          f"{t_host*1e3:.1f} ms")
    vj = jnp.asarray(verts)
    fj = jnp.asarray(faces)
    bj, mj = jnp.asarray(bins), jnp.asarray(meta)
    cxj, cyj = jnp.asarray(cx), jnp.asarray(cy)
    for tps in (32, 64, 128, 256):
        fn = jax.jit(lambda v: build_crossing_columns_blocked(
            v, fj, bj, mj, cxj, cyj, G=G, tiles_per_step=tps))
        z, c = fn(vj); jax.block_until_ready(z)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            z, c = fn(vj); jax.block_until_ready(z)
            ts.append(time.perf_counter() - t0)
        print(f"  G={G} tps={tps}: {min(ts)*1e3:.1f} ms  "
              f"(max count {int(np.asarray(c).max())})")
