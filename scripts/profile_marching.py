#!/usr/bin/env python
"""Stage-level profile of marching_tetrahedra_indexed on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from icon_tpu.recon import marching as M


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32)).reshape(1))


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    r = 256
    g = np.linspace(-1, 1, r)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    occ = jnp.asarray(np.clip(0.5 + (0.6 - np.sqrt(
        xx ** 2 + yy ** 2 + zz ** 2)) * 2, 0, 1), jnp.float32)

    fn = jax.jit(lambda o: M.marching_tetrahedra_indexed(
        o, 0.5, max_cells=1 << 18, max_tris=1 << 20, max_verts=1 << 20))
    out = timeit("marching_tetrahedra_indexed 256^3", fn, occ)
    print("  n_cells", int(out.n_cells), "n_tris", int(out.n_tris),
          "n_verts", int(out.n_verts))

    t0 = time.perf_counter()
    verts, faces = M.fetch_mesh(out)
    print(f"{'fetch_mesh (host transfer)':44s} "
          f"{(time.perf_counter()-t0)*1e3:9.1f} ms  "
          f"verts {verts.shape} faces {faces.shape}")


if __name__ == "__main__":
    main()
