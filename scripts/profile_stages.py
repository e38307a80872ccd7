#!/usr/bin/env python
"""Per-stage TPU timings for the recon pipeline (diagnostic, not the bench)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from icon_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()


def _sync(out):
    """On the axon platform block_until_ready is unreliable; force a tiny
    device->host transfer of a reduction over the first output leaf."""
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
    print(f"{name:42s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    print("platform:", jax.devices()[0].platform)
    rng = np.random.RandomState(0)

    from icon_tpu.utils.synthetic import synthetic_body
    v, f = synthetic_body(subdiv=5)
    V, F = len(v), len(f)
    print(f"body: {V} verts, {F} faces")

    # ---- hourglass filter on 512^2 x2 (front+back) ----
    from icon_tpu.models.hourglass import HGFilter
    hg = HGFilter(num_stack=2, depth=2, hourglass_dim=6)
    img = jnp.asarray(rng.randn(1, 512, 512, 6), jnp.float32)
    hgp = hg.init(jax.random.PRNGKey(0), img)
    hg_fn = jax.jit(lambda p, x: hg.apply(p, x))
    timeit("HGFilter 512^2 (1 stack pass)", hg_fn, hgp, img)

    # ---- exact sdf ----
    from icon_tpu.ops.sdf import point_mesh_dist_winding
    from icon_tpu.ops.mesh import face_vertices
    tris = face_vertices(jnp.asarray(v)[None], jnp.asarray(f))[0]
    for N in (35937, 101400):
        pts = jnp.asarray(rng.rand(N, 3) * 2 - 1, jnp.float32)
        fn = jax.jit(lambda p, t: point_mesh_dist_winding(p, t))
        timeit(f"exact sdf+winding N={N} F={F}", fn, pts, tris)

    # ---- fast sdf ----
    from icon_tpu.ops.sdf_fast import (build_vertex_face_table,
                                       point_body_features)
    table = jnp.asarray(build_vertex_face_table(f, V))
    cm = jnp.asarray(rng.rand(V, 3), jnp.float32)
    vi = jnp.asarray(rng.rand(V, 1), jnp.float32)
    for N in (101400, 399384):
        pts = jnp.asarray(rng.rand(N, 3) * 2 - 1, jnp.float32)
        fn = jax.jit(lambda p: point_body_features(
            p, jnp.asarray(v), jnp.asarray(f), table, cm, vi))
        timeit(f"fast sdf N={N}", fn, pts)

    # ---- MLP on many points ----
    from icon_tpu.models.mlp import MLP
    mlp = MLP(filter_channels=(13, 512, 256, 128, 1), res_layers=(2, 3),
              norm="batch")
    x = jnp.asarray(rng.randn(1, 399384, 13), jnp.float32)
    mp = mlp.init(jax.random.PRNGKey(0), x)
    fn = jax.jit(lambda p, x: mlp.apply(p, x))
    timeit("MLP 399k pts", fn, mp, x)

    # ---- grid_sample ----
    from icon_tpu.ops.grid_sample import grid_sample_2d
    feat = jnp.asarray(rng.randn(1, 128, 128, 12), jnp.float32)
    uv = jnp.asarray(rng.rand(1, 399384, 2) * 2 - 1, jnp.float32)
    fn = jax.jit(grid_sample_2d)
    timeit("grid_sample_2d 399k pts", fn, feat, uv)

    # ---- smooth conv + resize at recon levels ----
    from icon_tpu.ops.voxelize import smooth_conv3d
    from icon_tpu.ops.resize import resize3d_trilinear_align_corners
    for r, k in ((65, 9), (129, 7), (257, 3)):
        vol = jnp.asarray(rng.rand(1, r, r, r, 1), jnp.float32)
        fn = jax.jit(lambda v, k=k: smooth_conv3d(v, k))
        timeit(f"smooth_conv3d {r}^3 k={k}", fn, vol)
    for r_in, r_out in ((33, 65), (65, 129), (129, 257)):
        vol = jnp.asarray(rng.rand(1, r_in, r_in, r_in, 1), jnp.float32)
        fn = jax.jit(lambda v, ro=r_out: resize3d_trilinear_align_corners(
            v, (ro, ro, ro)))
        timeit(f"trilinear {r_in}->{r_out}", fn, vol)

    # ---- marching tets ----
    from icon_tpu.recon.marching import marching_tetrahedra
    for r in (128, 256):
        g = np.linspace(-1, 1, r)
        zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
        occ = jnp.asarray(np.clip(0.5 + (0.6 - np.sqrt(
            xx**2 + yy**2 + zz**2)) * 2, 0, 1), jnp.float32)
        fn = jax.jit(lambda o: marching_tetrahedra(
            o, 0.5, max_cells=1 << 19, max_tris=1 << 21))
        out = timeit(f"marching_tets {r}^3", fn, occ)
        print("   n_tris:", int(out[3]))

    # ---- device->host transfer of triangle soup ----
    tv = jnp.zeros((1 << 21, 3, 3), jnp.float32)
    t0 = time.perf_counter()
    _ = np.asarray(tv)
    print(f"{'transfer 75MB device->host':42s} {(time.perf_counter()-t0)*1e3:9.1f} ms")

    # ---- compaction on large grid ----
    from icon_tpu.recon.marching import _compact_indices
    mask = jnp.asarray(rng.rand(256 ** 3) < 0.01)
    fn = jax.jit(lambda m: _compact_indices(m, 1 << 19))
    timeit("compaction 256^3 mask", fn, mask)


if __name__ == "__main__":
    import sys as _s
    if "--raster" in _s.argv:
        raster_profile()
        _s.exit(0)
    main()
# (raster profiling appended)
def raster_profile():
    rng = np.random.RandomState(1)
    from icon_tpu.utils.synthetic import synthetic_body
    from icon_tpu.ops.raster import rasterize, vertex_visibility
    from icon_tpu.render.camera import verts_to_ndc
    v, f = synthetic_body(subdiv=5)
    attrs = jnp.asarray(rng.rand(len(v), 3), jnp.float32)
    ndc = verts_to_ndc(jnp.asarray(v))
    fn = jax.jit(lambda vv: rasterize(vv, jnp.asarray(f), attrs,
                                      H=512, W=512, K=256))
    timeit("rasterize 512^2 20k faces", fn, ndc)
    fn2 = jax.jit(lambda vv: vertex_visibility(vv, jnp.asarray(f), res=1024))
    timeit("vertex_visibility 1024^2", fn2, ndc)
