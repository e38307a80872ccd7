#!/usr/bin/env python
"""Micro-profile of marching-tetrahedra and sdf_fast internals (diagnostic)."""

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
    print(f"{name:46s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)

    R = 257
    g = np.linspace(-1, 1, R - 1)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    occ_np = np.clip(0.5 + (0.55 - np.sqrt(
        (xx / 0.45) ** 2 + yy ** 2 + (zz / 0.3) ** 2) * 0.55) * 4,
        0, 1).astype(np.float32)
    occ = jnp.asarray(occ_np)
    D = H = W = R - 1
    print("active frac:", float(((occ_np > 0.1) & (occ_np < 0.9)).mean()))

    max_cells = 1 << 18
    max_tris = 1 << 20

    # stage 1: active-cell detection + compaction
    from icon_tpu.recon.marching import (_compact_indices, _CORNER_OFF,
                                         _TETS, _SEL_A, _SEL_B, _TRI_VALID,
                                         marching_tetrahedra_indexed)

    def stage_active(occ):
        inside = occ > 0.5
        def corner(arr, c):
            dx, dy, dz = _CORNER_OFF[c]
            return arr[dz:dz + D - 1, dy:dy + H - 1, dx:dx + W - 1]
        cnt = sum(corner(inside, c).astype(jnp.int8) for c in range(8))
        active = (cnt > 0) & (cnt < 8)
        return active

    active = timeit("active mask 256^3", jax.jit(stage_active), occ)

    def stage_compact(active):
        return _compact_indices(active.reshape(-1), max_cells)

    (cell_idx, n_cells, _) = timeit("compact 256^3 -> 262k",
                                    jax.jit(stage_compact), active)
    print("  n_cells:", int(n_cells))

    def stage_gather(occ, cell_idx):
        cw, ch = W - 1, H - 1
        cz = cell_idx // (ch * cw)
        cy = (cell_idx // cw) % ch
        cx = cell_idx % cw
        occ_flat = occ.reshape(-1)
        lin = ((cz[:, None] + _CORNER_OFF[:, 2][None]) * H +
               (cy[:, None] + _CORNER_OFF[:, 1][None])) * W + \
            (cx[:, None] + _CORNER_OFF[:, 0][None])
        return occ_flat[lin]

    cvals = timeit("corner gather [262k, 8]", jax.jit(stage_gather),
                   occ, cell_idx)

    def stage_tables(cvals):
        dt = cvals.dtype
        cbits = (cvals > 0.5).astype(jnp.int32)
        tet_bits = cbits[:, _TETS]
        case = (tet_bits * jnp.array([1, 2, 4, 8])).sum(-1)
        onehot = jax.nn.one_hot(case, 16, dtype=dt)
        sel_a = jnp.asarray(_SEL_A.reshape(6, 16, 48))
        sel_b = jnp.asarray(_SEL_B.reshape(6, 16, 48))
        Wa = jnp.einsum("nte,tew->ntw", onehot, sel_a,
                        preferred_element_type=dt).reshape(-1, 36, 8)
        Wb = jnp.einsum("nte,tew->ntw", onehot, sel_b,
                        preferred_element_type=dt).reshape(-1, 36, 8)
        va = jnp.einsum("nsc,nc->ns", Wa, cvals)
        vb = jnp.einsum("nsc,nc->ns", Wb, cvals)
        return va, vb, Wa, Wb

    timeit("one-hot tables + interp planes", jax.jit(stage_tables), cvals)

    def stage_sort(keys):
        order = jnp.argsort(keys)
        return keys[order], order

    keys = jnp.asarray(rng.randint(0, 2 ** 30, size=(max_tris * 3,)),
                       jnp.int32)
    timeit("argsort 3.1M int32 + gather", jax.jit(stage_sort), keys)

    keys6 = jnp.asarray(rng.randint(0, 2 ** 30, size=(max_tris * 6,)),
                        jnp.int32)
    timeit("argsort 6.3M int32 + gather", jax.jit(stage_sort), keys6)

    fn = jax.jit(lambda o: marching_tetrahedra_indexed(
        o, 0.5, max_cells=max_cells, max_tris=max_tris, max_verts=1 << 20))
    out = timeit("marching_tetrahedra_indexed 256^3", fn, occ)
    print("  n_tris:", int(out.n_tris), "n_verts:", int(out.n_verts))

    # ---- sdf_fast internals ----
    from icon_tpu.utils.synthetic import synthetic_body
    from icon_tpu.ops.sdf_fast import (_nearest_vertices,
                                       build_vertex_face_table,
                                       point_body_features)
    v, f = synthetic_body(subdiv=5)
    V, F = len(v), len(f)
    vj = jnp.asarray(v)
    N = 399384
    pts = jnp.asarray(rng.rand(N, 3).astype(np.float32) * 2 - 1)

    for k in (1, 2, 4):
        fn = jax.jit(lambda p, k=k: _nearest_vertices(p, vj, k=k))
        timeit(f"kNN matmul+topk k={k} N={N}", fn, pts)

    table = jnp.asarray(build_vertex_face_table(f, V))
    cm = jnp.asarray(rng.rand(V, 3).astype(np.float32))
    vi = jnp.asarray(rng.rand(V, 1).astype(np.float32))
    for k, deg in ((1, 16), (2, 16), (4, 16)):
        fn = jax.jit(lambda p, k=k: point_body_features(
            p, vj, jnp.asarray(f), table, cm, vi, k=k))
        timeit(f"point_body_features k={k} N={N}", fn, pts)

    table8 = jnp.asarray(build_vertex_face_table(f, V, max_degree=8))
    fn = jax.jit(lambda p: point_body_features(
        p, vj, jnp.asarray(f), table8, cm, vi, k=2))
    timeit(f"point_body_features k=2 deg=8 N={N}", fn, pts)


if __name__ == "__main__":
    main()
