"""Bisect the lattice march's device time: active cells -> corner gather ->
crossing/own test -> 19-slot compaction (top_k over NC*19) -> vertex sort ->
cell compaction. Run on the real TPU."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time, functools, numpy as np, jax, jax.numpy as jnp
from icon_tpu.utils.jax_cache import enable; enable()
from icon_tpu.recon import marching as M
from icon_tpu.utils.synthetic import clothed_human_occ

# the serving-shaped inputs: 257^3 occupancy (sliced to 256^3) as the 2x
# upsample of the engine's 129^3 final coarse level (the engine's faster
# mode contract, recon/engine.py)
from icon_tpu.ops.resize import resize3d_trilinear_align_corners
g = np.linspace(-1, 1, 129, dtype=np.float32)
zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
pts = np.stack([xx, yy, zz], -1).reshape(-1, 3)
cvol = np.empty((129 ** 3,), np.float32)
CH = 1 << 21
for i in range(0, len(pts), CH):
    cvol[i:i + CH] = np.asarray(clothed_human_occ(jnp.asarray(pts[i:i + CH])))
coarse = jnp.asarray(cvol.reshape(129, 129, 129))
occ = resize3d_trilinear_align_corners(
    coarse[None, ..., None], (257, 257, 257))[0, ..., 0][1:, 1:, 1:]

MC, MV, MCAND = 131072, 262144, 1 << 18
iso = 0.5


def stage_cells(occ, coarse):
    return M._active_cells(occ, iso, MC, coarse, MCAND)


def stage_cvals(occ, coarse):
    D, H, W = occ.shape
    cx, cy, cz, cell_idx, alive, n_cells, nct = stage_cells(occ, coarse)
    lin = ((cz[:, None] + M._CORNER_OFF[:, 2][None]) * H +
           (cy[:, None] + M._CORNER_OFF[:, 1][None])) * W + \
        (cx[:, None] + M._CORNER_OFF[:, 0][None])
    return occ.reshape(-1)[lin], cx, cy, cz, cell_idx, alive


def stage_valid(occ, coarse):
    D, H, W = occ.shape
    cw, ch = W - 1, H - 1
    cvals, cx, cy, cz, cell_idx, alive = stage_cvals(occ, coarse)
    v_lo = cvals[:, M._EDGE_SLOTS[:, 0]]
    v_hi = cvals[:, M._EDGE_SLOTS[:, 1]]
    crossing = (v_lo > iso) != (v_hi > iso)
    olo = M._CORNER_OFF[M._EDGE_SLOTS[:, 0]]
    own = (((olo[None, :, 0] == 0) | (cx[:, None] == cw - 1)) &
           ((olo[None, :, 1] == 0) | (cy[:, None] == ch - 1)) &
           ((olo[None, :, 2] == 0) | (cz[:, None] == D - 2)))
    return crossing & own & alive[:, None]


def stage_compact(occ, coarse):
    valid = stage_valid(occ, coarse)
    return M._compact_indices(valid.reshape(-1), MV)


def stage_full(occ, coarse):
    return M.marching_lattice(occ, iso, max_cells=MC, max_verts=MV,
                              coarse_occ=coarse, max_candidates=MCAND)


R = 8
for name, fn, leaf in [
        ("active cells", stage_cells, lambda o: o[0]),
        ("+ corner gather", stage_cvals, lambda o: o[0]),
        ("+ crossing/own test", stage_valid, lambda o: o),
        ("+ compact (top_k 19*NC)", stage_compact, lambda o: o[0]),
        ("full lattice march", stage_full, lambda o: o.vert_eid)]:
    j = jax.jit(fn)
    o = j(occ, coarse)
    jax.block_until_ready(leaf(o))
    t0 = time.perf_counter()
    for _ in range(R):
        o = j(occ, coarse)
    jax.block_until_ready(leaf(o))
    print(f"{name:28s} {(time.perf_counter() - t0) / R * 1e3:8.2f} ms")

out = jax.jit(stage_full)(occ, coarse)
print("n_cells", int(out.n_cells), "n_verts", int(out.n_verts))
