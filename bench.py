#!/usr/bin/env python
"""End-to-end benchmark: single-image clothed-human recon at 256^3 on one TPU.

Pipeline timed (matches the reference demo's per-frame hot path,
apps/infer.py:390-391 -> ICON.test_single): normal-feature filtering
(stacked hourglass on 512^2 x2), coarse-to-fine occupancy evaluation at
(33, 65, 129, 257) with ICON's SMPL-local features against a 20480-face body
mesh, and on-device marching-tetrahedra extraction (+ host dedup).

Baseline: the reference reports 6.56 fps for the occupancy recon engine alone
on GPU in faster mode (lib/common/seg3d_lossless.py:153-158); vs_baseline
compares our full end-to-end images/sec against that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--image-size", type=int, default=512)
    args = ap.parse_args()

    from icon_tpu.utils.jax_cache import enable as _enable_cache
    _enable_cache()

    import jax
    import jax.numpy as jnp

    from icon_tpu.config import Config, NetConfig
    from icon_tpu.models.hgpifu import HGPIFuNet
    from icon_tpu.recon.engine import (ReconEngine,
                                       reconstruction_resolutions)
    from icon_tpu.recon.marching import (fetch_mesh,
                                         marching_tetrahedra_indexed)
    from icon_tpu.utils.synthetic import synthetic_icon_batch

    cfg = Config(
        test_mode=False,
        net=NetConfig(
            mlp_dim=(256, 512, 256, 128, 1), res_layers=(2, 3, 4),
            num_stack=2, prior_type="icon", use_filter=True,
            in_geo=(("normal_F", 3), ("normal_B", 3)),
            in_nml=(("image", 3), ("T_normal_F", 3), ("T_normal_B", 3)),
            smpl_feats=("sdf", "norm", "vis", "cmap"),
            norm_mlp="batch", hourglass_dim=6, smpl_dim=7))
    net = HGPIFuNet(cfg)

    rng = np.random.RandomState(0)
    batch = synthetic_icon_batch(rng, B=1, image_size=args.image_size,
                                 n_samples=64, subdiv=5)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = net.init(jax.random.PRNGKey(0), batch, train=False)

    resolutions = reconstruction_resolutions(args.res)
    # auto_budget: steady-state serving — per-level buffers sized from the
    # previous frame's measured boundary counts (overflow-guarded)
    eng = ReconEngine(resolutions, faster=True, auto_budget=True)
    total_points = float(resolutions[0] ** 3 +
                         sum(eng.budgets[:max(len(resolutions) - 2, 0)]))

    from icon_tpu.ops.sdf_fast import build_vertex_face_table
    feat_keys = ("image", "normal_F", "normal_B")
    smpl_keys = ("smpl_verts", "smpl_faces", "smpl_cmap", "smpl_vis")

    # production buffer sizes: a clothed human at 257^3 yields ~150-600k
    # triangles; marching cost scales with these static buffers (sort +
    # scatters), and n_tris/n_cells overflow counters police the headroom.
    # Surface-bound quantities grow ~quadratically with resolution.
    area_scale = max((args.res // 256) ** 2, 1)
    max_cells = (1 << 18) * area_scale
    max_tris = (1 << 19) * area_scale

    smpl_feat = {k: batch[k] for k in smpl_keys}
    smpl_feat["smpl_vf_table"] = jnp.asarray(build_vertex_face_table(
        np.asarray(batch["smpl_faces"]), batch["smpl_verts"].shape[1]))

    filter_jit = jax.jit(lambda v, t: net.apply(v, t, train=False,
                                                method=net.filter))
    in_t = {k: batch[k] for k in feat_keys}
    features = filter_jit(variables, in_t)

    # The net is random-init, so its raw level set is noise — it would
    # saturate every level budget and the triangle buffers, timing a
    # worst-case field instead of a body. Blend in a body-shaped occupancy
    # at full net compute: preds still contribute (*1e-6, not DCE-able), but
    # the level set (and therefore boundary sizes, triangle counts, and
    # transfer volumes) matches a real clothed-human reconstruction.
    body_axes = jnp.asarray(np.array([0.2475, 0.55, 0.165], np.float32))

    def query_fn(pts):
        preds = net.apply(variables, features, pts, batch["calib"],
                          smpl_feat, False, method=net.query)[-1]
        rad = jnp.linalg.norm(pts / body_axes, axis=-1, keepdims=True)
        body = jax.nn.sigmoid((1.0 - rad) * 30.0)
        return preds * 1e-6 + body

    march_jit = jax.jit(lambda occ, coarse: marching_tetrahedra_indexed(
        occ[1:, 1:, 1:], 0.5, max_cells=max_cells, max_tris=max_tris,
        max_verts=(1 << 19) * area_scale, coarse_occ=coarse))

    def frame():
        feats = filter_jit(variables, in_t)
        occ, stats = eng(query_fn, jit_levels=True)
        mesh = march_jit(occ, stats["coarse_occ"])
        verts, faces = fetch_mesh(mesh)   # minimal host transfer
        return stats, mesh, verts, faces

    # warmup/compile (per-level executables cached on the engine); twice so
    # the auto-budget buckets settle and their executables compile
    frame()
    frame()

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        stats, mesh, verts, faces = frame()
        n_tris = mesh.n_tris
        times.append(time.perf_counter() - t0)

    # engine-only fps (the metric the reference's 6.56 fps measures:
    # occupancy evaluation without meshing/transfer)
    occ, _ = eng(query_fn, jit_levels=True)      # warm
    np.asarray(jnp.sum(occ[0, 0]).reshape(1))
    eng_times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        occ, _ = eng(query_fn, jit_levels=True)
        np.asarray(jnp.sum(occ[0, 0]).reshape(1))     # sync
        eng_times.append(time.perf_counter() - t0)

    dt = float(np.median(times))
    fps = 1.0 / dt
    baseline_fps = 6.56  # reference recon engine, faster mode, GPU
    result = {
        "metric": f"e2e_recon_{args.res}_images_per_sec",
        "value": round(fps, 4),
        "unit": "images/sec",
        "vs_baseline": round(fps / baseline_fps, 4),
    }
    # secondary diagnostics on stderr (driver reads stdout JSON only)
    print(json.dumps({
        "sec_per_image": round(dt, 4),
        "mpoints_per_sec": round(total_points / dt / 1e6, 3),
        "engine_only_fps": round(1.0 / float(np.median(eng_times)), 3),
        "n_tris": int(n_tris),
        "platform": jax.devices()[0].platform,
        "times": [round(t, 4) for t in times],
    }), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
