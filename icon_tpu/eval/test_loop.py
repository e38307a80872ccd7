"""Benchmark evaluation loop (reference apps/ICON.py:519-673 test_step /
test_epoch_end + lib/common/train_util.py:458-478 accumulate).

Per test view: reconstruct the clothed mesh with the octree engine, compare
against the GT scan with chamfer / P2S (x100 over 1000 surface samples) and
normal consistency over 4 orthographic re-renders, then average per dataset
and print the benchmark table.

Both meshes are compared in the calib (NDC) space — the reference's
space transfers land both in the same [-1,1]^3 cube before sampling
(ICON.py:614-641).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from icon_tpu.eval.evaluator import chamfer_p2s, normal_consistency


def recon_one(net, variables, batch: Dict[str, np.ndarray], engine,
              max_cells: int = 1 << 18, max_tris: int = 1 << 20,
              mesh=None, marcher=None):
    """netG.filter + octree recon + marching for one test item
    (ICON.test_single, apps/ICON.py:729-761). Returns (verts, faces) in the
    [-1,1] engine world space.

    ``mesh``: optional 1-D jax device mesh — the occupancy queries point-
    shard over it (SURVEY §2.4); the engine must have been built with
    ``pad_multiple=mesh.size``."""
    import jax.numpy as jnp
    from icon_tpu.recon.export import extract_mesh

    feat_keys = [k for k in ("image", "normal_F", "normal_B",
                             "T_normal_F", "T_normal_B") if k in batch]
    in_t = {k: jnp.asarray(batch[k])[None] if batch[k].ndim == 3
            else jnp.asarray(batch[k]) for k in feat_keys}
    features = net.apply(variables, in_t, False, method=net.filter)

    calib = jnp.asarray(batch["calib"])
    if calib.ndim == 2:
        calib = calib[None]
    smpl_feat = None
    # smpl_query_inside is the per-training-sample host sign — engine
    # queries are different points, so drop it and sign via ray bins
    skeys = [k for k in batch
             if k.startswith(("smpl_", "voxel_"))
             and k != "smpl_query_inside"]
    if skeys:
        smpl_feat = {}
        for k in skeys:
            v = jnp.asarray(batch[k])
            if k in ("smpl_faces", "smpl_vf_table", "voxel_codes"):
                smpl_feat[k] = v
            else:
                smpl_feat[k] = v[None] if v.ndim == 2 else v
        if "smpl_verts" in smpl_feat and "smpl_vf_table" in smpl_feat:
            from icon_tpu.ops.sdf_fast import build_ray_bins
            rb, rg = build_ray_bins(
                np.asarray(smpl_feat["smpl_verts"])[0],
                np.asarray(smpl_feat["smpl_faces"]))
            smpl_feat["smpl_ray_bins"] = jnp.asarray(rb)
            smpl_feat["smpl_ray_grid"] = jnp.asarray(rg)

    def query_fn(pts):
        return net.apply(variables, features, pts, calib, smpl_feat,
                         False, method=net.query)[-1]

    if mesh is not None:
        from icon_tpu.parallel.mesh import shard_query
        with mesh:
            occ, stats = engine(shard_query(query_fn, mesh),
                                jit_levels=True)
    else:
        occ, stats = engine(query_fn, jit_levels=True)
    verts, faces = extract_mesh(occ, max_cells=max_cells, max_tris=max_tris,
                                marcher=marcher)
    return verts, faces, stats


def world_to_ndc(verts: np.ndarray, calib: np.ndarray) -> np.ndarray:
    """Engine-world verts -> calib/NDC space via the net's projection."""
    h = np.concatenate([verts, np.ones((len(verts), 1), verts.dtype)], 1)
    return (h @ calib.T)[:, :3]


def run_evaluation(cfg, dataset, net, variables,
                   mcube_res: Optional[int] = None,
                   num_samples: int = 1000,
                   nc_size: int = 512,
                   max_items: int = 0,
                   num_devices: int = 1) -> Dict[str, Dict[str, float]]:
    """Evaluate every test view; returns {dataset: {metric: mean}} and prints
    the benchmark table (reference test_epoch_end, ICON.py:647-673).

    ``num_devices`` > 1 point-shards the recon queries over a 1-D device
    mesh (SURVEY §2.4 inference point parallelism)."""
    from icon_tpu.data.datasets import projection_np
    from icon_tpu.recon.engine import (ReconEngine,
                                       reconstruction_resolutions)
    from icon_tpu.utils.io import clean_mesh

    mesh = None
    if num_devices > 1:
        from icon_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(num_devices)
        print(f"[eval] point-sharding recon over {mesh.size} devices")
        if cfg.net.norm_mlp == "group":
            print("[eval] WARNING: norm_mlp=group normalizes over the "
                  "point axis — sharded stats differ from single-device "
                  "(see parallel.mesh.shard_query)")
    res = mcube_res or cfg.mcube_res
    engine = ReconEngine(reconstruction_resolutions(res),
                         pad_multiple=mesh.size if mesh else 1)
    from icon_tpu.recon.export import make_marcher
    marcher = make_marcher()   # lattice wire + autotuned buffers, per-run

    accum: Dict[str, Dict[str, List[float]]] = {}
    n = len(dataset)
    if max_items:
        n = min(n, max_items)
    for i in range(n):
        item = dataset[i]
        verts_pr, faces_pr, stats = recon_one(net, variables, item, engine,
                                              mesh=mesh, marcher=marcher)
        if cfg.clean_mesh and len(verts_pr):
            verts_pr, faces_pr = clean_mesh(verts_pr, faces_pr)
        if not len(verts_pr):
            print(f"[eval] {item['subject']}/{item['rotation']}: "
                  "EMPTY recon, skipped")
            continue
        # engine world -> calib space; world = grid_normalized * (1,-1,1)
        # (engine B_MIN/B_MAX y-flip, recon/engine.py:34-35). extract_mesh
        # already restores the dropped-first-slice index (recon/export.py),
        # so no further offset belongs here — metrics measure geometry.
        world = verts_pr * np.array([1, -1, 1], np.float32)
        pr_ndc = world_to_ndc(world, item["calib"])
        gt_ndc = projection_np(item["verts"], item["calib"])

        chamfer, p2s = chamfer_p2s(pr_ndc, faces_pr, gt_ndc, item["faces"],
                                   num_samples=num_samples)
        nc = normal_consistency(pr_ndc * np.array([1, -1, -1], np.float32),
                                faces_pr,
                                gt_ndc * np.array([1, -1, -1], np.float32),
                                item["faces"], size=nc_size)
        # bucket per dataset AND noise setting (the reference groups test
        # metrics by the pose/beta noise configuration, apps/ICON.py:539-541)
        dname = str(item["subject"]).split("/")[0]
        ns = tuple(getattr(cfg.dataset, "noise_scale", ()) or ())
        if any(s > 0 for s in ns):
            dname = f"{dname}@noise{list(ns)}"
        bucket = accum.setdefault(dname, {"chamfer": [], "p2s": [], "NC": []})
        bucket["chamfer"].append(chamfer)
        bucket["p2s"].append(p2s)
        bucket["NC"].append(nc)
        print(f"[eval] {item['subject']} rot={item['rotation']}: "
              f"chamfer={chamfer:.4f} p2s={p2s:.4f} NC={nc:.4f}")

    table: Dict[str, Dict[str, float]] = {}
    for dname, metrics in accum.items():
        table[dname] = {k: float(np.mean(v)) for k, v in metrics.items()}
    print("\n=== benchmark (x100 chamfer/P2S; NC: sum sq diff / 4 views) ===")
    for dname, row in table.items():
        cells = "  ".join(f"{k}={v:.4f}" for k, v in row.items())
        print(f"  {dname}: {cells}")
    return table
