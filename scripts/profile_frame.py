#!/usr/bin/env python
"""Per-stage timing of the exact bench.py frame (engine levels split out)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from icon_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()


def sync(x):
    jax.block_until_ready(x)
    return x


def main():
    from icon_tpu.config import Config, NetConfig
    from icon_tpu.models.hgpifu import HGPIFuNet
    from icon_tpu.recon.engine import (ReconEngine,
                                       reconstruction_resolutions)
    from icon_tpu.recon.marching import (fetch_mesh,
                                         marching_tetrahedra_indexed)
    from icon_tpu.utils.synthetic import synthetic_icon_batch
    from icon_tpu.ops.sdf_fast import build_vertex_face_table

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
    batch = synthetic_icon_batch(rng, B=1, image_size=512,
                                 n_samples=64, subdiv=5)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = net.init(jax.random.PRNGKey(0), batch, train=False)

    resolutions = reconstruction_resolutions(256)
    eng = ReconEngine(resolutions, faster=True)
    print("resolutions", resolutions, "budgets", eng.budgets, flush=True)

    feat_keys = ("image", "normal_F", "normal_B")
    smpl_keys = ("smpl_verts", "smpl_faces", "smpl_cmap", "smpl_vis")
    smpl_feat = {k: batch[k] for k in smpl_keys}
    smpl_feat["smpl_vf_table"] = jnp.asarray(build_vertex_face_table(
        np.asarray(batch["smpl_faces"]), batch["smpl_verts"].shape[1]))

    filter_jit = jax.jit(lambda v, t: net.apply(v, t, train=False,
                                                method=net.filter))
    in_t = {k: batch[k] for k in feat_keys}

    def query_fn(pts):
        return net.apply(variables, features, pts, batch["calib"],
                         smpl_feat, False, method=net.query)[-1]

    features = sync(filter_jit(variables, in_t))

    l0 = jax.jit(lambda: eng._level0(query_fn))
    step1 = jax.jit(lambda o, e: eng._level_step(1, o, e, query_fn))
    step2 = jax.jit(lambda o, e: eng._level_step(2, o, e, query_fn))
    up = jax.jit(lambda o: eng._upsample(o, resolutions[-1]))
    march = jax.jit(lambda occ: marching_tetrahedra_indexed(
        occ[1:, 1:, 1:], 0.5, max_cells=1 << 18, max_tris=1 << 20,
        max_verts=1 << 20))

    # warm
    occ, ev = sync(l0())
    occ, ev, n1, _ = sync(step1(occ, ev))
    occ, ev, n2, _ = sync(step2(occ, ev))
    occf = sync(up(occ))
    mesh = sync(march(occf))
    print("level points:", int(n1), int(n2), "n_cells", int(mesh.n_cells),
          "n_tris", int(mesh.n_tris), flush=True)

    for it in range(3):
        t0 = time.perf_counter()
        f = sync(filter_jit(variables, in_t))
        t1 = time.perf_counter()
        occ, ev = sync(l0())
        t2 = time.perf_counter()
        occ, ev, n1, _ = sync(step1(occ, ev))
        t3 = time.perf_counter()
        occ, ev, n2, _ = sync(step2(occ, ev))
        t4 = time.perf_counter()
        occf = sync(up(occ))
        t5 = time.perf_counter()
        mesh = sync(march(occf))
        t6 = time.perf_counter()
        verts, faces = fetch_mesh(mesh)
        t7 = time.perf_counter()
        print(f"filter {t1-t0:.3f}  L0 {t2-t1:.3f}  L1 {t3-t2:.3f}  "
              f"L2 {t4-t3:.3f}  up {t5-t4:.3f}  march {t6-t5:.3f}  "
              f"fetch {t7-t6:.3f}  total {t7-t0:.3f}", flush=True)


if __name__ == "__main__":
    main()
