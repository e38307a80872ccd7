#!/usr/bin/env python
"""Bisect net.query cost at recon point counts (diagnostic)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from icon_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()


def timeit(name, fn, *args, iters=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    from icon_tpu.config import Config, NetConfig
    from icon_tpu.models.hgpifu import HGPIFuNet
    from icon_tpu.utils.synthetic import synthetic_icon_batch
    from icon_tpu.ops.sdf_fast import (build_vertex_face_table,
                                       cal_sdf_batch_fast,
                                       point_body_features)
    from icon_tpu.ops.grid_sample import grid_sample_2d
    from icon_tpu.ops.select import feat_select
    from icon_tpu.ops.projection import project

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
    feat_keys = ("image", "normal_F", "normal_B")
    in_t = {k: batch[k] for k in feat_keys}
    filter_jit = jax.jit(lambda v, t: net.apply(v, t, train=False,
                                                method=net.filter))
    features = jax.block_until_ready(filter_jit(variables, in_t))

    smpl_keys = ("smpl_verts", "smpl_faces", "smpl_cmap", "smpl_vis")
    smpl_feat = {k: batch[k] for k in smpl_keys}
    vf = jnp.asarray(build_vertex_face_table(
        np.asarray(batch["smpl_faces"]), batch["smpl_verts"].shape[1]))

    N = 399384
    pts = jnp.asarray(rng.rand(1, N, 3).astype(np.float32) * 2 - 1)

    # 1. full query with vf_table (fast path)
    sf = dict(smpl_feat)
    sf["smpl_vf_table"] = vf
    q_full = jax.jit(lambda p: net.apply(variables, features, p,
                                         batch["calib"], sf, False,
                                         method=net.query)[-1])
    timeit("query FULL (fast sdf path)", q_full, pts)

    # 2. query with exact sdf path (no vf table)
    q_exact = jax.jit(lambda p: net.apply(variables, features, p,
                                          batch["calib"], smpl_feat, False,
                                          method=net.query)[-1])
    timeit("query FULL (exact sdf path)", q_exact, pts)

    # 3. cal_sdf_batch_fast alone, batched (as inside query)
    f_sdf = jax.jit(lambda p: cal_sdf_batch_fast(
        smpl_feat["smpl_verts"], smpl_feat["smpl_faces"],
        smpl_feat["smpl_cmap"], smpl_feat["smpl_vis"], p, vf))
    timeit("cal_sdf_batch_fast [1, N]", f_sdf, pts)

    # 4. unbatched point_body_features (as in profile_stages)
    f_un = jax.jit(lambda p: point_body_features(
        p, smpl_feat["smpl_verts"][0], smpl_feat["smpl_faces"], vf,
        smpl_feat["smpl_cmap"][0], smpl_feat["smpl_vis"][0]))
    timeit("point_body_features [N] unbatched", f_un, pts[0])

    # 5. grid_sample + feat_select + MLP on precomputed features
    def rest(p):
        xyz = project(p, batch["calib"])
        xy = xyz[..., :2]
        smpl_pts = jnp.concatenate([
            jnp.zeros((1, N, 6), jnp.float32),
            jnp.ones((1, N, 1), jnp.float32),
            (p[..., :1] > 0).astype(jnp.float32)], -1)
        feat = feat_select(grid_sample_2d(features[-1], xy),
                           smpl_pts[..., -1:])
        pf = jnp.concatenate([feat, smpl_pts[..., :-1]], -1)
        return net.apply(variables, pf, False,
                         method=lambda m, x, t: m.if_regressor(x, t))
    timeit("grid_sample+select+MLP only", jax.jit(rest), pts)


if __name__ == "__main__":
    main()
