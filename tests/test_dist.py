"""Multi-device correctness on the 8-device virtual CPU mesh (conftest).

Covers the three collective paths SURVEY §2.4 names (all previously only
exercised by the driver's dryrun):

1. point-sharded occupancy recon (``shard_query``) == unsharded, bit-for-bit
   on an analytic field and allclose on the production HGPIFuNet query path;
2. the data-parallel ``train_step`` over an 8-device mesh == the single-device
   step on the same global batch (params AND batch_stats after 2 steps) —
   the batch_stats equality is exactly the sync-BN property: XLA's
   sharding-derived global batch-norm moments must match full-batch moments
   (reference sync_batchnorm=True, apps/train.py:117-121);
3. an isolated flax BatchNorm on a sharded batch reproduces manually computed
   global moments (the psum-of-per-shard-moments identity).

Plus the multi-host env-parsing helpers (parallel/dist.py), which need no
devices at all.
"""

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# env helpers (parallel/dist.py)


def test_env_parsing():
    from icon_tpu.parallel.dist import distributed_env
    assert distributed_env({}) is None
    cfg = distributed_env({"COORDINATOR_ADDRESS": "10.0.0.2:8476",
                           "NUM_PROCESSES": "4", "PROCESS_ID": "2"})
    assert cfg == {"coordinator_address": "10.0.0.2:8476",
                   "num_processes": 4, "process_id": 2}


def test_single_process_is_noop():
    from icon_tpu.parallel.dist import initialize_distributed
    assert initialize_distributed(environ={}) is False
    assert initialize_distributed(num_processes=1) is False
    assert initialize_distributed(environ={"NUM_PROCESSES": "1"}) is False


def test_is_main_process_single_host():
    from icon_tpu.parallel.dist import is_main_process
    assert is_main_process() is True


# ---------------------------------------------------------------------------
# multi-host input pipeline: per-process dataset sharding


def test_dataloader_process_sharding():
    """Every process computes the same seeded shuffle but loads only its
    contiguous B/hosts slice: per-host item sets are disjoint and
    concatenate back to exactly the single-host global batch (reference
    DistributedSampler semantics, apps/train.py:117-121)."""
    from icon_tpu.data.datasets import DataLoader

    class Toy:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    def batches(pi=0, pc=1):
        ld = DataLoader(Toy(), batch_size=8, num_workers=1, seed=7,
                        process_index=pi, process_count=pc)
        ld.set_epoch(3)
        return [b["x"][:, 0].astype(int).tolist() for b in ld]

    global_batches = batches()
    per_host = [batches(pi, 4) for pi in range(4)]
    assert all(len(hb) == len(global_batches) for hb in per_host)
    for bi, gb in enumerate(global_batches):
        shards = [per_host[pi][bi] for pi in range(4)]
        assert all(len(s) == 2 for s in shards)   # B/hosts each
        flat = sum(shards, [])
        assert len(set(flat)) == len(flat), "per-host items overlap"
        assert flat == gb, "shards do not reassemble the global batch"


def test_global_batch_from_local_single_process():
    """Single-process path of the multi-host batch assembly: the stitched
    global array equals the input and carries the expected shardings."""
    import jax
    from jax.sharding import PartitionSpec as P
    from icon_tpu.parallel.mesh import global_batch_from_local, make_mesh

    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    batch = {"x": rng.randn(8, 5).astype(np.float32),
             "faces": rng.randint(0, 9, (12, 3)).astype(np.int32)}
    out = global_batch_from_local(batch, mesh, shared_keys=("faces",))
    np.testing.assert_array_equal(jax.device_get(out["x"]), batch["x"])
    np.testing.assert_array_equal(jax.device_get(out["faces"]),
                                  batch["faces"])
    assert out["x"].sharding.spec == P("data", None)
    assert out["faces"].sharding.spec == P()


# ---------------------------------------------------------------------------
# shared tiny-net fixtures (the __graft_entry__ dryrun configuration)


def _tiny_net():
    from icon_tpu.config import Config, NetConfig
    from icon_tpu.models.hgpifu import HGPIFuNet
    cfg = Config(net=NetConfig(
        mlp_dim=(256, 512, 256, 128, 1), res_layers=(2, 3, 4),
        num_stack=2, prior_type="icon", use_filter=True,
        in_geo=(("normal_F", 3), ("normal_B", 3)),
        in_nml=(("image", 3), ("T_normal_F", 3), ("T_normal_B", 3)),
        smpl_feats=("sdf", "norm", "vis", "cmap"), norm_mlp="batch",
        hourglass_dim=6, smpl_dim=7))
    return HGPIFuNet(cfg.replace(test_mode=False))


def _tiny_batch(B=8, image_size=64, n_samples=128, subdiv=2):
    import jax.numpy as jnp
    from icon_tpu.utils.synthetic import synthetic_icon_batch
    rng = np.random.RandomState(0)
    batch = synthetic_icon_batch(rng, B=B, image_size=image_size,
                                 n_samples=n_samples, subdiv=subdiv)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _get_state(tree, path):
    for k in path:
        tree = tree[k]
    return tree


# ---------------------------------------------------------------------------
# 1. point-sharded recon == unsharded


def test_shard_query_bitwise_analytic():
    """shard_map over the point axis must be a pure re-layout: every device
    evaluates its slice with identical elementwise math, so the assembled
    occupancy grid matches the unsharded one bit-for-bit. The field is a
    polynomial (mul/add/clip only): transcendentals (exp/sqrt) vectorize
    differently at different shard shapes and drift ~1 ULP — the net-path
    test below covers those with allclose."""
    import jax
    import jax.numpy as jnp
    from icon_tpu.parallel.mesh import make_mesh, shard_query
    from icon_tpu.recon.engine import ReconEngine

    def query_fn(pts):
        q = (pts[..., 0] ** 2 * 1.0 + pts[..., 1] ** 2 * 1.3 +
             pts[..., 2] ** 2 * 0.8)
        return jnp.clip(0.5 + (0.3 - q) * 4.0, 0.0, 1.0)[..., None]

    res = (17, 33, 65)
    occ_u, stats_u = ReconEngine(res, pad_multiple=8)(query_fn,
                                                      jit_levels=True)
    mesh = make_mesh(8)
    with mesh:
        occ_s, stats_s = ReconEngine(res, pad_multiple=8)(
            shard_query(query_fn, mesh), jit_levels=True)
        occ_s = jax.device_get(occ_s)
    np.testing.assert_array_equal(np.asarray(occ_u), np.asarray(occ_s))
    for k in stats_u:
        if k.endswith("_points"):
            assert int(stats_u[k]) == int(stats_s[k])


def test_shard_query_matches_unsharded_net():
    """The production path: HGPIFuNet.query (grid_sample + SMPL sdf features
    + MLP) point-sharded over the 8-device mesh vs single-device. allclose
    (not bitwise): XLA may tile the per-device matmuls differently."""
    import jax
    import jax.numpy as jnp
    from icon_tpu.parallel.mesh import make_mesh, shard_query
    from icon_tpu.recon.engine import ReconEngine
    from icon_tpu.ops.sdf_fast import (build_ray_bins,
                                       build_vertex_face_table)

    net = _tiny_net()
    batch = _tiny_batch(B=1)
    variables = jax.jit(lambda k, b: net.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)

    in_t = {k: batch[k] for k in ("image", "normal_F", "normal_B")}
    features = net.apply(variables, in_t, False, method=net.filter)
    smpl_feat = {k: batch[k] for k in
                 ("smpl_verts", "smpl_faces", "smpl_cmap", "smpl_vis")}
    smpl_feat["smpl_vf_table"] = jnp.asarray(build_vertex_face_table(
        np.asarray(batch["smpl_faces"]), batch["smpl_verts"].shape[1]))
    rb, rg = build_ray_bins(np.asarray(batch["smpl_verts"][0]),
                            np.asarray(batch["smpl_faces"]))
    smpl_feat["smpl_ray_bins"] = jnp.asarray(rb)
    smpl_feat["smpl_ray_grid"] = jnp.asarray(rg)

    def query_fn(pts):
        return net.apply(variables, features, pts, batch["calib"],
                         smpl_feat, False, method=net.query)[-1]

    res = (17, 33)
    occ_u, _ = ReconEngine(res, pad_multiple=8)(query_fn, jit_levels=True)
    mesh = make_mesh(8)
    with mesh:
        occ_s, _ = ReconEngine(res, pad_multiple=8)(
            shard_query(query_fn, mesh), jit_levels=True)
        occ_s = jax.device_get(occ_s)
    np.testing.assert_allclose(np.asarray(occ_u), np.asarray(occ_s),
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# 2. data-parallel train_step == single-device step (grads all-reduce +
#    sync-BN)


@pytest.mark.slow
def test_train_step_matches_single_device():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from icon_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from icon_tpu.training.train_step import create_train_state, train_step

    net = _tiny_net()
    batch = _tiny_batch(B=8, image_size=64, n_samples=128, subdiv=2)
    # SGD for the equality check: the collective paths under test (gradient
    # all-reduce, sync-BN) are optimizer-independent, and RMSprop's 1/sqrt(v)
    # amplifies ULP-level reduction-order differences ~1000x on near-zero
    # second moments, forcing useless tolerances
    cfg = net.cfg.replace(optim="sgd")

    def run(n_devices, steps=2):
        state = create_train_state(net, jax.random.PRNGKey(0), batch, cfg)
        step_fn = jax.jit(train_step)
        if n_devices == 1:
            b = batch
        else:
            mesh = make_mesh(n_devices)
            state = replicate(state, mesh)
            b = shard_batch({k: v for k, v in batch.items()
                             if k != "smpl_faces"}, mesh)
            b["smpl_faces"] = jax.device_put(
                batch["smpl_faces"], NamedSharding(mesh, P()))
        metrics = None
        for _ in range(steps):
            state, metrics = step_fn(state, b)
        return jax.device_get(state), {k: float(v)
                                       for k, v in metrics.items()}

    state1, m1 = run(1)
    state8, m8 = run(8)

    # gradient all-reduce: identical params after 2 steps
    flat1 = jax.tree_util.tree_leaves(state1.params)
    flat8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    # sync-BN: sharding-derived global moments == full-batch moments
    for a, b in zip(jax.tree_util.tree_leaves(state1.batch_stats),
                    jax.tree_util.tree_leaves(state8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    assert abs(m1["loss"] - m8["loss"]) < 1e-4


# ---------------------------------------------------------------------------
# 3. sharding-derived global BN == manually computed global moments


def test_global_bn_moments_on_sharded_batch():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from icon_tpu.parallel.mesh import make_mesh, data_sharding

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=False,
                                momentum=0.0)(x)

    m = M()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 16, 4).astype(np.float32) * 2.0 + 1.0)
    variables = m.init(jax.random.PRNGKey(0), x)

    mesh = make_mesh(8)
    xs = jax.device_put(x, data_sharding(mesh, x.ndim))

    @jax.jit
    def apply(v, x):
        y, upd = m.apply(v, x, mutable=["batch_stats"])
        return y, upd["batch_stats"]

    _, stats = apply(variables, xs)
    stats = jax.device_get(stats)["BatchNorm_0"]
    xn = np.asarray(x)
    # momentum=0.0 -> running stats ARE this batch's global moments
    np.testing.assert_allclose(stats["mean"], xn.mean(axis=(0, 1)),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(stats["var"], xn.var(axis=(0, 1)),
                               atol=1e-5, rtol=1e-5)
