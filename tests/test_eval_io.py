"""Evaluator metrics + mesh IO + checkpoint warm-start filtering."""

import os

import numpy as np
import jax.numpy as jnp

from icon_tpu.eval import (chamfer_p2s, normal_consistency,
                           occupancy_metrics, sample_surface)
from icon_tpu.utils.io import clean_mesh, load_obj, save_obj
from icon_tpu.utils.synthetic import icosphere


def test_sample_surface_on_sphere():
    v, f = icosphere(subdiv=3, radius=0.7)
    s = sample_surface(v, f, 2000)
    rad = np.linalg.norm(s, axis=1)
    assert abs(rad.mean() - 0.7) < 0.01
    assert s.shape == (2000, 3)


def test_chamfer_identical_and_scaled():
    v, f = icosphere(subdiv=2, radius=0.5)
    ch0, p2s0 = chamfer_p2s(v, f, v, f)
    assert ch0 < 0.2 and p2s0 < 0.2          # near-zero for identical mesh
    v2 = v * 1.1                              # radius +0.05
    ch1, p2s1 = chamfer_p2s(v2, f, v, f)
    assert abs(ch1 - 5.0) < 0.8, ch1          # x100 scale: 0.05 -> 5
    assert ch1 > ch0


def test_normal_consistency_zero_for_same():
    v, f = icosphere(subdiv=2)
    nc = normal_consistency(v, f, v, f, size=128)
    assert nc < 1e-6
    nc2 = normal_consistency(v * np.array([[1.2, 1, 1]], np.float32), f,
                             v, f, size=128)
    assert nc2 > nc


def test_occupancy_metrics():
    pred = jnp.asarray([0.9, 0.8, 0.2, 0.1])
    lab = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    m = occupancy_metrics(pred, lab)
    assert m["acc"] == 0.5 and m["prec"] == 0.5 and m["recall"] == 0.5


def test_obj_roundtrip(tmp_path):
    v, f = icosphere(subdiv=1)
    p = str(tmp_path / "mesh.obj")
    save_obj(p, v, f, colors=np.abs(v))
    v2, f2 = load_obj(p)
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_array_equal(f2, f)


def test_clean_mesh_keeps_largest():
    v1, f1 = icosphere(subdiv=2)           # large
    v2, f2 = icosphere(subdiv=0)           # small, offset
    v = np.concatenate([v1, v2 + 5.0])
    f = np.concatenate([f1, f2 + len(v1)])
    cv, cf = clean_mesh(v, f)
    assert len(cv) == len(v1) and len(cf) == len(f1)
    np.testing.assert_allclose(cv, v1)


def test_partial_warm_start_filtering():
    from icon_tpu.training.checkpoints import partial_warm_start
    init = {"F_filter": {"conv1": {"kernel": np.zeros((3, 3, 6, 64))}},
            "if_regressor": {"conv0": {"kernel": np.zeros((13, 512))}},
            "normal_filter": {"netF": {"conv_in": {"kernel":
                                                   np.zeros((7, 7, 9, 64))}}}}
    loaded = {"F_filter": {"conv1": {"kernel": np.ones((3, 3, 6, 64))}},
              "if_regressor": {"conv0": {"kernel": np.ones((99, 512))}}}
    merged = partial_warm_start(init, loaded)
    assert merged["F_filter"]["conv1"]["kernel"].max() == 1.0   # shape match
    assert merged["if_regressor"]["conv0"]["kernel"].max() == 0.0  # mismatch

    # normal-net rename: netG -> normal_filter
    normal_ckpt = {"netG": {"netF": {"conv_in": {"kernel":
                                                 np.ones((7, 7, 9, 64))}}}}
    merged2 = partial_warm_start(init, normal_ckpt,
                                 rename={"netG": "normal_filter"})
    assert merged2["normal_filter"]["netF"]["conv_in"]["kernel"].max() == 1.0
