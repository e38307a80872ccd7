"""SMPL-family loader coverage: MANO hand PCA, FLAME expressions, create()."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp


def _fake_model_data(V=32, J=3, extra_shapedirs=0, hands=None):
    rng = np.random.RandomState(0)
    d = {
        "v_template": rng.randn(V, 3).astype(np.float32) * 0.1,
        "shapedirs": rng.randn(V, 3, 10 + extra_shapedirs).astype(
            np.float32) * 0.01,
        "posedirs": rng.randn(V, 3, 9 * (J - 1)).astype(np.float32) * 1e-3,
        "J_regressor": np.eye(J, V, dtype=np.float32),
        "weights": np.eye(V, J, dtype=np.float32) * 0 + 1.0 / J,
        "f": np.stack([np.arange(V - 2), np.arange(1, V - 1),
                       np.arange(2, V)], 1).astype(np.int32),
        "kintree_table": np.stack([np.array([0] + list(range(J - 1))),
                                   np.arange(J)]),
    }
    if hands:
        d["hands_components"] = rng.randn(6, (J - 1) * 3).astype(np.float32)
        d["hands_mean"] = rng.randn((J - 1) * 3).astype(np.float32) * 0.1
    return d


def test_mano_pca_hand_pose(tmp_path):
    from icon_tpu.models.smplx.body import load_body_model
    p = tmp_path / "MANO_RIGHT.pkl"
    data = _fake_model_data(J=16, hands=True)
    # MANO pca spans 15 joints * 3
    rng = np.random.RandomState(1)
    data["hands_components"] = rng.randn(6, 45).astype(np.float32)
    data["hands_mean"] = rng.randn(45).astype(np.float32) * 0.1
    with open(p, "wb") as f:
        pickle.dump(data, f)
    model = load_body_model(str(p))
    assert model.model_type == "mano"
    assert model.hands_components_l is not None
    v, j = model.forward(betas=jnp.zeros((1, 10)))
    assert v.shape[0] == 1 and j.shape[1] == 16


def test_flame_expressions(tmp_path):
    from icon_tpu.models.smplx.body import load_body_model
    p = tmp_path / "FLAME_NEUTRAL.pkl"
    data = _fake_model_data(J=5, extra_shapedirs=300)  # 310 cols -> expr
    with open(p, "wb") as f:
        pickle.dump(data, f)
    model = load_body_model(str(p), num_expression_coeffs=10)
    assert model.model_type == "flame"
    assert model.expr_dirs is not None
    v0, _ = model.forward(betas=jnp.zeros((1, 10)))
    v1, _ = model.forward(betas=jnp.zeros((1, 10)),
                          expression=jnp.ones((1, 10)))
    assert float(jnp.abs(v1 - v0).max()) > 0


def test_create_factory_resolves_dir(tmp_path):
    import os
    from icon_tpu.models.smplx import create
    d = tmp_path / "models" / "smpl"
    os.makedirs(d)
    with open(d / "SMPL_NEUTRAL.pkl", "wb") as f:
        pickle.dump(_fake_model_data(J=24), f)
    model = create(str(tmp_path / "models"), model_type="smpl",
                   gender="neutral")
    assert model.num_joints == 24


def test_smplx_pca_hand_forward_differs():
    from icon_tpu.models.smplx.body import synthetic_smplx_model
    m = synthetic_smplx_model(subdiv=2)
    v0, _ = m.forward(betas=jnp.zeros((1, 10)))
    v1, _ = m.forward(betas=jnp.zeros((1, 10)),
                      left_hand_pose=jnp.ones((1, 12)))
    assert float(jnp.abs(v1 - v0).max()) > 0


def test_u2net_param_count_matches_official_lite():
    from icon_tpu.models.u2net import U2NET, U2NET_LITE
    net = U2NET(config=U2NET_LITE)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                 train=False)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(v["params"]))
    # official u2netp: 1,131,181 parameters
    assert n == 1_131_181, n
