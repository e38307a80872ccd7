"""LBS correctness: golden parity against the reference torch implementation
(loaded directly from file, torch CPU) plus analytic invariants."""

import importlib.util

import numpy as np
import jax.numpy as jnp
import torch

from icon_tpu.models.smplx.body import synthetic_body_model
from icon_tpu.models.smplx.lbs import batch_rodrigues, lbs

RNG = np.random.RandomState(7)


def _load_ref_lbs():
    import sys
    import types
    base = "/root/reference/lib/smplx"
    pkg = types.ModuleType("refsmplx")
    pkg.__path__ = [base]
    sys.modules.setdefault("refsmplx", pkg)
    for name in ("utils", "lbs"):
        spec = importlib.util.spec_from_file_location(
            f"refsmplx.{name}", f"{base}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refsmplx.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refsmplx.lbs"]


def test_batch_rodrigues_matches_torch_ref():
    ref = _load_ref_lbs()
    aa = RNG.randn(16, 3).astype(np.float32)
    ours = np.asarray(batch_rodrigues(jnp.array(aa)))
    golden = ref.batch_rodrigues(torch.from_numpy(aa)).numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)


def test_lbs_matches_torch_reference():
    ref = _load_ref_lbs()
    model = synthetic_body_model(n_verts=64, n_joints=5, n_betas=8)
    B = 3
    betas = RNG.randn(B, 8).astype(np.float32)
    pose = (RNG.randn(B, 5 * 3) * 0.3).astype(np.float32)

    ours_v, ours_j = lbs(jnp.array(betas), jnp.array(pose), model.v_template,
                         model.shapedirs, model.posedirs, model.J_regressor,
                         model.parents, model.lbs_weights)

    t = lambda x: torch.from_numpy(np.asarray(x))
    ref_v, ref_j = ref.lbs(t(betas), t(pose), t(model.v_template)[None],
                           t(model.shapedirs), t(model.posedirs),
                           t(model.J_regressor),
                           torch.tensor(model.parents, dtype=torch.long),
                           t(model.lbs_weights))
    np.testing.assert_allclose(np.asarray(ours_v), ref_v.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_j), ref_j.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_zero_pose_is_shaped_template():
    model = synthetic_body_model()
    betas = jnp.array(RNG.randn(2, 10).astype(np.float32))
    verts, _ = model.forward(betas=betas)
    expect = np.asarray(model.v_template)[None] + np.einsum(
        "bl,mkl->bmk", np.asarray(betas), np.asarray(model.shapedirs))
    np.testing.assert_allclose(np.asarray(verts), expect, atol=1e-5)


def test_global_orient_rotates_about_root():
    model = synthetic_body_model()
    aa = np.array([[0.0, np.pi / 2, 0.0]], np.float32)
    verts0, joints0 = model.forward()
    vertsR, _ = model.forward(global_orient=jnp.array(aa))
    R = np.asarray(batch_rodrigues(jnp.array(aa)))[0]
    root = np.asarray(joints0)[0, 0]
    expect = (np.asarray(verts0)[0] - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(vertsR)[0], expect,
                               rtol=1e-4, atol=1e-5)


def test_transl_and_scale():
    model = synthetic_body_model()
    t = jnp.array([[1.0, 2.0, 3.0]])
    v0, _ = model.forward()
    v1, _ = model.forward(transl=t)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0) + np.array(
        [1, 2, 3]), atol=1e-6)
