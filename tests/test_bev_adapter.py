"""BEV HPS adapter (reference TestDataset.py:111-125 + 263-276).

The BEV net itself is the external `simple-romp` pip package in both
codebases; first-party code is only the output-adaptation shim. These
tests stub the package and prove the shim: axis-angle -> rotmat, betas
slice, person-0 selection, and the reference's empirical camera remap."""

import sys
import types

import numpy as np
import pytest

from icon_tpu.data.test_dataset import _rodrigues_np, adapt_bev_output


def test_rodrigues_identity_and_quarter_turn():
    aa = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, np.pi / 2]], np.float32)
    R = _rodrigues_np(aa)
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(
        R[1] @ np.array([1.0, 0, 0]), [0.0, 1.0, 0.0], atol=1e-6)
    # proper rotations
    np.testing.assert_allclose(np.linalg.det(R), [1.0, 1.0], atol=1e-5)


def _fake_preds(n_people=2):
    rs = np.random.RandomState(0)
    return {
        "smpl_thetas": rs.randn(n_people, 72).astype(np.float32) * 0.3,
        "smpl_betas": rs.randn(n_people, 11).astype(np.float32),
        "verts": rs.randn(n_people, 6890, 3).astype(np.float32),
        "cam": np.array([[0.8, 0.1, -0.2]] * n_people, np.float32),
        "cam_trans": np.array([[0.05, 0.3, 2.0]] * n_people, np.float32),
    }


def test_adapt_bev_output_layout():
    preds = _fake_preds()
    out = adapt_bev_output(preds)
    assert out["rotmat"].shape == (1, 24, 3, 3)
    assert out["pred_shape"].shape == (1, 10)     # kid-offset dim dropped
    assert out["verts"].shape == (1, 6890, 3)
    np.testing.assert_allclose(out["verts"][0], preds["verts"][0])
    # reference remap: scale = cam[0]*1.1, tranX = cam_trans[0],
    # tranY = cam[1] + 0.28 (TestDataset.py:271-276)
    s, tx, ty = out["cam"][0]
    assert np.isclose(s, 0.8 * 1.1)
    assert np.isclose(tx, 0.05)
    assert np.isclose(ty, 0.1 + 0.28)
    # rotmats match the thetas
    R = _rodrigues_np(preds["smpl_thetas"][0].reshape(-1, 3))
    np.testing.assert_allclose(out["rotmat"][0], R, atol=1e-6)


def test_bev_wrapper_via_stub_package(monkeypatch):
    """get_hps('bev') end to end against a stubbed simple-romp module."""
    calls = {}

    class FakeBEV:
        def __init__(self, settings):
            calls["settings"] = settings

        def __call__(self, bgr):
            calls["input"] = bgr
            return _fake_preds(1)

    fake = types.ModuleType("bev")
    fake.main = types.SimpleNamespace(
        default_settings=types.SimpleNamespace(
            mode=None, show_largest=None, GPU=0))
    fake.BEV = FakeBEV
    monkeypatch.setitem(sys.modules, "bev", fake)

    from icon_tpu.data.test_dataset import get_hps
    hps = get_hps("bev")
    assert hps.wants_raw and not hps.random_init
    assert calls["settings"].mode == "image"
    assert calls["settings"].show_largest is True
    assert hps.faces.ndim == 2 and hps.faces.shape[1] == 3

    raw = (np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    out = hps(raw)
    # RGB -> BGR flip on the way in
    np.testing.assert_array_equal(calls["input"], raw[..., ::-1])
    assert out["rotmat"].shape == (1, 24, 3, 3)


def test_bev_missing_package_message():
    import importlib
    if importlib.util.find_spec("bev") is not None:
        pytest.skip("bev installed")
    from icon_tpu.data.test_dataset import get_hps
    with pytest.raises(RuntimeError, match="simple-romp"):
        get_hps("bev")
