"""Alignment visualization + per-run config snapshot (reference
TestDataset.visualize_alignment :301-354 and train_util.export_cfg
:589-597)."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image


def test_export_cfg_roundtrip(tmp_path):
    from icon_tpu.config import Config, NetConfig, export_cfg, load_config
    cfg = Config(name="snap", batch_size=2,
                 net=NetConfig(mlp_dim=(13, 1), prior_type="pamir"))
    p = export_cfg(cfg, str(tmp_path))
    assert load_config(p) == cfg
    # write-once: a resumed run keeps the original snapshot
    export_cfg(cfg.replace(batch_size=99), str(tmp_path))
    assert load_config(p).batch_size == 2


def test_export_cfg_reference_yaml(tmp_path):
    """The snapshot of a reference config is itself a loadable config."""
    ref = "/root/reference/configs/train/icon-filter.yaml"
    if not os.path.exists(ref):
        pytest.skip("reference configs not present")
    from icon_tpu.config import export_cfg, load_config
    cfg = load_config(ref)
    assert load_config(export_cfg(cfg, str(tmp_path))) == cfg


@pytest.mark.slow
def test_visualize_alignment_writes_panel(tmp_path):
    from icon_tpu.data.test_dataset import TestDataset
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(0)
    rgba = np.zeros((96, 96, 4), np.uint8)
    rgba[..., :3] = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
    yy, xx = np.mgrid[:96, :96]
    body = ((yy - 48) ** 2 / 40.0 ** 2 + (xx - 48) ** 2 / 20.0 ** 2) < 1
    rgba[..., 3] = body * 255
    Image.fromarray(rgba).save(d / "person.png")

    ds = TestDataset(str(d), hps_type="pymaf", icon_size=64,
                     allow_random_hps=True)
    item = ds[0]
    # the HPS is random-init here, so pin a fit that places the canonical
    # body in frame — the test checks the viz path, not fit quality
    item["scale"] = 1.0
    item["trans"] = np.zeros(3, np.float32)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32),
                          item["body_pose"].shape).copy()
    item["body_pose"] = eye
    item["global_orient"] = np.eye(3, dtype=np.float32)[None, None]
    item["betas"] = np.zeros_like(item["betas"])
    out = ds.visualize_alignment(item, str(tmp_path / "align.png"))
    panel = np.asarray(Image.open(out))
    # 3-wide strip at the icon size
    assert panel.shape[:2] == (64, 192)
    # the normal panels contain a rendered body (non-background pixels)
    front = panel[:, 64:128].astype(np.float32) / 255.0
    assert (np.abs(front - 0.5).max(-1) > 0.2).mean() > 0.01
