"""End-to-end CLI app tests (in-process, virtual CPU mesh, synthetic data)."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import yaml
from PIL import Image

from icon_tpu.utils.io import save_obj
from icon_tpu.utils.synthetic import icosphere


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    n_views = 2
    for subject in ("0001",):
        folder = root / f"thuman2_{n_views}views" / subject
        for sub in ("render", "normal_F", "normal_B", "T_normal_F",
                    "T_normal_B", "calib"):
            os.makedirs(folder / sub, exist_ok=True)
        for rot in (0, 180):
            rgba = (rng.rand(64, 64, 4) * 255).astype(np.uint8)
            rgba[..., 3] = 255
            for sub in ("render", "normal_F", "normal_B", "T_normal_F",
                        "T_normal_B"):
                Image.fromarray(rgba).save(folder / sub / f"{rot:03d}.png")
            np.savetxt(folder / "calib" / f"{rot:03d}.txt",
                       np.concatenate([np.eye(4), np.eye(4)]))
        v, f = icosphere(subdiv=2, radius=0.4)
        scan = root / "thuman2" / "scans" / subject
        os.makedirs(scan, exist_ok=True)
        save_obj(str(scan / f"{subject}.obj"), v, f)
    return str(root)


@pytest.fixture(scope="module")
def train_cfg(data_root, tmp_path_factory):
    ck = tmp_path_factory.mktemp("ckpt")
    cfg = {
        "name": "test-icon", "ckpt_dir": str(ck),
        "batch_size": 2, "num_threads": 2, "num_epoch": 3,
        "dataset": {
            "root": data_root, "types": ["thuman2"], "scales": [1.0],
            "rotation_num": 2, "num_sample_geo": 64, "sigma_geo": 5.0,
        },
        "net": {
            "mlp_dim": [256, 64, 32, 1], "res_layers": [2],
            "num_stack": 1, "num_hourglass": 1, "prior_type": "pifu",
            "use_filter": True, "hourglass_dim": 6, "norm_mlp": "batch",
            "in_geo": "(('normal_F',3), ('normal_B',3))",
            "in_nml": "(('image',3), ('T_normal_F',3), ('T_normal_B',3))",
            "ngf": 8, "n_downsampling": 2, "n_blocks": 1,
        },
    }
    path = tmp_path_factory.mktemp("cfg") / "test.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def _image_panels(train_cfg, name):
    import glob
    with open(train_cfg) as f:
        cfg = yaml.safe_load(f)
    return glob.glob(os.path.join(cfg["ckpt_dir"], cfg["name"],
                                  "images", f"{name}*.png"))


def test_train_app_two_steps(train_cfg, monkeypatch, capsys):
    from icon_tpu.apps import train
    monkeypatch.setattr(sys, "argv",
                        ["train", "-cfg", train_cfg, "--max_steps", "2"])
    train.main()
    out = capsys.readouterr().out
    assert "done: 2 steps" in out
    # prediction panels rendered (pred-vs-label points + occupancy slice;
    # reference render_func, apps/ICON.py:694-727)
    assert "prediction panel failed" not in out
    assert _image_panels(train_cfg, "train"), "no prediction panels written"


def test_train_normal_app_two_steps(train_cfg, monkeypatch, capsys):
    from icon_tpu.apps import train_normal
    monkeypatch.setattr(sys, "argv",
                        ["train_normal", "-cfg", train_cfg,
                         "--max_steps", "2"])
    train_normal.main()
    out = capsys.readouterr().out
    assert "done: 2 steps" in out
    assert "prediction panel failed" not in out
    assert _image_panels(train_cfg, "normal"), "no prediction panels written"
