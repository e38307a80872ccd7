"""End-to-end: synthetic on-disk dataset -> SMPL-prior training -> eval.

Round-trip coverage of the offline renderer (render_dataset.py), the SMPL
feature pipeline (datasets.py load_smpl / load_smpl_voxel), ICON & PaMIR
training from disk, the benchmark evaluation loop, and checkpoint resume."""

import os
import sys

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from icon_tpu.data.fixture import make_synthetic_dataset
    root = str(tmp_path_factory.mktemp("synthdata"))
    make_synthetic_dataset(root, n_subjects=2, n_views=2, size=64)
    return root


def _cfg_yaml(root, tmp_path_factory, prior_type, **over):
    import dataclasses
    from icon_tpu.data.fixture import fixture_config
    cfg = fixture_config(root, n_views=2, prior_type=prior_type,
                         num_sample_geo=128, image_size=64)
    ck = tmp_path_factory.mktemp("ckpt")
    d = dataclasses.asdict(cfg)
    d["ckpt_dir"] = str(ck)
    d.update(over)
    # channel specs serialize as lists-of-lists; the parser accepts them
    path = tmp_path_factory.mktemp("cfg") / f"{prior_type}.yaml"
    path.write_text(yaml.safe_dump(d))
    return str(path)


def test_dataset_emits_smpl_features(fixture_root):
    from icon_tpu.data.fixture import fixture_config
    from icon_tpu.data.datasets import PIFuDataset
    cfg = fixture_config(fixture_root, n_views=2, num_sample_geo=128,
                         image_size=64)
    ds = PIFuDataset(cfg, split="train")
    assert len(ds) == 4
    item = ds[0]
    V = item["smpl_verts"].shape[0]
    assert item["smpl_verts"].shape == (V, 3)
    assert item["smpl_vis"].shape == (V, 1)
    assert item["smpl_cmap"].shape == (V, 3)
    assert item["smpl_vf_table"].shape[0] == V
    assert item["pts_signs"].shape == (128,)
    assert set(np.unique(item["pts_signs"])) <= {-1.0, 1.0}
    # visibility sane for a mostly-convex body: a good fraction visible
    assert 0.2 < item["smpl_vis"].mean() < 0.8
    # occupancy labels balanced by construction
    assert 0.3 <= item["label"].mean() <= 0.7


def test_per_epoch_sampling_differs(fixture_root):
    from icon_tpu.data.fixture import fixture_config
    from icon_tpu.data.datasets import PIFuDataset
    cfg = fixture_config(fixture_root, n_views=2, num_sample_geo=128,
                         image_size=64)
    ds = PIFuDataset(cfg, split="train")
    s0 = ds[0]["sample"]
    ds.set_epoch(1)
    s1 = ds[0]["sample"]
    assert not np.allclose(s0, s1)
    ds.set_epoch(0)
    s0b = ds[0]["sample"]
    np.testing.assert_allclose(s0, s0b)


@pytest.mark.parametrize("prior", ["icon", "pamir"])
def test_train_from_disk(fixture_root, tmp_path_factory, monkeypatch,
                         capsys, prior):
    from icon_tpu.apps import train
    cfg = _cfg_yaml(fixture_root, tmp_path_factory, prior)
    monkeypatch.setattr(sys, "argv",
                        ["train", "-cfg", cfg, "--max_steps", "2"])
    train.main()
    out = capsys.readouterr().out
    assert "done: 2 steps" in out


def test_resume_continues_step_count(fixture_root, tmp_path_factory,
                                     monkeypatch, capsys):
    from icon_tpu.apps import train
    cfg = _cfg_yaml(fixture_root, tmp_path_factory, "icon",
                    num_epoch=2)
    monkeypatch.setattr(sys, "argv",
                        ["train", "-cfg", cfg, "--max_steps", "1"])
    train.main()
    capsys.readouterr()
    monkeypatch.setattr(sys, "argv",
                        ["train", "-cfg", cfg, "-resume",
                         "--max_steps", "3"])
    train.main()
    out = capsys.readouterr().out
    assert "resumed from" in out
    assert "done: 3 steps" in out


def test_eval_loop_reports_metrics(fixture_root, tmp_path_factory,
                                   monkeypatch, capsys):
    from icon_tpu.apps import train
    cfg = _cfg_yaml(fixture_root, tmp_path_factory, "icon",
                    mcube_res=32)
    monkeypatch.setattr(sys, "argv",
                        ["train", "-cfg", cfg, "-test",
                         "--max_eval_items", "1"])
    train.main()
    out = capsys.readouterr().out
    assert "chamfer=" in out
    assert "benchmark" in out
