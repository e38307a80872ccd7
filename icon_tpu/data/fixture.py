"""Synthetic on-disk dataset fixture in the reference layout.

Builds everything ``PIFuDataset``/``NormalDataset`` read — scans, SMPL-X fit
pickles, calibrated multi-view renders, normals, visibility — from the
synthetic SMPL-X stand-in, so the full training/eval stack is exercised
end-to-end without licensed assets or THuman downloads. Doubles as the
round-trip test for the offline renderer (render_dataset.py): generate views
for a synthetic scan, then train a step on them.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Dict, Optional

import numpy as np


def make_synthetic_dataset(root: str, dataset: str = "synth",
                           n_subjects: int = 2, n_views: int = 3,
                           size: int = 128, seed: int = 0,
                           vis_res: int = 1024) -> None:
    """Write ``{root}/{dataset}/...`` + ``{root}/{dataset}_{R}views/...``.

    ``vis_res`` defaults to 1024 (not the production 4096,
    apps/render.py) — the fixture feeds tests and loader benches where a
    4096^2 CPU rasterization per view dominates generation time."""
    import jax.numpy as jnp
    from icon_tpu.models.smplx.assets import get_smpl_model
    from icon_tpu.data.render_dataset import render_subject_views
    from icon_tpu.data.datasets import vertex_normals_np
    from icon_tpu.utils.io import save_obj

    rng = np.random.RandomState(seed)
    model = get_smpl_model()           # synthetic fallback w/o assets
    rotations = list(range(0, 360, 360 // n_views))

    subjects = [f"{i:04d}" for i in range(n_subjects)]
    for split, subs in (("train", subjects), ("test", subjects[-1:]),
                        ("all", subjects)):
        os.makedirs(osp.join(root, dataset), exist_ok=True)
        with open(osp.join(root, dataset, f"{split}.txt"), "w") as f:
            f.write("\n".join(subs) + "\n")

    for si, subject in enumerate(subjects):
        param = {
            "betas": rng.randn(1, 10).astype(np.float32) * 0.3,
            "global_orient": rng.randn(1, 3).astype(np.float32) * 0.1,
            "body_pose": rng.randn(1, 63).astype(np.float32) * 0.1,
            "left_hand_pose": rng.randn(1, 12).astype(np.float32) * 0.1,
            "right_hand_pose": rng.randn(1, 12).astype(np.float32) * 0.1,
            "jaw_pose": np.zeros((1, 3), np.float32),
            "leye_pose": np.zeros((1, 3), np.float32),
            "reye_pose": np.zeros((1, 3), np.float32),
            "expression": rng.randn(1, 10).astype(np.float32) * 0.2,
            "scale": np.float64(1.0),
            "translation": np.zeros(3, np.float64),
        }
        fit_dir = osp.join(root, dataset, "fits", subject)
        os.makedirs(fit_dir, exist_ok=True)
        with open(osp.join(fit_dir, "smplx_param.pkl"), "wb") as f:
            pickle.dump(param, f)

        body_verts, _ = model.forward(
            betas=jnp.asarray(param["betas"]),
            global_orient=jnp.asarray(param["global_orient"]),
            body_pose=jnp.asarray(param["body_pose"]),
            left_hand_pose=jnp.asarray(param["left_hand_pose"]),
            right_hand_pose=jnp.asarray(param["right_hand_pose"]),
            expression=jnp.asarray(param["expression"]))
        body_verts = np.asarray(body_verts[0])

        # the "scan": clothed = body inflated with smooth radial bumps
        vn = vertex_normals_np(body_verts, model.faces)
        bump = 0.02 + 0.015 * np.sin(6 * body_verts[:, 1] + si) * \
            np.cos(5 * body_verts[:, 0])
        scan_verts = (body_verts + vn * bump[:, None]).astype(np.float32)

        scan_dir = osp.join(root, dataset, "scans", subject)
        os.makedirs(scan_dir, exist_ok=True)
        save_obj(osp.join(scan_dir, f"{subject}.obj"), scan_verts,
                 model.faces)

        out_dir = osp.join(root, f"{dataset}_{n_views}views", subject)
        render_subject_views(out_dir, scan_verts, model.faces,
                             body_verts, model.faces, rotations,
                             size=size, seed=seed + si, vis_res=vis_res)


def fixture_config(root: str, dataset: str = "synth", n_views: int = 3,
                   prior_type: str = "icon", num_sample_geo: int = 512,
                   image_size: int = 128):
    """A small Config wired to the fixture layout."""
    from icon_tpu.config import Config, DatasetConfig, NetConfig
    return Config(
        name=f"fixture-{prior_type}",
        batch_size=2,
        num_threads=2,
        num_epoch=1,
        net=NetConfig(
            mlp_dim=(256, 128, 1), res_layers=(1,), num_stack=1,
            num_hourglass=1, hourglass_dim=6, smpl_dim=7, voxel_dim=7,
            prior_type=prior_type, use_filter=True,
            in_geo=(("normal_F", 3), ("normal_B", 3)),
            in_nml=(("image", 3), ("T_normal_F", 3), ("T_normal_B", 3)),
            smpl_feats=("sdf", "cmap", "norm", "vis"),
            voxel_res=32,
            norm_mlp="batch", ngf=4, n_downsampling=2, n_blocks=1),
        dataset=DatasetConfig(
            root=root, types=(dataset,), scales=(1.0,),
            rotation_num=n_views, num_sample_geo=num_sample_geo,
            input_size=image_size,
            noise_type=("pose", "beta"), noise_scale=(0.01, 0.05)))
