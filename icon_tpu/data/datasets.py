"""Training/eval datasets in the reference's on-disk format.

Layout (docs/dataset.md; PIFuDataset.py:196-228):
``{root}/{dataset}_{R}views/{subject}/{render,normal_F,normal_B,T_normal_F,
T_normal_B,calib,vis}/{rotation:03d}.*`` plus scan meshes under the dataset
dir. Images are RGBA; RGB is premultiplied by the mask and scaled to [-1, 1]
(imagepath2tensor, PIFuDataset.py:250-259). All tensors here are channel-last
numpy, ready for jnp.asarray.

Point sampling (get_sampling_geo, PIFuDataset.py:483-607): 4x num_sample_geo
surface samples jittered along vertex normals by N(0, sigma_geo), plus
num_sample_geo/4 uniform samples in the view cube, labeled inside/outside and
rebalanced to num_sample_geo total. Inside tests use winding numbers (the
reference uses pyembree ray casts).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional, Sequence

import numpy as np

from icon_tpu.config import Config


def _imagepath2tensor(path: str, channels: int = 3) -> np.ndarray:
    from PIL import Image
    rgba = Image.open(path).convert("RGBA")
    arr = np.asarray(rgba, np.float32) / 255.0
    rgb, mask = arr[..., :3], arr[..., 3:4]
    # reference imagepath2tensor: normalize to [-1, 1] then mask (background
    # becomes exactly 0)
    out = (rgb * 2.0 - 1.0) * mask
    return out[..., :channels].astype(np.float32)


def load_calib(path: str) -> np.ndarray:
    """calib txt: 4x4 extrinsic over 4x4 intrinsic stacked (8 rows)
    (PIFuDataset.load_calib)."""
    data = np.loadtxt(path, dtype=np.float32)
    extrinsic = data[:4]
    intrinsic = data[4:8]
    return (intrinsic @ extrinsic).astype(np.float32)


class PIFuDataset:
    """Map-style geometry-training dataset (reference PIFuDataset)."""

    def __init__(self, cfg: Config, split: str = "train",
                 vis: bool = False, seed: int = 0):
        self.cfg = cfg
        self.split = split
        self.opt = cfg.dataset
        self.root = self.opt.root
        self.rotations = range(0, 360, 360 // max(self.opt.rotation_num, 1))
        self.datasets = list(self.opt.types)
        self.scales = {d: s for d, s in zip(self.datasets, self.opt.scales)}

        self.subjects: List[str] = []
        for d in self.datasets:
            split_file = osp.join(self.root, d, f"{split}.txt")
            if osp.exists(split_file):
                with open(split_file) as f:
                    self.subjects += [f"{d}/{line.strip()}"
                                      for line in f if line.strip()]
            else:
                views_dir = osp.join(self.root,
                                     f"{d}_{self.opt.rotation_num}views")
                if osp.isdir(views_dir):
                    self.subjects += [f"{d}/{s}"
                                      for s in sorted(os.listdir(views_dir))]
        self.in_total = [("image", 3), ("normal_F", 3), ("normal_B", 3),
                         ("T_normal_F", 3), ("T_normal_B", 3)]

    def __len__(self):
        return len(self.subjects) * len(list(self.rotations))

    def _paths(self, subject: str, rotation: int) -> Dict[str, str]:
        d, s = subject.split("/")
        folder = osp.join(self.root, f"{d}_{self.opt.rotation_num}views", s)
        return {
            "calib": osp.join(folder, "calib", f"{rotation:03d}.txt"),
            "render": osp.join(folder, "render", f"{rotation:03d}.png"),
            "folder": folder,
            "mesh": osp.join(self.root, d, "scans", s, f"{s}.obj"),
        }

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        if self.cfg.overfit:
            index = 0
        rots = list(self.rotations)
        rid = index % len(rots)
        mid = index // len(rots)
        subject = self.subjects[mid]
        rotation = rots[rid]
        p = self._paths(subject, rotation)

        item: Dict[str, np.ndarray] = {
            "subject": subject, "rotation": rotation,
            "calib": load_calib(p["calib"]),
        }
        item["image"] = _imagepath2tensor(p["render"])
        for name, ch in self.in_total[1:]:
            path = osp.join(p["folder"], name, f"{rotation:03d}.png")
            if osp.exists(path):
                item[name] = _imagepath2tensor(path, ch)

        verts, faces = self._load_mesh(p["mesh"], subject)
        samples, labels = sample_points_with_labels(
            verts, faces, item["calib"],
            num_sample_geo=self.opt.num_sample_geo,
            sigma_geo=self.opt.sigma_geo / 100.0,
            seed=abs(hash(subject)) % (2 ** 31))
        item["sample"] = samples
        item["label"] = labels[:, None]
        if self.split in ("test", "val"):
            item["verts"] = verts
            item["faces"] = faces
        return item

    def _load_mesh(self, path: str, subject: str):
        from icon_tpu.utils.io import load_obj
        d = subject.split("/")[0]
        verts, faces = load_obj(path)
        verts = verts * self.scales.get(d, 1.0)
        return verts, faces


def sample_points_with_labels(verts: np.ndarray, faces: np.ndarray,
                              calib: np.ndarray, num_sample_geo: int,
                              sigma_geo: float, seed: int = 0):
    """The get_sampling_geo procedure with winding-number inside labels."""
    import jax.numpy as jnp
    from icon_tpu.ops.mesh import vertex_normals
    from icon_tpu.ops.sdf import check_inside

    rng = np.random.RandomState(seed)
    V = len(verts)
    n_surf = 4 * num_sample_geo
    ids = rng.choice(V, n_surf, replace=True)
    vn = np.asarray(vertex_normals(jnp.asarray(verts)[None],
                                   jnp.asarray(faces)))[0]
    offset = rng.normal(scale=sigma_geo, size=(n_surf, 1)).astype(np.float32)
    samples_surface = verts[ids] + vn[ids] * offset

    n_space = num_sample_geo // 4
    calib_inv = np.linalg.inv(calib)
    space_img = (2.0 * rng.rand(n_space, 3) - 1.0).astype(np.float32)
    h = np.concatenate([space_img, np.ones((n_space, 1), np.float32)], 1)
    samples_space = (h @ calib_inv.T)[:, :3]

    samples = np.concatenate([samples_surface, samples_space]).astype(
        np.float32)
    rng.shuffle(samples)

    inside = np.asarray(check_inside(jnp.asarray(verts)[None],
                                     jnp.asarray(faces),
                                     jnp.asarray(samples)[None]))[0]
    inside_samples = samples[inside]
    outside_samples = samples[~inside]
    nin = len(inside_samples)
    half = num_sample_geo // 2
    if nin > half:
        inside_samples = inside_samples[:half]
        outside_samples = outside_samples[:half]
    else:
        outside_samples = outside_samples[:num_sample_geo - nin]
    samples = np.concatenate([inside_samples, outside_samples])
    labels = np.concatenate([np.ones(len(inside_samples), np.float32),
                             np.zeros(len(outside_samples), np.float32)])
    # pad to fixed size (static shapes downstream)
    short = num_sample_geo - len(samples)
    if short > 0:
        samples = np.concatenate([samples, samples[:1].repeat(short, 0)])
        labels = np.concatenate([labels, labels[:1].repeat(short)])
    return samples.astype(np.float32), labels.astype(np.float32)


class NormalDataset:
    """image + T_normal_F/B -> GT normal_F/B pairs (reference
    NormalDataset.py)."""

    def __init__(self, cfg: Config, split: str = "train"):
        self.inner = PIFuDataset(cfg, split)

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, index):
        item = self.inner[index]
        keys = ("image", "T_normal_F", "T_normal_B", "normal_F", "normal_B")
        return {k: item[k] for k in keys if k in item}


class DataLoader:
    """Threaded, batched, shuffled loader (replaces the torch DataLoader
    workers; reference PIFuDataModule.py:41-44)."""

    def __init__(self, dataset, batch_size: int = 4, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        import concurrent.futures as cf
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed).shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        def collate(items):
            out = {}
            for k in items[0]:
                vals = [it[k] for it in items]
                if isinstance(vals[0], np.ndarray):
                    out[k] = np.stack(vals)
                else:
                    out[k] = vals
            return out

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            futures = [pool.submit(
                lambda idxs=b: collate([self.dataset[int(i)] for i in idxs]))
                for b in batches]
            for fut in futures:
                yield fut.result()
