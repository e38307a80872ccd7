"""Reconstruction metrics (reference lib/dataset/Evaluator.py).

- Chamfer / P2S over 1000 area-weighted surface samples, x100
  (Evaluator.py:200-230: trimesh.sample + closest_point on both directions;
  chamfer = mean of the two one-sided distances, P2S = gt-samples -> pred).
- Normal consistency: re-render both meshes' normal images at azimuths
  0/90/180/270 and take the mean squared difference (Evaluator.py:125-177 —
  the reference uses its offline OpenGL renderer; we use the tile
  rasterizer).
- Occupancy accuracy/IoU/precision/recall at 0.5 (Evaluator.py:232-263).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from icon_tpu.ops.mesh import face_vertices
from icon_tpu.ops.sdf import point_mesh_dist_winding
from icon_tpu.render.camera import ortho_views
from icon_tpu.render.render import render_normal


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                   seed: int = 1993) -> np.ndarray:
    """Area-weighted uniform surface samples (trimesh.sample equivalent)."""
    rng = np.random.RandomState(seed)
    v = np.asarray(verts)
    f = np.asarray(faces)
    tris = v[f]                                        # [F, 3, 3]
    cross = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1)
    prob = area / max(area.sum(), 1e-12)
    pick = rng.choice(len(f), size=n, p=prob)
    r1 = np.sqrt(rng.rand(n, 1))
    r2 = rng.rand(n, 1)
    t = tris[pick]
    return ((1 - r1) * t[:, 0] + r1 * (1 - r2) * t[:, 1] +
            r1 * r2 * t[:, 2]).astype(np.float32)


def _point_to_mesh(points: np.ndarray, verts: np.ndarray,
                   faces: np.ndarray) -> np.ndarray:
    tris = face_vertices(jnp.asarray(verts)[None], jnp.asarray(faces))[0]
    d2, _, _ = point_mesh_dist_winding(jnp.asarray(points), tris)
    return np.sqrt(np.asarray(d2))


def chamfer_p2s(pred_verts: np.ndarray, pred_faces: np.ndarray,
                gt_verts: np.ndarray, gt_faces: np.ndarray,
                num_samples: int = 1000,
                seed: int = 1993) -> Tuple[float, float]:
    """Returns (chamfer, p2s), both x100 (reference convention).

    p2s: distance from gt surface samples to the predicted mesh;
    chamfer: mean of both one-sided sample->mesh distances.
    """
    pred_samples = sample_surface(pred_verts, pred_faces, num_samples, seed)
    gt_samples = sample_surface(gt_verts, gt_faces, num_samples, seed + 1)

    d_pred_to_gt = _point_to_mesh(pred_samples, gt_verts, gt_faces).mean()
    d_gt_to_pred = _point_to_mesh(gt_samples, pred_verts, pred_faces).mean()

    p2s = 100.0 * d_gt_to_pred
    chamfer = 100.0 * 0.5 * (d_pred_to_gt + d_gt_to_pred)
    return float(chamfer), float(p2s)


def normal_consistency(pred_verts: np.ndarray, pred_faces: np.ndarray,
                       gt_verts: np.ndarray, gt_faces: np.ndarray,
                       size: int = 512) -> float:
    """Mean squared normal-image difference over 4 orthographic views
    (x4 summed, matching the reference's per-view accumulation)."""
    total = 0.0
    for az in ortho_views():
        np_pred, m_pred = render_normal(jnp.asarray(pred_verts),
                                        jnp.asarray(pred_faces),
                                        size=size, azimuth=az)
        np_gt, m_gt = render_normal(jnp.asarray(gt_verts),
                                    jnp.asarray(gt_faces),
                                    size=size, azimuth=az)
        diff = ((np.asarray(np_pred) - np.asarray(np_gt)) ** 2).sum(-1)
        total += float(diff.mean())
    return total


def occupancy_metrics(pred: jnp.ndarray, label: jnp.ndarray,
                      thresh: float = 0.5) -> Dict[str, float]:
    """acc / IoU / precision / recall at a threshold
    (Evaluator.py:232-263)."""
    p = np.asarray(pred) > thresh
    l = np.asarray(label) > thresh
    tp = float(np.sum(p & l))
    fp = float(np.sum(p & ~l))
    fn = float(np.sum(~p & l))
    tn = float(np.sum(~p & ~l))
    return {
        "acc": (tp + tn) / max(tp + tn + fp + fn, 1.0),
        "iou": tp / max(tp + fp + fn, 1.0),
        "prec": tp / max(tp + fp, 1.0),
        "recall": tp / max(tp + fn, 1.0),
    }
