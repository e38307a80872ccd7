"""Training-time PREDICTION visualization (reference render_func: the
geometry trainer posts recon slices and the normal trainer posts predicted
normal maps to TensorBoard every freq_show_*, apps/ICON.py:694-727,
apps/Normal.py:117-129, seg3d display seg3d_lossless.py:498-581).

Input-only panels tell you nothing about whether the net is learning;
these helpers render what the model currently PREDICTS:

- ``point_error_image``: the training batch's sampled query points splatted
  into an image, colored by |pred - label| (green = correct side, red =
  wrong side) — the geometry trainer's per-step learning signal.
- ``occupancy_slice_image``: a dense axis-aligned slice of the occupancy
  field through the origin — a cheap (res^2 points) recon preview without
  running the octree engine.
- ``normal_pred_panels``: input / body-prior normal / predicted normal /
  ground truth rows for the normal trainer.

All helpers return numpy arrays in [0, 1] ready for
``MetricLogger.log_images``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def point_error_image(xy: np.ndarray, pred: np.ndarray, label: np.ndarray,
                      size: int = 256) -> np.ndarray:
    """Splat sampled query points into a [size, size, 3] image colored by
    occupancy error: green = |pred - label| ~ 0, red = wrong side.

    xy: [N, 2] point positions in [-1, 1] (calib/NDC x right, y up).
    pred/label: [N] or [N, 1] occupancy in [0, 1].
    """
    xy = np.asarray(xy, np.float32).reshape(-1, 2)
    pred = np.asarray(pred, np.float32).reshape(-1)
    label = np.asarray(label, np.float32).reshape(-1)
    err = np.clip(np.abs(pred - label), 0.0, 1.0)
    px = np.clip(((xy[:, 0] * 0.5 + 0.5) * (size - 1)).round().astype(int),
                 0, size - 1)
    # y up in NDC -> row 0 at the top
    py = np.clip(((-xy[:, 1] * 0.5 + 0.5) * (size - 1)).round().astype(int),
                 0, size - 1)
    img = np.zeros((size, size, 3), np.float32)
    img[py, px, 0] = err                  # red: wrong
    img[py, px, 1] = 1.0 - err            # green: right
    return img


def occupancy_slice_image(net, variables, item: Dict[str, np.ndarray],
                          res: int = 65, axis: str = "z",
                          batch_first_only: bool = True) -> np.ndarray:
    """Dense occupancy slice through the origin on the given axis
    (a low-res recon preview; reference seg3d display,
    seg3d_lossless.py:498-581). ``item`` is one training batch — image
    features and SMPL prior tensors are read from it the same way the eval
    loop does (eval/test_loop.py:recon_one).

    Returns [res, res, 3] grayscale occupancy in [0, 1].
    """
    import jax.numpy as jnp

    def lead(v, keep_full=False):
        v = jnp.asarray(v)
        if batch_first_only and not keep_full and v.ndim >= 3:
            return v[:1]
        return v

    feat_keys = [k for k in ("image", "normal_F", "normal_B",
                             "T_normal_F", "T_normal_B") if k in item]
    in_t = {k: lead(item[k]) if np.asarray(item[k]).ndim == 4
            else jnp.asarray(item[k])[None] for k in feat_keys}
    features = net.apply(variables, in_t, False, method=net.filter)

    calib = jnp.asarray(item["calib"])
    if calib.ndim == 2:
        calib = calib[None]
    calib = calib[:1]

    smpl_feat = None
    skeys = [k for k in item if k.startswith(("smpl_", "voxel_"))
             and k != "smpl_query_inside"]
    if skeys:
        smpl_feat = {}
        for k in skeys:
            v = jnp.asarray(item[k])
            if k in ("smpl_faces", "smpl_vf_table", "voxel_codes"):
                smpl_feat[k] = v
            elif v.ndim == 2:
                smpl_feat[k] = v[None]
            else:
                smpl_feat[k] = v[:1]

    g = np.linspace(-1.0, 1.0, res, dtype=np.float32)
    a, b = np.meshgrid(g, g, indexing="xy")
    zeros = np.zeros_like(a)
    if axis == "z":               # xy plane at z=0, y flips to row-down
        pts = np.stack([a, -b, zeros], -1)
    elif axis == "y":             # xz plane
        pts = np.stack([a, zeros, b], -1)
    else:                         # yz plane
        pts = np.stack([zeros, -b, a], -1)
    pts = jnp.asarray(pts.reshape(1, -1, 3))
    preds = net.apply(variables, features, pts, calib, smpl_feat,
                      False, method=net.query)[-1]
    sl = np.asarray(preds).reshape(res, res, 1)
    return np.clip(sl, 0.0, 1.0).repeat(3, axis=-1)


def normal_pred_panels(batch: Dict[str, np.ndarray],
                       pred_F: np.ndarray,
                       pred_B: Optional[np.ndarray] = None
                       ) -> Dict[str, np.ndarray]:
    """Panel dict for the normal trainer (reference Normal.py:117-129
    render_func: [image, T_normal_F, pred, gt])."""
    out = {}
    if "image" in batch:
        out["image"] = np.asarray(batch["image"])[0]
    if "T_normal_F" in batch:
        out["T_normal_F"] = np.asarray(batch["T_normal_F"])[0]
    out["pred_F"] = np.asarray(pred_F)[0]
    if "normal_F" in batch:
        out["gt_F"] = np.asarray(batch["normal_F"])[0]
    if pred_B is not None:
        out["pred_B"] = np.asarray(pred_B)[0]
        if "normal_B" in batch:
            out["gt_B"] = np.asarray(batch["normal_B"])[0]
    return out
