"""Generate TetraSMPL assets (tedra ``tetra_{sex}_{age}_smpl.npz``).

Replaces the reference's offline tetgen pipeline
(scripts/tetrahedronize_scripts/tedrahedronize.py): the reference poses the
body apart, pushes self-intersecting faces inward with a CUDA BVH, runs
tetgen's constrained tetrahedralization, then transfers skinning/shape/pose
blend weights to the added interior nodes and un-poses them with inverse
LBS. Here the body is tetrahedralized directly in its rest pose (SMPL's
template already separates the limbs), so no intersection fixing or
un-posing is needed:

1. interior nodes = a regular lattice filtered by the exact ray-parity
   inside test (ops/sdf_fast.ray_parity_inside_np), kept a half-step away
   from the surface;
2. Delaunay over surface vertices + interior nodes (scipy), keeping only
   tetrahedra whose centroid lies inside the body and whose longest edge is
   short (drops convex-hull slivers bridging concavities such as the gap
   between the legs) — an unconstrained approximation of tetgen's PLC
   conforming mesh, sufficient for the consumer (PaMIR's semantic
   voxelization of node codes, lib/net/voxelize.py);
3. per-node weights/shapedirs/posedirs by the reference's gaussian
   nearest-neighbor transfer (tedrahedronize.py:74-92).

Output matches the reference npz layout exactly (v_template_added,
weights_added, shapedirs_added, posedirs_added, tetrahedrons), so
``icon_tpu.models.smplx.tetra.load_tetra_body_model`` consumes it
unchanged.

CLI::

    python -m icon_tpu.apps.tetrahedronize \
        -models data/smpl_related/models/smpl -out data/tedra_data
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from typing import Tuple

import numpy as np


def interior_nodes(verts: np.ndarray, faces: np.ndarray,
                   spacing: float) -> np.ndarray:
    """Regular lattice points strictly inside the surface, at least
    ``spacing/2`` away from the nearest surface vertex."""
    from scipy.spatial import cKDTree
    from icon_tpu.ops.sdf_fast import ray_parity_inside_np

    lo = verts.min(0) + spacing * 0.25
    hi = verts.max(0) - spacing * 0.25
    axes = [np.arange(lo[k], hi[k], spacing) for k in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    inside = ray_parity_inside_np(pts, verts, faces)
    pts = pts[inside]
    d, _ = cKDTree(verts).query(pts)
    return pts[d > 0.5 * spacing]


def tetrahedralize(verts: np.ndarray, faces: np.ndarray,
                   spacing: float = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """(added_nodes [A, 3], tets [T, 4] int32 indexing verts+added)."""
    from scipy.spatial import Delaunay
    from icon_tpu.ops.sdf_fast import ray_parity_inside_np

    if spacing is None:
        tri = verts[faces]
        spacing = 1.5 * float(np.linalg.norm(
            tri[:, 1] - tri[:, 0], axis=1).mean())
    added = interior_nodes(verts, faces, spacing)
    pts = np.concatenate([verts, added]).astype(np.float64)
    tets = Delaunay(pts).simplices.astype(np.int32)

    cent = pts[tets].mean(1).astype(np.float32)
    inside = ray_parity_inside_np(cent, verts, faces)
    edges = pts[tets]                                    # [T, 4, 3]
    pairs = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
    emax = np.max(np.stack([
        np.linalg.norm(edges[:, a] - edges[:, b], axis=1)
        for a, b in pairs]), axis=0)
    keep = inside & (emax < 2.5 * spacing)
    return added.astype(np.float32), tets[keep]


def transfer_weights(added: np.ndarray, verts: np.ndarray,
                     weights: np.ndarray, shapedirs: np.ndarray,
                     posedirs: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gaussian nearest-neighbor transfer (tedrahedronize.py:74-92):
    neighbors within 2x the min distance, gaussian-weighted by that min."""
    from scipy.spatial import cKDTree
    tree = cKDTree(verts)
    w_out = np.zeros((len(added), weights.shape[1]), np.float32)
    s_out = np.zeros((len(added),) + shapedirs.shape[1:], np.float32)
    p_out = np.zeros((len(added),) + posedirs.shape[1:], np.float32)
    # kNN bound: the 2*min-dist ball rarely holds >32 verts at SMPL density
    d, idx = tree.query(added, k=min(32, len(verts)))
    for i in range(len(added)):
        mind = d[i, 0]
        sel = d[i] < 2.0 * mind
        nw = np.exp(-d[i][sel] ** 2 / (2.0 * mind * mind + 1e-12))
        nw = (nw / nw.sum()).astype(np.float32)
        ii = idx[i][sel]
        w_out[i] = nw @ weights[ii]
        s_out[i] = np.tensordot(nw, shapedirs[ii], axes=1)
        p_out[i] = np.tensordot(nw, posedirs[ii], axes=1)
    return w_out, s_out, p_out


def build_tetra_npz(v_template: np.ndarray, faces: np.ndarray,
                    weights: np.ndarray, shapedirs: np.ndarray,
                    posedirs: np.ndarray, out_path: str = None,
                    spacing: float = None) -> dict:
    """Full asset build for one body; returns the npz dict (and writes it
    when ``out_path`` is given)."""
    added, tets = tetrahedralize(v_template, faces, spacing)
    w, s, p = transfer_weights(added, v_template, weights, shapedirs,
                               posedirs)
    out = {
        "v_template_added": added,
        "weights_added": w,
        "shapedirs_added": s,
        "posedirs_added": p,
        "tetrahedrons": tets.astype(np.int32),
    }
    if out_path:
        np.savez_compressed(out_path, **out)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-models", required=True,
                    help="dir with SMPL_{GENDER}.pkl files")
    ap.add_argument("-out", required=True, help="output tedra_data dir")
    ap.add_argument("-spacing", type=float, default=None,
                    help="interior lattice spacing (default ~1.5x mean "
                         "edge length)")
    args = ap.parse_args(argv)

    import pickle
    os.makedirs(args.out, exist_ok=True)
    for sex in ("male", "female", "neutral"):
        path = osp.join(args.models, f"SMPL_{sex.upper()}.pkl")
        if not osp.exists(path):
            print(f"[tetra] no {path}, skipping")
            continue
        # raw pkl layout (the same arrays tetra.load_tetra_body_model
        # concatenates): posedirs [V, 3, P], shapedirs [V, 3, B]
        with open(path, "rb") as f:
            params = pickle.load(f, encoding="latin1")

        def to_np(x):
            if hasattr(x, "todense"):
                x = x.todense()
            return np.asarray(x, np.float32)

        v = to_np(params["v_template"])
        out_path = osp.join(args.out, f"tetra_{sex}_adult_smpl.npz")
        res = build_tetra_npz(
            v, np.asarray(params["f"], np.int64),
            to_np(params["weights"]),
            to_np(params["shapedirs"])[..., :10],
            to_np(params["posedirs"]), out_path,
            spacing=args.spacing)
        print(f"[tetra] {sex}: +{len(res['v_template_added'])} nodes, "
              f"{len(res['tetrahedrons'])} tets -> {out_path}")


if __name__ == "__main__":
    main()
