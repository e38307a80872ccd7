"""Dataset-generation CLI (reference scripts/render_single.py:144-239 +
render_batch.sh): walk ``{root}/{dataset}/scans/*`` and ``fits/*``, render
every subject's multi-view training images into the
``{root}/{dataset}_{R}views`` layout that ``PIFuDataset`` consumes.

    python -m icon_tpu.apps.render -root ./data -dataset thuman2 \
        -views 36 -size 512 -procs 8 [-prt] [-vis_res 4096] [-subjects ...]

Per subject:
  - scan ``scans/{s}/{s}.obj`` is normalized the reference way
    (render_single.py:79-95): height -> 1.8 box units, centered at the
    pelvis joint (x, z) and the bbox mid-height (y).
  - SMPL-X fit ``fits/{s}/smplx_param.pkl`` poses the body through the
    in-repo SMPL-X model (assets required for T_normal/vis channels; scans
    render fine without).
  - ``-prt`` adds self-shadow PRT transport to the shaded renders
    (reference prt_util.py; see data/render_dataset.py:compute_prt).
  - process parallelism over subjects (the reference's ``xargs -P``,
    render_batch.sh) — workers force JAX onto CPU so they never contend
    for the TPU.
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp


def list_subjects(root: str, dataset: str):
    scans = sorted(glob.glob(osp.join(root, dataset, "scans", "*")))
    return [osp.basename(p) for p in scans if osp.isdir(p)]


def _find_scan(root: str, dataset: str, subject: str):
    for pat in (f"{subject}.obj", "*.obj"):
        hits = sorted(glob.glob(
            osp.join(root, dataset, "scans", subject, pat)))
        if hits:
            return hits[0]
    return None


def render_one(root: str, dataset: str, subject: str, views: int,
               size: int, prt_dirs: int, vis_res: int, seed: int) -> str:
    import numpy as np
    from icon_tpu.data.render_dataset import (compute_prt,
                                              render_subject_views)
    from icon_tpu.models.smplx.assets import load_smplx_param
    from icon_tpu.utils.io import load_obj

    scan_path = _find_scan(root, dataset, subject)
    if scan_path is None:
        return f"{subject}: no scan obj"
    scan_v, scan_f = load_obj(scan_path)

    fit_path = osp.join(root, dataset, "fits", subject, "smplx_param.pkl")
    body_v = body_f = None
    joints0 = None
    if osp.exists(fit_path):
        try:
            from icon_tpu.models.smplx.assets import get_smpl_model
            import jax.numpy as jnp
            param = load_smplx_param(fit_path)
            model = get_smpl_model("smplx")
            verts, joints = model.forward(
                betas=jnp.asarray(param["betas"]),
                global_orient=jnp.asarray(param["global_orient"]),
                body_pose=jnp.asarray(param["body_pose"]),
                left_hand_pose=jnp.asarray(param["left_hand_pose"]),
                right_hand_pose=jnp.asarray(param["right_hand_pose"]),
                expression=jnp.asarray(param.get("expression")))
            body_v = (np.asarray(verts[0]) * float(param["scale"]) +
                      np.asarray(param["translation"], np.float32))
            joints0 = (np.asarray(joints[0, 0]) * float(param["scale"]) +
                       np.asarray(param["translation"], np.float32))
            body_f = model.faces
        except Exception as e:          # no SMPL-X assets installed
            print(f"[render] {subject}: SMPL fit skipped ({e})")

    # normalization (render_single.py:79-95): height -> 1.8 of the box,
    # center = pelvis (x, z) + bbox mid-height (y)
    vmin, vmax = scan_v.min(0), scan_v.max(0)
    scale = 1.8 / max(vmax[1] - vmin[1], 1e-6)
    center = joints0.copy() if joints0 is not None else \
        (vmin + vmax) / 2.0
    center[1] = 0.5 * (vmax[1] + vmin[1])
    scan_n = (scan_v - center) * scale
    body_n = (body_v - center) * scale if body_v is not None else None

    prt = None
    if prt_dirs:
        prt = compute_prt(scan_n, scan_f, n_dirs=prt_dirs)

    rotations = list(range(0, 360, 360 // views))
    out_dir = osp.join(root, f"{dataset}_{views}views", subject)
    render_subject_views(out_dir, scan_n.astype(np.float32), scan_f,
                         body_n, body_f, rotations, size=size, seed=seed,
                         prt=prt, vis_res=vis_res or None)
    return f"{subject}: {views} views -> {out_dir}"


def _worker(job):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    try:
        return render_one(*job)
    except Exception as e:
        return f"{job[2]}: FAILED ({type(e).__name__}: {e})"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-root", required=True)
    ap.add_argument("-dataset", default="thuman2")
    ap.add_argument("-views", type=int, default=36)
    ap.add_argument("-size", type=int, default=512)
    ap.add_argument("-procs", type=int, default=max(os.cpu_count() - 2, 1))
    ap.add_argument("-prt", action="store_true",
                    help="self-shadow PRT transport for shaded renders")
    ap.add_argument("-prt_dirs", type=int, default=64)
    ap.add_argument("-vis_res", type=int, default=0,
                    help="SMPL visibility raster res (e.g. 4096; default "
                         "auto)")
    ap.add_argument("-seed", type=int, default=0)
    ap.add_argument("-subjects", nargs="*", default=None)
    args = ap.parse_args()

    subjects = args.subjects or list_subjects(args.root, args.dataset)
    if not subjects:
        raise SystemExit(
            f"no subjects under {args.root}/{args.dataset}/scans")
    jobs = [(args.root, args.dataset, s, args.views, args.size,
             args.prt_dirs if args.prt else 0, args.vis_res,
             args.seed + i) for i, s in enumerate(subjects)]

    if args.procs <= 1 or len(jobs) == 1:
        for job in jobs:
            print(_worker(job), flush=True)
    else:
        import multiprocessing as mp
        ctx = mp.get_context("spawn")      # workers re-init JAX on CPU
        with ctx.Pool(min(args.procs, len(jobs))) as pool:
            for msg in pool.imap_unordered(_worker, jobs):
                print(msg, flush=True)
    print(f"done: {len(jobs)} subjects")


if __name__ == "__main__":
    main()
