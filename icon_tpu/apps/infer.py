"""Single-image reconstruction demo CLI (reference apps/infer.py — the
north-star API).

Pipeline per image (reference call stack, SURVEY.md §3.1):
  1. load RGBA image (+ precomputed SMPL init: ``<name>_smpl.npz`` with
     betas/body_pose/global_orient/transl/scale — produced by an HPS
     estimator; the bundled PyMAF-equivalent port lands in a later round,
     until then bring-your-own fit or the neutral body is used),
  2. predict cloth normals (NormalNet; random-init unless -ckpt given),
  3. SMPL refinement against normals + silhouette (100 iters),
  4. implicit occupancy reconstruction at -mcube_res via the octree engine,
  5. optional cloth refinement (200 iters of LocalAffine),
  6. vertex coloring from the input image + OBJ/turntable export.

Usage:
  python -m icon_tpu.apps.infer -cfg configs/icon-filter.yaml \
      -in_dir examples -out_dir results [-loop_smpl 100] [-loop_cloth 200]
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp

import numpy as np


def load_image_rgba(path: str, size: int = 512):
    from PIL import Image
    img = Image.open(path).convert("RGBA").resize((size, size))
    arr = np.asarray(img, np.float32) / 255.0
    rgb = (arr[..., :3] * 2 - 1) * arr[..., 3:4]
    mask = (arr[..., 3] > 0.5).astype(np.float32)
    return rgb.astype(np.float32), mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-cfg", "--config_file", required=True)
    ap.add_argument("-in_dir", required=True)
    ap.add_argument("-out_dir", required=True)
    ap.add_argument("-ckpt", default="", help="geometry checkpoint")
    ap.add_argument("-normal_ckpt", default="", help="normal-net checkpoint")
    ap.add_argument("-smpl_model", default="",
                    help="SMPL(-X) asset file (.pkl/.npz)")
    ap.add_argument("-loop_smpl", type=int, default=100)
    ap.add_argument("-loop_cloth", type=int, default=200)
    ap.add_argument("-mcube_res", type=int, default=256)
    ap.add_argument("-export_video", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from icon_tpu.config import load_config
    from icon_tpu.infer.refine import refine_cloth, refine_smpl
    from icon_tpu.models.hgpifu import HGPIFuNet
    from icon_tpu.models.smplx.body import load_body_model
    from icon_tpu.ops.raster import vertex_visibility
    from icon_tpu.recon.engine import (ReconEngine,
                                       reconstruction_resolutions)
    from icon_tpu.recon.export import extract_mesh
    from icon_tpu.render.camera import verts_to_ndc
    from icon_tpu.render.render import query_color, render_normal
    from icon_tpu.training.checkpoints import (load_checkpoint,
                                               partial_warm_start)
    from icon_tpu.utils.io import save_gif, save_obj
    from icon_tpu.utils.synthetic import synthetic_body

    cfg = load_config(args.config_file).replace(test_mode=False,
                                                mcube_res=args.mcube_res)
    net = HGPIFuNet(cfg)

    if args.smpl_model:
        body = load_body_model(args.smpl_model)
        body_faces = body.faces
    else:
        print("[infer] no -smpl_model given: using the synthetic body prior")
        body = None
        sv, body_faces = synthetic_body(subdiv=5)

    images = sorted(sum([glob.glob(osp.join(args.in_dir, e))
                         for e in ("*.png", "*.jpg", "*.jpeg")], []))
    if not images:
        raise SystemExit(f"no images in {args.in_dir}")
    os.makedirs(args.out_dir, exist_ok=True)

    # init params once on the first image
    variables = None
    eng = ReconEngine(reconstruction_resolutions(args.mcube_res))

    for path in images:
        name = osp.splitext(osp.basename(path))[0]
        print(f"[infer] {name}")
        rgb, mask = load_image_rgba(path)
        image = jnp.asarray(rgb)[None]

        in_t = {"image": image}

        # --- SMPL init (precomputed fit or neutral) ---
        fit_path = osp.join(args.in_dir, f"{name}_smpl.npz")
        if body is not None:
            if osp.exists(fit_path):
                fit = np.load(fit_path)
                init_params = {
                    "betas": fit["betas"].astype(np.float32),
                    "body_pose": fit["body_pose"].astype(np.float32),
                    "global_orient":
                        fit["global_orient"].astype(np.float32),
                    "trans": fit["transl"].astype(np.float32)}
            else:
                nj = (body.num_joints - 1) * 3
                init_params = {
                    "betas": np.zeros((1, body.num_betas), np.float32),
                    "body_pose": np.zeros((1, nj), np.float32),
                    "global_orient": np.zeros((1, 3), np.float32),
                    "trans": np.zeros((1, 3), np.float32)}
            smpl_verts0, _ = body.forward(
                betas=jnp.asarray(init_params["betas"]),
                body_pose=jnp.asarray(init_params["body_pose"]),
                global_orient=jnp.asarray(init_params["global_orient"]),
                transl=jnp.asarray(init_params["trans"]))
            smpl_verts0 = smpl_verts0[0]
        else:
            smpl_verts0 = jnp.asarray(sv)

        # --- predicted cloth normals (T_normals from the body prior) ---
        T_nF, _ = render_normal(smpl_verts0, jnp.asarray(body_faces))
        T_nB, _ = render_normal(smpl_verts0, jnp.asarray(body_faces),
                                azimuth=180.0)
        in_t["T_normal_F"] = T_nF[None]
        in_t["T_normal_B"] = T_nB[None]

        if variables is None:
            init_batch = dict(in_t)
            init_batch.update({
                "sample": jnp.zeros((1, 8, 3)), "calib": jnp.eye(4)[None]})
            if cfg.net.prior_type == "icon":
                init_batch.update(_icon_feats(smpl_verts0, body_faces))
            variables = net.init(jax.random.PRNGKey(0), init_batch,
                                 train=False)
            for ck, rename in ((args.ckpt, None),
                               (args.normal_ckpt,
                                {"netG": "normal_filter"})):
                if ck and osp.exists(ck):
                    loaded = load_checkpoint(ck)
                    variables = dict(variables)
                    variables["params"] = partial_warm_start(
                        variables["params"], loaded["params"], rename)

        nmlF, nmlB = net.apply(variables, in_t, False,
                               method=net.predict_normals)
        in_t["normal_F"] = nmlF
        in_t["normal_B"] = nmlB

        # --- SMPL refinement ---
        if body is not None and args.loop_smpl > 0:
            refined, smpl_verts, losses = refine_smpl(
                body, body_faces, init_params, nmlF[0], nmlB[0],
                jnp.asarray(mask), iters=args.loop_smpl)
            print(f"  smpl refine: {losses[0]:.4f} -> {losses[-1]:.4f}")
        else:
            smpl_verts = smpl_verts0

        # --- implicit reconstruction ---
        features = net.apply(variables, in_t, False, method=net.filter)
        smpl_feat = _icon_feats(smpl_verts, body_faces) \
            if cfg.net.prior_type == "icon" else None

        def query_fn(pts):
            return net.apply(variables, features, pts, jnp.eye(4)[None],
                             smpl_feat, False, method=net.query)[-1]

        occ, stats = eng(query_fn)
        verts, faces = extract_mesh(occ)
        if cfg.clean_mesh:
            from icon_tpu.utils.io import clean_mesh
            verts, faces = clean_mesh(verts, faces)
        print(f"  recon: {len(verts)} verts, {len(faces)} faces")
        save_obj(osp.join(args.out_dir, f"{name}_recon.obj"), verts, faces)

        # --- cloth refinement ---
        if args.loop_cloth > 0 and len(verts):
            refined_verts, closses = refine_cloth(
                verts, faces, nmlF[0], nmlB[0], iters=args.loop_cloth)
            print(f"  cloth refine: {closses[0]:.4f} -> {closses[-1]:.4f}")
            verts = refined_verts
            save_obj(osp.join(args.out_dir, f"{name}_refine.obj"),
                     verts, faces)

        # --- vertex colors + turntable ---
        if len(verts):
            colors = np.asarray(query_color(
                jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(rgb)))
            save_obj(osp.join(args.out_dir, f"{name}_recon_color.obj"),
                     verts, faces, colors)
            if args.export_video:
                frames = []
                for az in range(0, 360, 10):
                    img_n, m = render_normal(jnp.asarray(verts),
                                             jnp.asarray(faces),
                                             size=256, azimuth=float(az))
                    frame = ((np.asarray(img_n) * 0.5 + 0.5) *
                             np.asarray(m)[..., None] * 255)
                    frames.append(frame.astype(np.uint8))
                save_gif(osp.join(args.out_dir, f"{name}_turntable.gif"),
                         frames)
    print("[infer] done")


def _icon_feats(smpl_verts, body_faces):
    import jax.numpy as jnp
    import numpy as np
    from icon_tpu.ops.raster import vertex_visibility
    from icon_tpu.render.camera import verts_to_ndc
    v = smpl_verts
    vis = vertex_visibility(verts_to_ndc(v), jnp.asarray(body_faces))
    vmin = v.min(axis=0)
    vmax = v.max(axis=0)
    cmap = (v - vmin) / jnp.maximum(vmax - vmin, 1e-6)
    return {
        "smpl_verts": v[None],
        "smpl_faces": jnp.asarray(body_faces),
        "smpl_cmap": cmap[None],
        "smpl_vis": vis[None],
    }


if __name__ == "__main__":
    main()
