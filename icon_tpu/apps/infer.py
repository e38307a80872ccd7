"""Single-image reconstruction demo CLI (reference apps/infer.py — the
north-star API).

Pipeline per image (reference call stack, SURVEY.md §3.1):
  1. TestDataset preprocessing: crop around the person matte (alpha channel,
     or full frame for RGB) + PyMAF SMPL initialization
     (TestDataset.py:194-287). A precomputed ``<name>_smpl.npz`` fit
     overrides the HPS output when present.
  2. SMPL body fitting against the evolving predicted cloth normals +
     front/back silhouettes (infer.py:123-273) — the normal net re-runs
     every iteration inside the jitted step.
  3. implicit occupancy reconstruction at -mcube_res via the octree engine;
     budget/bin overflow stats are CHECKED and reported loudly.
  4. isotropic remesh (infer.py:402 -> mesh_util.py:109) before
  5. cloth refinement (200 iters of LocalAffine, infer.py:431-505),
  6. vertex coloring from the input image + OBJ/turntable export; garment
     extraction when a segmentation json is provided (-seg_dir).

Usage:
  python -m icon_tpu.apps.infer -cfg configs/icon-filter.yaml \
      -in_dir examples -out_dir results [-loop_smpl 100] [-loop_cloth 200]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-cfg", "--config_file", required=True)
    ap.add_argument("-in_dir", required=True)
    ap.add_argument("-out_dir", required=True)
    ap.add_argument("-seg_dir", default=None)
    ap.add_argument("-ckpt", default="", help="geometry checkpoint")
    ap.add_argument("-normal_ckpt", default="", help="normal-net checkpoint")
    ap.add_argument("-hps_type", default="pymaf")
    ap.add_argument("-hps_ckpt", default="")
    ap.add_argument("-loop_smpl", type=int, default=100)
    ap.add_argument("-loop_cloth", type=int, default=200)
    ap.add_argument("-patience", type=int, default=5)
    ap.add_argument("-mcube_res", type=int, default=256)
    ap.add_argument("-img_size", type=int, default=512,
                    help="working resolution for crops/renders/refinement")
    ap.add_argument("-export_video", action="store_true")
    ap.add_argument("-num_devices", type=int, default=1,
                    help="point-shard the occupancy queries over an "
                    "n-device 1-D mesh (SURVEY §2.4 inference point "
                    "parallelism); 1 = single-chip")
    ap.add_argument("-no_remesh", action="store_true")
    ap.add_argument("-allow_random_hps", action="store_true",
                    help="proceed with a random-init HPS (smoke tests only; "
                    "the fits are meaningless)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from icon_tpu.utils.jax_cache import enable as _enable_cache
    _enable_cache()   # persist XLA compilations across demo invocations

    from icon_tpu.config import load_config
    from icon_tpu.data.render_dataset import make_calib
    from icon_tpu.data.test_dataset import TestDataset
    from icon_tpu.infer.refine import refine_cloth, refine_smpl_live
    from icon_tpu.models.hgpifu import HGPIFuNet
    from icon_tpu.ops.raster import vertex_visibility
    from icon_tpu.ops.remesh import remesh
    from icon_tpu.recon.engine import (ReconEngine,
                                       reconstruction_resolutions)
    from icon_tpu.recon.export import extract_mesh, make_marcher
    from icon_tpu.render.camera import verts_to_ndc
    from icon_tpu.render.render import query_color, render_normal
    from icon_tpu.training.checkpoints import (load_checkpoint,
                                               partial_warm_start)
    from icon_tpu.utils.io import clean_mesh, save_obj

    cfg = load_config(args.config_file).replace(test_mode=False,
                                                mcube_res=args.mcube_res)
    net = HGPIFuNet(cfg)

    dataset = TestDataset(args.in_dir, hps_type=args.hps_type,
                          hps_ckpt=args.hps_ckpt, seg_dir=args.seg_dir,
                          icon_size=args.img_size,
                          allow_random_hps=args.allow_random_hps)
    if len(dataset) == 0:
        raise SystemExit(f"no images in {args.in_dir}")
    os.makedirs(args.out_dir, exist_ok=True)

    calib8 = make_calib(0.0)
    calib = jnp.asarray((calib8[4:8] @ calib8[:4])[None])  # render->calib

    variables = None
    # point-sharded recon (SURVEY §2.4): the engine's per-level point
    # buffers pad to the mesh size and shard_map splits the N axis across
    # devices; XLA all-gathers the per-device occupancy slices back
    mesh = None
    if args.num_devices > 1:
        from icon_tpu.parallel.mesh import make_mesh
        if len(jax.devices()) < args.num_devices:
            raise SystemExit(
                f"-num_devices {args.num_devices} but only "
                f"{len(jax.devices())} devices visible")
        mesh = make_mesh(args.num_devices)
        print(f"[infer] point-sharding recon over {mesh.size} devices")
        if cfg.net.norm_mlp == "group":
            print("[infer] WARNING: norm_mlp=group normalizes over the "
                  "point axis — sharded stats differ from single-device "
                  "(published ckpts use norm_mlp=batch, which is "
                  "shard-exact; see parallel.mesh.shard_query)")
    eng = ReconEngine(reconstruction_resolutions(args.mcube_res),
                      pad_multiple=mesh.size if mesh else 1)
    # one marcher across the run: autotuned buffers + the lattice wire
    # (~6x fewer bytes/frame over the tunneled host link than the
    # explicit indexed mesh the one-shot path transfers)
    marcher = make_marcher()

    for idx in range(len(dataset)):
        data = dataset[idx]
        name = data["name"]
        print(f"[infer] {name}")
        image = jnp.asarray(data["image"])
        body = dataset.hps.body
        body_faces = data["smpl_faces"]

        # precomputed fit overrides the HPS estimate when provided
        fit_path = osp.join(args.in_dir, f"{name}_smpl.npz")
        if osp.exists(fit_path):
            from icon_tpu.models.smplx.lbs import batch_rodrigues
            fit = np.load(fit_path)
            nb = body.num_joints - 1
            bp = np.asarray(batch_rodrigues(jnp.asarray(
                fit["body_pose"].reshape(-1, 3)))).reshape(1, -1, 3, 3)
            go = np.asarray(batch_rodrigues(jnp.asarray(
                fit["global_orient"].reshape(-1, 3)))).reshape(1, 1, 3, 3)
            init = {"betas": fit["betas"].reshape(1, -1).astype(np.float32),
                    "body_pose": bp[:, :nb].astype(np.float32),
                    "global_orient": go.astype(np.float32),
                    "trans": fit["transl"].reshape(3).astype(np.float32)}
            scale = float(fit["scale"]) if "scale" in fit else 1.0
        else:
            init = {"betas": data["betas"].astype(np.float32),
                    "body_pose": data["body_pose"].astype(np.float32),
                    "global_orient": data["global_orient"].astype(
                        np.float32),
                    "trans": data["trans"].astype(np.float32)}
            scale = float(data["scale"])

        if variables is None:
            import time as _time
            _t0 = _time.perf_counter()
            variables = _init_variables(net, image, body, body_faces, args)
            print(f"  init: {_time.perf_counter() - _t0:.1f}s", flush=True)

        def normal_fn(in_t):
            return net.apply(variables, in_t, False,
                             method=net.predict_normals)

        # --- SMPL body fitting ---
        fit_params = init
        fit_frames = []
        if args.loop_smpl > 0 and cfg.net.prior_type != "pifu":
            import time as _time
            _t0 = _time.perf_counter()
            (smpl_verts, (nmlF, nmlB), losses, fit_params,
             fit_frames) = refine_smpl_live(
                body, body_faces, image, init, normal_fn, scale,
                iters=args.loop_smpl, patience=args.patience,
                size=args.img_size, mask=jnp.asarray(data["mask"]),
                capture_every=max(args.loop_smpl // 20, 1)
                if args.export_video or args.loop_smpl > 1 else 0)
            print(f"  smpl fit: {losses[0]:.4f} -> {losses[-1]:.4f} "
                  f"({_time.perf_counter() - _t0:.1f}s)", flush=True)
            smpl_verts = jnp.asarray(smpl_verts)
            nmlF, nmlB = jnp.asarray(nmlF)[None], jnp.asarray(nmlB)[None]
        else:
            nb = init["body_pose"].shape[1]
            v0, _ = body.forward(
                betas=jnp.asarray(init["betas"]),
                global_orient=jnp.asarray(
                    init["global_orient"]).reshape(1, 9),
                body_pose=jnp.asarray(init["body_pose"]).reshape(1, nb * 9),
                pose2rot=False)
            smpl_verts = (v0[0] + jnp.asarray(init["trans"])[None]) * scale
            T_nF, _ = render_normal(smpl_verts, jnp.asarray(body_faces),
                                    size=args.img_size)
            T_nB, _ = render_normal(smpl_verts, jnp.asarray(body_faces),
                                    size=args.img_size, azimuth=180.0)
            nmlF, nmlB = normal_fn({"image": image[None],
                                    "T_normal_F": T_nF[None],
                                    "T_normal_B": T_nB[None]})

        # --- SMPL-fit artifacts (reference apps/infer.py:288-364):
        # the fitted body mesh, its parameters, the fit-progression gif,
        # and the input/cloth-normal overlap panel ---
        if cfg.net.prior_type != "pifu":
            save_obj(osp.join(args.out_dir, f"{name}_smpl.obj"),
                     np.asarray(smpl_verts) * np.array([1, -1, 1],
                                                       np.float32),
                     np.asarray(body_faces))
            np.save(osp.join(args.out_dir, f"{name}_smpl.npy"),
                    {"betas": np.asarray(fit_params["betas"]),
                     "pose": np.asarray(fit_params["body_pose"]),
                     "orient": np.asarray(fit_params["global_orient"]),
                     "trans": np.asarray(fit_params["trans"]),
                     "scale": scale},
                    allow_pickle=True)
            if fit_frames:
                from icon_tpu.utils.io import save_gif
                save_gif(osp.join(args.out_dir, f"{name}_smpl.gif"),
                         fit_frames, fps=2)
        _export_overlap(osp.join(args.out_dir, f"{name}_overlap.png"),
                        np.asarray(data["image"]), np.asarray(nmlF[0]),
                        np.asarray(data["mask"]))

        in_t = {"image": image[None], "normal_F": nmlF, "normal_B": nmlB}

        # --- implicit reconstruction ---
        features = net.apply(variables, in_t, False, method=net.filter)
        if cfg.net.prior_type == "icon":
            smpl_feat = _icon_feats(smpl_verts, body_faces, calib[0],
                                    lattice_res=eng.resolutions[-1])
        elif cfg.net.prior_type == "pamir":
            smpl_feat = _pamir_feats(smpl_verts, body, fit_params, scale,
                                     calib[0])
        else:
            smpl_feat = None

        def query_fn(pts):
            return net.apply(variables, features, pts, calib,
                             smpl_feat, False, method=net.query)[-1]

        if mesh is not None:
            from icon_tpu.parallel.mesh import shard_query
            with mesh:
                occ, stats = eng(shard_query(query_fn, mesh),
                                 jit_levels=True)
        else:
            occ, stats = eng(query_fn, jit_levels=True)
        for k, v in stats.items():
            if k.endswith("overflow") and int(v) > 0:
                print(f"  WARNING: recon {k}={int(v)} — geometry may be "
                      "lost; raise engine budgets")
        # extract_mesh restores the dropped-first-slice index internally
        # (recon/export.py), so only the engine's y-flip remains
        verts, faces = extract_mesh(occ, marcher=marcher)
        verts = verts * np.array([1, -1, 1], np.float32)
        if cfg.clean_mesh:
            verts, faces = clean_mesh(verts, faces)
        print(f"  recon: {len(verts)} verts, {len(faces)} faces")
        save_obj(osp.join(args.out_dir, f"{name}_recon.obj"), verts, faces)

        # --- remesh (reference infer.py:402) ---
        if len(verts) and not args.no_remesh:
            verts, faces = remesh(verts, faces)
            print(f"  remesh: {len(verts)} verts, {len(faces)} faces")

        # --- cloth refinement ---
        recon_verts = verts                   # pre-refine copy for the video
        if args.loop_cloth > 0 and len(verts):
            refined_verts, closses = refine_cloth(
                verts, faces, nmlF[0], nmlB[0], iters=args.loop_cloth,
                size=args.img_size)
            print(f"  cloth refine: {closses[0]:.4f} -> {closses[-1]:.4f}")
            verts = refined_verts
            save_obj(osp.join(args.out_dir, f"{name}_refine.obj"),
                     verts, faces)

        # --- vertex colors + garments + turntable ---
        if len(verts):
            def colors_of(v):
                return np.asarray(query_color(
                    jnp.asarray(v), jnp.asarray(faces),
                    jnp.asarray(data["image"])))
            colors = colors_of(verts)
            save_obj(osp.join(args.out_dir, f"{name}_recon_color.obj"),
                     verts, faces, colors)
            if args.seg_dir is not None:
                _extract_garments(args, name, verts, faces,
                                  np.asarray(smpl_verts), body_faces)
            if args.export_video:
                _export_turntable_video(
                    osp.join(args.out_dir, f"{name}_cloth.mp4"),
                    np.asarray(data["image"]), np.asarray(nmlF[0]),
                    [(recon_verts, colors_of(recon_verts)),
                     (verts, colors)] if recon_verts is not verts
                    else [(verts, colors)],
                    faces)
    print("[infer] done")


def _init_variables(net, image, body, body_faces, args):
    import jax
    import jax.numpy as jnp
    from icon_tpu.training.checkpoints import (load_checkpoint,
                                               partial_warm_start)
    # init at a tiny spatial size: conv/BN parameter shapes are
    # size-agnostic, and tracing the full 512^2 forward just to create
    # params costs a multi-minute cold compile on a tunneled device
    small = jnp.zeros((1, 64, 64, image.shape[-1]), image.dtype)
    init_batch = {
        "image": small,
        "T_normal_F": small,
        "T_normal_B": small,
        "sample": jnp.zeros((1, 8, 3)), "calib": jnp.eye(4)[None]}
    if net.cfg.net.prior_type == "icon":
        # zero placeholders with the right SHAPES: init only traces, and
        # computing real _icon_feats here dispatched ~60 eager ops whose
        # individual compiles bloat the remote compile service before the
        # big network modules get their turn
        V = int(body.v_template.shape[0])
        F = int(np.asarray(body_faces).shape[0])
        init_batch.update({
            "smpl_verts": jnp.zeros((1, V, 3)),
            "smpl_faces": jnp.zeros((F, 3), jnp.int32),
            "smpl_cmap": jnp.zeros((1, V, 3)),
            "smpl_vis": jnp.zeros((1, V, 1)),
            "smpl_vf_table": jnp.zeros((V, 8), jnp.int32),
        })
        init_batch["sample"] = jnp.zeros((1, 8, 3))
    elif net.cfg.net.prior_type == "pamir":
        init_batch["voxel_verts"] = jnp.zeros((1, 8000, 3))
        init_batch["voxel_codes"] = jnp.zeros((8000, 3))
    variables = jax.jit(lambda k, b: net.init(k, b, train=False))(
        jax.random.PRNGKey(0), init_batch)
    import os.path as osp
    # published torch checkpoints (icon-filter.ckpt / normal.ckpt ...) are
    # single FILES; our own orbax checkpoints are DIRECTORIES. Torch files
    # go through the twin-proven converter (utils/torch_port.py:
    # port_icon_checkpoint; reference lib/dataset/mesh_util.py:187-237 +
    # the netG->normal_filter rename of apps/train.py:201-218).
    torch_geo = args.ckpt if args.ckpt and osp.isfile(args.ckpt) else None
    torch_nrm = (args.normal_ckpt
                 if args.normal_ckpt and osp.isfile(args.normal_ckpt)
                 else None)
    if torch_geo or torch_nrm:
        from icon_tpu.utils.torch_port import (load_torch_state,
                                               port_icon_checkpoint,
                                               scope_summary)
        params, stats, log = port_icon_checkpoint(
            variables["params"],
            icon_state=load_torch_state(torch_geo) if torch_geo else None,
            normal_state=load_torch_state(torch_nrm) if torch_nrm else None)
        variables = dict(variables)
        variables["params"] = params
        if stats:
            variables["batch_stats"] = partial_warm_start(
                variables.get("batch_stats", {}), stats)
        print(f"  ported {len(log)} torch tensors "
              f"({'geometry ' if torch_geo else ''}"
              f"{'normal' if torch_nrm else ''})", flush=True)
        # per-scope landing check: every ported scope should show a trained
        # (non-init) weight norm (torch_port.scope_summary)
        for line in scope_summary(params):
            print(f"    {line}", flush=True)
    for ck, rename in ((args.ckpt, None),
                       (args.normal_ckpt, {"netG": "normal_filter"})):
        if ck and osp.isdir(ck):
            loaded = load_checkpoint(ck)
            variables = dict(variables)
            variables["params"] = partial_warm_start(
                variables["params"], loaded["params"], rename)
    return variables


def _icon_feats(smpl_verts, body_faces, calib, lattice_res=None):
    """SMPL-local features in calib space (reference compute_vis_cmap,
    apps/ICON.py:317-333)."""
    import jax.numpy as jnp
    import numpy as np
    from icon_tpu.ops.projection import project
    from icon_tpu.ops.raster import vertex_visibility
    from icon_tpu.ops.sdf_fast import (build_ray_bins,
                                       build_vertex_face_table)
    from icon_tpu.models.smplx.assets import SMPLX, get_smpl_model
    import os.path as osp

    v_cal = project(smpl_verts[None], jnp.asarray(calib)[None])[0]
    vis = vertex_visibility(v_cal, jnp.asarray(body_faces))

    reg = SMPLX()
    n = smpl_verts.shape[0]
    cmap = None
    if osp.exists(reg.cmap_vert_path):
        if len(reg.cmap) == n:                       # SMPL-X body (pixie)
            cmap = jnp.asarray(reg.cmap)
        elif osp.exists(reg.smpl_verts_path) and \
                osp.exists(reg.smplx_verts_path) and \
                len(reg.smpl_verts) == n:            # SMPL body (pymaf/...)
            # remap through the nearest-smplx-vertex correspondence so a
            # trained ICON net sees in-distribution cmap features
            # (reference apps/ICON.py:322-326 cmap_smpl_vids)
            cmap = jnp.asarray(reg.cmap_smpl_vids("smpl"))
    if cmap is None:
        vmin = v_cal.min(axis=0)
        vmax = v_cal.max(axis=0)
        cmap = (v_cal - vmin) / jnp.maximum(vmax - vmin, 1e-6)
    vf = build_vertex_face_table(np.asarray(body_faces),
                                 smpl_verts.shape[0])
    _rb, _rg = build_ray_bins(np.asarray(v_cal),
                              np.asarray(body_faces))
    extra = {}
    if lattice_res is not None:
        # demo calib is axis-aligned ortho, so engine queries project onto
        # the recon lattice in calib space: rasterize per-column crossings
        # once (the serving sign path; point_body_features prefers it)
        from icon_tpu.ops.sdf_fast import (build_column_bins,
                                           build_crossing_columns_blocked)
        import jax
        cxn = np.linspace(-1.0, 1.0, lattice_res, dtype=np.float32)
        cyn = np.linspace(1.0, -1.0, lattice_res, dtype=np.float32)
        # compact tiles: only occupied lattice tiles run the crossing math
        cb, cm, tids = build_column_bins(np.asarray(v_cal),
                                         np.asarray(body_faces), cxn, cyn,
                                         compact=True)
        cz, _cnt = jax.jit(build_crossing_columns_blocked,
                           static_argnames=("max_cross", "G"))(
            jnp.asarray(v_cal), jnp.asarray(body_faces), jnp.asarray(cb),
            jnp.asarray(cm), jnp.asarray(cxn), jnp.asarray(cyn),
            tile_ids=jnp.asarray(tids))
        h = (lattice_res - 1) / 2.0
        extra = {
            "smpl_cross_z": cz,
            "smpl_cross_meta": jnp.asarray(
                [-1.0, 1.0, h, -h, float(lattice_res),
                 float(lattice_res)], jnp.float32),
        }
    return {
        **extra,
        "smpl_verts": v_cal[None],
        "smpl_faces": jnp.asarray(body_faces),
        "smpl_cmap": cmap[None],
        "smpl_vis": vis[None],
        "smpl_vf_table": jnp.asarray(vf),
        # exact in-net sign (check_sign semantics via ray parity;
        # ops/sdf_fast.py)
        "smpl_ray_bins": jnp.asarray(_rb),
        "smpl_ray_grid": jnp.asarray(_rg),
    }


def _pamir_feats(smpl_verts, body, fit_params, scale, calib):
    """PaMIR voxel features for the demo (reference apps/infer.py:379-388 ->
    TestDataset.compute_voxel_verts): TetraSMPL surface+interior vertices
    posed with the optimized fit when the tedra assets are installed,
    otherwise the fitted surface itself; padded to the training-time count,
    projected to calib space and halved (PIFuDataset.py:466-481)."""
    import os.path as osp
    import jax.numpy as jnp
    import numpy as np
    from icon_tpu.models.smplx.assets import SMPLX
    from icon_tpu.ops.projection import project

    reg = SMPLX()
    tetra_model = osp.join(reg.model_dir, "smpl", "SMPL_MALE.pkl")
    tetra_add = osp.join(reg.tedra_dir, "tetra_male_adult_smpl.npz")
    if osp.exists(tetra_model) and osp.exists(tetra_add):
        from icon_tpu.models.smplx.tetra import load_tetra_body_model
        model, _ = load_tetra_body_model(tetra_model, tetra_add)
        bp = np.asarray(fit_params["body_pose"], np.float32)  # [1,J-1,3,3]
        pose = np.broadcast_to(np.eye(3, dtype=np.float32),
                               (1, 23, 3, 3)).copy()
        nb = min(bp.shape[1], 23)     # SMPL-X HPS (pixie) has 21 body joints
        pose[:, :nb] = bp[:, :nb]
        go = np.asarray(fit_params["global_orient"],
                        np.float32).reshape(1, 9)
        betas = np.asarray(fit_params["betas"], np.float32)[:, :10]
        verts, _ = model.forward(
            betas=jnp.asarray(betas),
            global_orient=jnp.asarray(go),
            body_pose=jnp.asarray(pose.reshape(1, 23 * 9)),
            pose2rot=False)
        trans = np.asarray(fit_params["trans"], np.float32).reshape(1, 3)
        verts = (np.asarray(verts[0]) + trans) * scale
        t = np.asarray(model.v_template)
        codes = (t - t.min(0)) / np.maximum(t.max(0) - t.min(0), 1e-6)
    else:
        verts = np.asarray(smpl_verts)
        t = np.asarray(body.v_template)[:len(verts)]
        codes = (t - t.min(0)) / np.maximum(t.max(0) - t.min(0), 1e-6)

    n = 8000                          # fixed count, datasets.load_smpl_voxel
    pad = max(n - len(verts), 0)
    verts = np.pad(verts[:n], ((0, pad), (0, 0)))
    codes = np.pad(codes[:n], ((0, pad), (0, 0)))
    v_proj = project(jnp.asarray(verts)[None], jnp.asarray(calib)[None]) * 0.5
    return {"voxel_verts": v_proj.astype(jnp.float32),
            "voxel_codes": jnp.asarray(codes.astype(np.float32))}


def _export_overlap(path, image, nmlF, mask):
    """Side-by-side [input | input blended with the predicted cloth normal
    over the person mask] (reference blend_rgb_norm + the _overlap.png
    export, apps/infer.py:326-348, lib/dataset/mesh_util.py:144-149)."""
    from PIL import Image

    def to_u8(x):
        return (np.clip(x * 0.5 + 0.5, 0.0, 1.0) * 255).astype(np.uint8)

    img = to_u8(image)
    norm = to_u8(nmlF)
    m = (np.asarray(mask) > 0.5).astype(np.uint8)[..., None]
    blend = img * (1 - m) + norm * m
    Image.fromarray(np.concatenate([img, blend], axis=1)).save(path)


def _export_turntable_video(path, image, nmlF, meshes, faces,
                            size=256, n_frames=360, fps=30):
    """Colored-mesh rotation video (reference get_rendered_video,
    lib/common/render.py:327-374): side panels (input photo, predicted
    front normal — the reference's `[ori_image, rgb_norm]`), then each mesh
    of ``meshes`` ([(verts, vertex_colors), ...], recon + refined) rotating
    a full turn on gray, written as mp4 at 30 fps. One jitted raster
    executable serves all frames; rotation is a host-side [V,3]@[3,3]."""
    import math

    import jax.numpy as jnp
    from PIL import Image

    from icon_tpu.render.render import make_turntable_renderer
    from icon_tpu.utils.io import save_video

    panels = []
    for img in (image, nmlF):
        p = np.clip(np.asarray(img) * 0.5 + 0.5, 0.0, 1.0)
        p8 = (p * 255).astype(np.uint8)
        panels.append(np.asarray(Image.fromarray(p8).resize((size, size))))

    faces = jnp.asarray(np.asarray(faces))
    renderers = [make_turntable_renderer(faces, jnp.asarray(c), size=size,
                                         K=128) for _, c in meshes]
    frames = []
    for i in range(n_frames):
        a = math.radians(i * 360.0 / n_frames)
        c_, s_ = math.cos(a), math.sin(a)
        rot = np.array([[c_, 0.0, -s_], [0.0, 1.0, 0.0], [s_, 0.0, c_]],
                       np.float32)
        row = list(panels)
        for (v, _), rend in zip(meshes, renderers):
            v_rot = np.asarray(v, np.float32) @ rot.T
            rgb = np.clip(np.asarray(rend(jnp.asarray(v_rot))), 0.0, 1.0)
            row.append((rgb * 255).astype(np.uint8))
        frames.append(np.concatenate(row, axis=1))
    save_video(path, frames, fps=fps)
    print(f"  video: {path} ({n_frames} frames)")


def _extract_garments(args, name, verts, faces, smpl_verts, smpl_faces):
    import json
    import os.path as osp
    seg_path = osp.join(args.seg_dir, f"{name}.json")
    if not osp.exists(seg_path):
        return
    from icon_tpu.ops.cloth_extraction import extract_cloth
    with open(seg_path) as f:
        segmentations = json.load(f)
    for seg in segmentations:
        garment = extract_cloth(verts, faces, seg)
        if garment is None:
            continue
        g_verts, g_faces = garment
        out = osp.join(args.out_dir,
                       f"{name}_{seg.get('type', 'garment')}.obj")
        from icon_tpu.utils.io import save_obj
        save_obj(out, g_verts, g_faces)
        print(f"  garment: {seg.get('type')} -> {len(g_verts)} verts")


if __name__ == "__main__":
    main()
