"""Offline training-dataset generation (reference scripts/render_single.py +
lib/renderer GL stack, rebuilt on the in-repo tile rasterizer).

Per subject and view azimuth this writes the exact on-disk layout
``PIFuDataset`` consumes (docs/dataset.md)::

    {root}/{dataset}_{R}views/{subject}/
        calib/{y:03d}.txt          extrinsic (4x4) stacked over intrinsic
        render/{y:03d}.png         SH-lit RGBA render of the scan
        normal_F|normal_B/{y:03d}.png    scan normals (view frame)
        T_normal_F|T_normal_B/{y:03d}.png  SMPL body normals
        vis/{y:03d}.npy            per-SMPL-vertex visibility

Conventions (mirroring render_single.py:144-239):

- view y rotates the mesh about the world y axis; the camera is orthographic.
- the **back** images are inverse-depth renders — same camera, farthest
  surface wins the z-test (the reference flips near/far, :217-222) — so
  normal_B is pixel-aligned with normal_F.
- ``render`` uses a random spherical-harmonics light per view
  (:169-180); here as order-2 SH irradiance on vertex normals (the
  analytic part of prt_util.py's PRT, without self-shadowing transport).
"""

from __future__ import annotations

import math
import os
import os.path as osp
from typing import Optional, Sequence, Tuple

import numpy as np


def make_calib(azimuth_deg: float, scale: float = 1.0) -> np.ndarray:
    """8x4 calib file contents: extrinsic(4x4) over intrinsic(4x4).

    ``intrinsic @ extrinsic`` maps world verts (y up, [-1,1] box) to the
    rasterizer NDC frame: x right, y down, smaller z closer (see
    icon_tpu/render/camera.py:verts_to_ndc — the same [1,-1,-1] flip)."""
    a = math.radians(azimuth_deg)
    c, s = math.cos(a), math.sin(a)
    extrinsic = np.array([[c, 0, -s, 0],
                          [0, 1, 0, 0],
                          [s, 0, c, 0],
                          [0, 0, 0, 1]], np.float32)
    intrinsic = np.diag([scale, -scale, -scale, 1.0]).astype(np.float32)
    return np.concatenate([extrinsic, intrinsic], axis=0)


# order-2 SH basis (9 coeffs) — prt_util.py's analytic irradiance terms
_SH_C = np.array([0.282095, 0.488603, 0.488603, 0.488603, 1.092548,
                  1.092548, 0.315392, 1.092548, 0.546274], np.float32)


def sh_basis(n: np.ndarray) -> np.ndarray:
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    return np.stack([
        np.ones_like(x) * _SH_C[0],
        _SH_C[1] * y, _SH_C[2] * z, _SH_C[3] * x,
        _SH_C[4] * x * y, _SH_C[5] * y * z,
        _SH_C[6] * (3 * z * z - 1), _SH_C[7] * x * z,
        _SH_C[8] * (x * x - y * y)], axis=-1)


def random_sh(rng: np.random.RandomState) -> np.ndarray:
    """A plausible random environment: ambient + dominant directional."""
    sh = np.zeros((9, 3), np.float32)
    sh[0] = 2.4 + 0.8 * rng.rand(3)
    d = rng.randn(3)
    d /= np.linalg.norm(d)
    sh[1:4] = (0.3 + 0.4 * rng.rand()) * np.array(
        [d[1], d[2], d[0]], np.float32)[:, None]
    sh[4:] = 0.1 * (rng.rand(5, 3) - 0.5)
    return sh


def fibonacci_sphere(n: int) -> np.ndarray:
    """[n, 3] near-uniform unit directions."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.sin(phi) * np.cos(theta),
                     np.sin(phi) * np.sin(theta),
                     np.cos(phi)], -1).astype(np.float32)


def compute_prt(verts: np.ndarray, faces: np.ndarray,
                n_dirs: int = 64, vis_res: int = 512) -> np.ndarray:
    """Per-vertex diffuse PRT transport [V, 9] with self-shadowing
    (reference prt_util.py computePRT, which Monte-Carlo integrates
    visibility x cosine x SH over embree rays).

    TPU-native formulation: instead of per-vertex ray casts, render a depth
    buffer from each of ``n_dirs`` directions with the tile rasterizer and
    shadow-map-test every vertex against it (PCF-filtered point visibility,
    ops/raster.py:vertex_visibility_depth) — K rasterizations instead of
    V*K rays. T_lm = (4/K) sum_k vis_k cos+ Y_lm(d_k); the constant matches
    the analytic ``sh_basis(n) @ sh`` path at the ambient band for
    unshadowed surfaces, so PRT renders sit in the same exposure range
    while concavities (armpits, chin, folds) darken correctly. Correlates
    0.9995 with the literal ray-cast algorithm (tests/test_prt.py)."""
    import jax.numpy as jnp
    from icon_tpu.ops.mesh import vertex_normals
    from icon_tpu.ops.raster import vertex_visibility_depth

    v = jnp.asarray(verts)
    f = jnp.asarray(faces)
    vn = np.asarray(vertex_normals(v[None], f)[0])
    dirs = fibonacci_sphere(n_dirs)
    V = len(verts)
    T = np.zeros((V, 9), np.float32)
    flip = np.array([1, -1, -1], np.float32)
    for d in dirs:
        # orthonormal frame with +z = d; rasterizer looks along smaller-z
        z = d
        up = np.array([0.0, 1.0, 0.0], np.float32)
        if abs(np.dot(up, z)) > 0.95:
            up = np.array([1.0, 0.0, 0.0], np.float32)
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z]).astype(np.float32)      # world -> view
        ndc = (verts @ R.T) * flip
        vis = np.asarray(vertex_visibility_depth(jnp.asarray(ndc), f,
                                                 res=vis_res))
        cos = np.maximum(vn @ d, 0.0)
        T += (vis * cos)[:, None] * sh_basis(d)[None]
    return T * (4.0 / n_dirs)


def _save_png(path: str, rgb01: np.ndarray, mask01: np.ndarray) -> None:
    from PIL import Image
    os.makedirs(osp.dirname(path), exist_ok=True)
    rgba = np.concatenate([np.clip(rgb01, 0, 1),
                           np.clip(mask01[..., None], 0, 1)], axis=-1)
    Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(path)


def render_subject_views(out_dir: str,
                         scan_verts: np.ndarray, scan_faces: np.ndarray,
                         smpl_verts: Optional[np.ndarray],
                         smpl_faces: Optional[np.ndarray],
                         rotations: Sequence[int],
                         size: int = 512,
                         seed: int = 0,
                         with_light: bool = True,
                         prt: Optional[np.ndarray] = None,
                         vis_res: Optional[int] = None) -> None:
    """Render all views of one subject into ``out_dir`` (the
    ``{dataset}_{R}views/{subject}`` folder). Verts are in world units that
    the calib scale maps into [-1, 1] (i.e. already normalized scans).

    ``prt``: optional [V, 9] self-shadow transport from :func:`compute_prt`
    — the render images then use PRT irradiance (concavities darken)
    instead of analytic SH on normals. ``vis_res`` overrides the SMPL
    visibility raster resolution (the reference uses 4096^2,
    mesh_util.py:295)."""
    import jax.numpy as jnp
    from icon_tpu.ops.mesh import vertex_normals
    from icon_tpu.ops.raster import rasterize, vertex_visibility
    from icon_tpu.render.camera import view_matrix

    rng = np.random.RandomState(seed)
    sv = jnp.asarray(scan_verts)
    sf = jnp.asarray(scan_faces)
    s_vn = vertex_normals(sv[None], sf)[0]
    if smpl_verts is not None:
        bv = jnp.asarray(smpl_verts)
        bf = jnp.asarray(smpl_faces)
        b_vn = vertex_normals(bv[None], bf)[0]

    for y in rotations:
        calib8 = make_calib(y)
        cpath = osp.join(out_dir, "calib", f"{y:03d}.txt")
        os.makedirs(osp.dirname(cpath), exist_ok=True)
        np.savetxt(cpath, calib8)
        calib = calib8[4:8] @ calib8[:4]

        R = jnp.asarray(view_matrix(y))
        flip = jnp.asarray(np.array([1, -1, -1], np.float32))

        def ndc_of(v):
            return (v @ R.T) * flip

        def view_normals(vn):
            # view frame: x right, y up, z toward viewer (reference normal
            # shader frame; images store (n+1)/2)
            return vn @ R.T

        s_ndc = ndc_of(sv)
        s_nv = view_normals(s_vn)
        sh = random_sh(rng) if with_light else None

        # PRT: per-vertex irradiance for this view's light, interpolated by
        # the rasterizer alongside the normals (one pass, 6-channel attr)
        s_attr = s_nv
        if prt is not None and sh is not None:
            irr_v = jnp.asarray(np.clip(prt @ sh, 0, None))
            s_attr = jnp.concatenate([s_nv, irr_v], axis=-1)

        for suffix, zsign in (("F", 1.0), ("B", -1.0)):
            ndc = s_ndc * jnp.asarray(np.array([1, 1, zsign], np.float32))
            out = rasterize(ndc, sf, s_attr, H=size, W=size)
            attr = np.asarray(out.attr)
            nimg = attr[..., :3]
            mask = np.asarray(out.mask)
            _save_png(osp.join(out_dir, f"normal_{suffix}",
                               f"{y:03d}.png"), (nimg + 1) * 0.5, mask)
            if suffix == "F":
                albedo = np.full((size, size, 3), 0.75, np.float32)
                if prt is not None and sh is not None:
                    rgb = np.clip(albedo * attr[..., 3:6], 0, 1)
                elif sh is not None:
                    irr = sh_basis(nimg) @ sh          # [H, W, 3]
                    rgb = np.clip(albedo * irr, 0, 1)
                else:
                    rgb = (nimg + 1) * 0.5
                _save_png(osp.join(out_dir, "render", f"{y:03d}.png"),
                          rgb, mask)

        if smpl_verts is not None:
            b_ndc = ndc_of(bv)
            b_nv = view_normals(b_vn)
            for suffix, zsign in (("F", 1.0), ("B", -1.0)):
                ndc = b_ndc * jnp.asarray(
                    np.array([1, 1, zsign], np.float32))
                out = rasterize(ndc, bf, b_nv, H=size, W=size)
                _save_png(osp.join(out_dir, f"T_normal_{suffix}",
                                   f"{y:03d}.png"),
                          (np.asarray(out.attr) + 1) * 0.5,
                          np.asarray(out.mask))
            # per-view SMPL visibility (reference vis_single.py:42-64)
            # reference parity: 4096^2 visibility (mesh_util.py:295) —
            # measured 4.8% of vertices flip between 1024^2 and 4096^2 on
            # a posed body (silhouette faces too small to win a coarse
            # pixel); offline cost is fine, so default to exact
            vis = np.asarray(vertex_visibility(
                b_ndc, bf, res=vis_res or 4096))
            vpath = osp.join(out_dir, "vis", f"{y:03d}.npy")
            os.makedirs(osp.dirname(vpath), exist_ok=True)
            np.save(vpath, vis.astype(np.float32))
