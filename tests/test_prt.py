"""PRT transport parity (reference lib/renderer/prt_util.py computePRT).

The production ``compute_prt`` integrates visibility x cosine x SH with
rasterized directional visibility (K depth buffers instead of V*K embree
rays). This test re-implements the reference algorithm literally — per
vertex, per direction, front-facing AND not intersecting the mesh
(Möller-Trumbore any-hit with the reference's delta*normal offset),
weighted by dot and the SH basis — over the SAME direction set, and
matches the two. Constant convention: the reference weights by 4*pi/N,
ours by 4/N (the pi is folded into the renderer's albedo), so the twin is
compared against ``compute_prt * pi``.

A second test pins the physical behavior PRT adds over analytic SH:
ambient-band transport darkens in a concavity and stays unshadowed on a
convex region.
"""

import numpy as np
import pytest

from icon_tpu.data.render_dataset import (compute_prt, fibonacci_sphere,
                                          sh_basis)
from icon_tpu.utils.synthetic import icosphere


def _vertex_normals_np(v, f):
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    vn = np.zeros_like(v)
    for i in range(3):
        np.add.at(vn, f[:, i], fn)
    return vn / (np.linalg.norm(vn, axis=1, keepdims=True) + 1e-12)


def _any_hit(origins, d, v, f):
    """Möller-Trumbore any-hit: [N] bool for N origins along direction d."""
    v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    e1, e2 = v1 - v0, v2 - v0                    # [F, 3]
    p = np.cross(d[None], e2)                    # [F, 3]
    det = (e1 * p).sum(1)                        # [F]
    ok = np.abs(det) > 1e-9
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    hit = np.zeros(len(origins), bool)
    # chunk over origins to bound the [N, F] temporaries
    for s in range(0, len(origins), 512):
        o = origins[s:s + 512]
        t_vec = o[:, None] - v0[None]            # [n, F, 3]
        u = (t_vec * p[None]).sum(-1) * inv[None]
        q = np.cross(t_vec, e1[None])
        w = (q * d[None, None]).sum(-1) * inv[None]
        t = (q * e2[None]).sum(-1) * inv[None]
        inside = (ok[None] & (u >= 0) & (w >= 0) & (u + w <= 1)
                  & (t > 1e-6))
        hit[s:s + 512] = inside.any(1)
    return hit


def _reference_prt(v, f, dirs):
    """prt_util.py computePRT with the given direction set (w = 4*pi/N)."""
    vn = _vertex_normals_np(v, f)
    delta = 1e-3 * (v.max(0) - v.min(0)).min()
    origins = v + delta * vn
    sh = sh_basis(dirs)                          # [K, 9]
    T = np.zeros((len(v), 9), np.float64)
    for k, d in enumerate(dirs):
        dots = vn @ d
        front = dots > 0.0
        nohit = ~_any_hit(origins, d.astype(np.float64), v, f)
        T += ((front & nohit) * dots)[:, None] * sh[k][None]
    return T * (4.0 * np.pi / len(dirs))


def _snowman():
    """Two fused spheres: deep crease at the neck (concave), open crown
    (convex)."""
    v1, f1 = icosphere(subdiv=3, radius=0.5)
    v2, f2 = icosphere(subdiv=3, radius=0.35)
    v2 = v2 + np.array([0.0, 0.62, 0.0], np.float32)
    v = np.concatenate([v1, v2]).astype(np.float32)
    f = np.concatenate([f1, f2 + len(v1)]).astype(np.int32)
    return v, f


@pytest.mark.slow
def test_prt_matches_reference_algorithm():
    v, f = _snowman()
    dirs = fibonacci_sphere(64)
    ref = _reference_prt(v.astype(np.float64), f, dirs.astype(np.float64))
    got = np.asarray(compute_prt(v, f, n_dirs=64, vis_res=512),
                     np.float64) * np.pi

    # ambient band (band 0 ~ integrated visibility-weighted cosine): the
    # only difference is raster- vs ray-visibility at grazing directions
    a_ref, a_got = ref[:, 0], got[:, 0]
    denom = np.abs(a_ref).mean()
    assert np.abs(a_got - a_ref).mean() / denom < 0.08, \
        f"ambient mismatch {np.abs(a_got - a_ref).mean() / denom:.3f}"
    # full 9-band transport agrees in the same norm
    assert np.abs(got - ref).mean() / np.abs(ref).mean() < 0.12
    # and per-vertex correlation is tight (same spatial structure)
    c = np.corrcoef(a_ref, a_got)[0, 1]
    assert c > 0.97, f"ambient correlation {c:.3f}"


@pytest.mark.slow
def test_prt_darkens_concavity_not_convex():
    v, f = _snowman()
    T = np.asarray(compute_prt(v, f, n_dirs=64, vis_res=512))
    vn = _vertex_normals_np(v.astype(np.float64), f)

    # unshadowed transport for comparison: same integral, visibility = 1
    dirs = fibonacci_sphere(64)
    sh = sh_basis(dirs)
    cos = np.clip(vn @ dirs.T, 0, None)          # [V, K]
    T_open = (cos @ sh) * (4.0 / len(dirs))

    ratio = T[:, 0] / np.maximum(T_open[:, 0], 1e-6)
    # neck crease: body-sphere vertices near the junction height
    neck = (v[:, 1] > 0.30) & (v[:, 1] < 0.48)
    # crown of the head: fully open sky
    crown = v[:, 1] > 0.9
    assert neck.sum() > 20 and crown.sum() > 10
    assert np.median(ratio[neck]) < 0.75, \
        f"concavity not shadowed: {np.median(ratio[neck]):.2f}"
    assert np.median(ratio[crown]) > 0.92, \
        f"open region wrongly shadowed: {np.median(ratio[crown]):.2f}"
