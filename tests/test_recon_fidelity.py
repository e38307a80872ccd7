"""Serving-path fidelity gate: engine + marching must stay geometrically
exact, not just fast.

Reconstructs the analytic posed-clothed-human field (the bench workload,
utils/synthetic.clothed_human_occ — |grad sdf| ~= 1 near the surface, so
the sdf evaluated at mesh vertices IS the point-to-surface error) through
the production chain: ReconEngine coarse-to-fine (faster mode, the
serving configuration) -> extract_mesh (marching tetrahedra + dedup).
Two pinned gates:

1. accuracy (P2S): |sdf(vertex)| — every extracted vertex sits on the true
   surface to sub-voxel precision;
2. completeness (chamfer direction surface->mesh): dense analytic surface
   samples must all have a nearby mesh vertex — catches silently dropped
   regions (budget/compaction bugs) that vertex-accuracy alone cannot see.

Thresholds are pinned from measured r4 values (see assertions) with ~2x
headroom; a perf-minded change that degrades recon quality trips this gate.
Reference analog: the benchmark-mode QA of apps/train.py:234-236.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

RES = 128


@pytest.fixture(scope="module")
def recon():
    import jax.numpy as jnp
    from icon_tpu.recon.engine import (ReconEngine,
                                       reconstruction_resolutions)
    from icon_tpu.recon.export import extract_mesh
    from icon_tpu.utils.synthetic import clothed_human_occ

    def query_fn(pts):
        return clothed_human_occ(pts)[..., None]

    eng = ReconEngine(reconstruction_resolutions(RES), faster=True)
    occ, stats = eng(query_fn, jit_levels=True)
    verts, faces = extract_mesh(occ, max_cells=1 << 18, max_tris=1 << 20)
    assert len(verts) > 5000, "reconstruction nearly empty"
    # extract_mesh normalizes grid indices straight to [-1,1]; the engine
    # queried the field through its B_MIN/B_MAX y-flip (engine.py:34-35),
    # so query-world y = -vertex y (the renderer/export path applies the
    # same flip, eval/test_loop.py:106)
    verts = np.asarray(verts) * np.array([1.0, -1.0, 1.0], np.float32)
    return verts, np.asarray(faces)


def test_vertex_accuracy_subvoxel(recon):
    from icon_tpu.utils.synthetic import clothed_human_sdf
    verts, _ = recon
    d = np.abs(np.asarray(clothed_human_sdf(verts)))
    voxel = 2.0 / RES
    # measured r4 at 128^3: mean 0.20 voxel, p99 0.63 voxel, max 0.89 voxel
    assert d.mean() < 0.5 * voxel, f"mean P2S {d.mean():.4f}"
    assert np.quantile(d, 0.99) < voxel, f"p99 {np.quantile(d, 0.99):.4f}"
    assert d.max() < 3.0 * voxel, f"max {d.max():.4f}"


def test_surface_coverage_complete(recon):
    """Every true-surface sample has a mesh vertex within 2 voxels."""
    from scipy.spatial import cKDTree
    from icon_tpu.utils.synthetic import clothed_human_sdf
    verts, _ = recon
    # dense analytic surface samples: near-surface grid points projected
    # along the numerical gradient onto the zero level
    g = np.linspace(-0.95, 0.95, 128).astype(np.float32)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([xx, yy, zz], -1).reshape(-1, 3)
    sd = np.asarray(clothed_human_sdf(pts))
    near = np.abs(sd) < 2.0 / RES
    surf = pts[near]
    eps = 1e-3
    for _ in range(3):      # Newton projection onto the zero level
        sd = np.asarray(clothed_human_sdf(surf))
        grad = np.stack([
            (np.asarray(clothed_human_sdf(surf + eps * np.eye(3)[i]))
             - np.asarray(clothed_human_sdf(surf - eps * np.eye(3)[i])))
            / (2 * eps) for i in range(3)], -1)
        grad /= np.linalg.norm(grad, axis=-1, keepdims=True) + 1e-9
        surf = surf - sd[:, None] * grad
    # keep only well-converged samples (folds bend the gradient slightly)
    ok = np.abs(np.asarray(clothed_human_sdf(surf))) < 2e-4
    surf = surf[ok]
    assert len(surf) > 10_000, "too few surface probes"

    dist, _ = cKDTree(verts).query(surf, k=1)
    voxel = 2.0 / RES
    # measured r4: p999 ~0.6 voxel; 2 voxels catches dropped patches
    assert np.quantile(dist, 0.999) < 2.0 * voxel, \
        f"p999 coverage {np.quantile(dist, 0.999):.4f}"
    assert dist.max() < 4.0 * voxel, f"max coverage gap {dist.max():.4f}"
