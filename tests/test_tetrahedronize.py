"""Tetra asset generation (apps/tetrahedronize.py) replaces the
reference's offline tetgen pipeline
(scripts/tetrahedronize_scripts/tedrahedronize.py)."""

import numpy as np
import jax.numpy as jnp


def _toy_body():
    from icon_tpu.models.smplx.body import synthetic_smplx_model
    model = synthetic_smplx_model(subdiv=3)
    v = np.asarray(model.v_template, np.float32)
    f = np.asarray(model.faces)
    return model, v, f


def test_tetrahedralize_fills_interior():
    from icon_tpu.apps.tetrahedronize import tetrahedralize
    from icon_tpu.ops.sdf_fast import ray_parity_inside_np
    _, v, f = _toy_body()
    added, tets = tetrahedralize(v, f)
    assert len(added) > 20            # a body has interior volume
    assert len(tets) > 100
    # every added node is strictly inside the surface
    assert ray_parity_inside_np(added, v, f).all()
    # tets index the concatenated vertex array and are non-degenerate
    assert tets.max() < len(v) + len(added)
    pts = np.concatenate([v, added])
    t = pts[tets]
    vol = np.einsum("ti,ti->t",
                    np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]),
                    t[:, 3] - t[:, 0])
    assert (np.abs(vol) > 1e-12).mean() > 0.95   # unconstrained Delaunay keeps a few surface slivers
    # total tet volume approximates the body volume (within 25%)
    rng = np.random.RandomState(0)
    probe = rng.uniform(v.min(0), v.max(0), (20000, 3)).astype(np.float32)
    box_vol = float(np.prod(v.max(0) - v.min(0)))
    body_vol = box_vol * ray_parity_inside_np(probe, v, f).mean()
    tet_vol = float(np.abs(vol).sum() / 6.0)
    assert abs(tet_vol - body_vol) < 0.25 * body_vol, (tet_vol, body_vol)


def test_tetra_npz_roundtrip(tmp_path):
    """The generated npz feeds the TetraSMPL loader layout: weights rows
    normalize, blend dirs interpolate, and the posed added nodes follow
    the body."""
    from icon_tpu.apps.tetrahedronize import build_tetra_npz
    model, v, f = _toy_body()
    J = model.lbs_weights.shape[1]
    weights = np.asarray(model.lbs_weights, np.float32)
    # synthetic per-vertex [V, 3, B] shape dirs + [V, 3, P] pose dirs
    rng = np.random.RandomState(0)
    shapedirs = rng.randn(len(v), 3, 4).astype(np.float32) * 0.01
    posedirs = rng.randn(len(v), 3, 6).astype(np.float32) * 0.01
    out = build_tetra_npz(v, f, weights, shapedirs, posedirs,
                          out_path=str(tmp_path / "tetra.npz"))
    A = len(out["v_template_added"])
    assert out["weights_added"].shape == (A, J)
    np.testing.assert_allclose(out["weights_added"].sum(1),
                               np.ones(A), atol=1e-5)
    assert out["shapedirs_added"].shape == (A, 3, 4)
    assert out["posedirs_added"].shape == (A, 3, 6)
    loaded = np.load(str(tmp_path / "tetra.npz"))
    assert set(loaded.files) >= {"v_template_added", "weights_added",
                                 "shapedirs_added", "posedirs_added",
                                 "tetrahedrons"}
