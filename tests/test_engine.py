"""Recon engine: octree refinement matches dense evaluation near the surface
and extracts the right geometry."""

import numpy as np
import pytest
import jax.numpy as jnp

from icon_tpu.recon.engine import (ReconEngine, default_budgets,
                                   reconstruction_resolutions)
from icon_tpu.recon.export import extract_mesh


def sphere_query(pts):
    """pts [1,N,3] world -> occupancy [1,N,1]; 0.5-level at radius 0.6."""
    d = jnp.linalg.norm(pts, axis=-1, keepdims=True)
    return jnp.clip(0.5 + (0.6 - d) * 4.0, 0.0, 1.0)


def test_resolution_ladder_matches_reference():
    assert reconstruction_resolutions(256) == (33, 65, 129, 257)
    assert reconstruction_resolutions(512) == (33, 65, 129, 257, 513)


def test_engine_matches_dense_near_surface():
    res = (17, 33, 65)
    eng = ReconEngine(res, faster=True)
    occ, stats = eng(sphere_query)
    assert occ.shape == (65, 65, 65)
    for k, v in stats.items():
        if "overflow" in k:
            assert int(v) == 0, (k, int(v))

    # dense reference at the refined (second-to-last) level, upsampled —
    # engine output must agree with dense-eval-everywhere on the >0.5 mask
    r = 65
    g = jnp.linspace(0, 1, r)
    zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
    from icon_tpu.recon.engine import _grid_to_world
    pts = jnp.stack([xx, yy, zz], -1).reshape(1, -1, 3)
    dense = sphere_query(_grid_to_world(pts)).reshape(r, r, r)
    inside_match = ((occ > 0.5) == (dense > 0.5)).mean()
    assert float(inside_match) > 0.995, float(inside_match)


def test_engine_mesh_radius():
    eng = ReconEngine((17, 33, 65), faster=True)
    occ, _ = eng(sphere_query)
    verts, faces = extract_mesh(occ)
    assert len(verts) > 400 and len(faces) > 800
    rad = np.linalg.norm(verts, axis=1)
    assert abs(np.mean(rad) - 0.6) < 0.04, np.mean(rad)


def test_engine_exact_mode_refines_last_level():
    eng = ReconEngine((17, 33), faster=False)
    occ, stats = eng(sphere_query)
    assert occ.shape == (33, 33, 33)
    assert "level1_points" in stats and int(stats["level1_points"]) > 0


def test_exact_mode_resolves_conflicts():
    """Exact mode re-examines neighborhoods of sign-flipping evaluations
    (reference seg3d_lossless.py:267-471) and must match a dense evaluation
    at least as well as faster mode on a thin feature."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from icon_tpu.recon.engine import ReconEngine

    axes = jnp.asarray(np.array([0.45, 0.7, 0.2], np.float32))

    def query_fn(pts):
        rad = jnp.linalg.norm(pts / axes, axis=-1, keepdims=True)
        return jax.nn.sigmoid((1.0 - rad) * 25.0)

    res = (33, 65)
    # dense ground truth at 65
    g = jnp.linspace(0.0, 1.0, 65)
    zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
    import icon_tpu.recon.engine as E
    pts01 = jnp.stack([xx, yy, zz], -1).reshape(1, -1, 3)
    dense = query_fn(E._grid_to_world(pts01)).reshape(65, 65, 65)
    dense_bits = dense > 0.5

    fast_eng = ReconEngine(res, faster=False)
    exact_eng = ReconEngine(res, exact=True)
    occ_f, _ = fast_eng(query_fn)
    occ_e, stats = exact_eng(query_fn)
    err_f = int(jnp.sum((occ_f > 0.5) != dense_bits))
    err_e = int(jnp.sum((occ_e > 0.5) != dense_bits))
    assert err_e <= err_f
    assert err_e <= 8, err_e            # near-lossless vs dense
    assert "level1_conflicts" in stats


def test_auto_budget_shrinks_and_recovers():
    """Auto-budget sizes buffers from the previous frame's counts and falls
    back to the configured cap after an overflow."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from icon_tpu.recon.engine import ReconEngine

    axes = jnp.asarray(np.array([0.4, 0.6, 0.25], np.float32))

    def q(pts):
        rad = jnp.linalg.norm(pts / axes, axis=-1, keepdims=True)
        return jax.nn.sigmoid((1.0 - rad) * 25.0)

    eng = ReconEngine((33, 65, 129), auto_budget=True)
    occ1, s1 = eng(q)
    b_default = eng.budgets[0]
    # second frame: bucket snaps to measured count x headroom
    b2 = eng._bucket(1)
    need = int(s1["level1_points"])
    assert b2 < b_default
    assert b2 >= need
    occ2, s2 = eng(q)
    # static scene: grids identical between bucket sizes
    assert float(jnp.abs(occ1 - occ2).max()) < 1e-6
    # overflow recovery: pretend last frame overflowed
    eng._last_counts[1] = jnp.asarray(10 ** 9, jnp.int32)
    assert eng._bucket(1) == b_default


def test_query_args_not_baked_into_cached_executables():
    """Per-frame tensors passed via ``query_args`` must flow through the
    cached level executables as real arguments: a second call with a
    different value has to change the field (a closure-captured tensor
    would be baked in as a constant at first trace and silently go
    stale)."""
    import jax.numpy as jnp
    from icon_tpu.recon.engine import ReconEngine

    eng = ReconEngine((9, 17, 33), budgets=(2048, 4096))

    def query_fn(pts, radius):
        d = jnp.linalg.norm(pts, axis=-1, keepdims=True)
        return (radius - d) * 4.0 + 0.5

    r1 = jnp.asarray(0.5, jnp.float32)
    occ1, _ = eng(query_fn, jit_levels=True, query_args=(r1,))
    r2 = jnp.asarray(0.75, jnp.float32)
    occ2, _ = eng(query_fn, jit_levels=True, query_args=(r2,))
    inside1 = float((occ1 > 0.5).mean())
    inside2 = float((occ2 > 0.5).mean())
    # a 1.5x larger sphere occupies ~3.4x the volume
    assert inside2 > 2.0 * inside1, (inside1, inside2)


@pytest.mark.slow
def test_exact_mode_converges_at_production_resolution():
    """Exact-mode parity with the reference's loop-until-empty conflict
    resolution (seg3d_lossless.py:388-471) at production resolution: on a
    257^3 posed-clothed-human field, 2 static conflict rounds leave ZERO
    residual side-flips at every level (VERDICT r4 #9)."""
    import jax.numpy as jnp
    from icon_tpu.recon.engine import ReconEngine
    from icon_tpu.utils.synthetic import clothed_human_occ

    def q(pts):
        return clothed_human_occ(pts)[..., None]

    eng = ReconEngine((33, 65, 129, 257), exact=True, conflict_rounds=2)
    occ, stats = eng(q, jit_levels=True)
    assert occ.shape == (257, 257, 257)
    for lv in (1, 2, 3):
        assert int(stats[f"level{lv}_overflow"]) == 0, \
            f"level {lv} budget overflow"
        assert int(stats[f"level{lv}_residual"]) == 0, (
            f"level {lv}: {int(stats[f'level{lv}_residual'])} residual "
            f"conflicts after {eng.conflict_rounds} rounds "
            f"(round conflicts: {int(stats[f'level{lv}_conflicts'])})")
