"""Iso-surface extraction tests: geometric accuracy, winding, watertightness."""

import numpy as np
import jax.numpy as jnp

from icon_tpu.recon.marching import dedup_triangle_soup, marching_tetrahedra


def sphere_occ(R, r=0.6):
    """Smooth occupancy: 0.5 level set is a sphere of radius r (grid coords
    centered at (R-1)/2, normalized [-1,1])."""
    g = np.linspace(-1, 1, R)
    z, y, x = np.meshgrid(g, g, g, indexing="ij")
    d = np.sqrt(x * x + y * y + z * z)
    # occupancy decays linearly through the surface -> exact lerp recovery
    return np.clip(0.5 + (r - d) * 2.0, 0.0, 1.0).astype(np.float32)


def to_normed(verts, R):
    return verts / (R - 1) * 2.0 - 1.0


def test_sphere_surface_accuracy():
    R = 65
    occ = jnp.array(sphere_occ(R))
    tv, tm, n_cells, n_tris = marching_tetrahedra(occ, 0.5,
                                                  max_cells=1 << 16,
                                                  max_tris=1 << 18)
    n_tris = int(n_tris)
    assert n_tris > 1000
    verts, faces = dedup_triangle_soup(np.asarray(tv), np.asarray(tm))
    assert len(faces) == n_tris - (n_tris - len(faces))  # sanity
    vn = to_normed(verts, R)
    rad = np.linalg.norm(vn, axis=1)
    # all surface vertices within a voxel of the true radius
    assert np.abs(rad - 0.6).max() < 2.0 / (R - 1), np.abs(rad - 0.6).max()
    # mean error much tighter (linear field -> near-exact interpolation)
    assert np.abs(rad - 0.6).mean() < 2e-3


def test_sphere_winding_outward():
    R = 33
    occ = jnp.array(sphere_occ(R))
    tv, tm, _, _ = marching_tetrahedra(occ, 0.5, max_cells=1 << 14,
                                       max_tris=1 << 16)
    verts, faces = dedup_triangle_soup(np.asarray(tv), np.asarray(tm))
    vn = to_normed(verts, R)
    tri = vn[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    centroid = tri.mean(1)
    # outward: normal . radial > 0 for (almost) all faces
    frac = ((n * centroid).sum(1) > 0).mean()
    assert frac > 0.999, frac


def test_sphere_watertight():
    R = 33
    occ = jnp.array(sphere_occ(R))
    tv, tm, _, _ = marching_tetrahedra(occ, 0.5, max_cells=1 << 14,
                                       max_tris=1 << 16)
    verts, faces = dedup_triangle_soup(np.asarray(tv), np.asarray(tm))
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    und = np.sort(edges, axis=1)
    _, counts = np.unique(und, axis=0, return_counts=True)
    assert np.all(counts == 2)     # closed 2-manifold: every edge in 2 faces


def test_overflow_counts_reported():
    R = 33
    occ = jnp.array(sphere_occ(R))
    tv, tm, n_cells, n_tris = marching_tetrahedra(occ, 0.5,
                                                  max_cells=64,  # too small
                                                  max_tris=128)
    assert int(n_cells) == 64 and int(n_tris) == 128  # clamped, not crashed


def test_overflow_totals_exceed_clamped():
    """n_cells_total / n_tris_total carry the TRUE counts so undersized
    buffers are detectable (engine levelN_overflow analog)."""
    from icon_tpu.recon.marching import marching_tetrahedra_indexed
    R = 33
    occ = jnp.array(sphere_occ(R))
    out = marching_tetrahedra_indexed(occ, 0.5, max_cells=64, max_tris=128,
                                      max_verts=256)
    assert int(out.n_cells_total) > int(out.n_cells)
    assert int(out.n_tris_total) > int(out.n_tris)
    # properly-sized buffers: totals agree with in-buffer counts
    ok = marching_tetrahedra_indexed(occ, 0.5, max_cells=1 << 14,
                                     max_tris=1 << 16, max_verts=1 << 15)
    assert int(ok.n_cells_total) == int(ok.n_cells)
    assert int(ok.n_tris_total) == int(ok.n_tris)


def test_coarse_candidate_overflow_reported():
    """Dropped mixed coarse cells must surface in n_cells_total."""
    from icon_tpu.ops.resize import resize3d_trilinear_align_corners
    from icon_tpu.recon.marching import marching_tetrahedra_indexed
    coarse = jnp.array(sphere_occ(33))
    fine = resize3d_trilinear_align_corners(
        coarse[None, ..., None], (65, 65, 65))[0, ..., 0]
    occ = fine[1:, 1:, 1:]
    out = marching_tetrahedra_indexed(occ, 0.5, max_cells=64,  # 8 coarse slots
                                      max_tris=128, max_verts=256,
                                      coarse_occ=coarse)
    assert int(out.n_cells_total) > int(out.n_cells)


def test_empty_grid():
    occ = jnp.zeros((17, 17, 17))
    tv, tm, n_cells, n_tris = marching_tetrahedra(occ, 0.5,
                                                  max_cells=256,
                                                  max_tris=512)
    assert int(n_tris) == 0 and not bool(tm.any())


def test_coarse_candidate_marching_matches_full():
    """Active cells derived from the coarse mixed mask must reproduce the
    full-scan marching exactly on an upsampled field (trilinear interp
    cannot cross iso outside mixed coarse cells)."""
    import numpy as np
    import jax.numpy as jnp
    from icon_tpu.ops.resize import resize3d_trilinear_align_corners
    from icon_tpu.recon.marching import (fetch_mesh,
                                         marching_tetrahedra_indexed)

    g = np.linspace(-1, 1, 65)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    coarse = jnp.asarray(1 / (1 + np.exp(-(0.6 - np.sqrt(
        (xx / 0.5) ** 2 + yy ** 2 + (zz / 0.4) ** 2)) * 10)).astype(
        np.float32))
    fine = resize3d_trilinear_align_corners(
        coarse[None, ..., None], (129, 129, 129))[0, ..., 0]
    occ = fine[1:, 1:, 1:]

    full = marching_tetrahedra_indexed(occ, 0.5, max_cells=1 << 16,
                                       max_tris=1 << 18, max_verts=1 << 17)
    fast = marching_tetrahedra_indexed(occ, 0.5, max_cells=1 << 16,
                                       max_tris=1 << 18, max_verts=1 << 17,
                                       coarse_occ=coarse)
    assert int(full.n_tris) == int(fast.n_tris)
    v1, f1 = fetch_mesh(full)
    v2, f2 = fetch_mesh(fast)
    assert len(v1) == len(v2)
    # same vertex set (order may differ): compare sorted
    s1 = np.sort(v1.view([("x", np.float32), ("y", np.float32),
                          ("z", np.float32)]).reshape(-1))
    s2 = np.sort(v2.view([("x", np.float32), ("y", np.float32),
                          ("z", np.float32)]).reshape(-1))
    assert (s1 == s2).all()


def test_async_pack_header_counts_and_overflow_retry():
    """AutoMarcher.pack never reads device scalars: the true counts ride a
    device-written header, stale-size packs report overflow, and unpack
    re-packs at full size so the mesh is never truncated."""
    import numpy as np
    import jax.numpy as jnp
    from icon_tpu.recon.marching import (AutoMarcher, fetch_mesh, pack_mesh,
                                         unpack_mesh)

    g = np.linspace(-1, 1, 33)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    small = jnp.asarray((np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) < 0.3)
                        .astype(np.float32))
    big = jnp.asarray((np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) < 0.85)
                      .astype(np.float32))

    m = AutoMarcher(max_cells=1 << 14, max_tris=1 << 16, max_verts=1 << 15,
                    use_coarse=False)
    out_small = m(small)
    ref_small = fetch_mesh(out_small)
    v, f = m.unpack(m.pack(out_small))          # first frame: full buffers
    assert len(v) == len(ref_small[0]) and len(f) == len(ref_small[1])

    # second frame: force stale-undersized pack sizes -> header reports
    # overflow; AutoMarcher.unpack must recover by re-packing at full size
    out_big = m(big)
    ref_big = fetch_mesh(out_big)
    tiny = pack_mesh(out_big, sizes=(64, 64), bucket=64)
    _, _, overflow = unpack_mesh(tiny, quantize=True, return_overflow=True)
    assert overflow, "undersized pack must report overflow via the header"
    token = (tiny, out_big, True)               # an AutoMarcher.pack token
    v2, f2 = m.unpack(token)
    assert len(v2) == len(ref_big[0]) and len(f2) == len(ref_big[1])
    q = np.round(ref_big[0] * 64) / 64          # 10.6 fixed-point grid coords
    assert np.abs(v2 - q).max() <= 1 / 128 + 1e-6

    # steady scene: hinted sizes fit, no overflow, bytes shrink vs full pack
    # (out_big itself was a one-frame march-buffer degrade on scene change,
    # so the steady frame is compared against its OWN full fetch)
    out_big2 = m(big)
    ref_big2 = fetch_mesh(out_big2)
    token2 = m.pack(out_big2)
    _, _, ovf2 = unpack_mesh(token2[0], quantize=True, return_overflow=True)
    assert not ovf2
    full_words = pack_mesh(out_big2)[0].shape[0]
    assert token2[0][0].shape[0] < full_words
    v3, f3 = m.unpack(token2)
    assert len(v3) == len(ref_big2[0]) and len(f3) == len(ref_big2[1])


def test_lattice_codec_matches_explicit_mesh():
    """The lattice wire format (edge ids + fractions + cells, faces rebuilt
    on host) must reproduce the explicit indexed mesh: identical vertex set
    up to u8 fraction quantization, identical face set."""
    import numpy as np
    import jax.numpy as jnp
    from icon_tpu.ops.resize import resize3d_trilinear_align_corners
    from icon_tpu.recon.marching import AutoMarcher, fetch_mesh

    g = np.linspace(-1, 1, 49)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    coarse = jnp.asarray(1 / (1 + np.exp(-(0.55 - np.sqrt(
        (xx / 0.6) ** 2 + (yy / 0.9) ** 2 + (zz / 0.35) ** 2)) * 8))
        .astype(np.float32))
    fine = resize3d_trilinear_align_corners(
        coarse[None, ..., None], (97, 97, 97))[0, ..., 0]

    for use_coarse in (False, True):
        ref_m = AutoMarcher(max_cells=1 << 15, max_tris=1 << 17,
                            max_verts=1 << 16, use_coarse=use_coarse,
                            slice_one=True)
        ref_out = ref_m(fine, coarse_occ=coarse if use_coarse else None)
        rv, rf = fetch_mesh(ref_out)

        lat = AutoMarcher(max_cells=1 << 15, max_tris=1 << 17,
                          max_verts=1 << 16, use_coarse=use_coarse,
                          slice_one=True, codec="lattice")
        for _ in range(2):   # second pass exercises hinted (bucketed) sizes
            out = lat(fine, coarse_occ=coarse if use_coarse else None)
            lv, lf = lat.unpack(lat.pack(out))

        assert len(lv) == len(rv), (len(lv), len(rv), use_coarse)
        assert len(lf) == len(rf), (len(lf), len(rf), use_coarse)
        # vertex streams are both sorted by edge id -> same order; coords
        # agree to the u8 fraction step (1/255 of an edge, <= sqrt(3)/255)
        assert np.abs(lv - rv).max() <= np.sqrt(3) / 255 + 1e-6
        # identical face sets (vertex indices refer to the same order)
        fs_r = set(map(tuple, np.sort(rf, axis=1).tolist()))
        fs_l = set(map(tuple, np.sort(lf, axis=1).tolist()))
        assert fs_r == fs_l


def test_virtual_upsample_marching_matches_materialized():
    """marching_lattice_virtual(coarse) must emit the same lattice codec as
    marching_lattice over the MATERIALIZED 2x align_corners upsample sliced
    by one: same vertex edge ids, fractions to interpolation ULP, same cell
    list, and an identical decoded mesh."""
    import jax
    from icon_tpu.ops.resize import resize3d_trilinear_align_corners
    from icon_tpu.recon.marching import (decode_lattice, marching_lattice,
                                         marching_lattice_virtual,
                                         pack_lattice)

    g = np.linspace(-1.0, 1.0, 33, dtype=np.float32)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(xx ** 2 * 1.15 + yy ** 2 * 0.8 + zz ** 2 * 1.3)
    field = 1.0 / (1.0 + np.exp(-(0.55 - r) * 9.0))
    coarse = jnp.asarray(field)

    fine = resize3d_trilinear_align_corners(
        coarse[None, ..., None], (65, 65, 65))[0, ..., 0]
    kw = dict(max_cells=1 << 15, max_verts=1 << 16)
    ref = jax.jit(lambda o, c: marching_lattice(o, coarse_occ=c, **kw))(
        fine[1:, 1:, 1:], coarse)
    vir = marching_lattice_virtual(coarse, **kw)

    nv, nc = int(ref.n_verts), int(ref.n_cells)
    assert nv > 500 and nc > 200
    assert int(vir.n_verts) == nv and int(vir.n_cells) == nc
    assert int(vir.n_cells_total) == int(ref.n_cells_total)
    np.testing.assert_array_equal(np.asarray(ref.vert_eid[:nv]),
                                  np.asarray(vir.vert_eid[:nv]))
    np.testing.assert_allclose(np.asarray(ref.vert_s[:nv]),
                               np.asarray(vir.vert_s[:nv]),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.cell_id[:nc]),
                                  np.asarray(vir.cell_id[:nc]))
    np.testing.assert_array_equal(np.asarray(ref.cell_bits[:nc]) & 0xFF,
                                  np.asarray(vir.cell_bits[:nc]) & 0xFF)

    v_r, f_r = decode_lattice(pack_lattice(ref), 64, 64)
    v_v, f_v = decode_lattice(pack_lattice(vir), 64, 64)
    assert v_r.shape == v_v.shape and f_r.shape == f_v.shape
    np.testing.assert_allclose(v_r, v_v, atol=1e-2)   # u8-quantized fracs
    np.testing.assert_array_equal(f_r, f_v)


def test_automarcher_virtual_mode():
    """AutoMarcher(virtual=True) drives the virtual kernel end to end with
    its bucket autotuning and lattice pack/unpack."""
    from icon_tpu.recon.marching import AutoMarcher

    g = np.linspace(-1.0, 1.0, 33, dtype=np.float32)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    field = ((xx ** 2 + yy ** 2 + zz ** 2) < 0.45).astype(np.float32)
    coarse = jnp.asarray(field)

    m = AutoMarcher(max_cells=1 << 15, max_verts=1 << 16, slice_one=True,
                    codec="lattice", virtual=True)
    for _ in range(2):                      # second call uses tuned buckets
        out = m(coarse)
        verts, faces = m.unpack(m.pack(out))
    assert len(verts) > 500 and len(faces) > 500
    # verts live on the fine lattice of the virtual upsample: 64^3 cells
    assert verts.min() >= 0.0 and verts.max() <= 64.0


def test_lattice_wire_v2_implicit_eid():
    """Wire v2 (implicit edge ids) must decode bit-identically to v1 on
    both the native and numpy paths, shrink the wire, and fall back to an
    explicit re-pack when the frame is truncated (alignment undefined)."""
    from icon_tpu import native
    from icon_tpu.recon.marching import (AutoMarcher, decode_lattice,
                                         marching_lattice, pack_lattice)

    g = np.linspace(-1, 1, 49)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt((xx / 0.6) ** 2 + (yy / 0.9) ** 2 + (zz / 0.35) ** 2)
    wob = 0.15 * np.sin(5 * xx) * np.cos(4 * yy)
    occ = jnp.asarray(
        (1 / (1 + np.exp(-(0.55 - r + wob) * 8))).astype(np.float32))
    out = marching_lattice(occ, max_cells=1 << 15, max_verts=1 << 16)
    p1 = pack_lattice(out)
    p2 = pack_lattice(out, implicit_eid=True)
    nv = int(out.n_verts)
    assert nv > 2000
    # wire shrink: v2 drops the 4 B/vertex edge-id block
    assert p2[0].shape[0] <= p1[0].shape[0] - nv

    v1, f1 = decode_lattice(p1, 49, 49)
    v2, f2 = decode_lattice(p2, 49, 49)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(f1, f2)
    assert len(v1) == nv and len(f1) > 0

    if native.available():            # numpy fallback must agree too
        import unittest.mock as mock
        with mock.patch.object(native, "lattice_decode",
                               lambda *a, **k: None):
            v2n, f2n = decode_lattice(p2, 49, 49)
        np.testing.assert_array_equal(v1, v2n)
        np.testing.assert_array_equal(f1, f2n)

    # truncated v2 frame: decode refuses (alignment undefined) and reports
    # overflow; AutoMarcher.unpack recovers via the explicit full re-pack
    tiny = pack_lattice(out, sizes=(64, 64), bucket=64, implicit_eid=True)
    ev, ef, ovf = decode_lattice(tiny, 49, 49, return_overflow=True)
    assert ovf and len(ev) == 0 and len(ef) == 0
    m = AutoMarcher(max_cells=1 << 15, max_verts=1 << 16, codec="lattice")
    m._dims = (49, 49)
    vr, fr = m.unpack((tiny, out, (49, 49)))
    np.testing.assert_array_equal(v1, vr)
    np.testing.assert_array_equal(f1, fr)


def test_extract_mesh_marcher_matches_indexed():
    """extract_mesh with a persistent lattice marcher (the serving path the
    demo/eval CLIs hold across frames) must reproduce the one-shot indexed
    extraction: same vertex count and normalized coords up to the u8
    fraction step, identical face set."""
    from icon_tpu.recon.export import extract_mesh, make_marcher

    g = np.linspace(-1, 1, 65, dtype=np.float32)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt((xx / 0.7) ** 2 + (yy / 0.9) ** 2 + (zz / 0.5) ** 2)
    occ = jnp.asarray((1 / (1 + np.exp(-(0.6 - r) * 10))).astype(np.float32))

    v_ref, f_ref = extract_mesh(occ, max_cells=1 << 15, max_tris=1 << 17)
    m = make_marcher(max_cells=1 << 15, max_tris=1 << 17)
    for _ in range(2):              # second frame exercises tuned buckets
        v_lat, f_lat = extract_mesh(occ, marcher=m)
    assert len(v_lat) == len(v_ref) and len(f_lat) == len(f_ref)
    # both vertex streams are sorted by lattice edge id; normalized coords
    # agree to the u8 fraction step (1/255 edge over a 64-cell half-width)
    assert np.abs(v_lat - v_ref).max() <= np.sqrt(3) / 255 / 32 + 1e-6
    fs_r = set(map(tuple, np.sort(f_ref, axis=1).tolist()))
    fs_l = set(map(tuple, np.sort(f_lat, axis=1).tolist()))
    assert fs_r == fs_l
    assert f_lat.dtype == np.int64 and f_ref.dtype == np.int64
