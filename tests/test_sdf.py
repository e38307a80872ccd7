"""Tests for point→mesh distance, winding-number sign, and cal_sdf_batch."""

import math

import numpy as np
import jax.numpy as jnp

from icon_tpu.ops.mesh import (barycentric_projection_weights, face_normals,
                               face_vertices, vertex_normals)
from icon_tpu.ops.sdf import cal_sdf_batch, check_inside, point_mesh_dist_winding

RNG = np.random.RandomState(1)


def make_cube():
    """Unit cube [-1,1]^3, 12 triangles, outward-oriented."""
    v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                 np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2],        # x = -1
        [4, 6, 7], [4, 7, 5],        # x = +1
        [0, 4, 5], [0, 5, 1],        # y = -1
        [2, 3, 7], [2, 7, 6],        # y = +1
        [0, 2, 6], [0, 6, 4],        # z = -1
        [1, 5, 7], [1, 7, 3],        # z = +1
    ], np.int32)
    return v, f


def brute_point_tri_dist(p, tri, res=400):
    """Approximate golden distance: dense barycentric sampling."""
    a = np.linspace(0, 1, res)
    b1, b2 = np.meshgrid(a, a)
    mask = (b1 + b2) <= 1.0
    b1, b2 = b1[mask], b2[mask]
    pts = ((1 - b1 - b2)[:, None] * tri[0] + b1[:, None] * tri[1] +
           b2[:, None] * tri[2])
    return np.sqrt(((pts - p) ** 2).sum(1).min())


def test_point_tri_distance_random_vs_dense_sampling():
    tris = RNG.randn(16, 3, 3).astype(np.float32)
    pts = RNG.randn(8, 3).astype(np.float32)
    d2, idx, _ = point_mesh_dist_winding(jnp.array(pts), jnp.array(tris),
                                         chunk=8)
    d = np.sqrt(np.asarray(d2))
    for i, p in enumerate(pts):
        golden = min(brute_point_tri_dist(p, t) for t in tris)
        assert abs(d[i] - golden) < 5e-3, (i, d[i], golden)


def test_point_mesh_distance_cube_analytic():
    v, f = make_cube()
    tris = np.asarray(face_vertices(jnp.array(v[None]), jnp.array(f)))[0]
    pts = np.array([
        [0.0, 0.0, 0.0],    # center: dist 1 to each face
        [2.0, 0.0, 0.0],    # outside +x: dist 1
        [0.0, 0.0, 0.5],    # inside: dist 0.5
        [2.0, 2.0, 2.0],    # outside corner: dist sqrt(3)
    ], np.float32)
    d2, _, wind = point_mesh_dist_winding(jnp.array(pts), jnp.array(tris))
    d = np.sqrt(np.asarray(d2))
    np.testing.assert_allclose(d, [1.0, 1.0, 0.5, math.sqrt(3)], atol=1e-5)
    w = np.abs(np.asarray(wind))
    assert w[0] > 0.5 and w[2] > 0.5      # inside
    assert w[1] < 0.5 and w[3] < 0.5      # outside


def test_check_inside_cube_batch():
    v, f = make_cube()
    pts = (RNG.rand(2, 200, 3).astype(np.float32) * 4 - 2)
    inside = np.asarray(check_inside(jnp.array(np.tile(v[None], (2, 1, 1))),
                                     jnp.array(f), jnp.array(pts)))
    golden = np.all(np.abs(pts) < 1.0, axis=-1)
    np.testing.assert_array_equal(inside, golden)


def test_vertex_normals_cube():
    v, f = make_cube()
    vn = np.asarray(vertex_normals(jnp.array(v[None]), jnp.array(f)))[0]
    # cube corner normals point diagonally outward; sign per octant
    expect = v / np.linalg.norm(v, axis=-1, keepdims=True)
    # area-weighted accumulation is not exactly the diagonal (faces are
    # triangulated asymmetrically), but each component must match in sign
    assert np.all(np.sign(vn) == np.sign(expect))
    np.testing.assert_allclose(np.linalg.norm(vn, axis=-1), 1.0, atol=1e-6)


def test_face_normals_outward():
    v, f = make_cube()
    fn = np.asarray(face_normals(jnp.array(v[None]), jnp.array(f)))[0]
    centers = v[f].mean(1)
    # outward: normal . center > 0
    assert np.all((fn * centers).sum(-1) > 0)


def test_barycentric_weights_reconstruct():
    tris = RNG.randn(32, 3, 3).astype(np.float32)
    b = RNG.rand(32, 3).astype(np.float32)
    b = b / b.sum(1, keepdims=True)
    pts = np.einsum("nk,nkd->nd", b, tris)
    w = np.asarray(barycentric_projection_weights(jnp.array(pts),
                                                  jnp.array(tris)))
    np.testing.assert_allclose(w, b, atol=2e-3)
    recon = np.einsum("nk,nkd->nd", w, tris)
    np.testing.assert_allclose(recon, pts, atol=2e-3)


def test_cal_sdf_batch_cube():
    v, f = make_cube()
    B = 2
    verts = jnp.array(np.tile(v[None], (B, 1, 1)))
    faces = jnp.array(f)
    cmaps = jnp.array(np.tile((v[None] + 1) / 2, (B, 1, 1)).astype(np.float32))
    vis = jnp.array((v[None, :, :1] > 0).astype(np.float32).repeat(B, 0))
    pts = np.array([[[0.0, 0.0, 0.5], [1.5, 0.0, 0.0]]], np.float32)
    pts = jnp.array(np.tile(pts, (B, 1, 1)))

    sdf, norm, cmap, visq = cal_sdf_batch(verts, faces, cmaps, vis, pts)
    sdf = np.asarray(sdf)
    # inside point: +0.5/sqrt(3); outside: -0.5/sqrt(3)
    np.testing.assert_allclose(sdf[:, 0, 0], 0.5 / math.sqrt(3), atol=1e-5)
    np.testing.assert_allclose(sdf[:, 1, 0], -0.5 / math.sqrt(3), atol=1e-5)
    assert norm.shape == (B, 2, 3) and cmap.shape == (B, 2, 3)
    assert visq.shape == (B, 2, 1)
    # closest face to [1.5,0,0] is x=+1 plane; its verts all have x=1 -> vis=1
    np.testing.assert_allclose(np.asarray(visq)[:, 1, 0], 1.0)
    # cmap at x=+1 face interpolates to x-channel == 1
    np.testing.assert_allclose(np.asarray(cmap)[:, 1, 0], 1.0, atol=1e-5)


def test_cal_sdf_normal_flip_convention():
    """The reference flips interpolated normals by (-1, 1, -1)
    (mesh_util.py:390); verify our output applies the same convention."""
    v, f = make_cube()
    verts = jnp.array(v[None])
    cmaps = jnp.zeros((1, 8, 3))
    vis = jnp.ones((1, 8, 1))
    pts = jnp.array([[[1.5, 0.0, 0.0]]])   # closest: +x face, normal (1,0,0)
    _, norm, _, _ = cal_sdf_batch(verts, jnp.array(f), cmaps, vis, pts)
    n = np.asarray(norm)[0, 0]
    # interpolated outward normal (1,0,0) flipped to (-1,0,0)
    assert n[0] < -0.5
