"""Rasterizer correctness: coverage, z-order, interpolation, gradients,
visibility."""

import numpy as np
import jax
import jax.numpy as jnp

from icon_tpu.ops.raster import rasterize, vertex_visibility


def square_mesh(z=0.0, half=0.5, attr=(1.0, 0.0, 0.0)):
    """Two triangles covering [-half, half]^2 at depth z."""
    v = np.array([[-half, -half, z], [half, -half, z],
                  [half, half, z], [-half, half, z]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    a = np.tile(np.array(attr, np.float32)[None], (4, 1))
    return v, f, a


def test_coverage_fraction():
    v, f, a = square_mesh(half=0.5)
    out = rasterize(jnp.array(v), jnp.array(f), jnp.array(a), H=128, W=128,
                    K=16)
    # square covers 1/4 of NDC area
    frac = float(out.mask.mean())
    assert abs(frac - 0.25) < 0.01, frac
    assert int(out.bin_overflow) == 0


def test_zbuffer_orders_front_face():
    v1, f1, a1 = square_mesh(z=0.2, half=0.5, attr=(1, 0, 0))
    v2, f2, a2 = square_mesh(z=0.1, half=0.25, attr=(0, 1, 0))  # closer
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + 4])
    a = np.concatenate([a1, a2])
    out = rasterize(jnp.array(v), jnp.array(f), jnp.array(a), H=64, W=64,
                    K=16)
    img = np.asarray(out.attr)
    center = img[32, 32]
    np.testing.assert_allclose(center, [0, 1, 0], atol=1e-5)   # green wins
    edge = img[32, 20]   # inside big square only (x=-0.36)
    np.testing.assert_allclose(edge, [1, 0, 0], atol=1e-5)
    assert np.asarray(out.depth)[32, 32] == np.float32(0.1)


def test_barycentric_interpolation_linear():
    # single triangle with attr = x coordinate: interpolation must equal x
    v = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    a = v[:, :1].copy()    # attr = x
    out = rasterize(jnp.array(v), jnp.array(f), jnp.array(a), H=64, W=64,
                    K=4)
    mask = np.asarray(out.mask) > 0
    xs = (np.arange(64) + 0.5) / 64 * 2 - 1
    expect = np.tile(xs[None, :], (64, 1))
    got = np.asarray(out.attr)[..., 0]
    np.testing.assert_allclose(got[mask], expect[mask], atol=0.05)


def test_silhouette_soft_and_differentiable():
    v, f, a = square_mesh(half=0.4)

    def sil_sum(vv):
        out = rasterize(vv, jnp.array(f), jnp.array(a), H=64, W=64, K=8)
        return jnp.sum(out.silhouette)

    g = jax.grad(sil_sum)(jnp.array(v))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0   # growing the square grows coverage

    out = rasterize(jnp.array(v), jnp.array(f), jnp.array(a), H=64, W=64, K=8)
    sil = np.asarray(out.silhouette)
    assert sil.max() > 0.9 and sil.min() < 0.1


def test_attr_gradient_flows_to_vertices():
    v, f, a = square_mesh(half=0.6)

    def loss(vv):
        out = rasterize(vv, jnp.array(f), jnp.array(a), H=32, W=32, K=8)
        return jnp.mean(out.attr)

    g = jax.grad(loss)(jnp.array(v))
    assert np.isfinite(np.asarray(g)).all()


def test_vertex_visibility_occlusion():
    v1, f1, _ = square_mesh(z=0.5, half=0.8)           # back, big
    v2, f2, _ = square_mesh(z=0.1, half=0.3)           # front, small
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + 4])
    vis = np.asarray(vertex_visibility(jnp.array(v), jnp.array(f), res=256))
    # front square fully visible
    np.testing.assert_allclose(vis[4:, 0], 1.0)
    # back square corners visible (outside the small square's footprint)
    np.testing.assert_allclose(vis[:4, 0], 1.0)

    # now a back square fully covered by a bigger front square
    v3 = np.concatenate([square_mesh(z=0.5, half=0.2)[0],
                         square_mesh(z=0.1, half=0.6)[0]])
    vis3 = np.asarray(vertex_visibility(jnp.array(v3), jnp.array(f),
                                        res=256))
    np.testing.assert_allclose(vis3[:4, 0], 0.0)   # occluded
    np.testing.assert_allclose(vis3[4:, 0], 1.0)
