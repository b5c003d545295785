"""Closed-form unit tests for the intersection kernels
(semantics from reference sphere.rs / triangle.rs / aa_rect.rs /
constant_medium.rs / transform.rs / ray.rs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_tpu.ops import geometry as geo


def v(*xs):
    return jnp.asarray(np.array(xs, np.float32))


class TestSphere:
    def test_head_on_hit(self):
        hit = geo.sphere_t(v(0, 0, 0), v(0, 0, -1), v(0, 0, -5), jnp.float32(1.0), 1e-3, jnp.inf)
        assert bool(hit.mask)
        assert np.isclose(float(hit.t), 4.0, atol=1e-5)

    def test_miss(self):
        hit = geo.sphere_t(v(0, 0, 0), v(0, 1, 0), v(0, 0, -5), jnp.float32(1.0), 1e-3, jnp.inf)
        assert not bool(hit.mask)

    def test_inside_takes_far_root(self):
        # origin at center: root1 = -r < t_min, so root2 = +r is selected
        hit = geo.sphere_t(v(0, 0, -5), v(0, 0, -1), v(0, 0, -5), jnp.float32(2.0), 1e-3, jnp.inf)
        assert bool(hit.mask)
        assert np.isclose(float(hit.t), 2.0, atol=1e-5)

    def test_t_window_excludes(self):
        hit = geo.sphere_t(v(0, 0, 0), v(0, 0, -1), v(0, 0, -5), jnp.float32(1.0), 1e-3, 3.0)
        assert not bool(hit.mask)

    def test_batched_grid(self):
        ro = jnp.zeros((4, 1, 3))
        rd = jnp.tile(v(0, 0, -1)[None, None], (4, 1, 1))
        centers = jnp.asarray([[0, 0, -5], [0, 0, -9], [10, 0, 0]], jnp.float32)
        radii = jnp.asarray([1.0, 1.0, 1.0])
        hit = geo.sphere_t(ro, rd, centers, radii, 1e-3, jnp.inf)
        assert hit.t.shape == (4, 3)
        assert bool(hit.mask[0, 0]) and bool(hit.mask[0, 1]) and not bool(hit.mask[0, 2])

    def test_uv_poles_and_equator(self):
        # outward normal +y -> theta=acos(-1)=pi -> v=1
        uv = geo.sphere_uv(v(0, 1, 0))
        assert np.isclose(float(uv[1]), 1.0, atol=1e-5)
        uv = geo.sphere_uv(v(0, -1, 0))
        assert np.isclose(float(uv[1]), 0.0, atol=1e-5)
        # +x equator: phi = atan2(0, 1) + pi = pi -> u = 0.5
        uv = geo.sphere_uv(v(1, 0, 0))
        assert np.isclose(float(uv[0]), 0.5, atol=1e-5)
        assert np.isclose(float(uv[1]), 0.5, atol=1e-5)


class TestTriangle:
    def test_hit_barycentrics(self):
        v0, e12, e13 = v(0, 0, -2), v(1, 0, 0), v(0, 1, 0)
        t, mask, u, vv, det = geo.triangle_t(
            v(0.25, 0.25, 0), v(0, 0, -1), v0, e12, e13, 1e-3, jnp.inf
        )
        assert bool(mask)
        assert np.isclose(float(t), 2.0, atol=1e-5)
        assert np.isclose(float(u), 0.25, atol=1e-5)
        assert np.isclose(float(vv), 0.25, atol=1e-5)

    def test_outside_edge_misses(self):
        v0, e12, e13 = v(0, 0, -2), v(1, 0, 0), v(0, 1, 0)
        t, mask, *_ = geo.triangle_t(
            v(0.8, 0.8, 0), v(0, 0, -1), v0, e12, e13, 1e-3, jnp.inf
        )
        assert not bool(mask)  # u + v > 1

    def test_winding_sets_det_sign(self):
        v0, e12, e13 = v(0, 0, -2), v(1, 0, 0), v(0, 1, 0)
        # det = e12 . (d x e13); d = -z -> (-z) x (0,1,0) = (1,0,0)... sign check
        *_, det_pos = geo.triangle_t(v(0.2, 0.2, 0), v(0, 0, -1), v0, e12, e13, 1e-3, jnp.inf)
        *_, det_neg = geo.triangle_t(v(0.2, 0.2, 0), v(0, 0, -1), v0, e13, e12, 1e-3, jnp.inf)
        assert float(det_pos) * float(det_neg) < 0

    def test_parallel_ray_misses(self):
        v0, e12, e13 = v(0, 0, -2), v(1, 0, 0), v(0, 1, 0)
        t, mask, *_ = geo.triangle_t(v(0, 0, 0), v(1, 0, 0), v0, e12, e13, 1e-3, jnp.inf)
        assert not bool(mask)


class TestRect:
    def test_xy_rect(self):
        t, mask, a, b = geo.rect_t(
            v(0.5, 0.5, 0), v(0, 0, -1),
            jnp.int32(0), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(-3.0),
            1e-3, jnp.inf,
        )
        assert bool(mask) and np.isclose(float(t), 3.0, atol=1e-5)
        assert np.isclose(float(a), 0.5) and np.isclose(float(b), 0.5)

    def test_yz_rect_axis_permutation(self):
        # yz-rect: a=y in [0,1], b=z in [0,1], plane x=k=2
        t, mask, a, b = geo.rect_t(
            v(0, 0.3, 0.7), v(1, 0, 0),
            jnp.int32(1), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(2.0),
            1e-3, jnp.inf,
        )
        assert bool(mask) and np.isclose(float(t), 2.0, atol=1e-5)
        assert np.isclose(float(a), 0.3, atol=1e-5)
        assert np.isclose(float(b), 0.7, atol=1e-5)

    def test_zx_rect(self):
        # zx-rect: a=z, b=x, plane y=k
        t, mask, a, b = geo.rect_t(
            v(0.25, 5, 0.75), v(0, -1, 0),
            jnp.int32(2), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(1.0),
            1e-3, jnp.inf,
        )
        assert bool(mask) and np.isclose(float(t), 4.0, atol=1e-5)
        assert np.isclose(float(a), 0.75, atol=1e-5)  # z
        assert np.isclose(float(b), 0.25, atol=1e-5)  # x

    def test_out_of_bounds_misses(self):
        t, mask, _, _ = geo.rect_t(
            v(2.0, 0.5, 0), v(0, 0, -1),
            jnp.int32(0), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(-3.0),
            1e-3, jnp.inf,
        )
        assert not bool(mask)

    def test_normals(self):
        n = geo.rect_normal(jnp.int32(0), jnp.asarray(True))
        assert np.allclose(np.asarray(n), [0, 0, 1])
        n = geo.rect_normal(jnp.int32(1), jnp.asarray(False))
        assert np.allclose(np.asarray(n), [-1, 0, 0])
        n = geo.rect_normal(jnp.int32(2), jnp.asarray(True))
        assert np.allclose(np.asarray(n), [0, 1, 0])


class TestAABB:
    def test_hit_and_miss(self):
        rd = v(0, 0, -1.0)
        inv = 1.0 / rd
        assert bool(geo.aabb_hit(v(0, 0, 0), inv, v(-1, -1, -5), v(1, 1, -4), 1e-3, jnp.inf))
        assert not bool(
            geo.aabb_hit(v(5, 0, 0), inv, v(-1, -1, -5), v(1, 1, -4), 1e-3, jnp.inf)
        )

    def test_behind_origin_misses(self):
        rd = v(0, 0, 1.0)
        assert not bool(
            geo.aabb_hit(v(0, 0, 0), 1.0 / rd, v(-1, -1, -5), v(1, 1, -4), 1e-3, jnp.inf)
        )


class TestMedium:
    def test_flight_inside_boundary(self):
        # ray through sphere r=1 at z=-5: chord length 2; u=1 -> log(1)=0 ->
        # flight 0 -> t = root1 = 4
        hit = geo.sphere_medium_t(
            v(0, 0, 0), v(0, 0, -1), v(0, 0, -5), jnp.float32(1.0), 1e-3, jnp.inf,
            jnp.float32(-1.0), jnp.float32(1.0),
        )
        assert bool(hit.mask)
        assert np.isclose(float(hit.t), 4.0, atol=1e-4)

    def test_long_flight_escapes(self):
        # u tiny -> -ln(u) huge -> flight > chord -> no scatter event
        hit = geo.sphere_medium_t(
            v(0, 0, 0), v(0, 0, -1), v(0, 0, -5), jnp.float32(1.0), 1e-3, jnp.inf,
            jnp.float32(-1.0), jnp.float32(1e-9),
        )
        assert not bool(hit.mask)

    def test_density_scales_flight(self):
        # flight = -1/d * ln(u); d=10, u=e^-1 -> flight=0.1 -> t=4.1
        hit = geo.sphere_medium_t(
            v(0, 0, 0), v(0, 0, -1), v(0, 0, -5), jnp.float32(1.0), 1e-3, jnp.inf,
            jnp.float32(-0.1), jnp.float32(np.exp(-1.0)),
        )
        assert bool(hit.mask)
        assert np.isclose(float(hit.t), 4.1, atol=1e-4)


class TestTransform:
    def test_ray_roundtrip_scale(self):
        # uniform scale 2 + translate: object ray norm = 1/2
        inv = jnp.asarray(np.diag([0.5, 0.5, 0.5]).astype(np.float32))
        inv_t = v(0, 0, 0)
        ro_o, rd_o, nrm = geo.transform_ray(inv, inv_t, v(2, 0, 0), v(0, 0, -1))
        assert np.allclose(np.asarray(ro_o), [1, 0, 0])
        assert np.allclose(np.asarray(rd_o), [0, 0, -1])
        assert np.isclose(float(nrm), 0.5)

    def test_face_normal_flip(self):
        ff, n = geo.face_normal(v(0, 0, -1), v(0, 0, 1))
        assert bool(ff)
        assert np.allclose(np.asarray(n), [0, 0, 1])
        ff, n = geo.face_normal(v(0, 0, 1), v(0, 0, 1))
        assert not bool(ff)
        assert np.allclose(np.asarray(n), [0, 0, -1])
