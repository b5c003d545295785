"""Generalized constant-medium tests (reference constant_medium.rs:41-85,
generic over any inner Hittable via HittableGroup, json.rs:549-576).

Covers: generic-path == legacy sphere kernel equivalence, the analytic
free-flight (Beer–Lambert) distribution through a cuboid boundary, the
medium-level transform, and an RTNW-style smoke-box render.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ray_tracing_tpu import SceneBuilder, build_scene
from ray_tracing_tpu.ops import geometry as geo
from ray_tracing_tpu.ops.intersect import KIND_MEDIUM, intersect_scene


def _medium_scene(**medium_kwargs):
    b = SceneBuilder()
    fog = b.add_isotropic(b.add_texture_solid((1.0, 1.0, 1.0)))
    b.add_medium(material=fog, **medium_kwargs)
    return b.build()


def test_generic_sphere_medium_matches_legacy_kernel():
    density = 0.7
    center = np.array([0.2, -0.1, 4.0], np.float32)
    radius = 1.3
    scene = _medium_scene(
        density=density, spheres=[(center, radius)]
    )

    rng = np.random.default_rng(11)
    n = 512
    ro = jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32))
    rd = jnp.asarray(
        (center + rng.normal(0, 0.6, (n, 3)) - np.asarray(ro)).astype(np.float32)
    )
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    u = jnp.asarray(rng.uniform(0, 1, (n, 1)).astype(np.float32))

    hit = intersect_scene(scene, ro, rd, 1e-3, jnp.inf, u)
    legacy = geo.sphere_medium_t(
        ro, rd, jnp.asarray(center), radius, 1e-3, jnp.inf,
        -1.0 / density, u[:, 0],
    )
    assert (np.asarray(hit.mask) == np.asarray(legacy.mask)).all()
    m = np.asarray(hit.mask)
    np.testing.assert_allclose(
        np.asarray(hit.t)[m], np.asarray(legacy.t)[m], rtol=1e-5, atol=1e-5
    )
    assert (np.asarray(hit.kind)[m] == KIND_MEDIUM).all()


@pytest.mark.parametrize("density,length", [(0.5, 2.0), (2.0, 1.0)])
def test_cuboid_free_flight_distribution(density, length):
    """P(scatter inside) = 1 - exp(-density * path_length), and the
    scatter points are exponentially distributed along the chord."""
    scene = _medium_scene(
        density=density,
        cuboids=[((0.0, 0.0, 0.0), (1.0, 1.0, length))],
    )
    n = 20000
    ro = jnp.tile(jnp.asarray([[0.5, 0.5, -1.0]], jnp.float32), (n, 1))
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    # stratified uniforms make the empirical CDF nearly exact
    u = jnp.asarray(((np.arange(n) + 0.5) / n).astype(np.float32))[:, None]
    hit = intersect_scene(scene, ro, rd, 1e-3, jnp.inf, u)
    p_scatter = float(np.asarray(hit.mask).mean())
    assert p_scatter == pytest.approx(1.0 - np.exp(-density * length), abs=2e-3)
    # scattered depth beyond the entry point is Exp(density) truncated
    depth = np.asarray(hit.t)[np.asarray(hit.mask)] - 1.0
    assert (depth >= 0).all() and (depth <= length + 1e-5).all()
    med = np.median(depth)
    # median of truncated exponential
    p = 1.0 - np.exp(-density * length)
    expected_med = -np.log(1.0 - 0.5 * p) / density
    assert med == pytest.approx(expected_med, rel=0.02)


def test_medium_transform_moves_boundary():
    """A translate on the constant-medium itself (the reference wraps
    the whole ConstantMedium in TransformHittable)."""
    shift = np.array([0.0, 0.0, 5.0], np.float32)
    scene = _medium_scene(
        density=3.0,
        cuboids=[((0, 0, 0), (1, 1, 1))],
        transform=(np.eye(3, dtype=np.float32), shift),
    )
    n = 256
    ro = jnp.tile(jnp.asarray([[0.5, 0.5, -1.0]], jnp.float32), (n, 1))
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    u = jnp.asarray(np.linspace(0.01, 0.99, n, dtype=np.float32))[:, None]
    hit = intersect_scene(scene, ro, rd, 1e-3, jnp.inf, u)
    m = np.asarray(hit.mask)
    assert m.any()
    t = np.asarray(hit.t)[m]
    # medium now spans z in [5, 6] -> t in [6, 7] from z=-1
    assert (t >= 6.0 - 1e-4).all() and (t <= 7.0 + 1e-4).all()


def test_smoke_box_renders():
    """RTNW-style smoke cuboid inside a lit box renders finite, and the
    medium visibly attenuates the view compared to no medium."""
    from ray_tracing_tpu import Camera, CameraParam
    from ray_tracing_tpu.render.renderer import render_pass

    def build(with_smoke):
        b = SceneBuilder()
        white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
        light = b.add_diffuse_light(b.add_texture_solid((7.0, 7.0, 7.0)))
        b.add_rect("zx", 113, 443, 127, 432, 554, light, positive=False,
                   important=True)
        b.add_rect("zx", 0, 555, 0, 555, 0, white, positive=True)
        b.add_rect("xy", 0, 555, 0, 555, 555, white, positive=False)
        if with_smoke:
            fog = b.add_isotropic(b.add_texture_solid((0.2, 0.2, 0.2)))
            b.add_medium(
                0.01, fog, cuboids=[((100, 0, 100), (400, 300, 400))]
            )
        return b.build()

    cam = Camera.build(CameraParam((278, 278, -800), (278, 278, 0), 40), 1.0)
    imgs = {}
    for smoke in (False, True):
        img = np.asarray(
            render_pass(
                build(smoke), cam, jax.random.key(2),
                width=24, height=24, max_depth=8, antialias=False,
                tile_size=576,
            )
        )
        assert np.isfinite(img).all() and (img >= 0).all()
        imgs[smoke] = img
    # dark smoke in front of the floor lowers the mean image brightness
    assert imgs[True].mean() < imgs[False].mean()
