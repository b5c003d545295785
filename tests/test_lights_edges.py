"""Light-pdf corner cases and the PRB zero-albedo pin (VERDICT r1,
Weak #3/#4): a ray origin inside a light sphere, grazing-cosine rect
lights, and the documented PRB deviation at exactly-zero albedo
channels.  The reference's scalar math NaNs on the degenerate cone
(sphere.rs:100-144 takes sqrt of a negative when the query point is
inside the light); our guarded forms must stay finite in both the
primal and every gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_tpu import SceneBuilder
from ray_tracing_tpu.ops.lights import lights_value
from ray_tracing_tpu.render.integrator import trace
from ray_tracing_tpu.render.prb import (
    PrbParams,
    check_fit_init,
    prb_radiance,
)


def _sphere_light_scene():
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
    light = b.add_diffuse_light(b.add_texture_solid((6.0, 6.0, 6.0)))
    b.add_rect("zx", -4, 4, -4, 4, 0.0, white, positive=True)
    b.add_sphere((0.0, 2.0, 0.0), 1.0, light, important=True)
    return b.build()


def test_lights_value_inside_sphere_finite():
    """Query points inside (and at the center of) the light sphere: the
    cone is degenerate; the pdf must come back finite and NaN-free (the
    whole sphere subtends 2pi of solid angle from inside)."""
    scene = _sphere_light_scene()
    p = jnp.asarray(
        [
            [0.0, 2.0, 0.0],  # exact center: dist_sq = 0
            [0.3, 2.0, 0.0],  # interior
            [0.0, 2.9999, 0.0],  # just inside the surface
        ],
        jnp.float32,
    )
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (3, 1))
    v = np.asarray(lights_value(scene, p, d))
    assert np.isfinite(v).all(), v
    # from strictly inside, every direction hits: pdf = 1/(2pi)
    np.testing.assert_allclose(v, 1.0 / (2.0 * np.pi), rtol=1e-4)


def test_trace_scatter_inside_light_sphere_finite_and_grad_clean():
    """MIS evaluates the light pdf at scatter points; make those points
    sit INSIDE the important light's sphere (a floor slicing through the
    light) so the degenerate cone is exercised inside the full
    estimator.  Radiance and color-table gradients must stay finite."""
    b = SceneBuilder(background=(0.02, 0.02, 0.02))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
    light = b.add_diffuse_light(b.add_texture_solid((6.0, 6.0, 6.0)))
    b.add_rect("zx", -4, 4, -4, 4, 0.0, white, positive=True)
    # light sphere dips below the floor: floor points with x^2+z^2 < 0.75
    # are inside it, so their MIS light-pdf query is the degenerate cone
    b.add_sphere((0.0, 0.5, 0.0), 1.0, light, important=True)
    scene = b.build()

    n = 1024
    rng = np.random.RandomState(0)
    ro = jnp.asarray(np.tile([[0.0, 3.0, 3.0]], (n, 1)), jnp.float32)
    tgt = np.stack(
        [rng.uniform(-1.5, 1.5, n), np.zeros(n), rng.uniform(-1.5, 1.5, n)],
        -1,
    )
    d = tgt - np.asarray(ro)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    key = jax.random.key(3)

    rad = np.asarray(trace(scene, ro, rd, key, 5))
    assert np.isfinite(rad).all()
    assert rad.sum() > 0.0  # the outside-the-circle lanes are lit

    def loss(colors):
        s = scene.replace(textures=scene.textures.replace(color=colors))
        return jnp.sum(trace(s, ro, rd, key, 5))

    g = np.asarray(jax.grad(loss)(scene.textures.color))
    assert np.isfinite(g).all(), g
    assert np.abs(g).sum() > 0.0


def _rect_light_scene():
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
    light = b.add_diffuse_light(b.add_texture_solid((5.0, 5.0, 5.0)))
    b.add_rect("zx", -2, 2, -2, 2, 0.0, white, positive=True)
    b.add_rect("zx", -1, 1, -1, 1, 3.0, light, positive=False,
               important=True)
    return b.build()


def test_lights_value_grazing_rect():
    """Directions parallel to (and nearly parallel to) the rect light's
    plane: parallel -> miss (pdf 0, from the guarded division, not NaN);
    near-grazing hit -> a huge but usable pdf (MIS weight -> 0)."""
    scene = _rect_light_scene()
    p = jnp.asarray(
        [
            [3.0, 3.0, 0.0],  # on the light plane, pointing along it
            [2.0, 3.00005, 0.0],  # epsilon above, near-grazing hit
            [0.0, 1.0, 0.0],  # ordinary point under the light
        ],
        jnp.float32,
    )
    d = jnp.asarray(
        [
            [-1.0, 0.0, 0.0],
            [-1.0, -2e-5, 0.0],  # reaches y=3 at x=-0.5, inside the rect
            [0.0, 1.0, 0.0],
        ],
        jnp.float32,
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    v = np.asarray(lights_value(scene, p, d))
    assert not np.isnan(v).any(), v
    assert v[0] == 0.0  # parallel ray: t would be inf, masked to 0
    assert v[1] > 1e3  # grazing: pdf blows up but stays a number
    assert 0.0 < v[2] < 10.0


def test_trace_grazing_rect_finite_and_grad_clean():
    """A wall whose scatter points sit at the light's plane height: the
    light-pdf grazing corner is exercised inside the full estimator;
    radiance and gradients must stay finite."""
    b = SceneBuilder(background=(0.1, 0.1, 0.1))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
    light = b.add_diffuse_light(b.add_texture_solid((5.0, 5.0, 5.0)))
    # wall plane passes exactly through the light's plane y = 3
    b.add_rect("xy", -2, 2, 0, 6, -2.0, white, positive=True)
    b.add_rect("zx", -1, 1, -1, 1, 3.0, light, positive=False,
               important=True)
    scene = b.build()

    n = 512
    rng = np.random.RandomState(1)
    ro = jnp.asarray(np.tile([[0.0, 3.0, 2.0]], (n, 1)), jnp.float32)
    # aim at the wall strip right at the light's height
    tgt = np.stack(
        [rng.uniform(-2, 2, n), np.full(n, 3.0) + rng.uniform(-1e-4, 1e-4, n),
         np.full(n, -2.0)], -1,
    )
    d = tgt - np.asarray(ro)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    key = jax.random.key(7)

    rad = np.asarray(trace(scene, ro, rd, key, 4))
    assert np.isfinite(rad).all()

    def loss(colors):
        s = scene.replace(textures=scene.textures.replace(color=colors))
        return jnp.sum(trace(s, ro, rd, key, 4))

    g = np.asarray(jax.grad(loss)(scene.textures.color))
    assert np.isfinite(g).all(), g


def _zero_channel_scene():
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    # wall albedo has an exactly-zero blue channel
    wall = b.add_lambertian(b.add_texture_solid((0.7, 0.5, 0.0)))
    light = b.add_diffuse_light(b.add_texture_solid((4.0, 4.0, 4.0)))
    b.add_rect("zx", -2, 2, -2, 2, 0.0, wall, positive=True)
    b.add_rect("zx", -1, 1, -1, 1, 3.0, light, positive=False,
               important=True)
    return b.build()


def test_prb_zero_albedo_channel_pins_zero_gradient():
    """The documented PRB deviation (render/prb.py): at an exactly-zero
    albedo channel the replay's suffix radiance is zero, so the PRB
    gradient collapses to 0 even though true AD reports the nonzero
    one-bounce derivative.  Pin both sides so a silent change in either
    estimator is caught."""
    scene = _zero_channel_scene()
    n = 1024
    rng = np.random.RandomState(5)
    ro = jnp.asarray(np.tile([[0.0, 1.5, 1.5]], (n, 1)), jnp.float32)
    d = np.stack(
        [rng.uniform(-0.6, 0.6, n), -np.ones(n), rng.uniform(-1.2, -0.4, n)],
        -1,
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    key = jax.random.key(11)
    depth = 4

    def loss_ad(colors):
        s = scene.replace(textures=scene.textures.replace(color=colors))
        return jnp.sum(trace(s, ro, rd, key, depth))

    def loss_prb(colors):
        return jnp.sum(
            prb_radiance(colors, scene, ro, rd, key, depth, compaction=False)
        )

    g_ad = np.asarray(jax.grad(loss_ad)(scene.textures.color))
    g_prb = np.asarray(jax.grad(loss_prb)(scene.textures.color))

    # wall texture is row 0; blue channel is the zero one
    assert g_ad[0, 2] > 1e-3, "AD sees the one-bounce derivative"
    assert g_prb[0, 2] == 0.0, "PRB pins exactly zero at A=0"
    # the nonzero channels agree between the two estimators
    np.testing.assert_allclose(
        g_prb[0, :2], g_ad[0, :2], rtol=2e-3, atol=1e-5
    )


def test_check_fit_init_warns_on_black():
    """A PRB fit initialized at black silently gets no gradient; the
    guard must warn on any exactly-zero channel and stay quiet on
    strictly positive starts."""
    colors = jnp.asarray([[0.5, 0.5, 0.5], [0.0, 0.2, 0.3]])
    with pytest.warns(UserWarning, match="zero"):
        check_fit_init(colors)

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        check_fit_init(jnp.asarray([[0.5, 0.5, 0.5]]))

    with pytest.warns(UserWarning):
        fixed = check_fit_init(colors, nudge=1e-3)
    assert float(fixed.min()) >= 1e-3


def test_prb_black_init_recovers_with_nudge():
    """End-to-end pin of the failure mode and its fix: from exact black
    the PRB gradient of the wall row is all-zero; after the nudge the
    gradient is alive."""
    scene = _zero_channel_scene()
    n = 512
    rng = np.random.RandomState(8)
    ro = jnp.asarray(np.tile([[0.0, 1.5, 1.5]], (n, 1)), jnp.float32)
    d = np.stack(
        [rng.uniform(-0.6, 0.6, n), -np.ones(n), rng.uniform(-1.2, -0.4, n)],
        -1,
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    key = jax.random.key(13)

    black = scene.textures.color.at[0].set(0.0)

    def loss(colors):
        return jnp.sum(
            prb_radiance(colors, scene, ro, rd, key, 4, compaction=False)
        )

    g_black = np.asarray(jax.grad(loss)(black))
    assert (g_black[0] == 0.0).all()

    with pytest.warns(UserWarning):
        nudged = check_fit_init(black, nudge=1e-3)
    g_nudged = np.asarray(jax.grad(loss)(nudged))
    assert np.abs(g_nudged[0]).sum() > 0.0
