"""Differentiability: gradients of rendered radiance w.r.t. scene
parameters via path-replay (fixed key), checked against closed forms and
finite differences.  This is the new capability the TPU build adds over
the reference (BASELINE.md north star)."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu import SceneBuilder
from ray_tracing_tpu.render.integrator import trace


def _furnace_scene(albedo):
    b = SceneBuilder(background=(1.0, 1.0, 1.0))
    mat = b.add_lambertian(b.add_texture_solid(albedo))
    b.add_rect("zx", -1e4, 1e4, -1e4, 1e4, 0.0, mat, positive=True)
    return b.build()


def test_albedo_gradient_exact():
    """Furnace: pixel = albedo * 1, so d pixel / d albedo_texel = 1."""
    scene = _furnace_scene((0.6, 0.6, 0.6))
    ro = jnp.asarray([[0.0, 1.0, 0.0]] * 64, jnp.float32)
    rd = jnp.asarray([[0.0, -1.0, 0.0]] * 64, jnp.float32)
    key = jax.random.key(0)

    def loss(color):
        s = scene.replace(
            textures=scene.textures.replace(
                color=scene.textures.color.at[0].set(color)
            )
        )
        return trace(s, ro, rd, key, 4).mean()

    g = jax.grad(loss)(jnp.asarray([0.6, 0.6, 0.6]))
    # mean over 3 channels of 64 rays: d/d c_i = 1/3 per channel
    assert np.allclose(np.asarray(g), 1.0 / 3.0, atol=1e-4)


def test_emission_gradient_exact():
    """Pixel looking at a light = emit, so gradient w.r.t. emit = 1."""
    b = SceneBuilder()
    light = b.add_diffuse_light(b.add_texture_solid((2.0, 2.0, 2.0)))
    b.add_rect("xy", -1, 1, -1, 1, -2.0, light, positive=True)
    scene = b.build()
    ro = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    rd = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)

    def loss(emit):
        s = scene.replace(
            textures=scene.textures.replace(
                color=scene.textures.color.at[0].set(emit)
            )
        )
        return trace(s, ro, rd, jax.random.key(0), 3)[0, 0]

    g = jax.grad(loss)(jnp.asarray([2.0, 2.0, 2.0]))
    assert np.allclose(np.asarray(g), [1.0, 0.0, 0.0], atol=1e-5)


def test_gradient_matches_finite_difference():
    """Cornell-ish box: path-replay gradient of mean radiance w.r.t. the
    wall albedo matches central differences at matched keys."""
    def build(albedo_r):
        b = SceneBuilder(background=(0, 0, 0))
        wall = b.add_lambertian(b.add_texture_solid((albedo_r, 0.5, 0.5)))
        light = b.add_diffuse_light(b.add_texture_solid((4.0, 4.0, 4.0)))
        b.add_rect("zx", -2, 2, -2, 2, 0.0, wall, positive=True)
        b.add_rect("zx", -1, 1, -1, 1, 3.0, light, positive=False, important=True)
        return b.build()

    scene = build(0.5)
    n = 2048
    rng = np.random.RandomState(3)
    ro = jnp.asarray(np.tile([[0.0, 1.5, 0.0]], (n, 1)), jnp.float32)
    d = np.stack(
        [rng.uniform(-0.5, 0.5, n), -np.ones(n), rng.uniform(-0.5, 0.5, n)], -1
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    key = jax.random.key(5)

    def loss_given(scene, r):
        s = scene.replace(
            textures=scene.textures.replace(
                color=scene.textures.color.at[0, 0].set(r)
            )
        )
        return trace(s, ro, rd, key, 4)[:, 0].mean()

    g = float(jax.grad(lambda r: loss_given(scene, r))(jnp.float32(0.5)))
    eps = 1e-2
    f1 = float(loss_given(scene, jnp.float32(0.5 + eps)))
    f0 = float(loss_given(scene, jnp.float32(0.5 - eps)))
    fd = (f1 - f0) / (2 * eps)
    assert np.isclose(g, fd, rtol=0.05), (g, fd)


def test_render_pass_is_differentiable():
    """End-to-end: grad of an image-space loss through render_pass."""
    from ray_tracing_tpu import Camera, CameraParam
    from ray_tracing_tpu.render.renderer import render_pass

    b = SceneBuilder(background=(0.2, 0.2, 0.2))
    mat = b.add_lambertian(b.add_texture_solid((0.5, 0.3, 0.2)))
    b.add_sphere((0, 0, -3), 1.0, mat)
    scene = b.build()
    cam = Camera.build(CameraParam((0, 0, 1), (0, 0, -1), 60), 1.0)

    def loss(color_table):
        s = scene.replace(textures=scene.textures.replace(color=color_table))
        img = render_pass(
            s, cam, jax.random.key(0),
            width=16, height=16, max_depth=3, antialias=True, tile_size=256,
        )
        return jnp.mean((img - 0.25) ** 2)

    g = jax.grad(loss)(scene.textures.color)
    ga = np.asarray(g[0])
    assert np.isfinite(ga).all()
    assert np.abs(ga).sum() > 0.0


def test_albedo_fit_converges():
    """Matched-key path-replay inverse rendering recovers scene albedos
    (the BASELINE C5 capability), on the examples/fit_albedo.py scene."""
    import sys

    sys.path.insert(0, "examples")
    try:
        import fit_albedo
    finally:
        sys.path.pop(0)

    argv = sys.argv
    sys.argv = ["fit_albedo", "--steps", "50", "--size", "24", "--depth", "3"]
    try:
        err = fit_albedo.main()
    finally:
        sys.argv = argv
    assert err < 0.05, err
