"""Texture table evaluation tests (reference src/texture/)."""

import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu.models.compiler import SceneBuilder
from ray_tracing_tpu.ops.textures import perlin_noise, perlin_turb, texture_value


def build_textures(fn):
    b = SceneBuilder()
    ids = fn(b)
    scene = b.build()
    return scene.textures, ids


def test_solid_color():
    tt, (i,) = build_textures(lambda b: [b.add_texture_solid((0.2, 0.4, 0.6))])
    p = jnp.zeros((5, 3))
    uv = jnp.zeros((5, 2))
    out = np.asarray(texture_value(tt, jnp.full((5,), i, jnp.int32), uv, p))
    assert np.allclose(out, [0.2, 0.4, 0.6])


def test_checker_sign_select():
    def mk(b):
        odd = b.add_texture_solid((1, 0, 0))
        even = b.add_texture_solid((0, 1, 0))
        return [b.add_texture_checker(odd, even, 10.0)]

    tt, (i,) = build_textures(mk)
    # sin(10*x)^3 sign at p=(0.05,0.05,0.05): sin(0.5)^3 > 0 -> even
    p = jnp.asarray([[0.05, 0.05, 0.05], [-0.05, 0.05, 0.05]], jnp.float32)
    uv = jnp.zeros((2, 2))
    out = np.asarray(texture_value(tt, jnp.full((2,), i, jnp.int32), uv, p))
    assert np.allclose(out[0], [0, 1, 0])  # even
    assert np.allclose(out[1], [1, 0, 0])  # odd (one negative sine)


def test_nested_checker():
    def mk(b):
        r = b.add_texture_solid((1, 0, 0))
        g = b.add_texture_solid((0, 1, 0))
        inner = b.add_texture_checker(r, g, 100.0)
        blue = b.add_texture_solid((0, 0, 1))
        return [b.add_texture_checker(inner, blue, 1.0)]

    tt, (i,) = build_textures(mk)
    assert tt.max_checker_depth == 2
    p = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)  # outer sines>0 -> even=blue
    out = np.asarray(texture_value(tt, jnp.full((1,), i, jnp.int32), jnp.zeros((1, 2)), p))
    assert np.allclose(out[0], [0, 0, 1])
    # outer odd branch -> inner checker resolves to red or green
    p = jnp.asarray([[-0.5, 0.5, 0.5]], jnp.float32)
    out = np.asarray(texture_value(tt, jnp.full((1,), i, jnp.int32), jnp.zeros((1, 2)), p))
    assert np.allclose(out[0], [1, 0, 0]) or np.allclose(out[0], [0, 1, 0])


def test_image_texture_clamp_and_flip():
    img = np.zeros((2, 4, 3), np.uint8)
    img[0, 0] = (255, 0, 0)  # top-left
    img[1, 3] = (0, 0, 255)  # bottom-right
    tt, (i,) = build_textures(lambda b: [b.add_texture_image(img)])
    idx = jnp.full((4,), i, jnp.int32)
    p = jnp.zeros((4, 3))
    # v flipped: uv (0, 1) -> texel row 0 (top); uv (1, 0) -> bottom-right
    uv = jnp.asarray([[0.0, 1.0], [0.99, 0.0], [-5.0, 7.0], [2.0, -3.0]], jnp.float32)
    out = np.asarray(texture_value(tt, idx, uv, p))
    assert np.allclose(out[0], [1, 0, 0])
    assert np.allclose(out[1], [0, 0, 1])
    assert np.allclose(out[2], [1, 0, 0])  # clamps to (0, 1)
    assert np.allclose(out[3], [0, 0, 1])  # clamps to (1, 0)


def test_perlin_noise_properties():
    tt, (i,) = build_textures(lambda b: [b.add_texture_noise(1.0, 7)])
    assert tt.max_noise_depth == 7
    p = jnp.asarray(np.random.RandomState(0).uniform(-10, 10, (1000, 3)), jnp.float32)
    n1 = np.asarray(perlin_noise(tt, p))
    n2 = np.asarray(perlin_noise(tt, p))
    assert np.array_equal(n1, n2)  # deterministic
    assert np.abs(n1).max() <= 2.0  # bounded gradient noise
    assert n1.std() > 0.05  # actually varies
    # smoothness: nearby points give nearby values
    eps = 1e-3
    n3 = np.asarray(perlin_noise(tt, p + eps))
    assert np.abs(n1 - n3).max() < 0.1


def test_turbulence_octave_masking():
    tt, (i,) = build_textures(lambda b: [b.add_texture_noise(1.0, 7)])
    p = jnp.asarray(np.random.RandomState(1).uniform(-5, 5, (100, 3)), jnp.float32)
    # depth=1 equals |noise|
    t1 = np.asarray(perlin_turb(tt, p, jnp.int32(1), 7))
    n = np.abs(np.asarray(perlin_noise(tt, p)))
    assert np.allclose(t1, n, atol=1e-6)
    # depth d result is independent of the static bound
    t3a = np.asarray(perlin_turb(tt, p, jnp.int32(3), 7))
    t3b = np.asarray(perlin_turb(tt, p, jnp.int32(3), 3))
    assert np.allclose(t3a, t3b, atol=1e-6)


def test_noise_textures_decorrelated():
    def mk(b):
        return [b.add_texture_noise(1.0, 4), b.add_texture_noise(1.0, 4)]

    tt, (i, j) = build_textures(mk)
    p = jnp.asarray(np.random.RandomState(2).uniform(-5, 5, (500, 3)), jnp.float32)
    uv = jnp.zeros((500, 2))
    a = np.asarray(texture_value(tt, jnp.full((500,), i, jnp.int32), uv, p))[:, 0]
    c = np.asarray(texture_value(tt, jnp.full((500,), j, jnp.int32), uv, p))[:, 0]
    corr = np.corrcoef(a, c)[0, 1]
    assert abs(corr) < 0.3  # per-texture offsets decorrelate the fields
