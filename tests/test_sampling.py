"""Statistical tests for the directional samplers and PDFs
(reference src/random.rs, src/pdf/cosine.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu.ops import sampling as smp

N = 50_000


def _u(key, n=N, cols=1):
    u = jax.random.uniform(jax.random.key(key), (n, cols))
    return [u[:, i] for i in range(cols)]


def test_in_unit_disk():
    u1, u2 = _u(0, cols=2)
    d = np.asarray(smp.random_in_unit_disk(u1, u2))
    r = np.linalg.norm(d, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # area-uniform: E[r^2] = 1/2
    assert np.isclose((r**2).mean(), 0.5, atol=0.01)


def test_on_unit_sphere():
    u1, u2 = _u(1, cols=2)
    d = np.asarray(smp.random_on_unit_sphere(u1, u2))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.02  # isotropy
    # each component uniform on [-1,1]: variance 1/3
    assert np.allclose(d.var(axis=0), 1 / 3, atol=0.01)


def test_in_unit_sphere():
    u1, u2, u3 = _u(2, cols=3)
    d = np.asarray(smp.random_in_unit_sphere(u1, u2, u3))
    r = np.linalg.norm(d, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # volume-uniform: E[r^3] = 1/2
    assert np.isclose((r**3).mean(), 0.5, atol=0.01)


def test_cosine_pdf_sampling_matches_value():
    """Histogram of cos-weighted samples vs analytic cos/pi pdf."""
    normal = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (N, 1))
    u1, u2 = _u(3, cols=2)
    d = np.asarray(smp.cosine_pdf_generate(normal, u1, u2))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    cos = d[:, 1]
    assert cos.min() >= -1e-6  # all in hemisphere
    # cos-weighted: E[cos] = 2/3
    assert np.isclose(cos.mean(), 2 / 3, atol=0.01)
    # pdf value integral over hemisphere: MC with uniform sphere dirs
    u1, u2 = _u(4, cols=2)
    dirs = smp.random_on_unit_sphere(u1, u2)
    vals = np.asarray(smp.cosine_pdf_value(normal, dirs))
    # integral = mean * 4pi over full sphere = 1
    assert np.isclose(vals.mean() * 4 * np.pi, 1.0, atol=0.02)


def test_cosine_pdf_value_zero_below_horizon():
    normal = jnp.asarray([0.0, 1.0, 0.0])
    assert float(smp.cosine_pdf_value(normal, jnp.asarray([0.0, -1.0, 0.0]))) == 0.0
    assert np.isclose(
        float(smp.cosine_pdf_value(normal, jnp.asarray([0.0, 1.0, 0.0]))),
        1 / np.pi,
    )


def test_face_towards_orthonormal():
    d = jnp.asarray([[0.3, -0.5, 0.8], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    x, y, z = smp.face_towards(d, smp.onb_up(d))
    for a in (x, y, z):
        assert np.allclose(np.linalg.norm(np.asarray(a), axis=-1), 1.0, atol=1e-5)
    assert np.allclose(np.asarray(jnp.sum(x * y, -1)), 0.0, atol=1e-5)
    assert np.allclose(np.asarray(jnp.sum(x * z, -1)), 0.0, atol=1e-5)
    # z column is the (normalized) input direction
    dn = np.asarray(d) / np.linalg.norm(np.asarray(d), axis=-1, keepdims=True)
    assert np.allclose(np.asarray(z), dn, atol=1e-5)


def test_random_to_sphere_cone():
    # cone toward sphere radius 1 at distance^2 = 25: cos_max = sqrt(1-1/25)
    u1, u2 = _u(5, cols=2)
    d = np.asarray(smp.random_to_sphere(u1, u2, jnp.float32(1.0), jnp.float32(25.0)))
    cos_max = np.sqrt(1 - 1 / 25)
    assert d[:, 2].min() >= cos_max - 1e-5  # all within the cone
    # z uniform on [cos_max, 1]
    assert np.isclose(d[:, 2].mean(), (1 + cos_max) / 2, atol=0.001)


def test_reflect_refract():
    v = jnp.asarray([np.sqrt(0.5), -np.sqrt(0.5), 0.0], dtype=jnp.float32)
    n = jnp.asarray([0.0, 1.0, 0.0])
    r = np.asarray(smp.reflect(v, n))
    assert np.allclose(r, [np.sqrt(0.5), np.sqrt(0.5), 0.0], atol=1e-6)
    # refraction at eta ratio 1 is identity
    t = np.asarray(smp.refract(v, n, jnp.float32(1.0)))
    assert np.allclose(t, np.asarray(v), atol=1e-6)
    # Snell: sin(theta_t) = ratio * sin(theta_i)
    ratio = 1 / 1.5
    t = np.asarray(smp.refract(v, n, jnp.float32(ratio)))
    assert np.isclose(np.abs(t[0]), ratio * np.sqrt(0.5), atol=1e-6)
    assert np.isclose(np.linalg.norm(t), 1.0, atol=1e-6)


def test_schlick_limits():
    # normal incidence: r0 = ((1-n)/(1+n))^2
    r = float(smp.schlick_reflectance(jnp.float32(1.0), jnp.float32(1.5)))
    assert np.isclose(r, ((1 - 1.5) / (1 + 1.5)) ** 2, atol=1e-6)
    # grazing: -> 1
    r = float(smp.schlick_reflectance(jnp.float32(0.0), jnp.float32(1.5)))
    assert np.isclose(r, 1.0, atol=1e-6)
