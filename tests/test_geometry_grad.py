"""Geometry-parameter gradients (sphere center/radius) through the
Phase-B rebuild — forward-mode AD vs central finite differences, and
the fit_geometry example's recovery loop.

Phase A selection is detached; Phase B re-solves the sphere roots from
the tables (ops/intersect.py:_sphere_phase_b), so the interior
(reparameterized) derivative flows through hit positions, normals,
texture lookups and light pdfs.  Silhouette (visibility) delta terms
are not estimated (no edge sampling), so:

* the FD check uses rays aimed well inside the sphere's silhouette —
  no winner flips under +-eps, making central differences exact for
  the same interior term AD computes;
* the scene uses a Perlin-noise albedo + an important area light —
  with a solid color under constant sky the interior gradient is
  EXACTLY zero (radiance is piecewise-constant in geometry), which is
  itself asserted below as the documented limitation."""

import jax
import jax.numpy as jnp
import numpy as np

from examples.fit_geometry import make_loss, scene_with, with_geometry
from ray_tracing_tpu import Camera, CameraParam, SceneBuilder
from ray_tracing_tpu.render.integrator import trace_compacted


def _interior_rays(n=64, seed=4):
    """Rays converging on the sphere's front face, well inside the
    silhouette (sphere r=0.45 at (0.1, 0, -1.1); impact params < 0.5r)."""
    rng = np.random.RandomState(seed)
    aim = np.asarray([0.1, 0.0, -1.1]) + rng.uniform(
        -0.15, 0.15, (n, 3)
    ) * np.asarray([1.0, 1.0, 0.0])
    ro = np.asarray([0.0, 0.2, 1.2]) + rng.uniform(-0.05, 0.05, (n, 3))
    rd = aim - ro
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32)


def test_geometry_grad_matches_finite_differences():
    theta = jnp.asarray([0.1, 0.0, -1.1, 0.45], jnp.float32)
    scene = scene_with(theta[:3], theta[3])
    ro, rd = _interior_rays()
    key = jax.random.key(11)

    def f(th):
        rad = trace_compacted(with_geometry(scene, th), ro, rd, key, 3)
        # weighted sum -> every channel/ray contributes distinctly
        w = 1.0 + 0.1 * jnp.arange(rad.size, dtype=jnp.float32)
        return jnp.vdot(w, rad.reshape(-1)) / rad.size

    g_ad = np.asarray(jax.jacfwd(f)(theta))
    assert np.abs(g_ad).max() > 1e-3, "interior gradient must be nonzero"

    eps = 1e-3
    g_fd = np.zeros(4, np.float64)
    for i in range(4):
        e = jnp.zeros(4, jnp.float32).at[i].set(eps)
        g_fd[i] = (float(f(theta + e)) - float(f(theta - e))) / (2 * eps)

    # tolerance floor: the loss is an f32 path-trace, so central
    # differences at eps=1e-3 carry ~|f|*1e-5/2eps of rounding noise
    # plus O(eps^2) curvature (measured ~0.07 absolute on a ~3-sized
    # gradient); AD is noise-free
    np.testing.assert_allclose(
        g_ad, g_fd, rtol=0.12, atol=0.02 * np.abs(g_fd).max()
    )


def test_solid_color_interior_gradient_is_zero():
    """The documented limitation: with a solid albedo under a constant
    sky (no lights), radiance is piecewise-constant in the geometry —
    the reparameterized interior gradient is exactly zero and ALL the
    signal sits in the unestimated silhouette term."""
    b = SceneBuilder(background=(0.8, 0.85, 0.9))
    red = b.add_lambertian(b.add_texture_solid((0.8, 0.2, 0.15)))
    b.add_sphere((0.1, 0.0, -1.1), 0.45, red)
    scene = b.build()
    ro, rd = _interior_rays()
    key = jax.random.key(11)

    def f(th):
        rad = trace_compacted(with_geometry(scene, th), ro, rd, key, 3)
        return jnp.sum(rad)

    g = np.asarray(jax.jacfwd(f)(
        jnp.asarray([0.1, 0.0, -1.1, 0.45], jnp.float32)))
    np.testing.assert_array_equal(g, np.zeros(4, np.float32))

def test_geometry_fit_recovers_depth_and_radius():
    """A short fit_geometry-style descent recovers the sphere's view
    depth and radius.  Lateral translation is deliberately NOT fit:
    its image response is silhouette-dominated and the interior
    gradient's sign is wrong at small offsets (probed: at cx +0.03 the
    loss slope is +0.05 but the interior gradient is -0.026), the
    standard no-edge-sampling limitation — depth/radius change normals
    and shading across the whole visible disc, so their interior
    gradients are faithful."""
    w = h = 24
    depth = 3
    true_theta = jnp.asarray([0.25, 0.05, -1.1, 0.5], jnp.float32)
    true2 = jnp.asarray([-1.1, 0.5], jnp.float32)
    scene = scene_with(true_theta[:3], true_theta[3])
    camera = Camera.build(
        CameraParam((0.0, 0.2, 1.2), (0.0, 0.0, -1.1), 55.0), w / h
    )
    loss4 = make_loss(scene, camera, w, h, depth)

    def loss(t2, key, target):
        th = true_theta.at[2].set(t2[0]).at[3].set(t2[1])
        return loss4(th, key, target)

    from ray_tracing_tpu.models.camera import camera_rays

    @jax.jit
    def target_of(key):
        ro, rd, _, k_trace = camera_rays(camera, key, w, h, True)
        return trace_compacted(
            with_geometry(scene, true_theta), ro, rd, k_trace, depth
        )

    @jax.jit
    def step(t2, key, target):
        return loss(t2, key, target), jax.jacfwd(loss)(t2, key, target)

    t2 = jnp.asarray([-1.25, 0.38], jnp.float32)
    err0 = float(jnp.abs(t2 - true2).max())
    mu = jnp.zeros(2)
    v = jnp.zeros(2)
    for i in range(120):
        key = jax.random.key(500 + i)
        target = target_of(key).reshape(h, w, 3)
        _, g = step(t2, key, target)
        mu = 0.9 * mu + 0.1 * g
        v = 0.99 * v + 0.01 * g * g
        t2 = t2 - 0.01 * mu / (jnp.sqrt(v) + 1e-8)
    err = float(jnp.abs(t2 - true2).max())
    assert err < 0.45 * err0, (err0, err, np.asarray(t2))
    assert err < 0.07, np.asarray(t2)
