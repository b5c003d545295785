"""Closed-form radiometric oracles (BASELINE.md correctness substitute).

The Rust reference cannot be built in this environment (no toolchain,
no network egress — see BASELINE.md "Ground-truth attempt"), so instead
of golden reference images these tests pin the estimator to EXACT
analytic solutions of the rendering equation:

- point-to-rectangle form factor (the classic corner formula): a
  lambertian floor under a one-sided rect emitter has outgoing radiance
  exactly ``albedo * L_e * F`` for any max_depth >= 2 and black
  background (no other geometry, no higher-order terms), so the MC mean
  must converge to it at the 1/sqrt(N) rate;
- spherical emitter: irradiance at distance d from a uniform sphere
  emitter of radius R is pi * L_e * R^2/d^2, i.e. radiance
  ``albedo * L_e * R^2/d^2``;
- pixel-GRADIENT ground truth: d L / d albedo = L_e * F and
  d L / d L_e = albedo * F, checked against both reverse-mode AD and
  the PRB replay — the gradient analogue of the image comparison the
  reference build would have provided;
- a deterministic specular chain (fuzz-0 metal) with EXACT equality.

These exercise the full production estimator: mixture MIS (0.5/0.5
cosine/light), light pdfs, cosine sampling, one-sided emission
(reference renderer.rs:231-263, aa_rect.rs:146-185, sphere.rs:100-144).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu import SceneBuilder
from ray_tracing_tpu.render.integrator import trace, trace_compacted
from ray_tracing_tpu.render.prb import prb_radiance


def corner_form_factor(a, b):
    """Form factor from a point to an aligned rectangle with one corner
    directly above the point, half-sizes a = X/h, b = Z/h (standard
    radiosity corner formula; odd in each argument so signed
    decomposition covers arbitrary offsets)."""
    ra = np.sqrt(1.0 + a * a)
    rb = np.sqrt(1.0 + b * b)
    return (a / ra * np.arctan(b / ra) + b / rb * np.arctan(a / rb)) / (
        2.0 * np.pi
    )


def rect_form_factor(px, pz, x0, x1, z0, z1, h):
    """Point (px, 0, pz) with +y normal to rect [x0,x1]x[z0,z1] at y=h."""
    f = lambda x, z: corner_form_factor(x / h, z / h)
    return (
        f(x1 - px, z1 - pz)
        - f(x0 - px, z1 - pz)
        - f(x1 - px, z0 - pz)
        + f(x0 - px, z0 - pz)
    )


ALBEDO = np.array([0.7, 0.5, 0.3])
EMIT = np.array([6.0, 5.0, 4.0])
X0, X1, Z0, Z1, H = -1.0, 1.0, -1.5, 0.5, 2.0


def _floor_rect_light_scene(important):
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    floor = b.add_lambertian(b.add_texture_solid(tuple(ALBEDO)))
    light = b.add_diffuse_light(b.add_texture_solid(tuple(EMIT)))
    b.add_rect("zx", -50, 50, -50, 50, 0.0, floor, positive=True)
    b.add_rect("zx", Z0, Z1, X0, X1, H, light, positive=False,
               important=important)
    return b.build()


def _rays_at_point(point, n, height=1.0, back=1.0):
    """n identical camera rays aimed at one floor point (per-lane RNG
    makes each lane an independent sample of the same pixel)."""
    ro = np.tile([[point[0], height, point[2] + back]], (n, 1))
    d = np.asarray(point, np.float64) - ro
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(ro, jnp.float32), jnp.asarray(d, jnp.float32)


def _mc_mean(scene, point, keys, n=32768, depth=3, tracer=trace):
    ro, rd = _rays_at_point(point, n)
    acc = np.zeros(3)
    for k in keys:
        acc += np.asarray(
            jnp.mean(tracer(scene, ro, rd, jax.random.key(k), depth), axis=0)
        )
    return acc / len(keys)


def test_rect_light_form_factor_oracle():
    """MC radiance at two floor points (one under the light, one offset)
    equals albedo * L_e * F(point) from the corner formula."""
    scene = _floor_rect_light_scene(important=True)
    for point in ((0.0, 0.0, -0.5), (1.8, 0.0, 0.9)):
        F = rect_form_factor(point[0], point[2], X0, X1, Z0, Z1, H)
        expected = ALBEDO * EMIT * F
        got = _mc_mean(scene, point, keys=range(4))
        np.testing.assert_allclose(got, expected, rtol=0.03, err_msg=str(point))


def test_rect_light_oracle_without_importance_sampling():
    """Same closed form with the light NOT in the important list: the
    estimator falls back to pure cosine sampling and must converge to
    the identical answer (unbiasedness across sampling strategies)."""
    scene = _floor_rect_light_scene(important=False)
    point = (0.0, 0.0, -0.5)
    F = rect_form_factor(point[0], point[2], X0, X1, Z0, Z1, H)
    expected = ALBEDO * EMIT * F
    got = _mc_mean(scene, point, keys=range(8))
    np.testing.assert_allclose(got, expected, rtol=0.05)


def test_rect_light_oracle_compacted():
    """The compacted production forward converges to the same closed
    form (different uniform pairing, same expectation)."""
    scene = _floor_rect_light_scene(important=True)
    point = (0.0, 0.0, -0.5)
    F = rect_form_factor(point[0], point[2], X0, X1, Z0, Z1, H)
    expected = ALBEDO * EMIT * F
    got = _mc_mean(scene, point, keys=range(4), tracer=trace_compacted)
    np.testing.assert_allclose(got, expected, rtol=0.03)


def test_sphere_light_irradiance_oracle():
    """Floor point at distance d below a uniform sphere emitter: radiance
    = albedo * L_e * R^2/d^2 (exact; E = pi L sin^2 theta_max)."""
    R, D = 0.5, 2.5
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    floor = b.add_lambertian(b.add_texture_solid(tuple(ALBEDO)))
    light = b.add_diffuse_light(b.add_texture_solid(tuple(EMIT)))
    b.add_rect("zx", -50, 50, -50, 50, 0.0, floor, positive=True)
    b.add_sphere((0.0, D, 0.0), R, light, important=True)
    scene = b.build()

    expected = ALBEDO * EMIT * (R * R) / (D * D)
    got = _mc_mean(scene, (0.0, 0.0, 0.0), keys=range(4))
    np.testing.assert_allclose(got, expected, rtol=0.03)


def test_gradient_matches_form_factor_derivative():
    """Pixel-gradient ground truth: with L = albedo * L_e * F,
    dL_c/dalbedo_c = L_e_c * F and dL_c/dL_e_c = albedo_c * F.  Both
    reverse-mode AD and the PRB replay must match the closed form (the
    substitute for reference-image gradient comparison, BASELINE.md)."""
    scene = _floor_rect_light_scene(important=True)
    point = (0.0, 0.0, -0.5)
    F = rect_form_factor(point[0], point[2], X0, X1, Z0, Z1, H)
    n = 32768
    ro, rd = _rays_at_point(point, n)
    keys = range(4)

    # texture rows: 0 = floor albedo, 1 = emitter radiance
    def mean_grad(loss_fn):
        acc = None
        for k in keys:
            g = np.asarray(jax.grad(loss_fn)(scene.textures.color,
                                             jax.random.key(k)))
            acc = g if acc is None else acc + g
        return acc / len(keys)

    def loss_ad(colors, key):
        s = scene.replace(textures=scene.textures.replace(color=colors))
        return jnp.sum(jnp.mean(trace(s, ro, rd, key, 3), axis=0))

    def loss_prb(colors, key):
        return jnp.sum(jnp.mean(
            prb_radiance(colors, scene, ro, rd, key, 3), axis=0))

    for name, g in (("ad", mean_grad(loss_ad)), ("prb", mean_grad(loss_prb))):
        np.testing.assert_allclose(
            g[0], EMIT * F, rtol=0.04, err_msg=f"{name}: d/d albedo"
        )
        np.testing.assert_allclose(
            g[1], ALBEDO * F, rtol=0.04, err_msg=f"{name}: d/d emission"
        )


def test_mirror_chain_exact():
    """Deterministic specular chain: fuzz-0 metal mirrors bounce the ray
    into the background; radiance is EXACTLY prod(albedos) * background
    (no sampling, no tolerance beyond float rounding)."""
    bg = (0.8, 0.9, 1.0)
    a1 = (0.9, 0.6, 0.3)
    a2 = (0.5, 0.8, 0.2)
    b = SceneBuilder(background=bg)
    m1 = b.add_metal(a1, 0.0)
    m2 = b.add_metal(a2, 0.0)
    b.add_rect("zx", -5, 5, -5, 5, 0.0, m1, positive=True)   # floor
    b.add_rect("zx", -5, 5, -5, 5, 4.0, m2, positive=False)  # ceiling
    scene = b.build()

    # 45-degree ray: floor -> ceiling -> escapes horizontally
    ro = jnp.asarray([[-3.0, 3.0, 0.0]], jnp.float32)
    rd = jnp.asarray([[1.0, -1.0, 0.0]], jnp.float32)
    rd = rd / jnp.linalg.norm(rd)
    out = np.asarray(trace(scene, ro, rd, jax.random.key(0), 8))[0]
    expected = np.asarray(a1) * np.asarray(a2) * np.asarray(bg)
    np.testing.assert_allclose(out, expected, rtol=1e-5)
