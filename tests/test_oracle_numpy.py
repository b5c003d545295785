"""Production tracer vs the independent scalar-NumPy oracle.

Every other cross-check in the suite ultimately flows through the same
``ops/`` primitives.  ``tests/oracle_numpy.py`` shares zero code with
them (its own RNG, math, shapes, estimator recursion — transliterated
from the reference Rust, citations in its docstring), so agreement at
the Monte-Carlo noise floor here is an independent estimator check.

Noise-floor standard (CLAUDE.md / verify skill): per-ray paths are
chaotic, so the matched comparison is statistical — the
production-vs-oracle mean-absolute-difference must sit inside the
same-estimator different-key noise floor (times a small margin), with
everything seeded and deterministic.
"""

import numpy as np
import pytest

from ray_tracing_tpu import Renderer, RendererParam
from ray_tracing_tpu.models.camera import CameraParam
from ray_tracing_tpu.models.compiler import SceneBuilder

from tests import oracle_numpy as onp

W = H = 16
SPP = 48


def _prod_render(bundle_scene, cam_param, depth, keys):
    r = Renderer(
        RendererParam(W, H, max_depth=depth), cam_param, bundle_scene,
        tile_size=W * H,
    )
    acc = np.zeros((H, W, 3), np.float64)
    for k in keys:
        acc += np.asarray(r.render(k), np.float64)
    return acc / len(keys)


def cornell_scenes():
    """C1-class: Cornell walls + rect light (important) + metal and
    glass spheres."""
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    white = b.add_texture_solid((0.73, 0.73, 0.73))
    red = b.add_texture_solid((0.65, 0.05, 0.05))
    green = b.add_texture_solid((0.12, 0.45, 0.15))
    lite = b.add_texture_solid((4.0, 4.0, 4.0))
    m_white = b.add_lambertian(white)
    m_red = b.add_lambertian(red)
    m_green = b.add_lambertian(green)
    m_light = b.add_diffuse_light(lite)
    m_metal = b.add_metal((0.8, 0.85, 0.88), 0.3)
    m_glass = b.add_dielectric(1.5)
    # box [0,2]^3 opening toward +z; rect axes: 0=xy(z) 1=yz(x) 2=zx(y)
    b.add_rect(1, 0.0, 2.0, 0.0, 2.0, 0.0, m_green, positive=True)   # left
    b.add_rect(1, 0.0, 2.0, 0.0, 2.0, 2.0, m_red, positive=False)    # right
    b.add_rect(2, 0.0, 2.0, 0.0, 2.0, 0.0, m_white, positive=True)   # floor
    b.add_rect(2, 0.0, 2.0, 0.0, 2.0, 2.0, m_white, positive=False)  # ceil
    b.add_rect(0, 0.0, 2.0, 0.0, 2.0, 0.0, m_white, positive=True)   # back
    b.add_rect(2, 0.6, 1.4, 0.6, 1.4, 1.999, m_light, positive=False,
               important=True)
    b.add_sphere((0.6, 0.4, 0.7), 0.4, m_metal)
    b.add_sphere((1.4, 0.4, 1.2), 0.4, m_glass)
    scene = b.build()

    o = onp.OracleScene(background=(0, 0, 0), environment=(0, 0, 0))
    w = onp.Solid((0.73, 0.73, 0.73))
    o.add(onp.RectO((1, 2, 0), 0, 2, 0, 2, 0.0, True),
          onp.LambertianM(onp.Solid((0.12, 0.45, 0.15))))
    o.add(onp.RectO((1, 2, 0), 0, 2, 0, 2, 2.0, False),
          onp.LambertianM(onp.Solid((0.65, 0.05, 0.05))))
    o.add(onp.RectO((2, 0, 1), 0, 2, 0, 2, 0.0, True), onp.LambertianM(w))
    o.add(onp.RectO((2, 0, 1), 0, 2, 0, 2, 2.0, False), onp.LambertianM(w))
    o.add(onp.RectO((0, 1, 2), 0, 2, 0, 2, 0.0, True), onp.LambertianM(w))
    o.add(onp.RectO((2, 0, 1), 0.6, 1.4, 0.6, 1.4, 1.999, False),
          onp.DiffuseLightM(onp.Solid((4.0, 4.0, 4.0))), important=True)
    o.add(onp.SphereO((0.6, 0.4, 0.7), 0.4),
          onp.MetalM((0.8, 0.85, 0.88), 0.3))
    o.add(onp.SphereO((1.4, 0.4, 1.2), 0.4), onp.DielectricM(1.5))

    cam = CameraParam(
        look_from=(1.0, 1.0, 4.2), look_at=(1.0, 1.0, 0.0), vfov=40.0,
        up=(0.0, 1.0, 0.0), aperture=0.0, focus_dist=4.2,
    )
    ocam = onp.OracleCamera((1.0, 1.0, 4.2), (1.0, 1.0, 0.0), 40.0,
                            W / H, aperture=0.0, focus_dist=4.2)
    return scene, cam, o, ocam, 8


def weekend_scenes():
    """C2-class: checker ground + lambertian + metal under a sky
    background, NO important lights (exercises the no-MIS branch)."""
    b = SceneBuilder(background=(0.70, 0.80, 1.00))
    check = b.add_texture_checker(
        b.add_texture_solid((0.2, 0.3, 0.1)),
        b.add_texture_solid((0.9, 0.9, 0.9)), 10.0,
    )
    b.add_sphere((0.0, -100.5, -1.0), 100.0, b.add_lambertian(check))
    b.add_sphere((0.0, 0.0, -1.0), 0.5,
                 b.add_lambertian(b.add_texture_solid((0.7, 0.3, 0.3))))
    b.add_sphere((1.05, 0.0, -1.0), 0.5, b.add_metal((0.8, 0.8, 0.8), 0.15))
    scene = b.build()

    o = onp.OracleScene(background=(0.70, 0.80, 1.00),
                        environment=(0.0, 0.0, 0.0))
    o.add(onp.SphereO((0.0, -100.5, -1.0), 100.0),
          onp.LambertianM(onp.CheckerTex(
              onp.Solid((0.2, 0.3, 0.1)), onp.Solid((0.9, 0.9, 0.9)),
              10.0)))
    o.add(onp.SphereO((0.0, 0.0, -1.0), 0.5),
          onp.LambertianM(onp.Solid((0.7, 0.3, 0.3))))
    o.add(onp.SphereO((1.05, 0.0, -1.0), 0.5),
          onp.MetalM((0.8, 0.8, 0.8), 0.15))

    cam = CameraParam(
        look_from=(0.0, 0.3, 1.2), look_at=(0.3, 0.0, -1.0), vfov=50.0,
        up=(0.0, 1.0, 0.0), aperture=0.0, focus_dist=2.4,
    )
    ocam = onp.OracleCamera((0.0, 0.3, 1.2), (0.3, 0.0, -1.0), 50.0,
                            W / H, aperture=0.0, focus_dist=2.4)
    return scene, cam, o, ocam, 6


def smoke_scenes():
    """Constant-medium class: an isotropic smoke ball over a bright
    floor with a rect light — exercises the stochastic medium double
    hit (constant_medium.rs quirks) and the isotropic phase."""
    b = SceneBuilder(background=(0.1, 0.1, 0.12))
    white = b.add_texture_solid((0.8, 0.8, 0.8))
    lite = b.add_texture_solid((5.0, 5.0, 5.0))
    gray = b.add_texture_solid((0.6, 0.6, 0.6))
    m_floor = b.add_lambertian(white)
    m_light = b.add_diffuse_light(lite)
    m_smoke = b.add_isotropic(gray)
    b.add_rect(2, -3.0, 3.0, -3.0, 3.0, 0.0, m_floor, positive=True)
    b.add_rect(2, -1.0, 1.0, -1.0, 1.0, 3.5, m_light, positive=False,
               important=True)
    b.add_medium(1.2, m_smoke, spheres=[((0.0, 1.0, 0.0), 0.9)])
    scene = b.build()

    o = onp.OracleScene(background=(0.1, 0.1, 0.12),
                        environment=(0.0, 0.0, 0.0))
    o.add(onp.RectO((2, 0, 1), -3, 3, -3, 3, 0.0, True),
          onp.LambertianM(onp.Solid((0.8, 0.8, 0.8))))
    o.add(onp.RectO((2, 0, 1), -1, 1, -1, 1, 3.5, False),
          onp.DiffuseLightM(onp.Solid((5.0, 5.0, 5.0))), important=True)
    o.add(onp.ConstantMediumO(onp.SphereO((0.0, 1.0, 0.0), 0.9), 1.2),
          onp.IsotropicM(onp.Solid((0.6, 0.6, 0.6))))

    cam = CameraParam(
        look_from=(0.0, 1.6, 4.0), look_at=(0.0, 0.9, 0.0), vfov=45.0,
        up=(0.0, 1.0, 0.0), aperture=0.0, focus_dist=4.0,
    )
    ocam = onp.OracleCamera((0.0, 1.6, 4.0), (0.0, 0.9, 0.0), 45.0,
                            W / H, aperture=0.0, focus_dist=4.0)
    return scene, cam, o, ocam, 8


def earthmap_scenes():
    """Image-texture class: the earthmap sphere under a sky — pins the
    sphere-uv mapping (theta/phi from the outward normal) and the
    clamp/flip-v/nearest/255 atlas lookup chain independently."""
    import os

    from PIL import Image as PILImage

    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        "earthmap.jpg")
    with PILImage.open(path) as im:
        arr = np.asarray(im.convert("RGB"))

    b = SceneBuilder(background=(0.75, 0.8, 0.9))
    earth = b.add_texture_image(arr)
    b.add_sphere((0.0, 0.0, -1.6), 0.8, b.add_lambertian(earth))
    scene = b.build()

    o = onp.OracleScene(background=(0.75, 0.8, 0.9),
                        environment=(0.0, 0.0, 0.0))
    o.add(onp.SphereO((0.0, 0.0, -1.6), 0.8),
          onp.LambertianM(onp.ImageTex(arr)))

    cam = CameraParam(
        look_from=(0.0, 0.3, 1.0), look_at=(0.0, 0.0, -1.6), vfov=45.0,
        up=(0.0, 1.0, 0.0), aperture=0.0, focus_dist=2.6,
    )
    ocam = onp.OracleCamera((0.0, 0.3, 1.0), (0.0, 0.0, -1.6), 45.0,
                            W / H, aperture=0.0, focus_dist=2.6)
    return scene, cam, o, ocam, 4


def transform_scenes():
    """Instancing-transform class: a rotated+scaled (ellipsoid) sphere
    and a ROTATED rect light sampled as an important light — pins the
    object-space hit, the |inv d| window/t normalization, the
    M-mapped normal quirk, and the transformed Samplable pdf chain."""
    import math

    ang = math.radians(30.0)
    rot = np.array([
        [math.cos(ang), 0.0, math.sin(ang)],
        [0.0, 1.0, 0.0],
        [-math.sin(ang), 0.0, math.cos(ang)],
    ], np.float32)
    scale = np.diag([1.4, 0.8, 1.0]).astype(np.float32)
    m_sph = rot @ scale
    t_sph = np.array([0.0, 0.6, 0.0], np.float32)
    tilt = math.radians(25.0)
    m_lit = np.array([
        [1.0, 0.0, 0.0],
        [0.0, math.cos(tilt), -math.sin(tilt)],
        [0.0, math.sin(tilt), math.cos(tilt)],
    ], np.float32)
    t_lit = np.array([0.0, 3.0, 0.0], np.float32)

    b = SceneBuilder(background=(0.1, 0.1, 0.12))
    white = b.add_texture_solid((0.75, 0.75, 0.75))
    red = b.add_texture_solid((0.7, 0.25, 0.2))
    lite = b.add_texture_solid((5.0, 5.0, 5.0))
    b.add_rect(2, -3.0, 3.0, -3.0, 3.0, 0.0, b.add_lambertian(white),
               positive=True)
    b.add_sphere((0.0, 0.0, 0.0), 0.7, b.add_lambertian(red),
                 transform=(m_sph, t_sph))
    b.add_rect(2, -0.8, 0.8, -0.8, 0.8, 0.0, b.add_diffuse_light(lite),
               positive=False, important=True, transform=(m_lit, t_lit))
    scene = b.build()

    o = onp.OracleScene(background=(0.1, 0.1, 0.12),
                        environment=(0.0, 0.0, 0.0))
    o.add(onp.RectO((2, 0, 1), -3, 3, -3, 3, 0.0, True),
          onp.LambertianM(onp.Solid((0.75, 0.75, 0.75))))
    o.add(onp.TransformO(onp.SphereO((0.0, 0.0, 0.0), 0.7), m_sph, t_sph),
          onp.LambertianM(onp.Solid((0.7, 0.25, 0.2))))
    o.add(onp.TransformO(onp.RectO((2, 0, 1), -0.8, 0.8, -0.8, 0.8, 0.0,
                                   False), m_lit, t_lit),
          onp.DiffuseLightM(onp.Solid((5.0, 5.0, 5.0))), important=True)

    cam = CameraParam(
        look_from=(0.0, 1.6, 4.2), look_at=(0.0, 0.7, 0.0), vfov=42.0,
        up=(0.0, 1.0, 0.0), aperture=0.0, focus_dist=4.2,
    )
    ocam = onp.OracleCamera((0.0, 1.6, 4.2), (0.0, 0.7, 0.0), 42.0,
                            W / H, aperture=0.0, focus_dist=4.2)
    return scene, cam, o, ocam, 6


@pytest.mark.parametrize(
    "maker", [cornell_scenes, weekend_scenes, smoke_scenes,
              earthmap_scenes, transform_scenes]
)
def test_production_matches_independent_oracle(maker):
    scene, cam, oracle_scene, ocam, depth = maker()

    prod_a = _prod_render(scene, cam, depth, range(0, SPP))
    prod_b = _prod_render(scene, cam, depth, range(1000, 1000 + SPP))
    orac = onp.render(oracle_scene, ocam, W, H, SPP, depth, seed=7)

    d_self = np.abs(prod_a - prod_b).mean()
    d_cross = 0.5 * (np.abs(prod_a - orac).mean()
                     + np.abs(prod_b - orac).mean())
    # same estimator, same spp -> cross-difference sits at the
    # different-key noise floor; a biased term would push it far out
    assert d_cross < 1.5 * d_self + 1e-4, (d_cross, d_self)
    # and the global means agree tightly (noise averages out over pixels)
    assert abs(prod_a.mean() - orac.mean()) < 6 * d_self / np.sqrt(W), (
        prod_a.mean(), orac.mean(), d_self,
    )
