"""Tests for the v4ray-compatible Python API (reference src/py.rs
surface) and the frontend plugin framework (reference v4ray_frontend/)."""

import asyncio
from uuid import uuid4

import numpy as np


def test_scene_build_and_async_render():
    import v4ray_tpu as v4ray

    scene = v4ray.Scene(background=(0.6, 0.7, 0.9))
    scene.add(
        v4ray.shape.Sphere((0, 0, -3), 1.0),
        v4ray.material.Lambertian(v4ray.texture.SolidColor((0.8, 0.3, 0.3))),
    )
    scene.add(
        v4ray.shape.Sphere((0, -101, -3), 100.0),
        v4ray.material.Metal((0.9, 0.9, 0.9), 0.1),
    )
    renderer = v4ray.Renderer(
        v4ray.RendererParam(32, 24, 4, True),
        v4ray.PerspectiveCameraParam((0, 0, 1), (0, 0, -1), 60),
        scene,
    )
    img = asyncio.run(renderer.render())
    assert isinstance(img, np.ndarray)
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
    img2 = asyncio.run(renderer.render())
    assert not np.array_equal(img, img2)  # fresh pass each call


def test_shared_material_compiles_once():
    import v4ray_tpu as v4ray

    scene = v4ray.Scene(background=(0, 0, 0))
    mat = v4ray.material.Dielectric(1.5)
    scene.add(v4ray.shape.Sphere((0, 0, -3), 1.0), mat)
    scene.add(v4ray.shape.Sphere((2, 0, -3), 1.0), mat)
    data = scene.compile()
    assert len(data.materials) == 1
    assert data.n_spheres == 2


def test_python_sphere_hit_batched():
    import v4ray_tpu as v4ray

    s = v4ray.shape.Sphere((0, 0, -5), 1.0)
    bb = s.bounding_box()
    assert np.allclose(bb.min, (-1, -1, -6))
    assert np.allclose(bb.max, (1, 1, -4))
    ray = v4ray.Ray(
        origin=[[0, 0, 0], [0, 0, 0]],
        direction=[[0, 0, -1], [0, 1, 0]],
    )
    rec = s.hit(ray, 1e-3, np.inf)
    assert rec.mask.tolist() == [True, False]
    assert np.isclose(rec.t[0], 4.0)
    assert rec.front_face[0]


def test_cuboid_and_medium_via_api():
    import v4ray_tpu as v4ray

    scene = v4ray.Scene(background=(1, 1, 1))
    iso = v4ray.material.Isotropic(v4ray.texture.SolidColor((1, 1, 1)))
    scene.add(
        v4ray.shape.ConstantMedium(v4ray.shape.Sphere((0, 0, 0), 1.0), 0.5), iso
    )
    scene.add(
        v4ray.shape.Cuboid((0, 0, 0), (1, 1, 1)),
        v4ray.material.Lambertian(v4ray.texture.SolidColor((0.5, 0.5, 0.5))),
    )
    data = scene.compile()
    assert data.n_medium == 1
    assert data.n_rects == 6


def test_frontend_sphere_plugin_roundtrip():
    from v4ray_frontend_tpu import shapes
    from v4ray_frontend_tpu.shape import Sphere

    assert Sphere in shapes
    data = [1.0, 2.0, 3.0, 4.0]
    assert Sphere.validate(data)
    assert not Sphere.validate([0.0, 0.0, 0.0, -1.0])
    j = Sphere.to_json(data)
    assert Sphere.from_json(j) == data
    built = Sphere.apply(data)
    assert len(built) == 1 and built[0].radius == 4.0


def test_frontend_texture_graph():
    from v4ray_frontend_tpu.texture import Checker, SolidColor

    t1, t2 = uuid4(), uuid4()
    solid_data = SolidColor.from_json({"color": "#ff8000"})
    assert solid_data == [(255, 128, 0)]
    assert SolidColor.to_json(solid_data)["color"] == "#ff8000"

    data = [t1, t2, 2.0]
    assert Checker.validate(data, {t1, t2})
    assert not Checker.validate(data, {t1})  # missing ref
    textures = {
        t1: SolidColor.apply(solid_data, {}),
        t2: SolidColor.apply([(0, 0, 255)], {}),
    }
    checker = Checker.apply(data, textures)
    assert checker.density == 2.0


def test_frontend_material_preview_standins():
    import v4ray_tpu as v4ray
    from v4ray_frontend_tpu.material import Dielectric, Metal

    # glass previews as gray lambertian (reference material.py:111-114)
    prev = Dielectric.apply_preview([1.5], {})
    assert isinstance(prev, v4ray.material.Lambertian)
    # metal previews as albedo-colored lambertian
    prev = Metal.apply_preview([(255, 0, 0), 0.2], {})
    assert isinstance(prev, v4ray.material.Lambertian)
    real = Metal.apply([(255, 0, 0), 0.2], {})
    assert isinstance(real, v4ray.material.Metal)


def test_frontend_camera_validate_and_preview():
    from v4ray_frontend_tpu.camera import PerspectiveCamera

    data = PerspectiveCamera.from_json(
        {
            "look_from": [0, 0, -10], "look_at": [0, 0, 0], "vfov": 40,
            "up": [0, 1, 0], "aperture": 2.0, "focus_dist": 10.0,
            "time0": 0.0, "time1": 0.0,
        }
    )
    assert PerspectiveCamera.validate(data)
    cam = PerspectiveCamera.apply(data)
    assert cam.aperture == 2.0
    prev = PerspectiveCamera.apply_preview(data)
    assert prev.aperture == 0.0  # pinhole preview
    bad = list(data)
    bad[6] = 200.0  # fov out of range
    assert not PerspectiveCamera.validate(bad)


def test_important_light_via_api():
    import v4ray_tpu as v4ray

    scene = v4ray.Scene(background=(0, 0, 0))
    scene.add_important(
        v4ray.shape.ZXRect(-1, 1, -1, 1, 2.0, positive=False),
        v4ray.material.DiffuseLight(v4ray.texture.SolidColor((5, 5, 5))),
    )
    data = scene.compile()
    assert data.n_lights == 1


def test_medium_generic_boundaries_via_api():
    """ConstantMedium over cuboid / rect / mesh boundaries (reference
    constant_medium.rs is generic over the inner Hittable)."""
    import v4ray_tpu as v4ray

    scene = v4ray.Scene(background=(1, 1, 1))
    iso = v4ray.material.Isotropic(v4ray.texture.SolidColor((1, 1, 1)))
    scene.add(
        v4ray.shape.ConstantMedium(
            v4ray.shape.Cuboid((0, 0, 0), (1, 1, 1)), 0.2), iso
    )
    scene.add(
        v4ray.shape.ConstantMedium(
            v4ray.shape.XYRect(0, 1, 0, 1, -2.0), 0.4), iso
    )
    scene.add(
        v4ray.shape.ConstantMedium(
            v4ray.shape.Triangle([[0, 0, 0], [1, 0, 0], [0, 1, 0]]), 0.1),
        iso,
    )
    data = scene.compile()
    assert data.n_medium == 3


def test_shared_texture_builds_once():
    """A texture object reused by two materials (and a checker child)
    maps to one table entry — one atlas slot / differentiable slot."""
    import numpy as np

    import v4ray_tpu as v4ray

    img = np.full((4, 4, 3), 128, np.uint8)
    tex = v4ray.texture.Image(img)
    s = v4ray.Scene(background=(0, 0, 0))
    s.add(v4ray.shape.Sphere((0, 0, -3), 1.0), v4ray.material.Lambertian(tex))
    s.add(v4ray.shape.Sphere((2, 0, -3), 1.0), v4ray.material.Isotropic(tex))
    scene = s.compile()
    assert scene.textures.images.shape[0] == 1  # not duplicated


def test_moving_sphere_api_and_plugin():
    """MovingSphere through the v4ray compat surface and the frontend
    plugin registry (superset: true motion blur)."""
    import v4ray_tpu as v4ray
    from v4ray_frontend_tpu import shapes
    from v4ray_frontend_tpu.shape import MovingSphere

    assert MovingSphere in shapes
    data = [-0.5, 0.0, -3.0, 0.5, 0.0, -3.0, 0.5, 0.0, 1.0]
    assert MovingSphere.validate(data)
    assert not MovingSphere.validate(data[:8] + [0.0])  # time1 == time0
    j = MovingSphere.to_json(data)
    assert MovingSphere.from_json(j) == data
    (shape,) = MovingSphere.apply(data)
    assert shape.radius == 0.5

    scene = v4ray.Scene(background=(0.2, 0.2, 0.2))
    scene.add(
        shape,
        v4ray.material.Lambertian(v4ray.texture.SolidColor((0.8, 0.2, 0.2))),
    )
    cam = v4ray.PerspectiveCameraParam(
        look_from=(0, 0, 1), look_at=(0, 0, -3), vfov=60,
        time0=0.0, time1=1.0,
    )
    renderer = v4ray.Renderer(
        v4ray.RendererParam(24, 24, max_depth=3), cam, scene
    )
    img = asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        renderer.render()
    )
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    # the red streak is visible somewhere
    assert (img[:, :, 0] - img[:, :, 1]).max() > 0.01


def test_user_defined_shape():
    """Scene.add is duck-typed on _build: a user-defined composite
    shape (a ring of spheres) renders through the normal pipeline —
    the working counterpart of the reference's PyHittable extension
    point, whose own conversion is todo!() for everything but Sphere
    (reference src/hittable/py.rs:142-153)."""
    import math

    import v4ray_tpu as v4ray

    class Ring:
        """User shape: N small spheres on a circle."""

        def __init__(self, center, radius, n=8, r_small=0.25):
            self.center, self.radius = center, radius
            self.n, self.r_small = n, r_small

        def _build(self, b, material, important):
            cx, cy, cz = self.center
            for i in range(self.n):
                a = 2 * math.pi * i / self.n
                b.add_sphere(
                    (cx + self.radius * math.cos(a), cy,
                     cz + self.radius * math.sin(a)),
                    self.r_small, material, important=important,
                )

    scene = v4ray.Scene(background=(0.6, 0.7, 0.9))
    red = v4ray.material.Lambertian(
        v4ray.texture.SolidColor((0.8, 0.2, 0.2)))
    scene.add(Ring((0.0, 0.0, -3.0), 1.2), red)
    compiled = scene.compile()
    assert compiled.n_spheres == 8

    r = v4ray.Renderer(
        v4ray.RendererParam(32, 32, 4),
        v4ray.PerspectiveCameraParam(
            look_from=(0, 2.5, 1.5), look_at=(0, 0, -3), vfov=60
        ),
        scene,
    )
    import asyncio

    img = np.asarray(asyncio.run(r.render()))
    # the ring reads as red excess over blue against the blue-ish sky
    assert ((img[..., 0] - img[..., 2]) > 0.05).sum() > 10
