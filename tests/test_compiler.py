"""Scene compiler / JSON schema tests (reference src/json.rs)."""

import numpy as np
import pytest

from ray_tracing_tpu import SceneBuilder, build_scene, load_scene_json
from ray_tracing_tpu.models.mesh import mesh_triangles, parse_obj
from ray_tracing_tpu.models.scene import (
    LIGHT_RECT,
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_LAMBERTIAN,
)

CAM = {"look_from": [0, 0, 1], "look_at": [0, 0, 0], "vfov": 60}
REN = {"width": 8, "height": 8}


def test_zy_scene_inventory():
    bd = load_scene_json("data/zy_scene.json")
    s = bd.scene
    assert s.n_spheres == 9
    assert s.n_rects == 6
    assert s.n_triangles == 0
    assert s.n_lights == 1
    assert s.lights.kind[0] == LIGHT_RECT
    assert bd.renderer.width == 800 and bd.renderer.max_depth == 20
    # light rect: y=554.999, positive false
    li = s.lights.index[0]
    assert np.isclose(float(s.rects.k[li]), 554.999)
    assert not bool(s.rects.positive[li])


def test_scene_json_inventory():
    bd = load_scene_json("data/scene.json")
    s = bd.scene
    # bunny (4968) + 1 metal triangle
    assert s.n_triangles == 4969
    # 6 cuboid faces + 5 walls + 1 light
    assert s.n_rects == 12
    # glass + earth + noise (the medium's boundary sphere lives in the
    # medium table, not the sphere table)
    assert s.n_spheres == 3
    assert s.n_medium == 1
    assert len(s.media) == 1
    assert s.media.boundaries[0].n_sph == 1
    # cuboid rects share one transform slot (not identity)
    tr = np.asarray(s.rects.transform)
    assert (tr > 0).sum() == 6
    assert len(set(tr[tr > 0].tolist())) == 1


def test_named_refs_are_memoized():
    param = {
        "renderer": REN,
        "camera": CAM,
        "materials": [
            {
                "name": "white",
                "type": "lambertian",
                "texture": {"name": "wtex", "type": "solid-color", "color": [0.7, 0.7, 0.7]},
            }
        ],
        "objects": [
            {"shape": {"type": "sphere", "center": [0, 0, 0], "radius": 1}, "material": "white"},
            {"shape": {"type": "sphere", "center": [2, 0, 0], "radius": 1}, "material": "white"},
        ],
    }
    bd = build_scene(param)
    s = bd.scene
    assert s.n_spheres == 2
    # one material entry, shared by both spheres
    assert len(s.materials) == 1
    assert np.asarray(s.spheres.material).tolist() == [0, 0]


def test_invisible_objects_skipped():
    param = {
        "renderer": REN,
        "camera": CAM,
        "objects": [
            {
                "shape": {"type": "sphere", "center": [0, 0, 0], "radius": 1},
                "material": {"type": "dielectric", "ir": 1.5},
                "visible": False,
            }
        ],
    }
    assert build_scene(param).scene.n_spheres == 0


def test_cuboid_expansion_matches_reference():
    b = SceneBuilder()
    m = b.add_dielectric(1.5)
    b.add_cuboid((0, 0, 0), (1, 2, 3), m)
    s = b.build()
    assert s.n_rects == 6
    # reference cuboid.rs:30-61 ordering: xy(z0,F), xy(z1,T), yz(x0,F),
    # yz(x1,T), zx(y0,F), zx(y1,T)
    axes = np.asarray(s.rects.axis).tolist()
    ks = np.asarray(s.rects.k).tolist()
    pos = np.asarray(s.rects.positive).tolist()
    assert axes == [0, 0, 1, 1, 2, 2]
    assert ks == [0.0, 3.0, 0.0, 1.0, 0.0, 2.0]
    assert pos == [False, True, False, True, False, True]


def test_mesh_smooth_normals():
    obj = parse_obj("data/bunny.obj")
    assert obj.positions.shape == (2503, 3)
    pts, nrm, uvs = mesh_triangles(obj)
    assert pts.shape == (4968, 3, 3)
    # smooth normals are unit length
    assert np.allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-4)
    # shared vertices share normals: find two faces sharing vertex 0
    faces = obj.models[0].indices
    sharing = np.nonzero((faces == faces[0, 0]).any(axis=1))[0]
    assert len(sharing) >= 2
    # no texcoords in bunny -> zero uvs
    assert np.allclose(uvs, 0.0)


def test_texture_cycle_detected():
    param = {
        "renderer": REN,
        "camera": CAM,
        "textures": [
            {"name": "a", "type": "checker", "odd": "a", "even": "a", "density": 1.0}
        ],
        "objects": [
            {
                "shape": {"type": "sphere", "center": [0, 0, 0], "radius": 1},
                "material": {"type": "lambertian", "texture": "a"},
            }
        ],
    }
    with pytest.raises(ValueError, match="cycle"):
        build_scene(param)


def test_medium_over_cuboid_compiles():
    """The RTNW smoke box: constant-medium over a cuboid boundary
    (reference constant_medium.rs generic over Hittable)."""
    param = {
        "renderer": REN,
        "camera": CAM,
        "objects": [
            {
                "shape": {
                    "type": "constant-medium",
                    "density": 0.1,
                    "shape": {"type": "cuboid", "p0": [0, 0, 0], "p1": [1, 1, 1]},
                },
                "material": {
                    "type": "isotropic",
                    "albedo": {"type": "solid-color", "color": [1, 1, 1]},
                },
            }
        ],
    }
    s = build_scene(param).scene
    assert s.n_medium == 1
    assert s.media.boundaries[0].n_rect == 6
    assert s.n_rects == 0  # boundary rects are not visible scene rects


def test_medium_inner_transform_rejected():
    param = {
        "renderer": REN,
        "camera": CAM,
        "objects": [
            {
                "shape": {
                    "type": "constant-medium",
                    "density": 0.1,
                    "shape": {
                        "type": "sphere", "center": [0, 0, 0], "radius": 1,
                        "translate": [1, 0, 0],
                    },
                },
                "material": {
                    "type": "isotropic",
                    "albedo": {"type": "solid-color", "color": [1, 1, 1]},
                },
            }
        ],
    }
    with pytest.raises(NotImplementedError):
        build_scene(param)


def test_triangle_default_face_normal():
    b = SceneBuilder()
    m = b.add_dielectric(1.5)
    b.add_triangle([[0, 0, 0], [1, 0, 0], [0, 1, 0]], m)
    s = b.build()
    # (p2-p1)x(p3-p2) = (1,0,0)x(-1,1,0) = (0,0,1)
    assert np.allclose(np.asarray(s.triangles.n0[0]), [0, 0, 1], atol=1e-6)


def test_baked_triangle_transform():
    b = SceneBuilder()
    m = b.add_dielectric(1.5)
    scale = (np.diag([2.0, 2.0, 2.0]).astype(np.float32), np.array([1.0, 0, 0]))
    b.add_triangle([[0, 0, 0], [1, 0, 0], [0, 1, 0]], m, transform=scale)
    s = b.build()
    assert np.allclose(np.asarray(s.triangles.v0[0]), [1, 0, 0])
    assert np.allclose(np.asarray(s.triangles.e12[0]), [2, 0, 0])
    assert np.allclose(np.asarray(s.triangles.e13[0]), [0, 2, 0])


def test_material_types_mapped():
    bd = load_scene_json("data/zy_scene.json")
    mt = np.asarray(bd.scene.materials.mtype)
    assert (mt == MAT_DIFFUSE_LIGHT).sum() == 1
    assert (mt == MAT_DIELECTRIC).sum() == 1
    assert (mt == MAT_LAMBERTIAN).sum() >= 7
