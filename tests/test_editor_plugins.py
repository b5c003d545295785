"""Round-5 editor plugins: Image texture, Mesh and ConstantMedium
shapes (the backend/CLI-schema types the reference editor never
surfaced — reference src/json.rs:147-155 image, :89-103 mesh +
constant-medium vs v4ray_frontend/__init__.py's three-entry
registries).  Covers JSON round-trip, validation, document->scene
generation, CLI-schema export, and the web API's string fields."""

import os

import numpy as np
import pytest

from ray_tracing_tpu.editor import (
    Document,
    RendererData,
    analyze,
    document_from_json,
    document_to_json,
    generate,
)
from ray_tracing_tpu.editor.export import document_to_scene_param
from v4ray_frontend_tpu import shapes, textures
from v4ray_frontend_tpu.shape import (
    ConstantMediumCuboid,
    ConstantMediumSphere,
    Mesh,
)
from v4ray_frontend_tpu.texture import Image

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
EARTH = os.path.join(DATA, "earthmap.jpg")


def tiny_obj(tmp_path):
    """Two-triangle square facing +z at z=-3."""
    p = tmp_path / "square.obj"
    p.write_text(
        "o square\n"
        "v -1 -1 -3\nv 1 -1 -3\nv 1 1 -3\nv -1 1 -3\n"
        "f 1 2 3\nf 1 3 4\n"
    )
    return str(p)


def test_new_plugins_registered():
    kinds = {s.kind() for s in shapes}
    assert {"mesh", "constant-medium-sphere",
            "constant-medium-cuboid"} <= kinds
    assert "image" in {t.kind() for t in textures}


def test_plugin_json_roundtrips(tmp_path):
    obj = tiny_obj(tmp_path)
    cases = [
        (Image, [EARTH]),
        (Mesh, [obj, ""]),
        (Mesh, [obj, "square"]),
        (ConstantMediumSphere, [0.0, 1.0, -3.0, 2.0, 0.5]),
        (ConstantMediumCuboid, [0.0, 0.0, 0.0, 1.0, 2.0, 3.0, 0.25]),
    ]
    for plugin, values in cases:
        j = plugin.to_json(values)
        assert plugin.from_json(j) == values, plugin.KIND


def test_plugin_validation(tmp_path):
    obj = tiny_obj(tmp_path)
    assert Image.validate([EARTH], set())
    assert not Image.validate([""], set())
    assert not Image.validate(["/nonexistent/file.png"], set())
    assert Mesh.validate([obj, ""])
    assert not Mesh.validate(["/nonexistent.obj", ""])
    assert ConstantMediumSphere.validate([0.0, 0.0, 0.0, 1.0, 0.5])
    assert not ConstantMediumSphere.validate([0.0, 0.0, 0.0, -1.0, 0.5])
    assert not ConstantMediumSphere.validate([0.0, 0.0, 0.0, 1.0, 0.0])
    assert not ConstantMediumCuboid.validate(
        [1.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.5]
    )


def _doc_with(shape_kind, shape_values, tex_kind="solid color",
              tex_values=((204, 51, 51),), mat_kind="lambertian"):
    doc = Document(renderer=RendererData(24, 24, 4, (30, 30, 60)))
    doc = doc.set_camera(
        ("perspective",
         [0.0, 0.0, 1.0, 0.0, 0.0, -1.0, 60.0,
          0.0, 1.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    )
    doc, tex = doc.add_texture("t", (tex_kind, list(tex_values)))
    doc, mat = doc.add_material("m", (mat_kind, [tex]))
    doc, obj = doc.add_object(
        "node", shape=(shape_kind, list(shape_values)), material=mat,
        visible=True,
    )
    return doc, obj


def test_earthmap_sphere_in_editor():
    """zy_scene's earthmap sphere is now expressible in the editor:
    image texture -> lambertian -> sphere, generated and rendered."""
    doc = Document(renderer=RendererData(24, 24, 3, (20, 20, 20)))
    doc = doc.set_camera(
        ("perspective",
         [0.0, 0.0, 1.0, 0.0, 0.0, -1.0, 60.0,
          0.0, 1.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    )
    doc, tex = doc.add_texture("earth", ("image", [EARTH]))
    doc, mat = doc.add_material("m", ("lambertian", [tex]))
    doc, obj = doc.add_object(
        "globe", shape=("sphere", [0.0, 0.0, -3.0, 1.5]), material=mat,
        visible=True,
    )
    a = analyze(doc)
    assert tex in a.valid_textures and obj in a.rendered_objects

    # project-JSON round trip preserves the image node
    doc2 = document_from_json(document_to_json(doc))
    assert doc2.textures[tex].texture == ("image", [EARTH])

    scene, cam, rp = generate(doc2)
    assert scene.compile().textures.images.shape[0] == 1

    # preview render: the globe shows the atlas, not a flat color
    import asyncio

    scene_p, cam_p, rp_p = generate(doc2, preview=True)
    import v4ray_tpu as v4ray

    r = v4ray.Renderer(rp_p, cam_p, scene_p)
    img = np.asarray(asyncio.run(r.render()))
    h, w = img.shape[:2]
    center = img[h // 3: 2 * h // 3, w // 3: 2 * w // 3]
    assert center.std() > 0.01  # textured, not uniform


def test_mesh_and_medium_generate_and_export(tmp_path):
    obj_file = tiny_obj(tmp_path)
    doc, obj = _doc_with("mesh", [obj_file, ""])
    scene, cam, rp = generate(doc)
    assert scene.compile().n_triangles == 2

    # isotropic smoke ball generates a medium
    doc2, obj2 = _doc_with(
        "constant-medium-sphere", [0.0, 0.0, -3.0, 1.0, 0.7],
        mat_kind="isotropic",
    )
    scene2, _, _ = generate(doc2)
    assert scene2.compile().n_medium == 1

    # CLI-schema export of all new kinds builds a scene
    from ray_tracing_tpu import build_scene

    for doc_i, tris, med in ((doc, 2, 0), (doc2, 0, 1)):
        param = document_to_scene_param(doc_i)
        bundle = build_scene(param)
        assert bundle.scene.n_triangles == tris
        assert bundle.scene.n_medium == med

    doc3, _ = _doc_with(
        "constant-medium-cuboid",
        [-1.0, -1.0, -4.0, 1.0, 1.0, -2.0, 0.4], mat_kind="isotropic",
    )
    param3 = document_to_scene_param(doc3)
    assert param3["objects"][0]["shape"]["type"] == "constant-medium"
    assert build_scene(param3).scene.n_medium == 1


def test_image_texture_exports_to_cli_schema():
    doc = Document(renderer=RendererData(16, 16, 2, (0, 0, 0)))
    doc = doc.set_camera(
        ("perspective",
         [0.0, 0.0, 1.0, 0.0, 0.0, -1.0, 60.0,
          0.0, 1.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    )
    doc, tex = doc.add_texture("earth", ("image", [EARTH]))
    doc, mat = doc.add_material("m", ("lambertian", [tex]))
    doc, _ = doc.add_object(
        "globe", shape=("sphere", [0.0, 0.0, -3.0, 1.0]), material=mat,
        visible=True,
    )
    param = document_to_scene_param(doc)
    tdef = next(t for t in param["textures"] if t["type"] == "image")
    assert tdef["file"] == EARTH
    from ray_tracing_tpu import build_scene

    assert build_scene(param).scene.textures.images.shape[0] == 1


def test_moving_sphere_exports_to_cli_schema():
    doc, _ = _doc_with(
        "moving-sphere",
        [0.0, 0.0, -3.0, 1.0, 0.0, -3.0, 0.5, 0.0, 1.0],
    )
    param = document_to_scene_param(doc)
    sdef = param["objects"][0]["shape"]
    assert sdef["type"] == "moving-sphere"
    from ray_tracing_tpu import build_scene

    assert build_scene(param).scene.has_motion
