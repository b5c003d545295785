"""Editor framework tests: immutable Document mutators, derived
Analysis (validity / inheritance / rendered sets), rerender predicate,
undo tree, project JSON round-trip, and preview-vs-final generation
(semantics from reference main.py)."""

import json

import numpy as np
import pytest

from ray_tracing_tpu.editor import (
    Document,
    RendererData,
    UndoTree,
    analyze,
    document_from_json,
    document_to_json,
    generate,
    need_rerender,
)


def simple_doc():
    doc = Document(renderer=RendererData(32, 24, 4, (128, 128, 255)))
    doc = doc.set_camera(
        ("perspective",
         [0.0, 0.0, 1.0, 0.0, 0.0, -1.0, 60.0, 0.0, 1.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    )
    doc, tex = doc.add_texture("red", ("solid color", [(204, 51, 51)]))
    doc, mat = doc.add_material("red mat", ("lambertian", [tex]))
    doc, obj = doc.add_object(
        "ball", shape=("sphere", [0.0, 0.0, -3.0, 1.0]), material=mat,
        visible=True,
    )
    return doc, tex, mat, obj


def test_mutators_are_immutable():
    doc, tex, mat, obj = simple_doc()
    doc2 = doc.modify_object(obj, visible=False)
    assert doc.objects[obj].visible is True
    assert doc2.objects[obj].visible is False


def test_analysis_validity_and_rendered():
    doc, tex, mat, obj = simple_doc()
    a = analyze(doc)
    assert tex in a.valid_textures
    assert mat in a.valid_materials
    assert obj in a.rendered_objects
    assert a.camera_valid
    assert a.rendered_materials == frozenset({mat})
    assert a.rendered_textures == frozenset({tex})

    # invalid radius -> object drops out of the rendered set
    doc_bad = doc.modify_object(obj, shape=("sphere", [0.0, 0.0, -3.0, -1.0]))
    a_bad = analyze(doc_bad)
    assert obj not in a_bad.valid_objects
    assert obj not in a_bad.rendered_objects


def test_texture_cycle_invalid():
    doc = Document()
    doc, t1 = doc.add_texture("a")
    doc, t2 = doc.add_texture("b")
    doc = doc.modify_texture(t1, texture=("checker", [t2, t2, 1.0]))
    doc = doc.modify_texture(t2, texture=("checker", [t1, t1, 1.0]))
    a = analyze(doc)
    assert t1 not in a.valid_textures
    assert t2 not in a.valid_textures
    # breaking the cycle makes both valid
    doc, solid = doc.add_texture("solid", ("solid color", [(255, 255, 255)]))
    doc = doc.modify_texture(t2, texture=("checker", [solid, solid, 1.0]))
    a = analyze(doc)
    assert a.valid_textures >= {t1, t2, solid}


def test_material_inheritance_through_groups():
    doc = Document()
    doc, tex = doc.add_texture("white", ("solid color", [(255, 255, 255)]))
    doc, mat_g = doc.add_material("group mat", ("lambertian", [tex]))
    doc, mat_o = doc.add_material("own mat", ("dielectric", [1.5]))
    doc, group = doc.add_group("g", material=mat_g, visible=True)
    doc, child1 = doc.add_object(
        "inherits", parent=group,
        shape=("sphere", [0.0, 0.0, 0.0, 1.0]), visible=True,
    )
    doc, child2 = doc.add_object(
        "own", parent=group, shape=("sphere", [2.0, 0.0, 0.0, 1.0]),
        material=mat_o, visible=True,
    )
    a = analyze(doc)
    assert a.effective_materials[child1] == mat_g
    assert a.effective_materials[child2] == mat_o
    assert a.parents[child1] == group
    assert child1 in a.rendered_objects and child2 in a.rendered_objects


def test_visibility_requires_all_ancestors():
    doc = Document()
    doc, tex = doc.add_texture("w", ("solid color", [(255, 255, 255)]))
    doc, mat = doc.add_material("m", ("lambertian", [tex]))
    doc, group = doc.add_group("g", material=mat, visible=False)
    doc, child = doc.add_object(
        "c", parent=group, shape=("sphere", [0.0, 0.0, 0.0, 1.0]), visible=True
    )
    a = analyze(doc)
    assert child not in a.visible_objects  # hidden group hides children
    doc2 = doc.modify_object(group, visible=True)
    assert child in analyze(doc2).visible_objects


def test_need_rerender_predicate():
    doc, tex, mat, obj = simple_doc()
    a = analyze(doc)
    # renaming an object does not rerender (reference main.py:1475-1513)
    doc2 = doc.modify_object(obj, name="renamed")
    assert not need_rerender(doc, a, doc2, analyze(doc2))
    # changing a rendered texture payload does
    doc3 = doc.modify_texture(tex, texture=("solid color", [(0, 255, 0)]))
    assert need_rerender(doc, a, doc3, analyze(doc3))
    # changing the camera does
    doc4 = doc.set_camera(
        ("perspective",
         [0.0, 0.0, 2.0, 0.0, 0.0, -1.0, 60.0, 0.0, 1.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    )
    assert need_rerender(doc, a, doc4, analyze(doc4))
    # editing an UNRENDERED material does not
    doc5, mat2 = doc.add_material("unused", ("dielectric", [1.5]))
    assert not need_rerender(doc, a, doc5, analyze(doc5))


def test_undo_tree_branches_and_prune():
    doc, *_ = simple_doc()
    tree = UndoTree(doc, "new")
    d1 = doc.set_renderer(RendererData(64, 48, 4, (0, 0, 0)))
    tree.push(d1, "resize")
    d2 = d1.set_renderer(RendererData(128, 96, 4, (0, 0, 0)))
    tree.push(d2, "resize again")
    assert tree.document.renderer.width == 128
    assert tree.undo().renderer.width == 64
    assert tree.redo().renderer.width == 128
    # undo then a new edit -> branch
    tree.undo()
    d3 = d1.set_renderer(RendererData(256, 192, 4, (0, 0, 0)))
    tree.push(d3, "branch")
    assert tree.document.renderer.width == 256
    assert tree.undo().renderer.width == 64
    assert tree.redo().renderer.width == 256  # redo follows newest branch
    tree.prune_others()
    assert len(tree.nodes) == 3  # root -> d1 -> d3


def test_undo_tree_workspace_roundtrip(tmp_path):
    doc, *_ = simple_doc()
    tree = UndoTree(doc, "new")
    tree.push(doc.set_renderer(RendererData(64, 48, 4, (0, 0, 0))), "resize")
    path = str(tmp_path / "workspace.json")
    tree.save(path)
    tree2 = UndoTree.load(path)
    assert tree2.document.renderer.width == 64
    assert tree2.can_undo()
    assert tree2.undo().renderer.width == 32


def test_project_json_roundtrip():
    doc, tex, mat, obj = simple_doc()
    doc, group = doc.add_group("grp", material=mat, visible=True)
    doc, child = doc.add_object(
        "child", parent=group, shape=("sphere", [1.0, 0.0, -3.0, 0.5]),
        visible=True,
    )
    blob = json.dumps(document_to_json(doc))
    doc2 = document_from_json(json.loads(blob))
    assert doc2.renderer == doc.renderer
    assert doc2.camera == doc.camera
    assert set(doc2.objects) == set(doc.objects)
    assert doc2.objects[child].shape == doc.objects[child].shape
    assert doc2.objects[group].children == doc.objects[group].children
    assert doc2.materials[mat].material == doc.materials[mat].material
    assert doc2.textures[tex].texture == doc.textures[tex].texture
    a2 = analyze(doc2)
    assert child in a2.rendered_objects


def test_generate_final_and_preview():
    import asyncio

    import v4ray_tpu as v4ray

    doc, tex, mat, obj = simple_doc()
    scene, camera, param = generate(doc)
    assert param.max_depth == 4 and param.antialias
    assert np.allclose(scene.background, (128 / 255, 128 / 255, 1.0))
    assert scene.environment == (0.0, 0.0, 0.0)

    scene_p, camera_p, param_p = generate(doc, preview=True)
    assert param_p.max_depth == 1 and not param_p.antialias
    assert scene_p.environment == (1.0, 1.0, 1.0)
    assert camera_p.aperture == 0.0

    # the generated scene actually renders
    r = v4ray.Renderer(param_p, camera_p, scene_p)
    img = asyncio.run(r.render())
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()


def test_generate_without_camera_raises():
    doc = Document()
    with pytest.raises(ValueError):
        generate(doc)


def test_weekend_scene_example():
    import sys

    sys.path.insert(0, "examples")
    try:
        from weekend_scene import build
    finally:
        sys.path.pop(0)

    doc = build(seed=1)
    a = analyze(doc)
    assert len(a.rendered_objects) > 400  # ground + ~480 small + 3 big
    assert a.camera_valid
    blob = document_to_json(doc)
    doc2 = document_from_json(blob)
    assert len(analyze(doc2).rendered_objects) == len(a.rendered_objects)
    scene, camera, param = generate(doc2, preview=True)
    assert len(scene.objects) == len(a.rendered_objects)


def test_progressive_render_controller():
    import asyncio

    import v4ray_tpu as v4ray
    from ray_tracing_tpu.editor.render import ProgressiveRenderController

    doc, *_ = simple_doc()
    scene, camera, param = generate(doc, preview=True)
    renderer = v4ray.Renderer(param, camera, scene)
    updates = []

    async def run():
        ctl = ProgressiveRenderController(
            renderer, param.width, param.height,
            on_update=lambda img, n: updates.append(n), in_flight=2,
        )
        ctl.start()
        while ctl.iterations < 4:
            await asyncio.sleep(0.01)
        ctl.stop()
        await ctl.drain()
        return ctl

    ctl = asyncio.run(run())
    assert ctl.iterations >= 4
    assert updates == sorted(updates)
    img = ctl.result.mean()
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()


def test_export_to_cli_schema_and_render():
    """Editor Document -> CLI scene schema -> compiled scene renders the
    same picture class as the editor path."""
    import sys

    sys.path.insert(0, "examples")
    try:
        from weekend_scene import build
    finally:
        sys.path.pop(0)

    from ray_tracing_tpu import Renderer, RendererParam, build_scene
    from ray_tracing_tpu.editor.export import document_to_scene_param

    doc = build(seed=2)
    param = document_to_scene_param(doc)
    assert param["renderer"]["width"] == 1200
    assert len(param["objects"]) == len(analyze(doc).rendered_objects)
    bundle = build_scene(param)
    assert bundle.scene.n_spheres == len(param["objects"])
    r = Renderer(RendererParam(48, 32, max_depth=3), bundle.camera, bundle.scene)
    img = np.asarray(r.render(0))
    assert img.shape == (32, 48, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.05  # sky + spheres actually render


def test_export_marks_lights_important():
    doc = Document(renderer=RendererData(8, 8, 2, (0, 0, 0)))
    doc = doc.set_camera(
        ("perspective",
         [0.0, 0.0, 1.0, 0.0, 0.0, -1.0, 60.0, 0.0, 1.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    )
    doc, mat = doc.add_material("lamp", ("diffuse light", [(255, 255, 255), 5.0]))
    doc, _ = doc.add_object(
        "light", shape=("zx-rect", [-1.0, 1.0, -1.0, 1.0, 2.0, -1.0]),
        material=mat, visible=True,
    )
    from ray_tracing_tpu.editor.export import document_to_scene_param

    param = document_to_scene_param(doc)
    assert param["objects"][0]["important"] is True
    from ray_tracing_tpu import build_scene

    assert build_scene(param).scene.n_lights == 1
