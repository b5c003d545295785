"""Web editor API tests: serve, edit, undo, render through HTTP."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture
def server():
    from ray_tracing_tpu.editor.web import serve

    srv = serve(port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())
    except urllib.error.HTTPError as e:
        return json.loads(e.read())  # API errors come back as JSON bodies


def test_editor_edit_render_undo_cycle(server):
    state = _get(server + "/api/state")
    assert state["analysis"]["camera_valid"]
    sphere_key = next(
        k for k, v in state["document"]["objects"].items() if v["name"] == "sphere"
    )

    # add + wire a red material
    _post(server + "/api/edit", {"action": "add_texture", "name": "t"})
    state = _get(server + "/api/state")
    tex = next(k for k, v in state["document"]["textures"].items() if v["name"] == "t")
    _post(server + "/api/edit",
          {"action": "set_texture", "key": tex, "kind": "solid color",
           "values": [[255, 0, 0]]})
    _post(server + "/api/edit", {"action": "add_material", "name": "m"})
    state = _get(server + "/api/state")
    mat = next(k for k, v in state["document"]["materials"].items() if v["name"] == "m")
    _post(server + "/api/edit",
          {"action": "set_material", "key": mat, "kind": "lambertian",
           "values": [{"uuid": tex}]})
    state = _post(server + "/api/edit",
                  {"action": "set_object", "key": sphere_key, "material": mat})
    assert mat in state["analysis"]["valid_materials"]

    # render: red channel dominates at the sphere
    out = _get(server + "/api/render?passes=2")
    img = np.asarray(
        __import__("PIL.Image", fromlist=["Image"]).open(
            io.BytesIO(base64.b64decode(out["png"]))
        )
    )
    h, w = img.shape[:2]
    center = img[h // 2 - 6 : h // 2 + 6, w // 2 - 6 : w // 2 + 6]
    assert center[..., 0].mean() > center[..., 2].mean()

    # undo unwinds the material assignment
    state = _post(server + "/api/undo", {})
    sphere = state["document"]["objects"][sphere_key]
    assert sphere.get("material") != mat
    state = _post(server + "/api/redo", {})
    assert state["document"]["objects"][sphere_key]["material"] == mat


def test_editor_error_paths(server):
    out = _post(server + "/api/edit", {"action": "explode"})
    assert "unknown action" in out["error"]
    out = _post(server + "/api/edit",
                {"action": "set_shape", "key": "nope", "kind": "sphere",
                 "values": [0, 0, 0, 1]})
    assert "error" in out


def test_registries_meta(server):
    regs = _get(server + "/api/registries")
    assert "sphere" in regs["shapes"]
    assert [p["name"] for p in regs["shapes"]["sphere"]] == [
        "center x", "center y", "center z", "radius",
    ]
    assert "lambertian" in regs["materials"]
    assert "perspective" in regs["cameras"]
    # round-5 plugins: image/mesh/constant-medium with string fields
    assert regs["textures"]["image"][0]["kind"] == "string"
    assert {"mesh", "constant-medium-sphere",
            "constant-medium-cuboid"} <= regs["shapes"].keys()
    assert [p["kind"] for p in regs["shapes"]["mesh"]] == [
        "string", "string",
    ]


def test_mesh_object_via_api(server, tmp_path):
    """A mesh node set through the HTTP API round-trips string values
    and joins the rendered set once its material is wired."""
    obj_path = tmp_path / "tri.obj"
    obj_path.write_text("v 0 0 -3\nv 1 0 -3\nv 0 1 -3\nf 1 2 3\n")

    state = _get(server + "/api/state")
    _post(server + "/api/edit", {"action": "add_object", "name": "mesh node"})
    state = _get(server + "/api/state")
    key = next(k for k, v in state["document"]["objects"].items()
               if v["name"] == "mesh node")
    tex = next(iter(state["document"]["textures"]))
    _post(server + "/api/edit", {"action": "add_material", "name": "mm"})
    state = _get(server + "/api/state")
    mat = next(k for k, v in state["document"]["materials"].items()
               if v["name"] == "mm")
    _post(server + "/api/edit",
          {"action": "set_material", "key": mat, "kind": "lambertian",
           "values": [{"uuid": tex}]})
    _post(server + "/api/edit",
          {"action": "set_shape", "key": key,
           "kind": "mesh", "values": [str(obj_path), ""]})
    state = _post(server + "/api/edit",
                  {"action": "set_object", "key": key, "material": mat,
                   "visible": True})
    assert "error" not in state
    assert state["values"]["objects"][key] == {
        "kind": "mesh", "values": [str(obj_path), ""]
    }
    assert key in state["analysis"]["rendered_objects"]
    # a bad path drops the node from the rendered set
    state = _post(server + "/api/edit",
                  {"action": "set_shape", "key": key,
                   "kind": "mesh", "values": ["/nope.obj", ""]})
    assert key not in state["analysis"]["rendered_objects"]


def test_editor_project_roundtrip_via_api(server):
    """Export the live document and load it back through the API."""
    project = _get(server + "/api/project")
    # wipe with a fresh load of the same project
    state = _post(server + "/api/edit", {"action": "load_project", "project": project})
    assert "error" not in state
    assert state["document"]["objects"].keys() == project["objects"].keys()
    # and load a minimal foreign project
    minimal = {
        "render": {"width": 8, "height": 8, "max_depth": 2,
                   "background": "#102030"},
        "camera": {"type": "perspective", "look_from": [0, 0, 1],
                   "look_at": [0, 0, 0], "vfov": 60, "up": [0, 1, 0],
                   "aperture": 0, "focus_dist": 2, "time0": 0, "time1": 0},
        "root_objects": [], "objects": {}, "materials": {}, "textures": {},
    }
    state = _post(server + "/api/edit", {"action": "load_project", "project": minimal})
    assert state["document"]["render"]["width"] == 8
    assert state["can_undo"]  # loading is an undoable edit
