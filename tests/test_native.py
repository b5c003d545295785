"""Native C++ host-runtime parity tests: the ctypes library must produce
bit-identical results to the pure-Python fallbacks (OBJ loading, Morton
ordering, LBVH tables, BMP output)."""

import numpy as np
import pytest

from ray_tracing_tpu import native


requires_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


@requires_native
def test_obj_parity_on_bunny():
    from ray_tracing_tpu.models.mesh import mesh_triangles, parse_obj

    pts_n, nrm_n, uv_n = native.obj_triangles("data/bunny.obj")
    pts_p, nrm_p, uv_p = mesh_triangles(parse_obj("data/bunny.obj"))
    assert pts_n.shape == pts_p.shape == (4968, 3, 3)
    np.testing.assert_array_equal(pts_n, pts_p)
    np.testing.assert_allclose(nrm_n, nrm_p, atol=1e-6)
    np.testing.assert_array_equal(uv_n, uv_p)


@requires_native
def test_obj_with_normals_and_uvs(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "o quad\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 1\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"  # quad -> 2 fan triangles
    )
    pts_n, nrm_n, uv_n = native.obj_triangles(str(obj))
    from ray_tracing_tpu.models.mesh import mesh_triangles, parse_obj

    pts_p, nrm_p, uv_p = mesh_triangles(parse_obj(str(obj)))
    assert pts_n.shape == (2, 3, 3)
    np.testing.assert_array_equal(pts_n, pts_p)
    np.testing.assert_array_equal(nrm_n, nrm_p)
    np.testing.assert_array_equal(uv_n, uv_p)
    # fan: (v1, v2, v3), (v1, v3, v4)
    np.testing.assert_array_equal(pts_n[1, 0], [0, 0, 0])
    np.testing.assert_array_equal(pts_n[1, 2], [0, 1, 0])


@requires_native
def test_obj_model_selection(tmp_path):
    obj = tmp_path / "two.obj"
    obj.write_text(
        "o first\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
        "o second\nv 0 0 1\nv 1 0 1\nv 0 1 1\nf 4 5 6\n"
    )
    pts0, _, _ = native.obj_triangles(str(obj), 0)
    pts1, _, _ = native.obj_triangles(str(obj), "second")
    assert pts0[0, 0, 2] == 0.0
    assert pts1[0, 0, 2] == 1.0
    with pytest.raises(KeyError):
        native.obj_triangles(str(obj), "third")


@requires_native
def test_morton_and_lbvh_parity():
    from ray_tracing_tpu.ops.bvh import LEAF_SIZE, build_lbvh, morton_order

    rng = np.random.RandomState(0)
    n = 777
    centers = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    half = rng.uniform(0.01, 0.5, (n, 1)).astype(np.float32)
    tmin = centers - half
    tmax = centers + half

    order_n = native.morton_order(tmin, tmax)
    order_p = morton_order(tmin, tmax)
    np.testing.assert_array_equal(order_n, order_p)

    smin, smax = tmin[order_p], tmax[order_p]
    nm, nx, miss, ls, lc = native.lbvh_build(smin, smax, LEAF_SIZE)
    ref = build_lbvh(smin, smax)
    assert nm.shape[0] == ref.n_nodes
    np.testing.assert_array_equal(nm, np.asarray(ref.node_min))
    np.testing.assert_array_equal(nx, np.asarray(ref.node_max))
    np.testing.assert_array_equal(miss, np.asarray(ref.miss_link))
    np.testing.assert_array_equal(ls, np.asarray(ref.leaf_start))
    np.testing.assert_array_equal(lc, np.asarray(ref.leaf_count))


@requires_native
def test_bmp_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (13, 17, 3), dtype=np.uint8)  # odd width: padding
    path = str(tmp_path / "out.bmp")
    assert native.write_bmp(path, img)
    with Image.open(path) as im:
        back = np.asarray(im.convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_scene_json_uses_native_and_matches_python(monkeypatch):
    """The compiled scene tables are identical whether or not the native
    library is used."""
    from ray_tracing_tpu import load_scene_json

    bd_native = load_scene_json("data/scene.json")
    monkeypatch.setenv("RAY_TPU_NO_NATIVE", "1")
    # force-reload of the lib gate
    native._lib = None
    native._lib_failed = False
    try:
        bd_python = load_scene_json("data/scene.json")
    finally:
        monkeypatch.delenv("RAY_TPU_NO_NATIVE")
        native._lib = None
        native._lib_failed = False

    t_n, t_p = bd_native.scene.triangles, bd_python.scene.triangles
    np.testing.assert_array_equal(np.asarray(t_n.v0), np.asarray(t_p.v0))
    b_n, b_p = bd_native.scene.bvh, bd_python.scene.bvh
    np.testing.assert_array_equal(
        np.asarray(b_n.miss_link), np.asarray(b_p.miss_link)
    )
    np.testing.assert_array_equal(
        np.asarray(b_n.node_min), np.asarray(b_p.node_min)
    )


def test_mixed_face_obj_native_matches_python(tmp_path):
    """An OBJ mixing faces with and without vn/vt must load with aligned
    per-face data on BOTH paths (the misaligned version paired face i
    with face j's normals or read out of bounds)."""
    import numpy as np

    from ray_tracing_tpu import native
    from ray_tracing_tpu.models import mesh as pymesh

    obj = tmp_path / "mixed.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "f 1/1/1 2/2/2 3/3/3\n"   # full spec
        "f 2 4 3\n"               # positions only
    )
    pf = pymesh.load_triangles(str(obj))
    nf = native.obj_triangles(str(obj))
    assert nf is not None, "native lib unavailable"
    for a, b, name in zip(pf, nf, ("pts", "nrm", "uv")):
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=name)
    pts, nrm, uv = pf
    assert pts.shape == (2, 3, 3)
    # mixed normals -> all-or-nothing smooth vertex normals, unit length
    assert np.allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)
    # the no-vt face reads uv (0,0)
    assert np.allclose(uv[1], 0.0)


def test_obj_model_index_bounds_checked(tmp_path):
    """Out-of-range integer model indices raise IndexError instead of
    invoking C++ UB; negative indices follow Python list semantics."""
    import numpy as np
    import pytest

    from ray_tracing_tpu import native

    obj = tmp_path / "one.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    ok = native.obj_triangles(str(obj), model=0)
    neg = native.obj_triangles(str(obj), model=-1)
    assert ok is not None and neg is not None
    np.testing.assert_array_equal(ok[0], neg[0])
    with pytest.raises(IndexError):
        native.obj_triangles(str(obj), model=3)
