"""LBVH build + stackless traversal tests: exact agreement with the
brute-force triangle sweep on the bunny mesh."""

import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu.models.compiler import SceneBuilder, load_scene_json
from ray_tracing_tpu.models.mesh import mesh_triangles, parse_obj
from ray_tracing_tpu.ops import geometry as geo
from ray_tracing_tpu.ops.bvh import build_lbvh, bvh_traverse_triangles, morton_order


def _bunny_scene():
    b = SceneBuilder()
    mat = b.add_lambertian(b.add_texture_solid((0.7, 0.7, 0.7)))
    pts, nrm, uvs = mesh_triangles(parse_obj("data/bunny.obj"))
    b.add_mesh_triangles(pts, nrm, uvs, mat)
    return b.build()


def test_bvh_structure_invariants():
    scene = _bunny_scene()
    bvh = scene.bvh
    assert bvh is not None
    m = bvh.n_nodes
    miss = np.asarray(bvh.miss_link)
    start = np.asarray(bvh.leaf_start)
    count = np.asarray(bvh.leaf_count)
    # miss links always advance (monotone traversal -> guaranteed halt)
    assert (miss > np.arange(m)).all()
    assert miss.max() == m
    # leaves partition the triangle range exactly
    leaf = start >= 0
    assert count[leaf].sum() == scene.n_triangles
    covered = np.zeros(scene.n_triangles, bool)
    for s, c in zip(start[leaf], count[leaf]):
        assert not covered[s : s + c].any()
        covered[s : s + c] = True
    assert covered.all()
    # node AABBs contain their leaf triangles
    v0 = np.asarray(scene.triangles.v0)
    e12 = np.asarray(scene.triangles.e12)
    e13 = np.asarray(scene.triangles.e13)
    verts = np.stack([v0, v0 + e12, v0 + e13], axis=1)
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    for i in np.nonzero(leaf)[0][:50]:
        tv = verts[start[i] : start[i] + count[i]].reshape(-1, 3)
        assert (tv >= nmin[i] - 1e-3).all() and (tv <= nmax[i] + 1e-3).all()


def test_bvh_matches_brute_force_on_bunny():
    scene = _bunny_scene()
    tr = scene.triangles
    rng = np.random.RandomState(0)
    n = 512
    # rays from a shell aimed at the bunny (bunny is ~0.15 units tall)
    origins = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    origins[:, 2] += 0.5
    targets = rng.uniform(-0.05, 0.15, (n, 3)).astype(np.float32)
    d = targets - origins
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.asarray(origins)
    rd = jnp.asarray(d)

    bh = bvh_traverse_triangles(scene.bvh, ro, rd, 1e-3, jnp.inf)

    # brute force over all 4968 triangles
    t, mask, *_ = geo.triangle_t(
        ro[:, None, :], rd[:, None, :], tr.v0, tr.e12, tr.e13, 1e-3, jnp.inf
    )
    t = jnp.where(mask, t, jnp.inf)
    brute_t = jnp.min(t, axis=1)
    brute_mask = jnp.isfinite(brute_t)

    assert np.array_equal(np.asarray(bh.mask), np.asarray(brute_mask))
    assert np.asarray(brute_mask).sum() > 50  # scene actually gets hit
    np.testing.assert_allclose(
        np.asarray(bh.t)[np.asarray(brute_mask)],
        np.asarray(brute_t)[np.asarray(brute_mask)],
        rtol=1e-5,
    )


def test_scene_json_render_with_bvh():
    """scene.json (bunny + everything) renders identically with the BVH
    path enabled vs disabled."""
    import jax

    from ray_tracing_tpu.ops.intersect import intersect_scene

    bd = load_scene_json("data/scene.json")
    scene = bd.scene
    assert scene.bvh is not None
    rng = np.random.RandomState(1)
    n = 256
    ro = jnp.asarray(np.tile([[278.0, 278.0, -500.0]], (n, 1)), np.float32)
    d = np.stack(
        [rng.uniform(-0.4, 0.4, n), rng.uniform(-0.4, 0.4, n), np.ones(n)], -1
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d)
    med_u = jnp.full((n, 1), 0.5, jnp.float32)

    hit_bvh = intersect_scene(scene, ro, rd, 1e-3, jnp.inf, med_u)
    hit_brute = intersect_scene(
        scene.replace(bvh=None), ro, rd, 1e-3, jnp.inf, med_u
    )
    assert np.array_equal(np.asarray(hit_bvh.mask), np.asarray(hit_brute.mask))
    np.testing.assert_allclose(
        np.asarray(hit_bvh.t), np.asarray(hit_brute.t), rtol=1e-5
    )
    assert np.array_equal(
        np.asarray(hit_bvh.material), np.asarray(hit_brute.material)
    )
    np.testing.assert_allclose(
        np.asarray(hit_bvh.p), np.asarray(hit_brute.p), rtol=1e-4, atol=1e-3
    )
