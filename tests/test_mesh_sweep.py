"""Dense triple-product triangle sweep (ops/geometry.py:triangle_sweep_t)
vs the sequential Möller–Trumbore kernel and the BVH traversal.

The sweep is the default mesh strategy on small/mid meshes; these tests
pin that it selects the exact same winning primitive as both other
strategies (same mask, same index, t equal to f32 rounding) on random
rays against the bunny, and that the raw kernels agree on random
triangle soups.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ray_tracing_tpu.ops import geometry as geo


def _random_tris(rng, t, scale=1.0, offset=0.0):
    v = rng.normal(size=(t, 3, 3)).astype(np.float32) * scale + offset
    v0 = v[:, 0]
    e12 = v[:, 1] - v[:, 0]
    e13 = v[:, 2] - v[:, 0]
    return v0, e12, e13


def test_sweep_kernel_matches_moller_trumbore():
    rng = np.random.default_rng(7)
    t = 64
    n = 256
    v0, e12, e13 = _random_tris(rng, t, scale=2.0)
    ro = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5.0)
    rd = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    t_ref, m_ref, _, _, _ = geo.triangle_t(
        ro[:, None, :], rd[:, None, :], v0, e12, e13, 1e-3, jnp.inf
    )
    origin, nrm, g1, g2, d0 = geo.triangle_sweep_tables(v0, e12, e13)
    t_sw, m_sw = geo.triangle_sweep_t(
        ro, rd, jnp.asarray(e12), jnp.asarray(e13),
        jnp.asarray(origin), jnp.asarray(nrm), jnp.asarray(g1),
        jnp.asarray(g2), jnp.asarray(d0), 1e-3, jnp.inf,
    )
    m_ref = np.asarray(m_ref)
    m_sw = np.asarray(m_sw)
    # mask chains agree except where u/v/t sit exactly on a boundary;
    # random soups put nothing on boundaries, so demand full agreement
    assert (m_ref == m_sw).mean() == 1.0
    both = m_ref & m_sw
    t_ref = np.asarray(t_ref)
    t_sw = np.asarray(t_sw)
    rel = np.abs(t_ref - t_sw)[both] / np.maximum(np.abs(t_ref[both]), 1e-6)
    assert rel.max() < 1e-4


@pytest.fixture(scope="module")
def bunny_scene():
    from examples.render_baselines import scene_c4

    b, _cam = scene_c4()
    return b.build()


def _shell_rays(rng, n, lo, hi, t_lo, t_hi):
    ro = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    target = rng.uniform(t_lo, t_hi, (n, 3)).astype(np.float32)
    rd = target - ro
    rd = rd / np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_sweep_matches_bvh_and_brute_on_bunny(bunny_scene, monkeypatch):
    from ray_tracing_tpu.ops.intersect import intersect_scene, mesh_strategy

    scene = bunny_scene
    assert scene.triangles.has_sweep
    assert mesh_strategy(scene) == "sweep"

    rng = np.random.default_rng(3)
    ro, rd = _shell_rays(rng, 2048, -0.6, 0.6, -0.1, 0.2)

    hits = {}
    for mode in ("sweep", "bvh", "brute"):
        monkeypatch.setenv("RAY_TPU_MESH", mode)
        assert mesh_strategy(scene) == mode
        hits[mode] = intersect_scene(scene, ro, rd, 1e-3, jnp.inf, None)
    monkeypatch.delenv("RAY_TPU_MESH")

    a = hits["sweep"]
    for other in ("bvh", "brute"):
        b = hits[other]
        assert (np.asarray(a.mask) == np.asarray(b.mask)).all()
        both = np.asarray(a.mask & b.mask)
        assert (np.asarray(a.index)[both] == np.asarray(b.index)[both]).all()
        dt = np.abs(np.asarray(a.t)[both] - np.asarray(b.t)[both])
        rel = dt / np.maximum(np.abs(np.asarray(b.t))[both], 1e-6)
        assert rel.max() < 1e-4


def test_sweep_render_matches_brute_image(bunny_scene, monkeypatch):
    """A small forward render must be invariant to the mesh strategy up
    to f32 rounding in t (the shading inputs come from Phase B, which is
    strategy-independent)."""
    from examples.render_baselines import scene_c4
    from ray_tracing_tpu import Camera, Renderer, RendererParam
    from ray_tracing_tpu.render.renderer import render_pass

    _b, cam = scene_c4()
    camera = Camera.build(cam, 1.0)
    imgs = {}
    for mode in ("sweep", "brute", "cluster"):
        monkeypatch.setenv("RAY_TPU_MESH", mode)
        imgs[mode] = np.asarray(
            render_pass(
                bunny_scene, camera, jax.random.key(5),
                width=32, height=32, max_depth=6, antialias=True,
                tile_size=1024,
            )
        )
    monkeypatch.delenv("RAY_TPU_MESH")
    np.testing.assert_allclose(imgs["sweep"], imgs["brute"], atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(imgs["cluster"], imgs["brute"], atol=1e-4, rtol=1e-3)


def test_unhonorable_mesh_override_raises(monkeypatch):
    """An explicit RAY_TPU_MESH=bvh/sweep that the scene cannot honor
    must raise, not silently fall back (an A/B run would otherwise
    mislabel its numbers)."""
    import pytest

    from ray_tracing_tpu import CameraParam, SceneBuilder
    from ray_tracing_tpu.ops.intersect import mesh_strategy
    from ray_tracing_tpu.models.scene import TriangleTable

    b = SceneBuilder(background=(0.1, 0.1, 0.1))
    white = b.add_lambertian(b.add_texture_solid((0.7, 0.7, 0.7)))
    pts = np.asarray([[[0, 0, -2], [1, 0, -2], [0, 1, -2]]], np.float32)
    nrm = np.tile(np.asarray([0, 0, 1], np.float32), (1, 3, 1))
    uv = np.zeros((1, 3, 2), np.float32)
    b.add_mesh_triangles(pts, nrm, uv, white)
    scene = b.build()

    # strip the sweep tables / BVH to simulate a hand-built table
    tr = scene.triangles
    stripped = scene.replace(
        triangles=tr.replace(
            sw_origin=None, sw_n=None, sw_g1=None, sw_g2=None, sw_d0=None
        ),
        bvh=None,
    )
    assert not stripped.triangles.has_sweep

    monkeypatch.setenv("RAY_TPU_MESH", "sweep")
    with pytest.raises(ValueError, match="sweep"):
        mesh_strategy(stripped)
    monkeypatch.setenv("RAY_TPU_MESH", "bvh")
    with pytest.raises(ValueError, match="bvh"):
        mesh_strategy(stripped)
    monkeypatch.delenv("RAY_TPU_MESH")


def test_cluster_matches_sweep_on_bunny(bunny_scene, monkeypatch):
    """Two-level cluster sweep (ops/geometry.py:triangle_cluster_sweep_t)
    selects the same winning primitive as the dense sweep — same mask,
    same index; t may differ by XLA fusion rounding (a few ulp) but the
    shading record rebuilds from the index in Phase B either way."""
    from ray_tracing_tpu.ops.intersect import intersect_scene, mesh_strategy

    scene = bunny_scene
    assert scene.triangles.has_clusters  # packed alongside the BVH

    rng = np.random.default_rng(11)
    ro, rd = _shell_rays(rng, 2048, -0.6, 0.6, -0.1, 0.2)

    hits = {}
    for mode in ("sweep", "cluster"):
        monkeypatch.setenv("RAY_TPU_MESH", mode)
        assert mesh_strategy(scene) == mode
        hits[mode] = intersect_scene(scene, ro, rd, 1e-3, jnp.inf, None)
    monkeypatch.delenv("RAY_TPU_MESH")

    a, b = hits["sweep"], hits["cluster"]
    assert (np.asarray(a.mask) == np.asarray(b.mask)).all()
    both = np.asarray(a.mask & b.mask)
    assert (np.asarray(a.index)[both] == np.asarray(b.index)[both]).all()
    ta = np.asarray(a.t)[both]
    tb = np.asarray(b.t)[both]
    ulp = np.abs(ta.view(np.int32) - tb.view(np.int32))
    assert ulp.max() <= 16


def test_cluster_auto_strategy_and_large_soup_vs_bvh(monkeypatch):
    """Above SWEEP_MAX_TRIS the auto strategy is the cluster sweep, and
    on a >32k random soup it agrees with the BVH walk ray-for-ray."""
    from ray_tracing_tpu import SceneBuilder
    from ray_tracing_tpu.ops.intersect import (
        SWEEP_MAX_TRIS,
        intersect_scene,
        mesh_strategy,
    )

    rng = np.random.default_rng(5)
    t = SWEEP_MAX_TRIS + 257  # non-multiple of the cluster width
    centers = rng.uniform(-4.0, 4.0, (t, 1, 3)).astype(np.float32)
    v = centers + rng.normal(size=(t, 3, 3)).astype(np.float32) * 0.05
    nrm = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = np.repeat(nrm[:, None, :], 3, axis=1).astype(np.float32)
    uv = np.zeros((t, 3, 2), np.float32)

    b = SceneBuilder(background=(0.1, 0.1, 0.1))
    white = b.add_lambertian(b.add_texture_solid((0.7, 0.7, 0.7)))
    b.add_mesh_triangles(v, nrm, uv, white)
    scene = b.build()
    assert mesh_strategy(scene) == "cluster"

    ro, rd = _shell_rays(rng, 512, -6.0, 6.0, -1.0, 1.0)
    hits = {}
    for mode in ("cluster", "bvh"):
        monkeypatch.setenv("RAY_TPU_MESH", mode)
        hits[mode] = intersect_scene(scene, ro, rd, 1e-3, jnp.inf, None)
    monkeypatch.delenv("RAY_TPU_MESH")

    a, b = hits["cluster"], hits["bvh"]
    assert (np.asarray(a.mask) == np.asarray(b.mask)).all()
    both = np.asarray(a.mask & b.mask)
    assert both.any()  # the soup is dense enough that rays hit
    assert (np.asarray(a.index)[both] == np.asarray(b.index)[both]).all()
    ta, tb = np.asarray(a.t)[both], np.asarray(b.t)[both]
    rel = np.abs(ta - tb) / np.maximum(np.abs(tb), 1e-6)
    assert rel.max() < 1e-4


def test_cluster_override_without_cluster_data_raises(monkeypatch):
    """RAY_TPU_MESH=cluster on a table without cluster packing raises
    (same no-silent-fallback contract as sweep/bvh)."""
    import pytest

    from ray_tracing_tpu import SceneBuilder
    from ray_tracing_tpu.ops.intersect import mesh_strategy

    b = SceneBuilder(background=(0.1, 0.1, 0.1))
    white = b.add_lambertian(b.add_texture_solid((0.7, 0.7, 0.7)))
    pts = np.asarray([[[0, 0, -2], [1, 0, -2], [0, 1, -2]]], np.float32)
    nrm = np.tile(np.asarray([0, 0, 1], np.float32), (1, 3, 1))
    uv = np.zeros((1, 3, 2), np.float32)
    b.add_mesh_triangles(pts, nrm, uv, white)
    scene = b.build()  # 1 tri: below BVH_THRESHOLD, no clusters
    assert not scene.triangles.has_clusters

    monkeypatch.setenv("RAY_TPU_MESH", "cluster")
    with pytest.raises(ValueError, match="cluster"):
        mesh_strategy(scene)
    monkeypatch.delenv("RAY_TPU_MESH")
