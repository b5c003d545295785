"""The Pallas triangle sweep must agree with the XLA triple-product
sweep + argmin exactly (same math, same strictly-less tie rule):
interpret mode on CPU, compiled on TPU (skips off-TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_tpu import SceneBuilder
from ray_tracing_tpu.models.mesh import load_triangles
from ray_tracing_tpu.ops import geometry as geo
from ray_tracing_tpu.ops.pallas_triangles import pallas_triangle_sweep


def _bunny_scene():
    b = SceneBuilder(background=(0.2, 0.2, 0.2))
    white = b.add_lambertian(b.add_texture_solid((0.7, 0.7, 0.7)))
    pts, nrm, uvs = load_triangles("data/bunny.obj")
    b.add_mesh_triangles(pts, nrm, uvs, white)
    return b.build()


def _rays(n, seed=0):
    # bunny spans roughly [-0.1, 0.06] x [0.03, 0.19] x [-0.06, 0.06]
    rng = np.random.RandomState(seed)
    ro = jnp.asarray(rng.uniform(-0.05, 0.05, (n, 3)) + [[0, 0.1, 0.4]],
                     jnp.float32)
    d = rng.normal(size=(n, 3)) * 0.3
    d[:, 2] -= 1.0  # bias toward the mesh
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return ro, jnp.asarray(d, jnp.float32)


def _xla_winner(scene, ro, rd):
    tr = scene.triangles
    t, mask = geo.triangle_sweep_t(
        ro, rd, tr.e12, tr.e13, tr.sw_origin, tr.sw_n, tr.sw_g1,
        tr.sw_g2, tr.sw_d0, geo.EPSILON, jnp.inf,
    )
    t_masked = jnp.where(mask, t, jnp.inf)
    idx = jnp.argmin(t_masked, axis=1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t_masked, idx[:, None], 1)[:, 0]
    return t_best, idx, jnp.any(mask, axis=1)


@pytest.mark.parametrize("seed", [0, 1])
def test_interpret_matches_xla_sweep(seed):
    scene = _bunny_scene()
    ro, rd = _rays(512, seed)
    tx, ix, mx = map(np.asarray, _xla_winner(scene, ro, rd))
    tp, ip, mp = map(
        np.asarray, pallas_triangle_sweep(scene, ro, rd, interpret=True)
    )
    np.testing.assert_array_equal(mx, mp)
    np.testing.assert_array_equal(ix[mx], ip[mp])
    np.testing.assert_allclose(tx[mx], tp[mp], rtol=1e-6)
    assert mx.any(), "rays must actually hit the mesh for this to test"


def test_compiled_on_tpu_matches_xla_sweep():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a real TPU backend (compiled Mosaic path)")
    scene = _bunny_scene()
    ro, rd = _rays(4096, 2)
    tx, ix, mx = map(np.asarray, _xla_winner(scene, ro, rd))
    tp, ip, mp = map(np.asarray, pallas_triangle_sweep(scene, ro, rd))
    np.testing.assert_array_equal(mx, mp)
    np.testing.assert_array_equal(ix[mx], ip[mp])
    np.testing.assert_allclose(tx[mx], tp[mp], rtol=1e-5)


def _grid_scene(copies=4):
    """Several offset bunnies: multiple spatially distinct clusters so
    the demand-fetch cull actually skips some.  copies > 4 lays them
    out on a 6-wide grid (used to exceed the paged kernel's CL_GROUP
    page size: ~27 copies pass 131k triangles)."""
    b = SceneBuilder(background=(0.2, 0.2, 0.2))
    white = b.add_lambertian(b.add_texture_solid((0.7, 0.7, 0.7)))
    pts, nrm, uvs = load_triangles("data/bunny.obj")
    if copies <= 4:
        offs = [(-0.15, 0.0), (0.15, 0.0), (0.0, -0.15), (0.0, 0.15)][:copies]
    else:
        offs = [(0.3 * (i % 6) - 0.75, 0.3 * (i // 6) - 0.75)
                for i in range(copies)]
    allp = [pts + np.asarray([dx, 0.0, dz], np.float32) for dx, dz in offs]
    b.add_mesh_triangles(
        np.concatenate(allp), np.concatenate([nrm] * copies),
        np.concatenate([uvs] * copies), white,
    )
    return b.build()


@pytest.mark.parametrize("seed", [0, 1])
def test_cluster_kernel_interpret_matches_xla(seed):
    """Demand-fetched two-level kernel == the XLA winner (same global
    indices, same tie rule), on a multi-bunny mesh whose clusters are
    spatially separated."""
    from ray_tracing_tpu.ops.pallas_triangles import pallas_cluster_sweep

    scene = _grid_scene()
    assert scene.triangles.has_clusters
    ro, rd = _rays(512, seed)
    tx, ix, mx = map(np.asarray, _xla_winner(scene, ro, rd))
    tp, ip, mp = map(
        np.asarray, pallas_cluster_sweep(scene, ro, rd, interpret=True)
    )
    np.testing.assert_array_equal(mx, mp)
    np.testing.assert_array_equal(ix[mx], ip[mp])
    np.testing.assert_allclose(tx[mx], tp[mp], rtol=1e-6)
    assert mx.any()


def test_cluster_kernel_compiled_on_tpu_matches_xla():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a real TPU backend (compiled Mosaic path)")
    from ray_tracing_tpu.ops.pallas_triangles import pallas_cluster_sweep

    scene = _grid_scene()
    ro, rd = _rays(4096, 2)
    tx, ix, mx = map(np.asarray, _xla_winner(scene, ro, rd))
    # cl_chunk=128 -> 160 clusters: the 1-D AABB tables span more than
    # one 128-lane tile, the exact regime where the old 2-D (6, Kc)
    # SMEM operand silently misindexed on real TPU (half the hits lost
    # at Kc=156; interpret mode hid it)
    for cl_chunk in (1024, 128):
        tp, ip, mp = map(
            np.asarray,
            pallas_cluster_sweep(scene, ro, rd, cl_chunk=cl_chunk),
        )
        np.testing.assert_array_equal(mx, mp)
        np.testing.assert_array_equal(ix[mx], ip[mp])
        np.testing.assert_allclose(tx[mx], tp[mp], rtol=1e-5)


def test_cluster_paged_interpret_matches_unpaged_and_xla():
    """Kc > CL_GROUP routes to the paged kernel (AABB tables paged
    HBM -> SMEM); its winners must bit-match the single-page kernel
    run at a coarser chunk (identical per-triangle math via the shared
    _tri_sweep_body) and the brute XLA winner."""
    from ray_tracing_tpu.ops.pallas_triangles import (
        CL_GROUP, pallas_cluster_eligible, pallas_cluster_sweep,
    )

    scene = _grid_scene(27)  # 134k tris -> 1056 clusters at chunk 128
    assert pallas_cluster_eligible(scene)
    assert scene.n_triangles > 128 * 1024  # beyond the old cap
    ro, rd = _rays(512, 3)
    tp, ip, mp = map(
        np.asarray,
        pallas_cluster_sweep(scene, ro, rd, interpret=True, cl_chunk=128),
    )
    tu, iu, mu = map(
        np.asarray,
        pallas_cluster_sweep(scene, ro, rd, interpret=True, cl_chunk=1024),
    )
    np.testing.assert_array_equal(mp, mu)
    np.testing.assert_array_equal(ip[mp], iu[mu])
    np.testing.assert_allclose(tp[mp], tu[mu], rtol=1e-6)
    assert mp.any()

    # brute XLA winner on a ray subset (the full grid would be GBs)
    ros, rds = ro[:128], rd[:128]
    tx, ix, mx = map(np.asarray, _xla_winner(scene, ros, rds))
    np.testing.assert_array_equal(mx, mp[:128])
    np.testing.assert_array_equal(ix[mx], ip[:128][mx])
    np.testing.assert_allclose(tx[mx], tp[:128][mx], rtol=1e-6)


def _soup_scene(n_tris=500_000, seed=0):
    """Synthetic ~n_tris soup: small random triangles scattered in a
    slab, Morton-orderable like a real mesh."""
    rng = np.random.RandomState(seed)
    c = rng.uniform(-1.0, 1.0, (n_tris, 3)).astype(np.float32)
    c[:, 2] = rng.uniform(-2.0, -0.5, n_tris)
    e1 = rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.01
    e2 = rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.01
    pts = np.stack([c, c + e1, c + e2], axis=1)  # (T, 3, 3)
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    nrm = np.repeat(n[:, None, :], 3, axis=1).astype(np.float32)
    uvs = np.zeros((n_tris, 3, 2), np.float32)
    b = SceneBuilder(background=(0.2, 0.2, 0.2))
    white = b.add_lambertian(b.add_texture_solid((0.7, 0.7, 0.7)))
    b.add_mesh_triangles(pts, nrm, uvs, white)
    return b.build()


def test_cluster_paged_compiled_500k_matches_xla_cluster():
    """>=500k-triangle soup end-to-end through the paged kernel on a
    real TPU, winners vs the XLA cluster sweep (VERDICT r4 item 7).
    Run by tests/tpu_smoke.py; skipped on the CPU suite."""
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a real TPU backend (compiled Mosaic path)")
    from ray_tracing_tpu.ops.pallas_triangles import (
        pallas_cluster_eligible, pallas_cluster_sweep,
    )

    scene = _soup_scene(500_000)
    assert pallas_cluster_eligible(scene)
    assert scene.triangles.has_clusters
    rng = np.random.RandomState(5)
    n = 4096
    ro = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3)) * 0.2
    d[:, 2] -= 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)

    tr = scene.triangles
    tx, ix, mx = map(np.asarray, jax.jit(
        lambda s, ro, rd: geo.triangle_cluster_sweep_t(
            ro, rd, s.triangles.sw_origin, s.triangles.cl_lo,
            s.triangles.cl_hi, s.triangles.cl_e12, s.triangles.cl_e13,
            s.triangles.cl_n, s.triangles.cl_g1, s.triangles.cl_g2,
            s.triangles.cl_d0, geo.EPSILON, jnp.inf,
        )
    )(scene, ro, rd))
    tp, ip, mp = map(np.asarray, pallas_cluster_sweep(scene, ro, rd))
    np.testing.assert_array_equal(mx, mp)
    same = ip[mp] == ix[mx]
    assert same.mean() > 0.999, "winner indices diverge beyond ties"
    np.testing.assert_allclose(tp[mp], tx[mx], rtol=1e-5)
    assert mp.sum() > 500, "soup must actually be hit"
