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
    the demand-fetch cull actually skips some."""
    b = SceneBuilder(background=(0.2, 0.2, 0.2))
    white = b.add_lambertian(b.add_texture_solid((0.7, 0.7, 0.7)))
    pts, nrm, uvs = load_triangles("data/bunny.obj")
    offs = [(-0.15, 0.0), (0.15, 0.0), (0.0, -0.15), (0.0, 0.15)][:copies]
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
