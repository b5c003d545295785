"""Pallas intersection-sweep kernel: parity with the XLA phase-A path
(interpreter mode on CPU; the compiled path is exercised on TPU by the
bench and TPU drives)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_tpu import load_scene_json
from ray_tracing_tpu.ops.intersect import intersect_scene
from ray_tracing_tpu.ops.pallas_intersect import (
    pallas_eligible,
    pallas_phase_a,
)


def _rays(n, seed=0):
    rng = np.random.RandomState(seed)
    ro = np.tile([[278.0, 278.0, -800.0]], (n, 1)).astype(np.float32)
    d = np.stack(
        [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n), np.ones(n)], -1
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(d)


def test_zy_scene_is_eligible():
    scene = load_scene_json("data/zy_scene.json").scene
    assert pallas_eligible(scene)


def test_scene_json_is_eligible():
    # transformed cuboid rects + medium sphere: transforms ride in the
    # kernel's SMEM rows and media keep their own XLA phase, so the
    # Pallas sweep now covers every analytic-primitive scene
    scene = load_scene_json("data/scene.json").scene
    assert pallas_eligible(scene)


def _transformed_scene():
    from ray_tracing_tpu import SceneBuilder

    b = SceneBuilder(background=(0.5, 0.6, 0.7))
    m = b.add_lambertian(b.add_texture_solid((0.7, 0.7, 0.7)))
    th = np.deg2rad(31.0)
    rot_y = np.array(
        [
            [np.cos(th), 0.0, np.sin(th)],
            [0.0, 1.0, 0.0],
            [-np.sin(th), 0.0, np.cos(th)],
        ]
    )
    scale = np.diag([1.4, 0.8, 1.0])
    b.add_cuboid((100, 0, 100), (260, 180, 260), m,
                 transform=(rot_y, np.array([40.0, 0.0, 30.0])))
    b.add_sphere((400, 90, 300), 90, m,
                 transform=(rot_y @ scale, np.array([-20.0, 10.0, 0.0])))
    b.add_sphere((150, 380, 200), 60, m)  # identity slot in the same table
    b.add_rect("zx", 0, 555, 0, 555, 0, m, positive=True)
    return b.build()


def test_pallas_matches_xla_phase_a_transformed():
    """Instancing transforms in-kernel: winner (t, kind, idx) must match
    the XLA object-space path on a scene mixing transformed cuboid
    rects, a scaled+rotated sphere, and identity primitives."""
    scene = _transformed_scene()
    assert scene.spheres.has_transforms and scene.rects.has_transforms
    ro, rd = _rays(1024, seed=7)

    t_p, kind_p, idx_p = pallas_phase_a(scene, ro, rd, interpret=True)

    os.environ["RAY_TPU_NO_PALLAS"] = "1"
    try:
        hit = intersect_scene(scene, ro, rd, 1e-3, jnp.inf, None)
    finally:
        del os.environ["RAY_TPU_NO_PALLAS"]

    kind_p = np.asarray(kind_p)
    mask_p = kind_p >= 0
    np.testing.assert_array_equal(mask_p, np.asarray(hit.mask))
    np.testing.assert_array_equal(kind_p[mask_p], np.asarray(hit.kind)[mask_p])
    np.testing.assert_array_equal(
        np.asarray(idx_p)[mask_p], np.asarray(hit.index)[mask_p]
    )
    np.testing.assert_allclose(
        np.asarray(t_p)[mask_p], np.asarray(hit.t)[mask_p], rtol=1e-4,
    )
    # the winners must span transformed AND identity prims of both types
    idx_p = np.asarray(idx_p)
    sph_idx = set(idx_p[mask_p & (kind_p == 0)].tolist())
    rect_idx = set(idx_p[mask_p & (kind_p == 2)].tolist())
    assert {0, 1} <= sph_idx  # transformed + identity sphere
    assert len([i for i in rect_idx if i < 6]) >= 2  # cuboid faces
    assert 6 in rect_idx  # identity floor
    assert mask_p.sum() > 100


def test_pallas_matches_xla_phase_a():
    scene = load_scene_json("data/zy_scene.json").scene
    ro, rd = _rays(1000)

    t_p, kind_p, idx_p = pallas_phase_a(scene, ro, rd, interpret=True)

    os.environ["RAY_TPU_NO_PALLAS"] = "1"
    try:
        hit = intersect_scene(scene, ro, rd, 1e-3, jnp.inf, None)
    finally:
        del os.environ["RAY_TPU_NO_PALLAS"]

    kind_p = np.asarray(kind_p)
    mask_p = kind_p >= 0
    np.testing.assert_array_equal(mask_p, np.asarray(hit.mask))
    np.testing.assert_array_equal(kind_p[mask_p], np.asarray(hit.kind)[mask_p])
    np.testing.assert_array_equal(
        np.asarray(idx_p)[mask_p], np.asarray(hit.index)[mask_p]
    )
    np.testing.assert_allclose(
        np.asarray(t_p)[mask_p], np.asarray(hit.t)[mask_p], rtol=1e-4,
    )
    assert mask_p.sum() > 400  # the Cornell box actually gets hit


def test_pallas_padding_is_discarded():
    scene = load_scene_json("data/zy_scene.json").scene
    # deliberately non-multiple-of-block ray count
    ro, rd = _rays(777, seed=3)
    t, kind, idx = pallas_phase_a(scene, ro, rd, interpret=True)
    assert t.shape == (777,)
    ro2, rd2 = _rays(777, seed=3)
    t2, _, _ = pallas_phase_a(scene, ro2, rd2, interpret=True)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t2))


def test_pallas_phase_a_traces_with_scene_as_jit_argument():
    """The production call path passes the SCENE as a jit argument
    (Renderer.render -> jit(render_pass)(scene, ...)), so every table in
    pack_primitive_tables is a tracer.  Host-numpy constants indexed by
    traced arrays raise TracerArrayConversionError — this pins that the
    whole phase A traces and runs under jit (interpret-mode kernel)."""
    import jax

    from ray_tracing_tpu.ops.pallas_intersect import pallas_phase_a

    scene = load_scene_json("data/zy_scene.json").scene
    ro, rd = _rays(256)

    @jax.jit
    def run(scene, ro, rd):
        return pallas_phase_a(scene, ro, rd, interpret=True)

    t, kind, idx = run(scene, ro, rd)
    assert t.shape == (256,)
    t2, kind2, idx2 = pallas_phase_a(scene, ro, rd, interpret=True)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(kind), np.asarray(kind2))
