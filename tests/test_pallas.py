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


def test_scene_json_not_eligible():
    # transformed cuboid rects + medium sphere -> XLA path
    scene = load_scene_json("data/scene.json").scene
    assert not pallas_eligible(scene)


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
