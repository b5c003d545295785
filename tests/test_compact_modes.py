"""compact_wavefront execution strategies and the lean tangent replay.

The stable alive-first partition is unique, so every compaction mode
(``gather`` / ``fused`` / ``sort`` — integrator.compact_wavefront) must
produce BIT-IDENTICAL results through every consumer: the compacted
forward, the taped forward, and the PRB replay.  The mode exists purely
because the TPU lowers the permutation differently (a bool-keyed
variadic sort beat argsort + scalar-core gathers by 46 ms/pass at 1024²,
docs/PERFORMANCE.md); nothing semantic may depend on it.

trace_subset_dot is the minimal replay the scalar tangent pass jacfwd's
(render/prb_scalar.py); it must agree with the full PRB replay's
radiance on any gathered subset, and the lean tangent pass must produce
the same fuzz/IR gradients as the PRB-replay tangent pass.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_tpu import SceneBuilder
from ray_tracing_tpu.render.integrator import (
    compact_wavefront,
    trace,
    trace_compacted,
    trace_subset_dot,
)

MODES = ("gather", "fused", "sort")


def _scene():
    b = SceneBuilder(background=(0.1, 0.12, 0.2))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.7, 0.68)))
    light = b.add_diffuse_light(b.add_texture_solid((5.0, 5.0, 5.0)))
    metal = b.add_metal((0.9, 0.8, 0.7), 0.25)
    glass = b.add_dielectric(1.5)
    b.add_rect("zx", -4, 4, -4, 4, 0.0, white, positive=True)
    b.add_rect("zx", -1, 1, -1, 1, 7.9, light, positive=False,
               important=True)
    b.add_sphere((1.5, 0.6, -2.0), 0.6, metal)
    b.add_sphere((-1.5, 0.6, -2.0), 0.6, glass)
    return b.build()


def _rays(n=1024, seed=11):
    rng = np.random.RandomState(seed)
    ro = jnp.asarray(np.tile([[0.0, 2.0, 5.0]], (n, 1)), jnp.float32)
    d = np.stack([rng.uniform(-0.7, 0.7, n), rng.uniform(-0.5, 0.2, n),
                  -np.ones(n)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return ro, jnp.asarray(d, jnp.float32)


def test_compact_wavefront_modes_identical():
    """Direct unit check: every mode applies the same permutation and
    round-trips dtypes (f32 columns, (n,3) mats, bool and i32 vecs)."""
    rng = np.random.RandomState(0)
    n = 640
    alive = jnp.asarray(rng.rand(n) < 0.3)
    f1 = jnp.asarray(rng.randn(n, 3), jnp.float32)
    f2 = jnp.asarray(rng.randn(n), jnp.float32)
    i1 = jnp.asarray(rng.randint(-5, 5, n), jnp.int32)
    b1 = jnp.asarray(rng.rand(n) < 0.5)

    outs = {}
    for mode in MODES:
        a, (g1, g2), (j1, j2) = compact_wavefront(
            alive, [f1, f2], [i1, b1], mode=mode
        )
        outs[mode] = [np.asarray(x) for x in (a, g1, g2, j1, j2)]
        assert outs[mode][3].dtype == np.int32
        assert outs[mode][4].dtype == np.bool_
    for mode in MODES[1:]:
        for a, b in zip(outs[MODES[0]], outs[mode]):
            assert np.array_equal(a, b), mode


@pytest.mark.parametrize("mode", MODES)
def test_trace_compacted_bit_identical_across_modes(mode):
    scene = _scene()
    ro, rd = _rays()
    key = jax.random.key(2)
    ref = np.asarray(trace(scene, ro, rd, key, 8))
    # mode comes from env at trace time; a fresh jit wrapper per mode
    os.environ["RAY_TPU_COMPACT"] = mode
    try:
        def f(s, ro, rd, k, _m=mode):
            return trace_compacted(s, ro, rd, k, 8)

        out = np.asarray(jax.jit(f)(scene, ro, rd, key))
    finally:
        os.environ.pop("RAY_TPU_COMPACT", None)
    assert np.array_equal(ref, out)


@pytest.mark.parametrize("mode", MODES)
def test_taped_and_replay_bit_identical_across_modes(mode):
    from ray_tracing_tpu.render.prb import prb_grad_compacted
    from ray_tracing_tpu.render.prb_tape import tape_sweep, trace_taped

    scene = _scene()
    ro, rd = _rays()
    key = jax.random.key(4)
    ref = np.asarray(trace(scene, ro, rd, key, 8))
    os.environ["RAY_TPU_COMPACT"] = mode
    try:
        def ft(s, ro, rd, k, _m=mode):
            rad, touched, tape = trace_taped(s, ro, rd, k, 8)
            gacc = tape_sweep(s, tape, rad, jnp.ones_like(rad), 8)
            return rad, touched, gacc

        rad, touched, gacc = jax.jit(ft)(scene, ro, rd, key)

        def fr(s, ro, rd, k, _m=mode):
            return prb_grad_compacted(
                s, ro, rd, k, 8, trace_compacted(s, ro, rd, k, 8),
                jnp.ones_like(ro),
            )

        gacc2, rad2, touched2 = jax.jit(fr)(scene, ro, rd, key)
    finally:
        os.environ.pop("RAY_TPU_COMPACT", None)
    assert np.array_equal(ref, np.asarray(rad))
    assert np.array_equal(ref, np.asarray(rad2))
    assert np.array_equal(np.asarray(touched), np.asarray(touched2))
    for a, b in zip(gacc, gacc2):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                           atol=1e-7)


def test_trace_subset_dot_matches_replay_radiance():
    """The lean replay's vdot(g, rad) over a gathered, partially-dead
    subset equals the PRB replay's radiance dotted the same way."""
    from ray_tracing_tpu.render.prb import prb_grad_compacted

    scene = _scene()
    ro, rd = _rays(n=512)
    key = jax.random.key(9)
    rng = np.random.RandomState(1)
    sub = jnp.asarray(rng.permutation(512)[:256], jnp.int32)
    alive0 = jnp.asarray(rng.rand(256) < 0.7)
    g = jnp.asarray(rng.rand(256, 3), jnp.float32)

    ro_s, rd_s = ro[sub], rd[sub]
    dot = float(trace_subset_dot(scene, ro_s, rd_s, key, 8, g, alive0, sub))

    _, rad_t, _ = prb_grad_compacted(
        scene, ro_s, rd_s, key, 8, jnp.zeros_like(g), g,
        alive0=alive0, ids0=sub, accumulate=False,
    )
    want = float(jnp.vdot(g, rad_t))
    assert np.isclose(dot, want, rtol=1e-5), (dot, want)


def test_planar_image_grads_roundtrip():
    """planar_images=True + image_grads_from_planar == default path
    (the tiled-caller protocol that skips per-tile planar transposes)."""
    from ray_tracing_tpu import load_scene_json
    from ray_tracing_tpu.models.camera import Camera, camera_rays
    from ray_tracing_tpu.render.prb_scalar import (
        image_grads_from_planar, params_of, prb_loss_and_grad_all,
    )

    b = load_scene_json("data/zy_scene.json")  # has the earthmap atlas
    scene, cam = b.scene, Camera.build(b.camera, 1.0)
    ro, rd, _, kt = camera_rays(cam, jax.random.key(1), 48, 48, True)
    params = params_of(scene)

    loss0, g0 = prb_loss_and_grad_all(
        jnp.sum, params, scene, ro, rd, kt, 8, static_scene=scene
    )
    loss1, g1, _aux = prb_loss_and_grad_all(
        jnp.sum, params, scene, ro, rd, kt, 8, static_scene=scene,
        defer_scalars=True, planar_images=True,
    )
    assert float(loss0) == float(loss1)
    img1 = image_grads_from_planar(g1.images, params.images.shape)
    assert np.array_equal(np.asarray(g0.images), np.asarray(img1))
    assert np.array_equal(np.asarray(g0.color), np.asarray(g1.color))
    assert np.asarray(g0.images).any()  # earthmap actually hit


def test_lean_tangent_pass_matches_prb_replay_tangents():
    from ray_tracing_tpu.render.prb_scalar import (
        params_of, prb_loss_and_grad_all,
    )

    scene = _scene()
    ro, rd = _rays(n=2048, seed=7)
    key = jax.random.key(6)
    params = params_of(scene)

    grads = {}
    for lean in ("0", "1"):
        os.environ["RAY_TPU_LEAN_TANGENT"] = lean
        try:
            def f(p, s, ro, rd, k, _l=lean):
                return prb_loss_and_grad_all(
                    jnp.sum, p, s, ro, rd, k, 8, static_scene=scene
                )

            loss, g = jax.jit(f)(params, scene, ro, rd, key)
        finally:
            os.environ.pop("RAY_TPU_LEAN_TANGENT", None)
        grads[lean] = (float(loss), np.asarray(g.fuzz), np.asarray(g.ir))
    assert grads["0"][0] == grads["1"][0]
    assert np.allclose(grads["0"][1], grads["1"][1], rtol=1e-4, atol=1e-8)
    assert np.allclose(grads["0"][2], grads["1"][2], rtol=1e-4, atol=1e-8)
    # and the gradients are actually nonzero (the scene has both kinds)
    assert np.any(grads["1"][1] != 0) and np.any(grads["1"][2] != 0)
