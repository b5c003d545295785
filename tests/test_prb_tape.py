"""Taped PRB backward (render/prb_tape.py): the forward writes a
36 B/ray/bounce tape and the color gradients come from a traversal-free
sweep.  Must reproduce the compacted forward bit-exactly and the replay
gradients to f32-rounding tolerance, across multi-stage compaction
schedules with partially-live chunks."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu import SceneBuilder
from ray_tracing_tpu.render.integrator import trace_compacted
from ray_tracing_tpu.render.prb import grads_image_flat, prb_grad_compacted
from ray_tracing_tpu.render.prb_scalar import (
    AllParams,
    params_of,
    prb_loss_and_grad_all,
    prb_radiance_all,
)
from ray_tracing_tpu.render.prb_tape import tape_sweep, trace_taped


def _textured_cornell():
    """Image-textured floor + fuzzy metal + glass + light: every
    gradient family (solid leaf, atlas texel, metal albedo, fuzz, IR)
    is live."""
    rng = np.random.RandomState(7)
    img = rng.uniform(0.2, 0.9, (4, 6, 3)).astype(np.float32)
    b = SceneBuilder(background=(0.05, 0.05, 0.05))
    floor = b.add_lambertian(b.add_texture_image(img))
    red = b.add_lambertian(b.add_texture_solid((0.65, 0.15, 0.12)))
    light = b.add_diffuse_light(b.add_texture_solid((4.0, 3.5, 3.0)))
    metal = b.add_metal((0.9, 0.85, 0.8), 0.2)
    glass = b.add_dielectric(1.5)
    b.add_rect("zx", -2, 2, -2, 2, 0.0, floor, positive=True)
    b.add_rect("xy", -2, 2, 0, 2, -2.0, red, positive=True)
    b.add_rect("zx", -1, 1, -1, 1, 3.0, light, positive=False, important=True)
    b.add_sphere((-0.6, 0.5, -0.6), 0.45, metal)
    b.add_sphere((0.7, 0.5, -0.7), 0.4, glass)
    return b.build()


def _rays(n=4096, seed=0):
    rng = np.random.RandomState(seed)
    ro = jnp.asarray(np.tile([[0.0, 1.2, 1.8]], (n, 1)), jnp.float32)
    d = np.stack(
        [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.8, 0.1, n), -np.ones(n)],
        -1,
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return ro, jnp.asarray(d, jnp.float32)


def test_taped_forward_bit_matches_compacted():
    """Same schedule, same uniforms: the taped forward's radiance and
    touched flags must equal trace_compacted / the replay bit-for-bit
    (max_depth 12 -> three stages, partially-live chunks)."""
    scene = _textured_cornell()
    ro, rd = _rays(4096, seed=1)
    key = jax.random.key(3)
    depth = 12

    rad_c = jax.jit(
        lambda s, ro, rd: trace_compacted(s, ro, rd, key, depth)
    )(scene, ro, rd)
    rad_t, touched_t, _tape = jax.jit(
        lambda s, ro, rd: trace_taped(s, ro, rd, key, depth)
    )(scene, ro, rd)
    np.testing.assert_array_equal(np.asarray(rad_c), np.asarray(rad_t))

    g = jnp.ones_like(rad_c) / rad_c.size
    _, _, touched_r = jax.jit(
        lambda s, ro, rd, rad, g: prb_grad_compacted(
            s, ro, rd, key, depth, rad, g
        )
    )(scene, ro, rd, rad_c, g)
    np.testing.assert_array_equal(np.asarray(touched_t), np.asarray(touched_r))


def test_tape_sweep_matches_replay_gradients():
    """Sweep gradients == replay gradients for every color-linear
    family (the sweep multiplies by reciprocals where the replay
    divides -> f32-rounding tolerance, not bit equality)."""
    scene = _textured_cornell()
    ro, rd = _rays(4096, seed=2)
    key = jax.random.key(5)
    depth = 12
    rng = np.random.RandomState(4)
    g = jnp.asarray(rng.uniform(0, 1, (ro.shape[0], 3)), jnp.float32)
    g = g / (ro.shape[0] * 3)

    @jax.jit
    def replay(s, ro, rd, g):
        rad = trace_compacted(s, ro, rd, key, depth)
        gacc, _, _ = prb_grad_compacted(s, ro, rd, key, depth, rad, g)
        return rad, gacc

    @jax.jit
    def taped(s, ro, rd, g):
        rad, _, tape = trace_taped(s, ro, rd, key, depth)
        return rad, tape_sweep(s, tape, rad, g, depth)

    rad_r, gacc_r = replay(scene, ro, rd, g)
    rad_t, gacc_t = taped(scene, ro, rd, g)
    np.testing.assert_array_equal(np.asarray(rad_r), np.asarray(rad_t))
    for nm, a, b in zip(("gcol", "gimg", "gmet"), gacc_r, gacc_t):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-9, err_msg=nm
        )
    gi = np.asarray(grads_image_flat(gacc_t, scene))
    assert np.abs(gi).sum() > 1e-4, "texel gradients must be live"
    assert np.abs(np.asarray(gacc_t[2])).sum() > 1e-5, "metal grads live"


def test_loss_and_grad_tape_matches_replay_and_ad():
    """prb_loss_and_grad_all: use_tape=True == use_tape=False == the
    AD surface, full parameter set including fuzz/IR."""
    scene = _textured_cornell()
    ro, rd = _rays(2048, seed=3)
    key = jax.random.key(7)
    depth = 8
    params = params_of(scene)
    rng = np.random.RandomState(6)
    w = jnp.asarray(rng.uniform(0, 1, (ro.shape[0], 3)), jnp.float32)

    def loss_fn(rad):
        return jnp.sum(w * rad)

    l_t, g_t = jax.jit(
        lambda p: prb_loss_and_grad_all(
            loss_fn, p, scene, ro, rd, key, depth, use_tape=True
        )
    )(params)
    l_r, g_r = jax.jit(
        lambda p: prb_loss_and_grad_all(
            loss_fn, p, scene, ro, rd, key, depth, use_tape=False
        )
    )(params)
    l_ad, g_ad = jax.jit(
        jax.value_and_grad(
            lambda p: loss_fn(prb_radiance_all(p, scene, ro, rd, key, depth))
        )
    )(params)

    np.testing.assert_allclose(float(l_t), float(l_r), rtol=1e-7)
    np.testing.assert_allclose(float(l_t), float(l_ad), rtol=1e-6)
    for name, a, b, c in zip(AllParams._fields, g_ad, g_r, g_t):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-9, err_msg=name
        )
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=1e-5, atol=1e-9, err_msg=name
        )
    assert np.abs(np.asarray(g_t.fuzz)).sum() > 1e-7
    assert np.abs(np.asarray(g_t.ir)).sum() > 1e-7


def test_tiled_ids_base_deferred_equals_full_width():
    """Tiles traced under ONE key with ids_base offsets are the same
    logical wavefront as the unsplit call: per-tile taped color grads +
    ONE global deferred tangent pass must equal the full-width fused
    call to float tolerance (paths are identical by construction)."""
    from ray_tracing_tpu.render.prb_scalar import scalar_tangent_pass

    scene = _textured_cornell()
    n, tile = 4096, 2048
    ro, rd = _rays(n, seed=5)
    key = jax.random.key(13)
    depth = 8
    params = params_of(scene)
    rng = np.random.RandomState(8)
    w = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)

    def loss_fn(rad):
        return jnp.sum(w * rad)

    l_full, g_full = jax.jit(
        lambda p: prb_loss_and_grad_all(loss_fn, p, scene, ro, rd, key, depth)
    )(params)

    @jax.jit
    def tiled(p):
        losses, gs, rads, gcos, touches = [], [], [], [], []
        for i in range(n // tile):
            sl = slice(i * tile, (i + 1) * tile)
            w_t = w[sl]
            l_i, g_i, (rad_i, g_ray_i, touched_i) = prb_loss_and_grad_all(
                lambda r, w_t=w_t: jnp.sum(w_t * r), p, scene,
                ro[sl], rd[sl], key, depth,
                ids_base=i * tile, defer_scalars=True,
            )
            losses.append(l_i)
            gs.append(g_i)
            rads.append(rad_i)
            gcos.append(g_ray_i)
            touches.append(touched_i)
        loss = sum(losses)
        g = jax.tree.map(lambda *x: sum(x), *gs)
        gfuzz, gir = scalar_tangent_pass(
            p, scene, ro, rd, key, depth,
            jnp.concatenate(rads), jnp.concatenate(gcos),
            jnp.concatenate(touches),
        )
        return loss, g._replace(fuzz=gfuzz, ir=gir)

    l_t, g_t = tiled(params)
    np.testing.assert_allclose(float(l_t), float(l_full), rtol=1e-6)
    for name, a, b in zip(AllParams._fields, g_full, g_t):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-9, err_msg=name
        )
    assert np.abs(np.asarray(g_t.fuzz)).sum() > 1e-7
    assert np.abs(np.asarray(g_t.ir)).sum() > 1e-7
