"""Multi-device sharding tests on the virtual 8-CPU-device mesh
(the TPU-world substitute for the reference's absent distributed story,
SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu import Camera, CameraParam, SceneBuilder
from ray_tracing_tpu.parallel.mesh import (
    make_mesh,
    make_prb_train_step_all,
    make_train_step,
    sharded_render_pass,
    sharded_trace,
)
from ray_tracing_tpu.render.integrator import trace


def _scene():
    b = SceneBuilder(background=(0.2, 0.3, 0.4))
    red = b.add_lambertian(b.add_texture_solid((0.8, 0.2, 0.2)))
    light = b.add_diffuse_light(b.add_texture_solid((3.0, 3.0, 3.0)))
    b.add_sphere((0, 0, -3), 1.0, red)
    b.add_rect("zx", -2, 2, -4, -2, 2.0, light, positive=False, important=True)
    return b.build()


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_trace_matches_per_shard_single_device():
    """Each shard must reproduce exactly what a single-device trace of
    the same rays produces under the same key and ids_base — sharding
    changes placement, not math (round 4: per-shard ids_base under ONE
    key replaced per-shard key fold-in, so the whole wavefront is also
    invariant to the device count; see
    test_integrator.test_sharded_render_bit_matches_unsharded)."""
    scene = _scene()
    mesh = make_mesh()
    n = 8 * 64
    rng = np.random.RandomState(0)
    ro = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (n, 1)), jnp.float32)
    d = np.stack([rng.uniform(-.3, .3, n), rng.uniform(-.3, .3, n), -np.ones(n)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    key = jax.random.key(7)

    out = np.asarray(sharded_trace(scene, ro, rd, key, 4, mesh))
    # reference: run each shard on one device with its ids_base
    per = n // 8
    for dev in range(8):
        lo, hi = dev * per, (dev + 1) * per
        expect = np.asarray(
            trace(scene, ro[lo:hi], rd[lo:hi], key, 4, ids_base=dev * per)
        )
        assert np.allclose(out[lo:hi], expect, atol=1e-6), f"shard {dev}"


def test_sharded_render_pass_shape():
    scene = _scene()
    cam = Camera.build(CameraParam((0, 0, 1), (0, 0, -1), 60), 20 / 12)
    img = np.asarray(
        sharded_render_pass(
            scene, cam, jax.random.key(0),
            width=20, height=12, max_depth=3, antialias=True, mesh=make_mesh(),
        )
    )
    assert img.shape == (12, 20, 3)
    assert np.isfinite(img).all()


def test_full_param_train_step_sharded():
    """The FULL parameter set (colors, texels, metal albedo, fuzz, IR)
    gets gradients through the sharded production path: the scene rides
    shard_map as a traced operand, the scalar rows come from the
    concrete template scene (prb_scalar._active_rows cannot read a
    tracer), and the psum'd full-param step descends."""
    from ray_tracing_tpu.render.prb_scalar import params_of

    b = SceneBuilder(background=(0.3, 0.3, 0.3))
    green = b.add_lambertian(b.add_texture_solid((0.2, 0.8, 0.2)))
    metal = b.add_metal((0.9, 0.8, 0.7), 0.2)
    glass = b.add_dielectric(1.5)
    light = b.add_diffuse_light(b.add_texture_solid((3.0, 3.0, 3.0)))
    b.add_rect("xy", -5, 5, -5, 5, -3.0, green, positive=True)
    b.add_sphere((-0.7, 0.0, -1.8), 0.5, metal)
    b.add_sphere((0.7, 0.0, -1.8), 0.5, glass)
    b.add_rect("zx", -1, 1, -3, -1, 3.0, light, positive=False,
               important=True)
    scene = b.build()
    cam = Camera.build(CameraParam((0, 0, 1), (0, 0, -1), 90), 1.0)
    mesh = make_mesh()
    step = make_prb_train_step_all(
        cam, scene, width=16, height=16, max_depth=4, mesh=mesh, lr=0.3,
    )

    params = params_of(scene)
    target = jnp.full((16, 16, 3), 0.5, jnp.float32)
    losses = []
    for it in range(6):
        params, loss = step(params, scene, jax.random.key(it), target)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    # scalar parameters actually received gradient signal
    p0 = params_of(scene)
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).sum()),
        params, p0,
    )
    assert moved.color > 0.0
    assert moved.fuzz > 0.0 or moved.ir > 0.0, moved


def test_train_step_reduces_loss():
    """DP differentiable-rendering: fit a wall albedo toward a target
    image; the psum'd gradient must actually descend."""
    b = SceneBuilder(background=(0.9, 0.9, 0.9))
    mat = b.add_lambertian(b.add_texture_solid((0.2, 0.8, 0.2)))
    b.add_rect("xy", -5, 5, -5, 5, -3.0, mat, positive=True)
    scene = b.build()
    cam = Camera.build(CameraParam((0, 0, 1), (0, 0, -1), 90), 1.0)
    mesh = make_mesh()
    step = make_train_step(cam, width=16, height=16, max_depth=2, mesh=mesh, lr=0.8)

    target = jnp.full((16, 16, 3), 0.55, jnp.float32)
    losses = []
    for it in range(8):
        scene, loss = step(scene, jax.random.key(it), target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses
    # the fitted albedo moved toward the target color
    c = np.asarray(scene.textures.color[0])
    assert abs(c[0] - c[1]) < 0.45  # started at (0.2, 0.8): gap shrinks


def test_direct_taped_train_step_matches_ad_step():
    """make_prb_train_step_all_direct (taped single-traversal backward,
    explicit psum) must produce the same update as the AD-surface step
    on the same key — the multi-chip face of the round-4 tape path.
    Width 15x15 also exercises the ray-axis padding mask (225 rays pad
    to 256 over 8 devices — _shard_pad rounds to n_devices*8)."""
    from ray_tracing_tpu.parallel.mesh import make_prb_train_step_all_direct
    from ray_tracing_tpu.render.prb_scalar import params_of

    b = SceneBuilder(background=(0.3, 0.3, 0.3))
    green = b.add_lambertian(b.add_texture_solid((0.2, 0.8, 0.2)))
    metal = b.add_metal((0.9, 0.8, 0.7), 0.2)
    glass = b.add_dielectric(1.5)
    light = b.add_diffuse_light(b.add_texture_solid((3.0, 3.0, 3.0)))
    b.add_rect("xy", -5, 5, -5, 5, -3.0, green, positive=True)
    b.add_sphere((-0.7, 0.0, -1.8), 0.5, metal)
    b.add_sphere((0.7, 0.0, -1.8), 0.5, glass)
    b.add_rect("zx", -1, 1, -3, -1, 3.0, light, positive=False,
               important=True)
    scene = b.build()
    cam = Camera.build(CameraParam((0, 0, 1), (0, 0, -1), 90), 1.0)
    mesh = make_mesh()
    w = h = 15
    target = jnp.full((h, w, 3), 0.5, jnp.float32)
    params = params_of(scene)

    step_ad = make_prb_train_step_all(
        cam, scene, width=w, height=h, max_depth=4, mesh=mesh, lr=0.3,
    )
    step_dir = make_prb_train_step_all_direct(
        cam, scene, width=w, height=h, max_depth=4, mesh=mesh, lr=0.3,
    )
    p_ad, l_ad = step_ad(params, scene, jax.random.key(5), target)
    p_dir, l_dir = step_dir(params, scene, jax.random.key(5), target)
    np.testing.assert_allclose(float(l_dir), float(l_ad), rtol=1e-6)
    for a, b2 in zip(jax.tree.leaves(p_ad), jax.tree.leaves(p_dir)):
        np.testing.assert_allclose(
            np.asarray(b2), np.asarray(a), rtol=1e-4, atol=1e-7
        )
