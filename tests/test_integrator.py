"""Estimator-law tests for the bounce-loop integrator
(reference src/renderer.rs:123-332 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu import CameraParam, Renderer, RendererParam, SceneBuilder
from ray_tracing_tpu.render.integrator import trace


def _trace(scene, ro, rd, key=0, depth=8):
    return np.asarray(
        trace(scene, jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32),
              jax.random.key(key), depth)
    )


def test_empty_scene_is_background():
    scene = SceneBuilder(background=(0.1, 0.2, 0.3)).build()
    out = _trace(scene, [[0, 0, 0]], [[0, 0, -1]])
    assert np.allclose(out, [[0.1, 0.2, 0.3]])


def test_direct_light_view_emits():
    b = SceneBuilder(background=(0, 0, 0))
    light = b.add_diffuse_light(b.add_texture_solid((5.0, 4.0, 3.0)))
    b.add_rect("xy", -1, 1, -1, 1, -2.0, light, positive=True)
    scene = b.build()
    # front side (+z normal, ray going -z -> front_face) sees the emission
    out = _trace(scene, [[0, 0, 0]], [[0, 0, -1]])
    assert np.allclose(out, [[5.0, 4.0, 3.0]], atol=1e-5)
    # back side: one-sided emission (reference diffuse_light.rs:18-23)
    out = _trace(scene, [[0, 0, -4]], [[0, 0, 1]])
    assert np.allclose(out, [[0, 0, 0]], atol=1e-5)


def test_lambertian_furnace():
    """Infinite-ish lambertian plane under a white background sky:
    every camera ray picks up exactly albedo * background."""
    albedo = (0.7, 0.5, 0.3)
    b = SceneBuilder(background=(1.0, 1.0, 1.0))
    mat = b.add_lambertian(b.add_texture_solid(albedo))
    b.add_rect("zx", -1e4, 1e4, -1e4, 1e4, 0.0, mat, positive=True)
    scene = b.build()
    n = 4096
    ro = np.tile([[0.0, 1.0, 0.0]], (n, 1))
    rd = np.tile([[0.0, -1.0, 0.0]], (n, 1))
    out = _trace(scene, ro, rd, depth=4)
    # cosine-sampled bounce always escapes upward to the background
    assert np.allclose(out.mean(axis=0), albedo, atol=1e-3)
    assert out.std(axis=0).max() < 1e-4  # exact per-path (f32 rounding only)


def test_depth_exhaustion_returns_environment():
    """Two parallel perfect mirrors trap the ray; after max_depth the
    environment color is returned (reference renderer.rs:128-130)."""
    b = SceneBuilder(background=(9.0, 9.0, 9.0), environment=(0.25, 0.5, 0.75))
    mirror = b.add_metal((1.0, 1.0, 1.0), 0.0)
    b.add_rect("xy", -10, 10, -10, 10, 0.0, mirror)
    b.add_rect("xy", -10, 10, -10, 10, 1.0, mirror)
    scene = b.build()
    out = _trace(scene, [[0, 0, 0.5]], [[0, 0, -1]], depth=6)
    assert np.allclose(out, [[0.25, 0.5, 0.75]], atol=1e-5)


def test_metal_mirror_reflects_light():
    b = SceneBuilder(background=(0, 0, 0))
    light = b.add_diffuse_light(b.add_texture_solid((2.0, 2.0, 2.0)))
    mirror = b.add_metal((0.8, 0.9, 1.0), 0.0)
    b.add_rect("zx", -10, 10, -10, 10, 0.0, mirror, positive=True)  # floor y=0
    b.add_rect("zx", -10, 10, -10, 10, 4.0, light, positive=False)  # ceiling
    scene = b.build()
    # straight down: bounce to straight up, hit ceiling light
    out = _trace(scene, [[0, 1, 0]], [[0, -1, 0]], depth=3)
    assert np.allclose(out, [[0.8 * 2, 0.9 * 2, 1.0 * 2]], atol=1e-4)


def test_dielectric_straight_through():
    """Normal incidence on glass slab-like sphere: ray passes through
    (or reflects) with attenuation exactly 1 -> sees background."""
    b = SceneBuilder(background=(0.3, 0.6, 0.9))
    glass = b.add_dielectric(1.5)
    b.add_sphere((0, 0, -3), 1.0, glass)
    scene = b.build()
    n = 512
    out = _trace(scene, np.tile([[0, 0, 0]], (n, 1)), np.tile([[0, 0, -1]], (n, 1)),
                 depth=8)
    assert np.allclose(out, [0.3, 0.6, 0.9], atol=1e-4)


def test_isotropic_medium_attenuates():
    """Dense fog with black albedo: rays entering the sphere die inside
    -> black; background elsewhere."""
    b = SceneBuilder(background=(1.0, 1.0, 1.0))
    fog = b.add_isotropic(b.add_texture_solid((0.0, 0.0, 0.0)))
    b.add_sphere((0, 0, -5), 1.0, fog, medium_density=1e4)
    scene = b.build()
    out = _trace(scene, [[0, 0, 0]], [[0, 0, -1]], depth=8)
    assert np.allclose(out, [[0, 0, 0]], atol=1e-6)
    out = _trace(scene, [[0, 0, 0]], [[0, 1, 0]], depth=8)
    assert np.allclose(out, [[1, 1, 1]], atol=1e-6)


def test_mis_unbiased_vs_brute_force():
    """Marking the light 'important' must not change the converged mean
    (reference's 0.5/0.5 mixture estimator, renderer.rs:234-244)."""

    def build(important):
        b = SceneBuilder(background=(0, 0, 0))
        white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
        light = b.add_diffuse_light(b.add_texture_solid((4.0, 4.0, 4.0)))
        b.add_rect("zx", -2, 2, -2, 2, 0.0, white, positive=True)
        b.add_rect("zx", -0.5, 0.5, -0.5, 0.5, 1.999, light, positive=False,
                   important=important)
        b.add_rect("xy", -2, 2, 0, 2, -2.0, white, positive=True)
        return b.build()

    n = 20_000
    rng = np.random.RandomState(0)
    ro = np.tile([[0.0, 1.0, 1.5]], (n, 1))
    # fan of directions toward the floor
    d = np.stack([rng.uniform(-0.3, 0.3, n), -np.ones(n), rng.uniform(-0.9, -0.3, n)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    means = []
    for important in (False, True):
        scene = build(important)
        acc = 0.0
        for k in range(12):
            acc = acc + _trace(scene, ro, d, key=k, depth=6).mean()
        means.append(acc / 12)
    assert np.isclose(means[0], means[1], rtol=0.05), means


def test_renderer_shapes_and_determinism():
    b = SceneBuilder(background=(0.5, 0.5, 0.5))
    b.add_sphere((0, 0, -3), 1.0, b.add_lambertian(b.add_texture_solid((0.5, 0.2, 0.2))))
    scene = b.build()
    cam = CameraParam((0, 0, 1), (0, 0, -1), 60)
    r = Renderer(RendererParam(40, 30, max_depth=4), cam, scene)
    img = np.asarray(r.render(0))
    assert img.shape == (30, 40, 3)
    assert np.array_equal(img, np.asarray(r.render(0)))
    assert not np.array_equal(img, np.asarray(r.render(1)))
    assert not np.isnan(img).any()


def test_image_orientation_top_row_first():
    """Row 0 of the output is the TOP of the image (reference renderer.rs:101
    iterates j = height-1 .. 0)."""
    b = SceneBuilder(background=(0, 0, 0))
    light = b.add_diffuse_light(b.add_texture_solid((1, 1, 1)))
    # emissive ceiling rect in the upper half of the view
    b.add_rect("zx", -50, 50, -50, 50, 20.0, light, positive=False)
    scene = b.build()
    cam = CameraParam((0, 10, 0), (0, 10, -50), 60)
    r = Renderer(RendererParam(16, 16, max_depth=2, antialias=False), cam, scene)
    img = np.asarray(r.render(0))
    top = img[:4].mean()
    bottom = img[-4:].mean()
    assert top > bottom  # bright ceiling should be in the top rows


def test_compacted_trace_is_unbiased():
    """trace_compacted must agree with trace in expectation (it re-pairs
    rays with uniforms, so only statistically) and exactly on scenes
    where every path's contribution is deterministic."""
    from ray_tracing_tpu.render.integrator import trace_compacted

    # furnace: every path contributes exactly albedo regardless of RNG
    albedo = (0.7, 0.5, 0.3)
    b = SceneBuilder(background=(1.0, 1.0, 1.0))
    mat = b.add_lambertian(b.add_texture_solid(albedo))
    b.add_rect("zx", -1e4, 1e4, -1e4, 1e4, 0.0, mat, positive=True)
    scene = b.build()
    n = 1024
    ro = jnp.asarray(np.tile([[0.0, 1.0, 0.0]], (n, 1)), jnp.float32)
    rd = jnp.asarray(np.tile([[0.0, -1.0, 0.0]], (n, 1)), jnp.float32)
    out = np.asarray(
        trace_compacted(scene, ro, rd, jax.random.key(0), 8, stage_bounces=2)
    )
    assert np.allclose(out.mean(axis=0), albedo, atol=1e-3)

    # Cornell-ish: means agree within MC tolerance over several keys
    b = SceneBuilder(background=(0, 0, 0))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
    light = b.add_diffuse_light(b.add_texture_solid((4.0, 4.0, 4.0)))
    b.add_rect("zx", -2, 2, -2, 2, 0.0, white, positive=True)
    b.add_rect("zx", -1, 1, -1, 1, 3.0, light, positive=False, important=True)
    b.add_rect("xy", -2, 2, 0, 2, -2.0, white, positive=True)
    scene = b.build()
    rng = np.random.RandomState(0)
    n = 8192
    ro = jnp.asarray(np.tile([[0.0, 1.0, 1.5]], (n, 1)), jnp.float32)
    d = np.stack([rng.uniform(-.3, .3, n), -np.ones(n), rng.uniform(-.9, -.3, n)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)

    m_std = np.mean([
        np.asarray(trace(scene, ro, rd, jax.random.key(k), 8)).mean()
        for k in range(8)
    ])
    m_cmp = np.mean([
        np.asarray(
            trace_compacted(scene, ro, rd, jax.random.key(k), 8,
                            stage_bounces=2, chunk_div=8)
        ).mean()
        for k in range(8)
    ])
    assert np.isclose(m_std, m_cmp, rtol=0.05), (m_std, m_cmp)


def test_device_accumulate_matches_sum_of_renders():
    b = SceneBuilder(background=(0.3, 0.4, 0.5))
    b.add_sphere((0, 0, -3), 1.0, b.add_lambertian(b.add_texture_solid((0.6, 0.3, 0.2))))
    scene = b.build()
    cam = CameraParam((0, 0, 1), (0, 0, -1), 60)
    r = Renderer(RendererParam(24, 16, max_depth=3), cam, scene)
    acc = None
    for i in range(3):
        acc = r.accumulate(i, acc)
    expect = sum(np.asarray(r.render(i)) for i in range(3))
    np.testing.assert_allclose(np.asarray(acc), expect, rtol=1e-6)


def test_golden_regression_zy():
    """Pinned dense-estimator render (CPU, fixed key): catches unintended
    estimator changes.  Regenerate the golden deliberately when the
    estimator/RNG-layout changes on purpose:
      python -c "...Renderer(...,compaction=False).render(42)" (see file)
    """
    import os

    from ray_tracing_tpu import load_scene_json

    bd = load_scene_json("data/zy_scene.json")
    r = Renderer(
        RendererParam(32, 32, max_depth=4), bd.camera, bd.scene,
        tile_size=1024, compaction=False, early_exit=False,
    )
    img = np.asarray(r.render(42))
    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "zy_32_d4_key42.npy")
    )
    np.testing.assert_allclose(img, golden, rtol=1e-5, atol=1e-6)


def test_render_to_noise_converges_and_stops():
    """Noise-targeted rendering: more passes -> lower error; loose
    targets stop earlier than tight ones; the returned image is the
    running mean."""
    import jax

    from ray_tracing_tpu import load_scene_json
    from ray_tracing_tpu.render.renderer import Renderer, RendererParam

    bd = load_scene_json("data/zy_scene.json")
    r = Renderer(RendererParam(32, 32, max_depth=4), bd.camera, bd.scene)

    img_loose, n_loose, rel_loose = r.render_to_noise(
        0, target_rel_err=0.30, max_passes=64, min_passes=4, check_every=4
    )
    img_tight, n_tight, rel_tight = r.render_to_noise(
        0, target_rel_err=0.10, max_passes=64, min_passes=4, check_every=4
    )
    assert img_loose.shape == (32, 32, 3)
    assert n_loose <= n_tight
    assert rel_tight <= rel_loose + 1e-6
    assert np.isfinite(img_tight).all()
    # the mean image matches accumulating the same keys manually
    acc = None
    key = jax.random.key(0)
    for i in range(n_loose):
        acc = r.accumulate(jax.random.fold_in(key, i), acc)
    np.testing.assert_allclose(
        img_loose, np.asarray(acc) / n_loose, rtol=1e-5, atol=1e-6
    )


def test_golden_regression_scene_json():
    """Golden for the mesh + instancing-transform + constant-medium
    scene (data/scene.json) — the feature surface zy lacks.  Regenerate
    deliberately on estimator/RNG-layout changes (same recipe as
    test_golden_regression_zy)."""
    import os

    from ray_tracing_tpu import load_scene_json

    bd = load_scene_json("data/scene.json")
    r = Renderer(
        RendererParam(32, 32, max_depth=4), bd.camera, bd.scene,
        tile_size=1024, compaction=False, early_exit=False,
    )
    img = np.asarray(r.render(42))
    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden",
                     "scene_32_d4_key42.npy")
    )
    np.testing.assert_allclose(img, golden, rtol=1e-5, atol=1e-6)


def test_golden_regression_bunny_mesh():
    """Golden for the triangle-mesh surface (BVH build + sweep
    traversal) via the C4 bunny scene, pinning the mesh path against
    silent estimator drift (VERDICT r3 item 9).  Every mesh strategy
    must reproduce the same golden: the default pick exactly, the
    others to f32 t-rounding tolerance."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    try:
        from examples.render_baselines import scene_c4
    finally:
        sys.path.pop(0)

    b, cam = scene_c4()
    scene = b.build()
    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden",
                     "bunny_32_d4_key42.npy")
    )

    def render_mode(mode):
        if mode:
            os.environ["RAY_TPU_MESH"] = mode
        try:
            r = Renderer(
                RendererParam(32, 32, max_depth=4), cam, scene,
                tile_size=1024, compaction=False, early_exit=False,
            )
            return np.asarray(r.render(42))
        finally:
            os.environ.pop("RAY_TPU_MESH", None)

    np.testing.assert_allclose(render_mode(None), golden,
                               rtol=1e-5, atol=1e-6)
    for mode in ("cluster", "brute"):
        np.testing.assert_allclose(render_mode(mode), golden,
                                   atol=1e-4, rtol=1e-3)


def _medium_golden_scene():
    """Fog sphere in a lit box corner: the constant-medium double-hit +
    free-flight sampling path, isolated from meshes."""
    from ray_tracing_tpu import CameraParam, SceneBuilder

    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    light = b.add_diffuse_light(b.add_texture_solid((7.0, 7.0, 7.0)))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
    fog = b.add_isotropic(b.add_texture_solid((0.8, 0.85, 0.9)))
    b.add_rect("zx", -2, 2, -2, 2, 0.0, white, positive=True)
    b.add_rect("xy", -2, 2, 0, 3, -2.0, white, positive=True)
    b.add_rect("zx", -0.7, 0.7, -0.7, 0.7, 2.8, light, positive=False,
               important=True)
    b.add_medium(1.5, fog, spheres=[((0.0, 1.0, 0.0), 0.8)])
    cam = CameraParam((0, 1.2, 4.5), (0, 1.0, 0), 40)
    return b.build(), cam


def test_golden_regression_constant_medium():
    """Golden for the constant-medium path (entry/exit double hit,
    exponential free flight, isotropic phase function) so volume
    estimator drift cannot ship silently (VERDICT r3 item 9)."""
    import os

    scene, cam = _medium_golden_scene()
    r = Renderer(
        RendererParam(32, 32, max_depth=4), cam, scene,
        tile_size=1024, compaction=False, early_exit=False,
    )
    img = np.asarray(r.render(42))
    # sanity: the fog actually contributes (some center pixels scatter)
    assert np.isfinite(img).all() and img.max() > 0.1
    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden",
                     "medium_32_d4_key42.npy")
    )
    np.testing.assert_allclose(img, golden, rtol=1e-5, atol=1e-6)


def test_golden_regression_earth_texture():
    """Golden for the image-texture (atlas gather, UV orientation)
    surface via the C3 earth scene."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    try:
        from render_baselines import scene_c3
    finally:
        sys.path.pop(0)

    b, cam = scene_c3()
    r = Renderer(
        RendererParam(32, 32, max_depth=4), cam, b.build(),
        tile_size=1024, compaction=False, early_exit=False,
    )
    img = np.asarray(r.render(42))
    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden",
                     "earth_32_d4_key42.npy")
    )
    np.testing.assert_allclose(img, golden, rtol=1e-5, atol=1e-6)


def test_render_independent_of_tile_size():
    """Round 4: per-ray RNG ids are GLOBAL (key shared across tiles,
    ids_base per tile), so the image is a pure function of
    (scene, camera, key) — tile_size is an execution strategy, like
    compaction, and must be BIT-invisible."""
    from ray_tracing_tpu import load_scene_json

    bd = load_scene_json("data/zy_scene.json")
    imgs = []
    for tile in (256, 512, 1024):
        r = Renderer(
            RendererParam(32, 32, max_depth=4), bd.camera, bd.scene,
            tile_size=tile, compaction=False, early_exit=False,
        )
        imgs.append(np.asarray(r.render(42)))
    np.testing.assert_array_equal(imgs[0], imgs[1])
    np.testing.assert_array_equal(imgs[0], imgs[2])


def test_sharded_render_bit_matches_unsharded():
    """Same invariance across the device mesh: an 8-device sharded pass
    must equal the single-call trace bit-for-bit (per-shard ids_base
    under one key — sharding is an execution strategy too)."""
    import jax

    from ray_tracing_tpu import Camera, CameraParam, load_scene_json
    from ray_tracing_tpu.models.camera import camera_rays
    from ray_tracing_tpu.parallel.mesh import make_mesh, sharded_trace

    bd = load_scene_json("data/zy_scene.json")
    cam = Camera.build(bd.camera, 1.0)
    n = 2048
    ro, rd, _, k_trace = camera_rays(cam, jax.random.key(3), 64, 32, True)
    mesh = make_mesh()
    shard = np.asarray(
        sharded_trace(bd.scene, ro, rd, k_trace, 4, mesh)
    )
    single = np.asarray(trace(bd.scene, ro, rd, k_trace, 4))
    assert shard.shape[0] == n
    # the PATHS are identical (same ids -> same uniforms), but the
    # sharded program is a different XLA program whose f32 FMA fusion
    # may differ in the last bits — so: overwhelmingly bit-equal, and
    # never beyond f32 rounding (a flipped branch would show O(1))
    rows_equal = (shard == single).all(axis=1).mean()
    assert rows_equal > 0.99, rows_equal
    np.testing.assert_allclose(shard, single, rtol=2e-4, atol=2e-5)


def test_fusion_hint_is_bit_identical():
    """The fusion_hint aux output (junk i32 written per bounce to flip
    XLA's fusion, round 5) must not change the radiance in any bit."""
    import jax

    from ray_tracing_tpu import load_scene_json
    from ray_tracing_tpu.models.camera import Camera, camera_rays
    from ray_tracing_tpu.render.integrator import trace_compacted

    bundle = load_scene_json("data/zy_scene.json")
    scene = bundle.scene
    cam = Camera.build(bundle.camera, 1.0)
    ro, rd, _, k = camera_rays(cam, jax.random.key(5), 32, 32, True)
    plain = np.asarray(jax.jit(
        lambda s, ro, rd, k: trace_compacted(s, ro, rd, k, 8)
    )(scene, ro, rd, k))
    hinted, hint = jax.jit(
        lambda s, ro, rd, k: trace_compacted(s, ro, rd, k, 8,
                                             fusion_hint=True)
    )(scene, ro, rd, k)
    np.testing.assert_array_equal(plain, np.asarray(hinted))
    assert int(hint) != 0  # the junk rows really are written

    with_stats = jax.jit(
        lambda s, ro, rd, k: trace_compacted(
            s, ro, rd, k, 8, with_stats=True, fusion_hint=True)
    )(scene, ro, rd, k)
    rad2, segs, hint2 = with_stats
    np.testing.assert_array_equal(plain, np.asarray(rad2))
    assert float(segs) > 0
