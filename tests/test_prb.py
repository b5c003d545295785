"""Path-replay backprop: exact agreement with AD on the dense loop,
replay fidelity, and compacted-gradient sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu import SceneBuilder
from ray_tracing_tpu.render.integrator import trace, trace_compacted
from ray_tracing_tpu.render.prb import (
    PrbParams,
    prb_grad_compacted,
    prb_grad_dense,
    prb_radiance,
    prb_radiance_full,
)


def _cornell():
    """Strictly-positive albedos (PRB's division trick is exact there)."""
    b = SceneBuilder(background=(0.05, 0.05, 0.05))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.7, 0.68)))
    red = b.add_lambertian(b.add_texture_solid((0.65, 0.15, 0.12)))
    light = b.add_diffuse_light(b.add_texture_solid((4.0, 3.5, 3.0)))
    fog = b.add_isotropic(b.add_texture_solid((0.8, 0.7, 0.6)))
    glass = b.add_dielectric(1.5)
    metal = b.add_metal((0.9, 0.85, 0.8), 0.1)
    b.add_rect("zx", -2, 2, -2, 2, 0.0, white, positive=True)
    b.add_rect("xy", -2, 2, 0, 2, -2.0, red, positive=True)
    b.add_rect("zx", -1, 1, -1, 1, 3.0, light, positive=False, important=True)
    b.add_sphere((0.8, 0.5, -0.8), 0.4, glass)
    b.add_sphere((-0.8, 0.5, -0.8), 0.4, metal)
    b.add_sphere((0.0, 0.6, 0.2), 0.3, fog, medium_density=2.0)
    return b.build()


def _rays(n=2048, seed=0):
    rng = np.random.RandomState(seed)
    ro = jnp.asarray(np.tile([[0.0, 1.2, 1.8]], (n, 1)), jnp.float32)
    d = np.stack(
        [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.8, 0.1, n), -np.ones(n)], -1
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return ro, jnp.asarray(d, jnp.float32)


def test_prb_dense_matches_ad_exactly():
    """Same paths (same key, dense loop): PRB's algebraic derivative must
    equal jax.grad to float tolerance."""
    scene = _cornell()
    ro, rd = _rays()
    key = jax.random.key(3)
    depth = 6

    def loss_ad(colors):
        s = scene.replace(textures=scene.textures.replace(color=colors))
        return jnp.sum(trace(s, ro, rd, key, depth) * weights)

    rng = np.random.RandomState(1)
    weights = jnp.asarray(rng.uniform(0, 1, (ro.shape[0], 3)), jnp.float32)

    colors = scene.textures.color
    g_ad = np.asarray(jax.grad(loss_ad)(colors))

    def loss_prb(colors):
        return jnp.sum(
            prb_radiance(colors, scene, ro, rd, key, depth, compaction=False)
            * weights
        )

    g_prb = np.asarray(jax.grad(loss_prb)(colors))
    np.testing.assert_allclose(g_prb, g_ad, rtol=2e-3, atol=2e-4)
    assert np.abs(g_ad).sum() > 0.1  # gradients are actually nonzero


def _textured_cornell():
    """Cornell variant with an image-textured floor and a fuzzy metal
    sphere — exercises the texel and metal-albedo gradient paths."""
    rng = np.random.RandomState(7)
    img = rng.uniform(0.2, 0.9, (4, 6, 3)).astype(np.float32)
    b = SceneBuilder(background=(0.05, 0.05, 0.05))
    floor_tex = b.add_texture_image(img)
    floor = b.add_lambertian(floor_tex)
    red = b.add_lambertian(b.add_texture_solid((0.65, 0.15, 0.12)))
    light = b.add_diffuse_light(b.add_texture_solid((4.0, 3.5, 3.0)))
    metal = b.add_metal((0.9, 0.85, 0.8), 0.1)
    b.add_rect("zx", -2, 2, -2, 2, 0.0, floor, positive=True)
    b.add_rect("xy", -2, 2, 0, 2, -2.0, red, positive=True)
    b.add_rect("zx", -1, 1, -1, 1, 3.0, light, positive=False, important=True)
    b.add_sphere((-0.6, 0.5, -0.6), 0.45, metal)
    return b.build()


def test_prb_full_params_match_ad_exactly():
    """Texel and metal-albedo PRB gradients equal jax.grad on the same
    dense paths (VERDICT r1 item 2: the full color-linear set)."""
    scene = _textured_cornell()
    ro, rd = _rays(2048, seed=2)
    key = jax.random.key(4)
    depth = 6
    rng = np.random.RandomState(1)
    weights = jnp.asarray(rng.uniform(0, 1, (ro.shape[0], 3)), jnp.float32)

    params = PrbParams(
        scene.textures.color, scene.textures.images, scene.materials.albedo
    )

    def loss_ad(p):
        s = scene.replace(
            textures=scene.textures.replace(color=p.color, images=p.images),
            materials=scene.materials.replace(albedo=p.metal_albedo),
        )
        return jnp.sum(trace(s, ro, rd, key, depth) * weights)

    g_ad = jax.grad(loss_ad)(params)

    def loss_prb(p):
        return jnp.sum(
            prb_radiance_full(p, scene, ro, rd, key, depth, compaction=False)
            * weights
        )

    g_prb = jax.grad(loss_prb)(params)

    for name, a, p in zip(
        PrbParams._fields, g_ad, g_prb
    ):
        a, p = np.asarray(a), np.asarray(p)
        np.testing.assert_allclose(p, a, rtol=2e-3, atol=3e-4, err_msg=name)
    assert np.abs(np.asarray(g_ad.images)).sum() > 0.01
    assert np.abs(np.asarray(g_ad.metal_albedo)).sum() > 0.01


def test_prb_texel_fit_recovers_image():
    """C5 deliverable shape: fit atlas texels from rendered targets."""
    import optax

    scene = _textured_cornell()
    true_params = PrbParams(
        scene.textures.color, scene.textures.images, scene.materials.albedo
    )
    ro, rd = _rays(8192, seed=13)
    keys = [jax.random.key(200 + i) for i in range(3)]
    targets = [
        prb_radiance_full(true_params, scene, ro, rd, k, 5) for k in keys
    ]

    images = jnp.full_like(true_params.images, 0.5)
    opt = optax.adam(0.1)
    state = opt.init(images)

    @jax.jit
    def step(images, state, which):
        def loss(im):
            p = true_params._replace(images=im)
            rad = prb_radiance_full(
                p, scene, ro, rd,
                jax.lax.switch(which, [lambda k=k: k for k in keys]), 5,
            )
            return jnp.mean((rad - jax.lax.switch(
                which, [lambda t=t: t for t in targets])) ** 2)

        l, grad = jax.value_and_grad(loss)(images)
        upd, state = opt.update(grad, state)
        images = optax.apply_updates(images, upd)
        return jnp.clip(images, 0.05, 1.0), state, l

    for i in range(80):
        images, state, l = step(images, state, jnp.int32(i % 3))
    err = np.abs(np.asarray(images) - np.asarray(true_params.images))
    # texels the camera rays actually see converge; a couple of corner
    # texels may be under-sampled — judge by the bulk
    assert np.median(err) < 0.1, err
    assert np.mean(err < 0.2) > 0.75, err


def test_prb_emissive_image_texture_matches_ad():
    """An image-textured diffuse light sends the EMISSION gradient
    through the atlas-scatter path (emit_mask & leaf_is_image) — the
    branch merged with the albedo accumulation in prb._prb_bounce; pins
    that the merged one-hot/scatter still routes T_k to the right texels
    and suffix/A to the right solid leaves on the same bounce."""
    rng = np.random.RandomState(11)
    emit_img = rng.uniform(1.0, 5.0, (3, 5, 3)).astype(np.float32)
    b = SceneBuilder(background=(0.05, 0.05, 0.05))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.7, 0.68)))
    light = b.add_diffuse_light(b.add_texture_image(emit_img))
    b.add_rect("zx", -2, 2, -2, 2, 0.0, white, positive=True)
    b.add_rect("zx", -1, 1, -1, 1, 3.0, light, positive=False,
               important=True)
    b.add_sphere((0.3, 0.5, -0.5), 0.4, white)
    scene = b.build()

    ro, rd = _rays(2048, seed=6)
    key = jax.random.key(8)
    depth = 5
    wrng = np.random.RandomState(2)
    weights = jnp.asarray(wrng.uniform(0, 1, (ro.shape[0], 3)), jnp.float32)
    params = PrbParams(
        scene.textures.color, scene.textures.images, scene.materials.albedo
    )

    def loss_ad(p):
        s = scene.replace(
            textures=scene.textures.replace(color=p.color, images=p.images)
        )
        return jnp.sum(trace(s, ro, rd, key, depth) * weights)

    g_ad = jax.grad(loss_ad)(params)

    def loss_prb(p):
        return jnp.sum(
            prb_radiance_full(p, scene, ro, rd, key, depth, compaction=False)
            * weights
        )

    g_prb = jax.grad(loss_prb)(params)
    np.testing.assert_allclose(
        np.asarray(g_prb.images), np.asarray(g_ad.images),
        rtol=2e-3, atol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(g_prb.color), np.asarray(g_ad.color),
        rtol=2e-3, atol=3e-4,
    )
    # the emitter texels the rays can see must carry real gradient
    assert np.abs(np.asarray(g_ad.images)).sum() > 0.01


def test_prb_replay_reproduces_forward_exactly():
    """The replay must walk the very same paths: its reconstructed
    radiance equals the forward output bit-for-bit (dense and compacted)."""
    scene = _cornell()
    ro, rd = _rays(seed=5)
    key = jax.random.key(9)
    g = jnp.ones_like(ro)

    rad_dense = trace(scene, ro, rd, key, 6)
    _, replay_dense, _ = prb_grad_dense(scene, ro, rd, key, 6, rad_dense, g)
    np.testing.assert_array_equal(np.asarray(rad_dense), np.asarray(replay_dense))

    rad_c = trace_compacted(scene, ro, rd, key, 6)
    _, replay_c, _ = prb_grad_compacted(scene, ro, rd, key, 6, rad_c, g)
    np.testing.assert_array_equal(np.asarray(rad_c), np.asarray(replay_c))


def test_prb_compacted_replay_exact_with_images():
    """Replay lock-step must also hold when the atlas-scatter path is
    active (image textures gate a lax.cond per bounce inside the
    chunked while_loop)."""
    scene = _textured_cornell()
    ro, rd = _rays(4096, seed=8)
    key = jax.random.key(12)
    g = jnp.ones_like(ro)

    rad_c = trace_compacted(scene, ro, rd, key, 6)
    _, replay_c, _ = prb_grad_compacted(scene, ro, rd, key, 6, rad_c, g)
    np.testing.assert_array_equal(np.asarray(rad_c), np.asarray(replay_c))


def test_prb_compacted_gradient_is_consistent():
    """Compacted PRB differentiates its own (compacted) estimator; its
    gradient must match dense-PRB statistically (same expectation)."""
    scene = _cornell()
    colors = scene.textures.color

    def mean_grad(compaction, keys):
        acc = 0.0
        for k in keys:
            ro, rd = _rays(4096, seed=k)

            def loss(c):
                return jnp.mean(
                    prb_radiance(c, scene, ro, rd, jax.random.key(k), 6,
                                 compaction=compaction)
                )

            acc = acc + np.asarray(jax.grad(loss)(colors))
        return acc / len(keys)

    g_dense = mean_grad(False, range(6))
    g_comp = mean_grad(True, range(6, 12))
    # normalize per entry; compare where gradients are significant
    sig = np.abs(g_dense) > 1e-5
    rel = np.abs(g_comp - g_dense)[sig] / np.abs(g_dense)[sig]
    assert np.median(rel) < 0.25, (g_dense, g_comp)


def test_prb_fit_recovers_albedo():
    """End-to-end: matched-key PRB gradients drive an albedo fit."""
    import optax

    scene = _cornell()
    true_colors = scene.textures.color
    ro, rd = _rays(4096, seed=11)
    keys = [jax.random.key(100 + i) for i in range(3)]
    targets = [
        prb_radiance(true_colors, scene, ro, rd, k, 5) for k in keys
    ]

    colors = jnp.full_like(true_colors, 0.5)
    # keep the emitter fixed (index 2 is the light texture)
    fit_mask = jnp.ones((true_colors.shape[0], 1)).at[2].set(0.0)
    colors = jnp.where(fit_mask > 0, colors, true_colors)
    opt = optax.adam(0.1)
    state = opt.init(colors)

    @jax.jit
    def step(colors, state, which):
        def loss(c):
            rad = prb_radiance(
                c, scene, ro, rd,
                jax.lax.switch(which, [lambda k=k: k for k in keys]), 5,
            )
            return jnp.mean((rad - jax.lax.switch(
                which, [lambda t=t: t for t in targets])) ** 2)

        l, grad = jax.value_and_grad(loss)(colors)
        upd, state = opt.update(grad * fit_mask, state)
        colors = optax.apply_updates(colors, upd)
        colors = jnp.where(fit_mask > 0, jnp.clip(colors, 0.05, 1.0), colors)
        return colors, state, l

    for i in range(60):
        colors, state, l = step(colors, state, jnp.int32(i % 3))
    err = np.abs(np.asarray(colors) - np.asarray(true_colors))
    err[2] = 0
    assert err.max() < 0.15, err
