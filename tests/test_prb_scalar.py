"""Forward-mode gradients for the scalar material parameters (metal
fuzz, dielectric IR): exact agreement with reverse-mode AD on the dense
loop, finite differences on smooth scenes, and compacted-forward
consistency.  Completes the full-parameter gradient set (VERDICT r1
item 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu import SceneBuilder
from ray_tracing_tpu.render.integrator import trace
from ray_tracing_tpu.render.prb_scalar import (
    AllParams,
    ScalarParams,
    params_of,
    prb_radiance_all,
    scalar_radiance,
)


def _cornell():
    b = SceneBuilder(background=(0.05, 0.05, 0.05))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.7, 0.68)))
    red = b.add_lambertian(b.add_texture_solid((0.65, 0.15, 0.12)))
    light = b.add_diffuse_light(b.add_texture_solid((4.0, 3.5, 3.0)))
    glass = b.add_dielectric(1.5)
    metal = b.add_metal((0.9, 0.85, 0.8), 0.25)
    b.add_rect("zx", -2, 2, -2, 2, 0.0, white, positive=True)
    b.add_rect("xy", -2, 2, 0, 2, -2.0, red, positive=True)
    b.add_rect("zx", -1, 1, -1, 1, 3.0, light, positive=False, important=True)
    b.add_sphere((0.8, 0.5, -0.8), 0.4, glass)
    b.add_sphere((-0.8, 0.5, -0.8), 0.4, metal)
    return b.build()


def _rays(n=2048, seed=0):
    rng = np.random.RandomState(seed)
    ro = jnp.asarray(np.tile([[0.0, 1.2, 1.8]], (n, 1)), jnp.float32)
    d = np.stack(
        [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.8, 0.1, n), -np.ones(n)], -1
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return ro, jnp.asarray(d, jnp.float32)


def test_scalar_dense_matches_ad_exactly():
    """Same dense paths, same key: the forward-mode scalar gradients must
    equal reverse-mode jax.grad of the same estimator."""
    scene = _cornell()
    ro, rd = _rays()
    key = jax.random.key(5)
    depth = 6
    rng = np.random.RandomState(2)
    weights = jnp.asarray(rng.uniform(0, 1, (ro.shape[0], 3)), jnp.float32)

    sp = ScalarParams(scene.materials.fuzz, scene.materials.ir)

    def loss_ad(p):
        s = scene.replace(
            materials=scene.materials.replace(fuzz=p.fuzz, ir=p.ir)
        )
        return jnp.sum(trace(s, ro, rd, key, depth) * weights)

    g_ad = jax.grad(loss_ad)(sp)

    def loss_fwd(p):
        return jnp.sum(
            scalar_radiance(p, scene, ro, rd, key, depth, compaction=False)
            * weights
        )

    g_fwd = jax.grad(loss_fwd)(sp)

    for name, a, f in zip(ScalarParams._fields, g_ad, g_fwd):
        a, f = np.asarray(a), np.asarray(f)
        np.testing.assert_allclose(f, a, rtol=2e-3, atol=2e-4, err_msg=name)
    assert np.abs(np.asarray(g_ad.fuzz)).sum() > 1e-3
    assert np.abs(np.asarray(g_ad.ir)).sum() > 1e-3


def test_all_params_dense_matches_ad_exactly():
    """One entry point, every parameter: prb_radiance_all's gradients for
    all five leaves equal jax.grad of the dense trace."""
    scene = _cornell()
    ro, rd = _rays(2048, seed=3)
    key = jax.random.key(6)
    depth = 6
    rng = np.random.RandomState(4)
    weights = jnp.asarray(rng.uniform(0, 1, (ro.shape[0], 3)), jnp.float32)
    params = params_of(scene)

    def loss_ad(p):
        s = scene.replace(
            textures=scene.textures.replace(color=p.color, images=p.images),
            materials=scene.materials.replace(
                albedo=p.metal_albedo, fuzz=p.fuzz, ir=p.ir
            ),
        )
        return jnp.sum(trace(s, ro, rd, key, depth) * weights)

    g_ad = jax.grad(loss_ad)(params)

    def loss_all(p):
        return jnp.sum(
            prb_radiance_all(p, scene, ro, rd, key, depth, compaction=False)
            * weights
        )

    g_all = jax.grad(loss_all)(params)

    for name, a, f in zip(AllParams._fields, g_ad, g_all):
        a, f = np.asarray(a), np.asarray(f)
        np.testing.assert_allclose(f, a, rtol=2e-3, atol=3e-4, err_msg=name)
    # every leaf carries signal in this scene
    for name in ("color", "metal_albedo", "fuzz", "ir"):
        assert np.abs(np.asarray(getattr(g_ad, name))).sum() > 1e-3, name


def test_fuzz_gradient_matches_finite_difference():
    """Smooth-by-construction scene (metal mirror onto a Perlin wall; no
    stochastic branches, every perturbed reflection still hits the wall)
    so FD is valid; checks the replay derivative against central FD."""
    b = SceneBuilder(background=(1.0, 1.0, 1.0))
    metal = b.add_metal((0.9, 0.9, 0.9), 0.05)
    noisy = b.add_lambertian(b.add_texture_noise(0.7, 4))
    b.add_rect("zx", -50, 50, -50, 50, 0.0, metal, positive=True)  # floor
    b.add_rect("xy", -200, 200, -200, 200, -30.0, noisy, positive=True)
    scene = b.build()

    n = 4096
    rng = np.random.RandomState(9)
    ro = jnp.asarray(np.tile([[0.0, 8.0, 8.0]], (n, 1)), jnp.float32)
    d = np.stack(
        [rng.uniform(-0.2, 0.2, n), -np.ones(n), rng.uniform(-1.2, -0.8, n)],
        -1,
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    key = jax.random.key(12)
    depth = 3

    def loss(fuzz0):
        p = params_of(scene)._replace(fuzz=scene.materials.fuzz.at[0].set(fuzz0))
        return jnp.mean(prb_radiance_all(p, scene, ro, rd, key, depth,
                                         compaction=False))

    g = float(jax.grad(loss)(jnp.float32(0.05)))
    # The loss has rare per-lane kinks (|fBm| zero crossings, tertiary
    # floor-edge hits) whose FD bias shrinks with eps; average central
    # differences at three small steps where FD has converged onto the
    # reparameterized-AD value (measured: rel err < 6% for eps <= 3e-4).
    loss_j = jax.jit(loss)
    fds = []
    for eps in (3e-4, 2e-4, 1e-4):
        fds.append(
            (float(loss_j(jnp.float32(0.05 + eps)))
             - float(loss_j(jnp.float32(0.05 - eps)))) / (2 * eps)
        )
    fd = float(np.mean(fds))
    assert abs(g) > 1e-4, "no fuzz signal"
    np.testing.assert_allclose(g, fd, rtol=0.1)


def test_scalar_compacted_matches_own_fd():
    """The compacted forward is a deterministic function of (params, key);
    its JVP must match finite differences of the SAME compacted estimator.
    This pins the scalar gradients on the production (compacted) path
    directly, with no dense-vs-compacted pairing noise."""
    b = SceneBuilder(background=(1.0, 1.0, 1.0))
    metal = b.add_metal((0.9, 0.9, 0.9), 0.05)
    noisy = b.add_lambertian(b.add_texture_noise(0.7, 4))
    b.add_rect("zx", -50, 50, -50, 50, 0.0, metal, positive=True)
    b.add_rect("xy", -200, 200, -200, 200, -30.0, noisy, positive=True)
    scene = b.build()

    n = 4096
    rng = np.random.RandomState(9)
    ro = jnp.asarray(np.tile([[0.0, 8.0, 8.0]], (n, 1)), jnp.float32)
    d = np.stack(
        [rng.uniform(-0.2, 0.2, n), -np.ones(n), rng.uniform(-1.2, -0.8, n)],
        -1,
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    key = jax.random.key(12)

    def loss(fuzz0):
        p = params_of(scene)._replace(
            fuzz=scene.materials.fuzz.at[0].set(fuzz0)
        )
        return jnp.mean(
            prb_radiance_all(p, scene, ro, rd, key, 3, compaction=True)
        )

    g = float(jax.grad(loss)(jnp.float32(0.05)))
    loss_j = jax.jit(loss)
    fds = [
        (float(loss_j(jnp.float32(0.05 + eps)))
         - float(loss_j(jnp.float32(0.05 - eps)))) / (2 * eps)
        for eps in (3e-4, 2e-4, 1e-4)
    ]
    fd = float(np.mean(fds))
    assert abs(g) > 1e-3, "no fuzz signal through the compacted path"
    np.testing.assert_allclose(g, fd, rtol=0.15)


def test_ir_compacted_matches_dense_statistically():
    """Compacted and dense forwards pair uniforms differently, so per-key
    gradients differ; their MEANS estimate the same expectation.  Checked
    on the dielectric IR (strong signal in the Cornell box); the fuzz
    analogue is covered deterministically above."""
    # One jitted gradient per compaction mode (rays/key as ARGUMENTS, not
    # closed-over constants): the eager per-key variant compiled the big
    # while_loop 12x and could segfault the XLA CPU compiler late in a
    # long pytest process (compile-time crash in backend_compile_and_load,
    # state-dependent); one compilation per mode is also ~6x faster.
    jax.clear_caches()
    scene = _cornell()
    sp = ScalarParams(scene.materials.fuzz, scene.materials.ir)

    def rays_at_spheres(n, seed):
        rng = np.random.RandomState(seed)
        ro = np.tile([[0.0, 1.0, 1.8]], (n, 1)).astype(np.float32)
        centers = np.array([[0.8, 0.5, -0.8], [-0.8, 0.5, -0.8]])
        tgt = centers[rng.randint(0, 2, n)] + rng.uniform(-0.45, 0.45, (n, 3))
        d = tgt - ro
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(ro), jnp.asarray(d.astype(np.float32))

    def mean_grad(compaction, keys):
        @jax.jit
        def grad_ir(ro, rd, key):
            def loss(p):
                return jnp.mean(
                    scalar_radiance(p, scene, ro, rd, key, 6,
                                    compaction=compaction)
                )

            return jax.grad(loss)(sp).ir

        acc = 0.0
        for k in keys:
            ro, rd = rays_at_spheres(4096, seed=k)
            acc = acc + np.asarray(grad_ir(ro, rd, jax.random.key(k)))
        return acc / len(keys)

    keys = range(6)
    gi_d = mean_grad(False, keys)
    gi_c = mean_grad(True, keys)
    sig = np.abs(gi_d) > 1e-3
    assert sig.any(), "no IR signal"
    rel = np.abs(gi_c - gi_d)[sig] / np.abs(gi_d)[sig]
    assert np.median(rel) < 0.5, (gi_d, gi_c)


def test_all_params_grad_through_lax_map_tiles():
    """bench.py tiles rays with jax.lax.map and differentiates through
    it; prb_radiance_all must be safe to call inside the map body (its
    custom_vjp bwd is traced during the scan transpose, so nothing from
    the map-body trace may hide in bwd's closure — regression for the
    jnp.asarray-row-index tracer leak).  A one-tile map must equal the
    unmapped call exactly."""
    scene = _cornell()
    ro, rd = _rays(1024, seed=7)
    key = jax.random.key(9)
    params = params_of(scene)

    def single(p):
        return jnp.sum(prb_radiance_all(p, scene, ro, rd, key, 6))

    def one_tile_map(p):
        ro_t = ro.reshape(1, -1, 3)
        rd_t = rd.reshape(1, -1, 3)

        def ts(args):
            ro_s, rd_s, _ = args
            return jnp.sum(prb_radiance_all(p, scene, ro_s, rd_s, key, 6))

        return jnp.sum(jax.lax.map(ts, (ro_t, rd_t, jnp.arange(1))))

    l1, g1 = jax.jit(jax.value_and_grad(single))(params)
    l2, g2 = jax.jit(jax.value_and_grad(one_tile_map))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for name, a, b in zip(AllParams._fields, g1, g2):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-8, err_msg=name
        )
    assert np.abs(np.asarray(g1.fuzz)).sum() > 1e-4
    assert np.abs(np.asarray(g1.ir)).sum() > 1e-4


def test_direct_loss_and_grad_matches_ad_surface():
    """prb_loss_and_grad_all (no AD graph over the renderer) must equal
    jax.value_and_grad of loss_fn∘prb_radiance_all — same forward, same
    replay, same tangent batches, minus the custom_vjp plumbing (the
    76 ms/pass fast path, round-4 item)."""
    from ray_tracing_tpu.render.prb_scalar import prb_loss_and_grad_all

    scene = _cornell()
    ro, rd = _rays(1024, seed=3)
    key = jax.random.key(11)
    params = params_of(scene)
    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.uniform(0, 1, (ro.shape[0], 3)), jnp.float32)

    def loss_fn(rad):
        # non-uniform cotangent exercises the g plumbing end to end
        return jnp.sum(w * rad) + jnp.sum(rad**2) / rad.size

    def loss_ad(p):
        return loss_fn(prb_radiance_all(p, scene, ro, rd, key, 6))

    l_ad, g_ad = jax.jit(jax.value_and_grad(loss_ad))(params)
    l_dir, g_dir = jax.jit(
        lambda p: prb_loss_and_grad_all(loss_fn, p, scene, ro, rd, key, 6)
    )(params)

    np.testing.assert_allclose(float(l_dir), float(l_ad), rtol=1e-6)
    for name, a, b in zip(AllParams._fields, g_ad, g_dir):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-8, err_msg=name
        )
    assert np.abs(np.asarray(g_dir.fuzz)).sum() > 1e-6
    assert np.abs(np.asarray(g_dir.ir)).sum() > 1e-6


def test_tangent_batches_exact_when_cap_does_not_divide_count():
    """Regression (round-4 review): dynamic_slice CLAMPS an
    out-of-range batch start, so a final partial batch used to
    double-count the overlap rows and drop the tail — wrong fuzz/IR
    gradients whenever the touched prefix overflowed a non-dividing
    cap.  All-touched scene, n=24, cap=16 (2 batches, second partial):
    must equal the single-batch cap=24 result exactly."""
    scene = _cornell()

    # every ray aimed at the metal sphere (center (-0.8, 0.5, -0.8),
    # r 0.4) with a small jitter: all 24 rays touch, and the Cornell
    # walls give the reflections structure so the fuzz gradient is live
    n = 24
    rng = np.random.RandomState(3)
    ro = jnp.asarray(np.tile([[0.0, 1.2, 1.8]], (n, 1)), jnp.float32)
    target = np.asarray([-0.8, 0.5, -0.8]) - np.asarray([0.0, 1.2, 1.8])
    d = target[None, :] + rng.uniform(-0.12, 0.12, (n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    key = jax.random.key(2)
    params = params_of(scene)

    from ray_tracing_tpu.render.prb_scalar import prb_loss_and_grad_all

    def run(cap):
        return jax.jit(
            lambda p: prb_loss_and_grad_all(
                jnp.sum, p, scene, ro, rd, key, 5, tangent_cap=cap
            )
        )(params)

    l_ref, g_ref = run(24)   # one exact batch
    l_16, g_16 = run(16)     # 2 batches, second partial (the bug case)
    l_8, g_8 = run(8)        # 3 exact batches

    assert np.abs(np.asarray(g_ref.fuzz)).sum() > 1e-6, "rays must touch"
    np.testing.assert_allclose(float(l_16), float(l_ref), rtol=1e-7)
    for nm, a, b16, b8 in zip(
        AllParams._fields, g_ref, g_16, g_8
    ):
        np.testing.assert_allclose(
            np.asarray(b16), np.asarray(a), rtol=1e-5, atol=1e-10,
            err_msg=f"{nm} cap=16",
        )
        np.testing.assert_allclose(
            np.asarray(b8), np.asarray(a), rtol=1e-5, atol=1e-10,
            err_msg=f"{nm} cap=8",
        )
