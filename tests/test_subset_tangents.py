"""The scalar tangent pass (render/prb_scalar.py) replays either the
touched-ray subset (paths that can reach a metal/dielectric) or — when
the subset overflows its static cap — the full wavefront.  Both
branches must produce the SAME gradients: a ray that never reaches a
metal/dielectric has exactly zero fuzz/IR derivative, so restricting
the tangent replay to touched rays is exact, not approximate."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu import SceneBuilder
from ray_tracing_tpu.render.prb_scalar import params_of, prb_radiance_all


def _scene_sparse_metal():
    """Cornell-ish box where only a small metal sphere is specular:
    most rays never touch it -> the subset branch runs."""
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
    light = b.add_diffuse_light(b.add_texture_solid((6.0, 6.0, 6.0)))
    metal = b.add_metal((0.9, 0.8, 0.7), 0.2)
    glass = b.add_dielectric(1.5)
    b.add_rect("zx", -4, 4, -4, 4, 0.0, white, positive=True)
    b.add_rect("zx", -4, 4, -4, 4, 8.0, white, positive=False)
    b.add_rect("xy", -4, 4, 0, 8, -4.0, white, positive=True)
    b.add_rect("zx", -1, 1, -1, 1, 7.999, light, positive=False,
               important=True)
    b.add_sphere((2.0, 0.6, -2.0), 0.6, metal)
    b.add_sphere((-2.0, 0.6, -2.0), 0.6, glass)
    return b.build()


def _rays(n=2048, seed=3):
    rng = np.random.RandomState(seed)
    ro = jnp.asarray(np.tile([[0.0, 3.0, 6.0]], (n, 1)), jnp.float32)
    d = np.stack([rng.uniform(-0.6, 0.6, n), rng.uniform(-0.5, 0.1, n),
                  -np.ones(n)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return ro, jnp.asarray(d, jnp.float32)


def _grads(scene, ro, rd, key, depth):
    def loss(p):
        return jnp.mean(prb_radiance_all(p, scene, ro, rd, key, depth))

    return jax.grad(loss)(params_of(scene))


def test_subset_and_full_branches_agree():
    """Force each cond branch by monkeypatching the touched mask: the
    all-touched run takes the full-width fallback, the honest run takes
    the subset — gradients must agree to float tolerance."""
    import ray_tracing_tpu.render.prb as prb

    scene = _scene_sparse_metal()
    ro, rd = _rays()
    key = jax.random.key(5)

    g_subset = _grads(scene, ro, rd, key, 6)

    # all-touched forces count > cap -> run_full branch (the touched
    # flag only ever ADDS rays with exactly-zero derivative)
    orig = prb.prb_grad_compacted

    def all_touched(*a, **kw):
        gacc, rad_out, touched = orig(*a, **kw)
        if kw.get("alive0") is None:  # only the primal pass's output
            # bitmask: mark EVERY ray as touching both families
            touched = jnp.full_like(touched, 3)
        return gacc, rad_out, touched

    prb.prb_grad_compacted = all_touched
    try:
        g_full = _grads(scene, ro, rd, key, 6)
    finally:
        prb.prb_grad_compacted = orig

    for name in ("fuzz", "ir"):
        a = np.asarray(getattr(g_subset, name))
        b = np.asarray(getattr(g_full, name))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7, err_msg=name)
    # color-linear grads come from the shared primal replay: identical
    np.testing.assert_array_equal(
        np.asarray(g_subset.color), np.asarray(g_full.color)
    )


def test_subset_branch_taken_and_nonzero():
    """Sanity: in the sparse scene the touched count is genuinely small
    (subset branch) and the scalar gradients are still nonzero."""
    from ray_tracing_tpu.render.integrator import trace_compacted
    import ray_tracing_tpu.render.prb as prb

    scene = _scene_sparse_metal()
    ro, rd = _rays()
    key = jax.random.key(5)
    rad = trace_compacted(scene, ro, rd, key, 6)
    _, _, touched = prb.prb_grad_compacted(
        scene, ro, rd, key, 6, rad, jnp.ones_like(rad)
    )
    frac = float(jnp.mean((touched != 0).astype(jnp.float32)))
    cap = max(256, ro.shape[0] // 8)
    assert float(jnp.sum(touched != 0)) <= cap, (frac, cap)
    # both families are present and (mostly) disjoint in this scene
    assert int(jnp.sum(touched & 1)) > 0 and int(jnp.sum(touched & 2)) > 0

    g = _grads(scene, ro, rd, key, 6)
    assert float(jnp.abs(g.fuzz).max()) > 0.0
    assert float(jnp.abs(g.ir).max()) > 0.0
