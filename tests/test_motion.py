"""True motion blur (moving spheres) — a superset feature: the
reference jitters ray time (camera.rs:113-129) but nothing consumes it.
Ray time is id-keyed (ops/rng.ray_time), so compaction, replays and
subsets see identical times with zero carry threading."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_tpu import (
    Camera,
    CameraParam,
    Renderer,
    RendererParam,
    SceneBuilder,
)
from ray_tracing_tpu.render.integrator import trace, trace_compacted


def _cam(t0=0.0, t1=1.0):
    return CameraParam(
        (0, 0, 4), (0, 0, 0), 40, time0=t0, time1=t1
    )


def _moving_scene(c0=(-0.8, 0.0, 0.0), c1=(0.8, 0.0, 0.0)):
    b = SceneBuilder(background=(0.1, 0.1, 0.1))
    red = b.add_lambertian(b.add_texture_solid((0.9, 0.1, 0.1)))
    b.add_sphere_moving(c0, c1, 0.35, red)
    return b.build()


def _static_scene(c=(-0.8, 0.0, 0.0)):
    b = SceneBuilder(background=(0.1, 0.1, 0.1))
    red = b.add_lambertian(b.add_texture_solid((0.9, 0.1, 0.1)))
    b.add_sphere(c, 0.35, red)
    return b.build()


def _render(scene, cam, key=0, size=48, depth=3):
    r = Renderer(RendererParam(size, size, max_depth=depth), cam, scene,
                 tile_size=size * size)
    return np.asarray(r.render(key))


def test_zero_shutter_matches_static_exactly():
    """With time0 == time1 == 0 every ray sees t=0, so a moving sphere
    renders BIT-identically to a static sphere at center0."""
    img_m = _render(_moving_scene(), _cam(0.0, 0.0))
    img_s = _render(_static_scene(), _cam(0.0, 0.0))
    np.testing.assert_array_equal(img_m, img_s)


def test_motion_smears_along_the_path():
    """Open shutter: the sphere's footprint covers both endpoints'
    columns; the static sphere's covers only its own."""
    img_m = _render(_moving_scene(), _cam(0.0, 1.0))
    img_s = _render(_static_scene(), _cam(0.0, 1.0))
    # the sphere reads as red excess over green (absolute radiance is
    # dim under the 0.1 gray background)
    red_m = (img_m[:, :, 0] - img_m[:, :, 1]) > 0.02
    red_s = (img_s[:, :, 0] - img_s[:, :, 1]) > 0.02
    cols_m = np.nonzero(red_m.any(axis=0))[0]
    cols_s = np.nonzero(red_s.any(axis=0))[0]
    assert cols_m.size and cols_s.size
    # the blur spans well beyond the static footprint's width
    assert (cols_m.max() - cols_m.min()) > 2 * (cols_s.max() - cols_s.min())
    # and covers the image center (the mid-path position)
    assert red_m[:, img_m.shape[1] // 2].any()


def test_compacted_bit_matches_dense_with_motion():
    """The id-keyed shutter time keeps the compaction invariant: the
    compacted loop must stay BIT-identical to the dense loop."""
    scene = _moving_scene()
    cam = Camera.build(_cam(0.0, 1.0), 1.0)
    scene = scene.replace(shutter=jnp.asarray([0.0, 1.0], jnp.float32))
    rng = np.random.RandomState(0)
    n = 512
    ro = jnp.asarray(np.tile([[0.0, 0.0, 4.0]], (n, 1)), jnp.float32)
    d = np.stack(
        [rng.uniform(-0.4, 0.4, n), rng.uniform(-0.4, 0.4, n), -np.ones(n)],
        -1,
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    key = jax.random.key(9)
    r_dense = trace(scene, ro, rd, key, 6)
    r_comp = trace_compacted(scene, ro, rd, key, 6)
    np.testing.assert_array_equal(np.asarray(r_dense), np.asarray(r_comp))
    del cam


def test_prb_full_params_still_exact_with_motion():
    """PRB color gradients on a motion scene equal dense AD (time is
    parameter-independent, so the replay reproduces the same paths)."""
    b = SceneBuilder(background=(0.2, 0.2, 0.2))
    red = b.add_lambertian(b.add_texture_solid((0.9, 0.2, 0.1)))
    green = b.add_lambertian(b.add_texture_solid((0.2, 0.7, 0.2)))
    b.add_sphere_moving((-0.5, 0, 0), (0.5, 0, 0), 0.35, red)
    b.add_rect("zx", -3, 3, -3, 3, -0.5, green, positive=True)
    scene = b.build().replace(
        shutter=jnp.asarray([0.0, 1.0], jnp.float32)
    )

    rng = np.random.RandomState(1)
    n = 1024
    ro = jnp.asarray(np.tile([[0.0, 0.6, 3.0]], (n, 1)), jnp.float32)
    d = np.stack(
        [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.6, 0.1, n), -np.ones(n)],
        -1,
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    key = jax.random.key(4)

    from ray_tracing_tpu.render.prb import prb_radiance

    def loss_ad(colors):
        s = scene.replace(textures=scene.textures.replace(color=colors))
        return jnp.sum(trace(s, ro, rd, key, 5)) / n

    def loss_prb(colors):
        return jnp.sum(
            prb_radiance(colors, scene, ro, rd, key, 5)
        ) / n

    g_ad = np.asarray(jax.grad(loss_ad)(scene.textures.color))
    g_prb = np.asarray(jax.grad(loss_prb)(scene.textures.color))
    np.testing.assert_allclose(g_prb, g_ad, rtol=2e-3, atol=2e-5)
    assert np.abs(g_ad).sum() > 1e-3


def test_moving_sphere_json_schema():
    """'moving-sphere' loads through the JSON scene schema (superset
    kind); transform / important combinations are rejected."""
    from ray_tracing_tpu.models.compiler import build_scene

    doc = {
        "renderer": {"width": 8, "height": 8},
        "camera": {
            "look_from": [0, 0, 4], "look_at": [0, 0, 0], "vfov": 40,
            "time0": 0.0, "time1": 1.0,
        },
        "objects": [
            {
                "shape": {
                    "type": "moving-sphere",
                    "center0": [-0.5, 0, 0], "center1": [0.5, 0, 0],
                    "radius": 0.3,
                },
                "material": {
                    "type": "lambertian",
                    "texture": {"type": "solid-color", "color": [0.8, 0.2, 0.2]},
                },
            }
        ],
    }
    bundle = build_scene(json.loads(json.dumps(doc)))
    assert bundle.scene.has_motion
    assert float(bundle.scene.spheres.vel[0, 0]) == pytest.approx(1.0)

    doc["objects"][0]["important"] = True
    with pytest.raises(NotImplementedError):
        build_scene(doc)


def test_builder_rejects_motion_with_transforms():
    b = SceneBuilder()
    m = b.add_lambertian(b.add_texture_solid((0.5, 0.5, 0.5)))
    b.add_sphere_moving((0, 0, 0), (1, 0, 0), 0.3, m)
    b.add_sphere((2, 0, 0), 0.3, m,
                 transform=(np.eye(3, dtype=np.float32) * 2.0, (0, 0, 0)))
    with pytest.raises(NotImplementedError):
        b.build()


def test_motion_renders_identically_through_sharded_path():
    """Regression (round-4 review): only render_pass used to stamp the
    camera shutter into scene.shutter, so sharded renders of a motion
    scene silently froze at t=0.  Every camera-having entry point now
    stamps (models/camera.stamp_shutter): the sharded pass must match
    the single-device render up to f32 fusion rounding — and must NOT
    match a zero-shutter (frozen) render."""
    import jax

    from ray_tracing_tpu.parallel.mesh import make_mesh, sharded_render_pass
    from ray_tracing_tpu.render.renderer import render_pass

    scene = _moving_scene()
    h, w = 16, 32
    cam = Camera.build(_cam(0.0, 1.0), w / h)
    key = jax.random.key(6)

    img = np.asarray(render_pass(
        scene, cam, key, width=w, height=h, max_depth=3, antialias=True,
        tile_size=w * h,
    ))
    img_sh = np.asarray(sharded_render_pass(
        scene, cam, key, width=w, height=h, max_depth=3, antialias=True,
        mesh=make_mesh(),
    ))
    np.testing.assert_allclose(img_sh, img, rtol=2e-4, atol=2e-5)

    frozen_cam = Camera.build(_cam(0.0, 0.0), w / h)
    img_frozen = np.asarray(render_pass(
        scene, frozen_cam, key, width=w, height=h, max_depth=3,
        antialias=True, tile_size=w * h,
    ))
    assert np.abs(img - img_frozen).max() > 0.05, "shutter must matter"


def motion_kernel_matches_xla_body(interpret: bool):
    """Pallas intersect kernel with the per-ray time operand vs the XLA
    motion phase A: same winners, same t (round 5 — motion scenes used
    to lose the kernel entirely, ops/pallas_intersect.py).  Shared by
    the CPU interpret test below and tests/tpu_smoke.py's compiled
    check."""
    from ray_tracing_tpu.models.camera import camera_rays
    from ray_tracing_tpu.ops import geometry as geo
    from ray_tracing_tpu.ops import intersect as isect
    from ray_tracing_tpu.ops.pallas_intersect import (
        pallas_eligible,
        pallas_phase_a,
    )

    b = SceneBuilder(background=(0.1, 0.1, 0.1))
    red = b.add_lambertian(b.add_texture_solid((0.9, 0.1, 0.1)))
    b.add_sphere_moving((-0.8, 0.0, 0.0), (0.8, 0.0, 0.0), 0.35, red)
    b.add_sphere((0.0, -0.9, 0.0), 0.3, red)
    b.add_rect(0, -1.5, 1.5, -1.5, 1.5, -1.0, red)
    scene = b.build()
    assert pallas_eligible(scene)

    cam = Camera.build(_cam(0.0, 1.0), 1.0)
    ro, rd, _, _ = camera_rays(cam, jax.random.key(5), 64, 64, True)
    t_ray = jax.random.uniform(jax.random.key(9), (ro.shape[0],))

    @jax.jit
    def both(s, ro, rd, t_ray):
        pt, pk, pi = pallas_phase_a(s, ro, rd, t_ray, interpret=interpret)
        st, sm = isect._sphere_phase_a(
            s, ro, rd, geo.EPSILON, isect.INF, t_ray)
        rt, rm = isect._rect_phase_a(s, ro, rd, geo.EPSILON, isect.INF)
        return pt, pk, pi, st, sm, rt, rm

    pt, pk, pi, st, sm, rt, rm = map(
        np.asarray, both(scene, ro, rd, t_ray))
    st = np.where(sm, st, np.inf)
    rt = np.where(rm, rt, np.inf)
    xs, xr = st.min(1), rt.min(1)
    xt = np.minimum(xs, xr)
    xkind = np.where(xs <= xr, isect.KIND_SPHERE, isect.KIND_RECT)
    xidx = np.where(xs <= xr, st.argmin(1), rt.argmin(1))
    xfound = np.isfinite(xt)
    pfound = pk >= 0
    np.testing.assert_array_equal(pfound, xfound)
    np.testing.assert_allclose(pt[pfound], xt[xfound], rtol=1e-4)
    same = pk[pfound] == xkind[xfound]
    assert np.array_equal(pi[pfound][same], xidx[xfound][same])
    assert same.mean() > 0.999
    # the moving sphere must actually be hit for the check to bite
    assert ((pk[pfound] == isect.KIND_SPHERE) & (pi[pfound] == 0)).sum() > 50


def test_motion_kernel_matches_xla_interpret():
    motion_kernel_matches_xla_body(interpret=True)
