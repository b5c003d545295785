"""Differential fuzz over random small scenes: execution-path variants
that must be EXACTLY equal (same estimator, same keys) stay equal, and
basic radiometric invariants hold for any scene the builder accepts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_tpu import SceneBuilder
from ray_tracing_tpu.render.integrator import trace


def _random_scene(rng):
    b = SceneBuilder(
        background=tuple(rng.uniform(0, 0.6, 3)),
        environment=tuple(rng.uniform(0, 0.3, 3)),
    )
    mats = []
    for _ in range(rng.randint(2, 5)):
        kind = rng.randint(5)
        if kind == 0:
            mats.append(b.add_lambertian(
                b.add_texture_solid(tuple(rng.uniform(0.1, 0.9, 3)))))
        elif kind == 1:
            mats.append(b.add_metal(tuple(rng.uniform(0.3, 1.0, 3)),
                                    float(rng.uniform(0, 0.5))))
        elif kind == 2:
            mats.append(b.add_dielectric(float(rng.uniform(1.1, 2.0))))
        elif kind == 3:
            mats.append(b.add_diffuse_light(
                b.add_texture_solid(tuple(rng.uniform(1.0, 6.0, 3)))))
        else:
            mats.append(b.add_lambertian(b.add_texture_checker(
                b.add_texture_solid(tuple(rng.uniform(0.1, 0.9, 3))),
                b.add_texture_solid(tuple(rng.uniform(0.1, 0.9, 3))),
                float(rng.uniform(0.5, 4.0)),
            )))

    light_used = False
    for _ in range(rng.randint(2, 6)):
        m = mats[rng.randint(len(mats))]
        s = rng.randint(3)
        important = bool(rng.rand() < 0.3) and not light_used
        if s == 0:
            b.add_sphere(tuple(rng.uniform(-3, 3, 3)),
                         float(rng.uniform(0.3, 1.2)), m,
                         important=important)
            light_used |= important
        elif s == 1:
            axis = ("xy", "yz", "zx")[rng.randint(3)]
            a0, b0 = rng.uniform(-3, 0, 2)
            b.add_rect(axis, a0, a0 + rng.uniform(0.5, 3), b0,
                       b0 + rng.uniform(0.5, 3), float(rng.uniform(-2, 2)),
                       m, positive=bool(rng.rand() < 0.5),
                       important=important)
            light_used |= important
        else:
            v0 = rng.uniform(-2, 2, 3)
            pts = np.stack([v0, v0 + rng.uniform(-1, 1, 3),
                            v0 + rng.uniform(-1, 1, 3)])[None]
            nrm = np.tile(np.asarray([0.0, 0.0, 1.0]), (1, 3, 1))
            b.add_mesh_triangles(pts.astype(np.float32),
                                 nrm.astype(np.float32),
                                 np.zeros((1, 3, 2), np.float32), m)
    return b.build()


def _rays(rng, n=1024):
    ro = np.tile(rng.uniform(-1, 1, 3)[None], (n, 1)) + np.asarray(
        [[0.0, 0.0, 4.0]]
    )
    d = np.stack([rng.uniform(-0.6, 0.6, n), rng.uniform(-0.6, 0.6, n),
                  -np.ones(n)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(ro, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_trace_variants_bit_identical(seed):
    """remat and early_exit are pure execution-strategy switches: the
    radiance must be BIT-identical to the plain dense loop."""
    rng = np.random.RandomState(100 + seed)
    scene = _random_scene(rng)
    ro, rd = _rays(rng)
    key = jax.random.key(seed)

    base = np.asarray(trace(scene, ro, rd, key, 6))
    for kw in ({"remat": True}, {"early_exit": True},
               {"remat": True, "early_exit": True}):
        out = np.asarray(trace(scene, ro, rd, key, 6, **kw))
        np.testing.assert_array_equal(base, out, err_msg=str(kw))

    assert np.isfinite(base).all()
    assert (base >= 0).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_compacted_bit_identical_to_dense(seed):
    """Per-bounce uniforms are keyed by (ray id, global bounce), not by
    wavefront position, so staged compaction — a pure execution
    strategy — must reproduce the dense loop BIT-exactly, for any chunk
    granularity."""
    from ray_tracing_tpu.render.integrator import trace_compacted

    rng = np.random.RandomState(200 + seed)
    scene = _random_scene(rng)
    ro, rd = _rays(rng, n=2048)

    for k in (0, 7):
        dense = np.asarray(trace(scene, ro, rd, jax.random.key(k), 6))
        for chunk_div in (8, 16):
            comp = np.asarray(trace_compacted(
                scene, ro, rd, jax.random.key(k), 6, chunk_div=chunk_div
            ))
            np.testing.assert_array_equal(dense, comp, err_msg=str(chunk_div))
