"""Inverse GEOMETRY: recover a sphere's center and radius from target
images by gradient descent through the path tracer.

The selection phase (Phase A / the Pallas sweep) is discrete and runs
detached, but Phase B re-solves the winning sphere's roots from its
center/radius table rows (ops/intersect.py:_sphere_phase_b), so hit
positions — and everything downstream: normals, uv, shading, light
pdfs, secondary rays — are differentiable in the geometry.
Forward-mode AD (jacfwd over the 4 geometry scalars) differentiates
straight through the compacted trace's dynamic-trip-count loops,
exactly like the fuzz/IR tangent machinery (render/prb_scalar.py).

The gradient is the REPARAMETERIZED interior term: silhouette
(visibility) delta terms are not estimated — standard for
differentiable rendering without edge sampling.  Two measured
consequences shape this example (probe data in the test file):

* the scene needs shading that depends CONTINUOUSLY on the hit
  position — a solid-color lambertian under a constant sky is
  piecewise-constant in the geometry (measured: exactly zero
  gradient) — so this scene uses a Perlin-noise-textured sphere
  (albedo continuous in world p) and an important area light (the
  MIS weight's hittable pdf is continuous in the hit point);
* parameters whose image response is silhouette-dominated
  (TRANSLATION across the view) are not recoverable from the
  interior term alone: the image loss has a clean minimum at the
  truth but the interior gradient's sign is wrong at small lateral
  offsets (measured cx +0.03: loss slope +0.05, interior gradient
  -0.026).  Radius and view-depth change normals/shading across the
  whole visible disc, so their interior gradients ARE faithful —
  this example therefore fits (depth, radius); lateral recovery
  needs boundary/edge sampling (future work).

tests/test_geometry_grad.py pins the same chain against central
finite differences on silhouette-free rays.

Targets use fixed per-step keys (matched seeds: the MC noise is common
mode and the loss is ~deterministic in the parameters).

Run (CPU example):
  JAX_PLATFORMS=cpu python examples/fit_geometry.py --steps 60 --size 32
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu import Camera, CameraParam, SceneBuilder
from ray_tracing_tpu.models.camera import camera_rays
from ray_tracing_tpu.render.integrator import trace_compacted


def scene_with(center, radius):
    """Noise-textured sphere over a gray ground, lit by an overhead
    rect light (important) under a dim sky — every term the interior
    geometry gradient flows through is position-continuous."""
    b = SceneBuilder(background=(0.25, 0.28, 0.32))
    marble = b.add_lambertian(b.add_texture_noise(4.0, 5))
    gray = b.add_lambertian(b.add_texture_solid((0.5, 0.5, 0.5)))
    light = b.add_diffuse_light(b.add_texture_solid((6.0, 6.0, 6.0)))
    b.add_sphere(tuple(float(c) for c in center), float(radius), marble)
    b.add_sphere((0.0, -100.6, -1.0), 100.0, gray)
    b.add_rect("zx", -1.2, 0.2, -0.8, 0.8, 1.6, light, positive=False,
               important=True)
    return b.build()


def with_geometry(scene, theta):
    """Write the 4 geometry scalars (cx, cy, cz, r) into sphere row 0."""
    sp = scene.spheres
    return scene.replace(spheres=sp.replace(
        center=sp.center.at[0].set(theta[:3]),
        radius=sp.radius.at[0].set(theta[3]),
    ))


def make_loss(scene, camera, width, height, max_depth):
    def loss(theta, key, target):
        ro, rd, _, k_trace = camera_rays(camera, key, width, height, True)
        rad = trace_compacted(
            with_geometry(scene, theta), ro, rd, k_trace, max_depth
        )
        return jnp.mean((rad - target.reshape(-1, 3)) ** 2)

    return loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--size", type=int, default=24)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--lr", type=float, default=0.01)
    args = ap.parse_args()
    w = h = args.size

    true_theta = jnp.asarray([0.25, 0.05, -1.1, 0.5], jnp.float32)
    true2 = jnp.asarray([-1.1, 0.5], jnp.float32)   # (depth cz, radius)
    init2 = jnp.asarray([-1.25, 0.38], jnp.float32)

    scene = scene_with(true_theta[:3], true_theta[3])
    camera = Camera.build(
        CameraParam((0.0, 0.2, 1.2), (0.0, 0.0, -1.1), 55.0), w / h
    )
    loss4 = make_loss(scene, camera, w, h, args.depth)

    def loss(t2, key, target):
        th = true_theta.at[2].set(t2[0]).at[3].set(t2[1])
        return loss4(th, key, target)

    @jax.jit
    def target_of(key):
        ro, rd, _, k_trace = camera_rays(camera, key, w, h, True)
        return trace_compacted(
            with_geometry(scene, true_theta), ro, rd, k_trace, args.depth
        ).reshape(h, w, 3)

    # forward-mode value+grad: 2 tangents through the compacted trace
    @jax.jit
    def step(t2, key, target):
        return loss(t2, key, target), jax.jacfwd(loss)(t2, key, target)

    t2 = init2
    mu = jnp.zeros_like(t2)
    v = jnp.zeros_like(t2)
    for i in range(args.steps):
        key = jax.random.key(1000 + i)
        target = target_of(key)
        val, g = step(t2, key, target)
        mu = 0.9 * mu + 0.1 * g
        v = 0.99 * v + 0.01 * g * g
        t2 = t2 - args.lr * mu / (jnp.sqrt(v) + 1e-8)
        if i % 25 == 0 or i == args.steps - 1:
            err = np.abs(np.asarray(t2 - true2))
            print(f"step {i:3d}  loss {float(val):.6f}  "
                  f"(depth, radius) {np.asarray(t2).round(4)}  "
                  f"max err {err.max():.4f}")

    err = np.abs(np.asarray(t2 - true2)).max()
    err0 = float(jnp.abs(init2 - true2).max())
    print(f"final geometry error: {err:.4f} (initial {err0:.4f}; "
          f"recovered to {'<' if err < 0.06 else '>='} 0.06)")
    # smoke-friendly: short runs must still descend; the tight 0.06
    # bound is asserted by tests/test_geometry_grad.py's full fit
    return 0 if err < err0 else 1


if __name__ == "__main__":
    sys.exit(main())
