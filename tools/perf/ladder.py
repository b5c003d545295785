#!/usr/bin/env python
"""Production-shaped perf ladder: same-process interleaved A/B of the
benchmark stages at 1024^2 on the real TPU (tracked home of the
scratch/exp_r*_ladder.py harnesses docs/PERFORMANCE.md cites — every
A/B in the dossier is a same-process interleave because the axon
service has ±15% CROSS-run variance).

Stages:
  fwd      — trace_compacted per tile, radiance sum consumed (fusion_hint)
  colors   — taped forward + tape sweep (color/texel/albedo grads)
  full     — bench.py's fwd_bwd (colors + per-family scalar tangents)

Usage: python tools/perf/ladder.py [stages ...] [--reps=N]
Prints per-stage median ms/pass over interleaved blocks.  End-of-round-5
record: fwd 114.0, colors 157.2, full 207.8 ms/pass.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, _ROOT)
os.chdir(_ROOT)  # scene/data paths are repo-relative

from ray_tracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from ray_tracing_tpu import load_scene_json
from ray_tracing_tpu.models.camera import Camera, camera_rays
from ray_tracing_tpu.render.renderer import _pick_tile_size
from ray_tracing_tpu.render.integrator import trace_compacted
from ray_tracing_tpu.render.prb_scalar import (
    AllParams, params_of, prb_loss_and_grad_all, image_grads_from_planar,
    scalar_tangent_pass,
)
from ray_tracing_tpu.ops.pallas_scatter import planar_rows

WIDTH = HEIGHT = 1024
PASSES = 3

bundle = load_scene_json("data/zy_scene.json")
scene = bundle.scene
camera = Camera.build(bundle.camera, WIDTH / HEIGHT)
max_depth = bundle.renderer.max_depth or 20
n = WIDTH * HEIGHT
n_prims = scene.n_spheres + scene.n_triangles + scene.n_rects
tile = _pick_tile_size(n, n_prims)
n_tiles = n // tile
params = params_of(scene)
ih, hh, wh = scene.textures.images.shape[:3]
p_rows = planar_rows(max(ih * hh * wh, 1))


@jax.jit
def run_fwd(s, key):
    ro, rd, _, k_trace = camera_rays(camera, key, WIDTH, HEIGHT, True)
    ro_t = ro.reshape(n_tiles, tile, 3)
    rd_t = rd.reshape(n_tiles, tile, 3)
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * tile

    def tile_f(args):
        ro_i, rd_i, base = args
        rad = trace_compacted(s, ro_i, rd_i, k_trace, max_depth,
                              ids_base=base, fusion_hint=True)
        return jnp.sum(rad[0]) if isinstance(rad, tuple) else jnp.sum(rad)

    return jnp.sum(jax.lax.map(tile_f, (ro_t, rd_t, bases)))


@jax.jit
def run_colors(p, s, key):
    ro, rd, _, k_trace = camera_rays(camera, key, WIDTH, HEIGHT, True)
    ro_t = ro.reshape(n_tiles, tile, 3)
    rd_t = rd.reshape(n_tiles, tile, 3)
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    init = (
        jnp.zeros(()),
        AllParams(
            color=jnp.zeros_like(p.color),
            images=jnp.zeros((3, p_rows, 128), jnp.float32),
            metal_albedo=jnp.zeros_like(p.metal_albedo),
            fuzz=jnp.zeros_like(p.fuzz),
            ir=jnp.zeros_like(p.ir),
        ),
    )

    def tile_fb(carry, args):
        ro_i, rd_i, base = args
        loss_i, gz, aux = prb_loss_and_grad_all(
            jnp.sum, p, s, ro_i, rd_i, k_trace, max_depth,
            static_scene=scene, ids_base=base,
            defer_scalars=True, planar_images=True,
        )
        loss_c, g_c = carry
        return (loss_c + loss_i, jax.tree.map(jnp.add, g_c, gz)), aux

    (loss_sum, g_sum), _aux = jax.lax.scan(tile_fb, init, (ro_t, rd_t, bases))
    g = jax.tree.map(lambda a: a / (n * 3), g_sum)
    g = g._replace(images=image_grads_from_planar(g.images, p.images.shape))
    return loss_sum / (n * 3), g


@jax.jit
def run_full(p, s, key):
    ro, rd, _, k_trace = camera_rays(camera, key, WIDTH, HEIGHT, True)
    ro_t = ro.reshape(n_tiles, tile, 3)
    rd_t = rd.reshape(n_tiles, tile, 3)
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    init = (
        jnp.zeros(()),
        AllParams(
            color=jnp.zeros_like(p.color),
            images=jnp.zeros((3, p_rows, 128), jnp.float32),
            metal_albedo=jnp.zeros_like(p.metal_albedo),
            fuzz=jnp.zeros_like(p.fuzz),
            ir=jnp.zeros_like(p.ir),
        ),
    )

    def tile_fb(carry, args):
        ro_i, rd_i, base = args
        loss_i, gz, aux = prb_loss_and_grad_all(
            jnp.sum, p, s, ro_i, rd_i, k_trace, max_depth,
            static_scene=scene, ids_base=base,
            defer_scalars=True, planar_images=True,
        )
        loss_c, g_c = carry
        return (loss_c + loss_i, jax.tree.map(jnp.add, g_c, gz)), aux

    (loss_sum, g_sum), (rads, gcs, touched) = jax.lax.scan(
        tile_fb, init, (ro_t, rd_t, bases))
    loss = loss_sum / (n * 3)
    g = jax.tree.map(lambda a: a / (n * 3), g_sum)
    g = g._replace(images=image_grads_from_planar(g.images, p.images.shape))
    gfuzz, gir = scalar_tangent_pass(
        params, s, ro, rd, k_trace, max_depth,
        rads.reshape(n, 3), gcs.reshape(n, 3) / (n * 3),
        touched.reshape(n), static_scene=scene, tangent_cap=65536,
    )
    g = g._replace(fuzz=gfuzz, ir=gir)
    return loss, g


STAGES = {
    "fwd": lambda key: run_fwd(scene, key),
    "colors": lambda key: run_colors(params, scene, key)[0],
    "full": lambda key: run_full(params, scene, key)[0],
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    names = args or ["fwd", "colors", "full"]
    fns = {k: STAGES[k] for k in names}
    # warmup/compile
    for k, f in fns.items():
        t0 = time.perf_counter()
        float(f(jax.random.key(0)))
        print(f"compiled {k} in {time.perf_counter()-t0:.1f}s", flush=True)
    results = {k: [] for k in names}
    for rep in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            outs = [f(jax.random.key(i + 1)) for i in range(PASSES)]
            for o in outs:
                float(o)
            dt = (time.perf_counter() - t0) / PASSES * 1e3
            results[k].append(dt)
    for k in names:
        r = sorted(results[k])
        print(f"{k:8s} median {r[len(r)//2]:7.1f} ms/pass  "
              f"[{r[0]:.1f} .. {r[-1]:.1f}]  reps={reps}")


if __name__ == "__main__":
    main()
