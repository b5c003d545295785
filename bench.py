#!/usr/bin/env python
"""Headline benchmark: differentiable render of data/zy_scene.json.

North-star metric (BASELINE.json): rays/sec/chip forward+backward at
1024^2 — one 1-spp differentiable pass (forward radiance + gradient of
an image loss w.r.t. all texture texels) at the scene's own max_depth.

The reference publishes no numbers and cannot be built here (no Rust
toolchain; BASELINE.md).  `REFERENCE_RAYS_PER_S` is a documented
estimate used only to fill `vs_baseline`; the absolute rays/s value is
the real output.  Estimate basis: the reference is a hand-rolled 8-wide
SIMD tracer whose hot loop heap-allocates per packet per bounce
(reference src/renderer.rs:131-298: Vec pushes, BTreeMap bucketing,
per-lane scalar RNG draws) and re-renders the full image per rayon
worker; comparable non-Embree hobby tracers measure ~1-5 Mrays/s on a
16-core host.  5 Mrays/s is taken as the (conservative-high) point
estimate.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}
"""

import json
import sys
import time

REFERENCE_RAYS_PER_S = 5e6  # documented estimate, see module docstring

WIDTH = HEIGHT = 1024
PASSES = 3


def main():
    import jax
    import jax.numpy as jnp

    from ray_tracing_tpu import load_scene_json
    from ray_tracing_tpu.models.camera import Camera
    from ray_tracing_tpu.render.renderer import render_pass, _pick_tile_size

    bundle = load_scene_json("data/zy_scene.json")
    scene = bundle.scene
    camera = Camera.build(bundle.camera, WIDTH / HEIGHT)
    max_depth = bundle.renderer.max_depth or 20
    n_prims = scene.n_spheres + scene.n_triangles + scene.n_rects
    tile = _pick_tile_size(WIDTH * HEIGHT, n_prims)

    def fwd(colors, key):
        s = scene.replace(textures=scene.textures.replace(color=colors))
        img, segs = render_pass(
            s, camera, key,
            width=WIDTH, height=HEIGHT, max_depth=max_depth,
            antialias=True, tile_size=tile, remat=True, with_stats=True,
        )
        return jnp.mean(img), segs

    @jax.jit
    def fwd_bwd(colors, key):
        (loss, segs), g = jax.value_and_grad(fwd, has_aux=True)(colors, key)
        return loss, segs, g

    colors = scene.textures.color
    # compile + warmup
    loss, segs, g = fwd_bwd(colors, jax.random.key(0))
    jax.block_until_ready((loss, segs, g))

    t0 = time.perf_counter()
    total_segments = 0.0
    for i in range(1, PASSES + 1):
        loss, segs, g = fwd_bwd(colors, jax.random.key(i))
        jax.block_until_ready((loss, segs, g))
        total_segments += float(segs)
    dt = time.perf_counter() - t0

    rays_per_s = total_segments / dt
    print(
        json.dumps(
            {
                "metric": "zy_scene 1024^2 fwd+bwd rays/s/chip",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / REFERENCE_RAYS_PER_S,
            }
        )
    )
    # secondary diagnostics on stderr (driver reads stdout JSON only)
    print(
        f"# passes={PASSES} dt={dt:.3f}s segments={total_segments:.3e} "
        f"depth={max_depth} tile={tile} loss={float(loss):.5f} "
        f"grad_norm={float(jnp.linalg.norm(g)):.3e}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
