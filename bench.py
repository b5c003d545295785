#!/usr/bin/env python
"""Headline benchmark: differentiable render of data/zy_scene.json.

North-star metric (BASELINE.json): rays/sec/chip forward+backward at
1024^2 — one 1-spp differentiable pass (forward radiance + gradient of
an image loss w.r.t. EVERY differentiable scene parameter: solid
colors, image texels, metal albedo, metal fuzz, dielectric IR) at the
scene's own max_depth, all on the compacted forward (no AD fallback in
the gradient path; the RAY_TPU_BENCH_AD subprocess fallback exists only
for the flaky remote-compiler case and is a cross-check, not the
metric).

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
import os
import subprocess
import sys
import time

REFERENCE_RAYS_PER_S = 5e6  # documented estimate, see module docstring

WIDTH = HEIGHT = 1024
PASSES = 3
REPS = 5  # timed blocks; headline = median block rays/s

# The axon remote-compile service intermittently hangs on large programs
# (observed repeatedly this round).  The orchestrator below runs the
# fast PRB-gradient benchmark in a subprocess with a timeout and falls
# back to the smaller (reliably-compiling) AD program, so the recorded
# bench never silently hangs.  The persistent compilation cache
# (utils/cache.py) makes the big compile a one-time cost: any run after
# a single successful compile starts in seconds, so the PRB timeout only
# matters on a completely cold cache.
PRB_TIMEOUT_S = 1500
AD_TIMEOUT_S = 1200


def orchestrate() -> int:
    # last resort: if the TPU service is unreachable (observed multi-hour
    # axon outages), record an honestly-labeled CPU measurement instead
    # of nothing — the metric name and note say exactly what it is.
    for mode, timeout in (
        ("prb", PRB_TIMEOUT_S), ("ad", AD_TIMEOUT_S), ("cpu", PRB_TIMEOUT_S)
    ):
        env = dict(os.environ)
        env["_BENCH_INNER"] = "1"
        env.pop("RAY_TPU_BENCH_AD", None)
        env.pop("RAY_TPU_BENCH_CPU", None)
        if mode == "ad":
            env["RAY_TPU_BENCH_AD"] = "1"
        elif mode == "cpu":
            env["RAY_TPU_BENCH_CPU"] = "1"
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            print(f"# {mode} bench timed out after {timeout}s; falling back",
                  file=sys.stderr)
            continue
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        if proc.returncode == 0 and line:
            print(line)
            sys.stderr.write(proc.stderr[-2000:])
            return 0
        print(f"# {mode} bench failed (rc={proc.returncode}):\n"
              f"{proc.stderr[-1500:]}", file=sys.stderr)
    return 1


def main():
    import os

    import jax

    force_cpu = os.environ.get("RAY_TPU_BENCH_CPU") == "1"
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from ray_tracing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from ray_tracing_tpu import load_scene_json
    from ray_tracing_tpu.models.camera import Camera, camera_rays
    from ray_tracing_tpu.render.renderer import render_pass, _pick_tile_size

    bundle = load_scene_json("data/zy_scene.json")
    scene = bundle.scene
    camera = Camera.build(bundle.camera, WIDTH / HEIGHT)
    max_depth = bundle.renderer.max_depth or 20
    n_prims = scene.n_spheres + scene.n_triangles + scene.n_rects
    tile = int(os.environ.get("RAY_TPU_BENCH_TILE", 0)) or _pick_tile_size(
        WIDTH * HEIGHT, n_prims
    )
    use_ad = os.environ.get("RAY_TPU_BENCH_AD") == "1"
    # A/B switch (docs/PERFORMANCE.md): rbg is a counter-based PRNG that
    # is far cheaper than threefry on the TPU VPU; keys carry their impl
    # end-to-end through the PRB custom_vjp, so this is a pure key swap.
    key_impl = "rbg" if os.environ.get("RAY_TPU_BENCH_RBG") == "1" else None

    def bench_key(i):
        return jax.random.key(i, impl=key_impl) if key_impl else jax.random.key(i)

    # NB: the scene is ALWAYS a jit argument below, never a closure.  A
    # closed-over scene is inlined into the HLO as literal text — with
    # the earthmap atlas that is a 15M-char program (measured) vs 2.7M
    # with arguments, and the big-literal program is what the flaky
    # remote TPU compiler chokes on (CLAUDE.md hazard list).
    if use_ad:
        # legacy AD path: rematerialized dense scan
        def fwd(colors, s, key):
            s = s.replace(textures=s.textures.replace(color=colors))
            img, segs = render_pass(
                s, camera, key,
                width=WIDTH, height=HEIGHT, max_depth=max_depth,
                antialias=True, tile_size=tile, remat=True, with_stats=True,
            )
            return jnp.mean(img), segs
    else:
        # path-replay backprop over the compacted forward (render/prb.py)
        # extended to the FULL differentiable parameter set — solid
        # colors, atlas texels, metal albedo, metal fuzz, dielectric IR.
        # The DIRECT value-and-grad entry point (prb_loss_and_grad_all)
        # computes the same gradients as value_and_grad over
        # prb_radiance_all (tests assert equality) without the
        # custom_vjp residual plumbing and lax.map transpose: measured
        # -76 ms/pass at 1024² on TPU.
        from ray_tracing_tpu.render.prb_scalar import (
            params_of, prb_loss_and_grad_all,
        )

        n = WIDTH * HEIGHT
        n_tiles = n // tile

    if use_ad:
        @jax.jit
        def fwd_bwd(params, s, key):
            (loss, segs), g = jax.value_and_grad(fwd, has_aux=True)(
                params, s, key
            )
            return loss, segs, g
    else:
        from ray_tracing_tpu.ops.pallas_scatter import planar_rows
        from ray_tracing_tpu.render.prb_scalar import (
            AllParams, image_grads_from_planar, scalar_tangent_pass,
        )

        ih, hh, wh = scene.textures.images.shape[:3]
        p_rows = planar_rows(max(ih * hh * wh, 1))

        @jax.jit
        def fwd_bwd(params, s, key):
            # ONE key + per-tile ids_base: the tiles form a single
            # logical wavefront (uniforms are keyed by absolute ray
            # id), so the fuzz/IR tangent pass runs ONCE over the
            # whole image's ~2% touched rays instead of paying a sort
            # + batch machinery per tile (deferred-scalars protocol,
            # render/prb_scalar.py).  Tiles run under lax.scan with the
            # gradient accumulators CARRIED (planar image layout, one
            # from_planar at the end) instead of lax.map-stacked —
            # same speed measured, but O(1) instead of O(n_tiles)
            # gradient-table memory.
            ro, rd, _, k_trace = camera_rays(camera, key, WIDTH, HEIGHT, True)
            ro_t = ro.reshape(n_tiles, tile, 3)
            rd_t = rd.reshape(n_tiles, tile, 3)
            bases = jnp.arange(n_tiles, dtype=jnp.int32) * tile

            init = (
                jnp.zeros(()),
                AllParams(
                    color=jnp.zeros_like(params.color),
                    images=jnp.zeros((3, p_rows, 128), jnp.float32),
                    metal_albedo=jnp.zeros_like(params.metal_albedo),
                    fuzz=jnp.zeros_like(params.fuzz),
                    ir=jnp.zeros_like(params.ir),
                ),
            )

            def tile_fb(carry, args):
                ro_i, rd_i, base = args
                loss_i, gz, aux = prb_loss_and_grad_all(
                    jnp.sum, params, s, ro_i, rd_i, k_trace, max_depth,
                    static_scene=scene,  # concrete rows; s stays traced
                    ids_base=base, defer_scalars=True, planar_images=True,
                )
                loss_c, g_c = carry
                return (loss_c + loss_i,
                        jax.tree.map(jnp.add, g_c, gz)), aux

            (loss_sum, g_sum), (rads, gcs, touched) = jax.lax.scan(
                tile_fb, init, (ro_t, rd_t, bases)
            )
            # per-tile loss is sum(rad); the image loss is mean over all
            # rays*channels, so scale the summed cotangents by 1/(n*3)
            loss = loss_sum / (n * 3)
            g = jax.tree.map(lambda a: a / (n * 3), g_sum)
            g = g._replace(images=image_grads_from_planar(
                g.images, params.images.shape))
            gfuzz, gir = scalar_tangent_pass(
                params, s, ro, rd, k_trace, max_depth,
                rads.reshape(n, 3), gcs.reshape(n, 3) / (n * 3),
                touched.reshape(n), static_scene=scene,
                # 65536 = one batch per scalar family on zy (metal- and
                # dielectric-touched sets are ~57k/59k rays at 1024²);
                # interleaved A/B: 298 vs 301 ms/pass at 32768
                tangent_cap=int(
                    os.environ.get("RAY_TPU_BENCH_TCAP", 0) or 65536
                ),
            )
            g = g._replace(fuzz=gfuzz, ir=gir)
            return loss, jnp.zeros(()), g

    bench_params = scene.textures.color if use_ad else params_of(scene)

    # untimed: traced-segment counts for the benchmark keys (the honest
    # rays/s numerator, identical keys AND identical rng layout to the
    # timed passes — the PRB path uses one key + per-tile ids_base)
    if use_ad:
        count_fn = jax.jit(
            lambda s, c, key: render_pass(
                s, c, key, width=WIDTH, height=HEIGHT,
                max_depth=max_depth, antialias=True, tile_size=tile,
                compaction=False, with_stats=True,
            )[1]
        )
        seg_counts = [
            float(count_fn(scene, camera, bench_key(i)))
            for i in range(1, PASSES + 1)
        ]
    else:
        from ray_tracing_tpu.render.integrator import trace_compacted

        @jax.jit
        def count_fn(s, key):
            ro, rd, _, k_trace = camera_rays(camera, key, WIDTH, HEIGHT, True)
            ro_t = ro.reshape(n_tiles, tile, 3)
            rd_t = rd.reshape(n_tiles, tile, 3)
            bases = jnp.arange(n_tiles, dtype=jnp.int32) * tile

            def tile_cnt(args):
                ro_i, rd_i, base = args
                _, segs = trace_compacted(
                    s, ro_i, rd_i, k_trace, max_depth,
                    with_stats=True, ids_base=base,
                )
                return segs

            return jnp.sum(jax.lax.map(tile_cnt, (ro_t, rd_t, bases)))

        seg_counts = [
            float(count_fn(scene, bench_key(i)))
            for i in range(1, PASSES + 1)
        ]

    # compile + warmup (float() forces a real host sync; block_until_ready
    # does not block through the axon tunnel)
    loss, segs, g = fwd_bwd(bench_params, scene, bench_key(0))
    float(loss)

    # Timed blocks: within each block, dispatch PASSES independent
    # fwd_bwd calls (same unchanged bench_params — independent passes,
    # not a chained fit) and only then drain them with one float() sync
    # per output.  block_until_ready does not block through the axon
    # tunnel (CLAUDE.md hazard 2), so pipelined dispatch + per-output
    # drains is how steady-state throughput is measured without paying a
    # ~30-100 ms tunnel round trip per pass.  The headline is the MEDIAN
    # of REPS blocks — the axon service has ±15% cross-run variance
    # (docs/PERFORMANCE.md) and a single block inherits it.
    block_rates = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        total_segments = 0.0
        outs = []
        for i in range(1, PASSES + 1):
            outs.append(fwd_bwd(bench_params, scene, bench_key(i)))
        for i, (loss, segs, g) in enumerate(outs):
            float(loss)
            total_segments += seg_counts[i] if not use_ad else float(segs)
        dt = time.perf_counter() - t0
        block_rates.append(total_segments / dt)

    block_rates.sort()
    rays_per_s = block_rates[len(block_rates) // 2]
    mode = "cpu" if force_cpu else ("ad" if use_ad else "prb")
    rec = {
        "metric": "zy_scene 1024^2 fwd+bwd rays/s/chip",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / REFERENCE_RAYS_PER_S,
        "mode": mode,
        "spread": {
            "blocks": len(block_rates),
            "passes_per_block": PASSES,
            "min": block_rates[0],
            "max": block_rates[-1],
        },
    }
    if force_cpu:
        rec["metric"] += " (CPU FALLBACK)"
        rec["note"] = (
            "TPU service unreachable at bench time; this is the same "
            "program measured on the host CPU and is NOT the headline "
            "TPU number (last recorded TPU: 5.50 Mrays/s, BENCH_r01)"
        )
    print(json.dumps(rec))
    # secondary diagnostics on stderr (driver reads stdout JSON only)
    print(
        f"# mode={mode} blocks={len(block_rates)}x{PASSES} "
        f"rates(Mrays/s)={[round(r / 1e6, 3) for r in block_rates]} "
        f"segments/block={total_segments:.3e} "
        f"depth={max_depth} tile={tile} loss={float(loss):.5f} "
        f"grad_norm={float(jnp.sqrt(sum(jnp.vdot(x, x) for x in jax.tree.leaves(g)))):.3e}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    if os.environ.get("_BENCH_INNER") == "1":
        main()
    else:
        sys.exit(orchestrate())
