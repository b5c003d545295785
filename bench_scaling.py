#!/usr/bin/env python
"""Multi-device scaling-efficiency harness (BASELINE.md: >=85% rays/s
efficiency from 1 chip to N).

Weak-scaling measurement of the PRODUCTION fwd+bwd path — compacted
forward + PRB backward per shard, psum'd color gradients — on k-device
meshes: each device gets the same per-device ray load, so

    efficiency(k) = time(1 device) / time(k devices)

is the rays/s/device retention.  Run it

- today on this host: CPU with virtual devices (validates the sharded
  code path and the harness math; "devices" share the host's cores, so
  the printed efficiency measures code-path overhead, NOT ICI scaling),
- on real multi-chip TPU: run under the default platform with
  JAX_PLATFORMS unset and no --force-cpu; the same code spans chips
  (and hosts, after jax.distributed.initialize) and the efficiency
  number becomes the BASELINE.md metric.

Prints one JSON line per device count and a final summary line:
  {"metric": "scaling efficiency 1->K devices", "value": eff, ...}

On a CONTENDED host (virtual CPU devices sharing cores) the raw
per-device retention conflates host contention with real sharding
overhead.  The discriminator (--unsharded-baseline, default on) times
the SAME total ray load unsharded on one device for every k: both
programs see the same contended host, so

    sharding_overhead(k) = t_sharded(k devices, n rays)
                         / t_unsharded(1 device, n rays)

isolates the cost of the sharding machinery itself (shard_map
partitioning, the psum, per-shard compaction loss) from "the cores are
busy".  ~1.0 means the sharded program costs nothing over the ideal
single-program run of the same work; the BASELINE.md >=85% ICI target
remains a real-multi-chip number.

Reference analogue: the rayon per-worker replication loop
(reference src/main.rs:39-63) — its scaling story is measured the same
way, samples/worker constant.
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default=None,
                    help="comma list of device counts (default: 1,2,...,all)")
    ap.add_argument("--rays-per-device", type=int, default=16384)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--force-cpu", action="store_true",
                    help="force CPU with 8 virtual devices")
    ap.add_argument("--no-unsharded-baseline", action="store_true",
                    help="skip the same-total-work unsharded timing")
    args = ap.parse_args()

    if args.force_cpu or os.environ.get("JAX_PLATFORMS") == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np

    from ray_tracing_tpu import Camera, load_scene_json
    from ray_tracing_tpu.parallel.mesh import (
        RAY_AXIS, make_mesh,
    )
    from ray_tracing_tpu.render.integrator import trace
    from ray_tracing_tpu.render.prb import prb_radiance
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_avail = len(jax.devices())
    if args.devices:
        counts = [int(x) for x in args.devices.split(",")]
    else:
        counts = [k for k in (1, 2, 4, 8, 16, 32, 64) if k <= n_avail]

    bundle = load_scene_json("data/zy_scene.json")
    scene = bundle.scene
    camera = Camera.build(bundle.camera, 1.0)
    colors = scene.textures.color

    results = {}
    for k in counts:
        mesh = make_mesh(k)
        n = args.rays_per_device * k  # weak scaling: constant per-device load

        k_rays = jax.random.key(7)
        st = jax.random.uniform(k_rays, (n, 2), dtype=jnp.float32)
        u = jax.random.uniform(jax.random.fold_in(k_rays, 1), (n, 3),
                               dtype=jnp.float32)
        ro, rd, _ = camera.get_rays(st, u[:, 0], u[:, 1], u[:, 2])

        def shard_fn(colors, scene, ro_s, rd_s, key):
            dev = jax.lax.axis_index(RAY_AXIS)
            rad = prb_radiance(
                colors, scene, ro_s, rd_s, jax.random.fold_in(key, dev),
                args.depth,
            )
            # psum so the replicated output is the TRUE all-ray sum (and
            # the transposed cotangent of `colors` is summed, not
            # averaged, across shards) — same collective the production
            # path gets implicitly from out_specs=P(RAY_AXIS) in
            # parallel/mesh.py:sharded_prb_render
            return jax.lax.psum(jnp.sum(rad), RAY_AXIS)

        sharded = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P()),
            out_specs=P(),
            check_vma=False,
        )

        @jax.jit
        def fwd_bwd(colors, key):
            def loss(c):
                return sharded(c, scene, ro, rd, key) / n

            l, g = jax.value_and_grad(loss)(colors)
            return l, g

        # Untimed: traced-segment counts for the benchmark keys — the
        # SAME numerator bench.py uses (a "ray" = one traced path
        # segment, counted per bounce while alive), so rays/s here and
        # the headline are directly comparable (VERDICT r3 item 6).
        # The count is estimator-determined (bit-identical across
        # execution strategies), so counting via the dense trace is
        # exact for the PRB path too.
        def count_shard_fn(scene, ro_s, rd_s, key):
            dev = jax.lax.axis_index(RAY_AXIS)
            _, segs = trace(
                scene, ro_s, rd_s, jax.random.fold_in(key, dev),
                args.depth, with_stats=True,
            )
            return jax.lax.psum(segs, RAY_AXIS)

        count_fn = jax.jit(shard_map(
            count_shard_fn, mesh=mesh,
            in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P()),
            out_specs=P(),
            check_vma=False,
        ))
        seg_counts = [
            float(count_fn(scene, ro, rd, jax.random.key(i)))
            for i in range(1, args.passes + 1)
        ]
        total_segments = sum(seg_counts)

        # compile + warmup
        l, g = fwd_bwd(colors, jax.random.key(0))
        float(l)

        # pipeline all passes, sync ONCE at the end (CLAUDE.md hazard 2:
        # per-pass host syncs cost 30-100 ms through the axon tunnel and
        # would add a device-count-independent term to every timing)
        t0 = time.perf_counter()
        outs = [fwd_bwd(colors, jax.random.key(i))
                for i in range(1, args.passes + 1)]
        np.asarray(outs[-1][0])
        dt = time.perf_counter() - t0

        rays_per_s = total_segments / dt
        per_dev = rays_per_s / k
        results[k] = per_dev
        rec = {
            "metric": f"sharded fwd+bwd rays/s ({k} devices)",
            "value": rays_per_s,
            "unit": "rays/s",
            "per_device": per_dev,
            "devices": k,
            "segments_per_pass": total_segments / args.passes,
            "primary_rays_per_pass": n,
        }

        if not args.no_unsharded_baseline:
            # same TOTAL work, no sharding, one device: both programs
            # fight for the same host cores, so the ratio isolates the
            # sharding machinery from host contention
            @jax.jit
            def fwd_bwd_unsharded(colors, key):
                def loss(c):
                    rad = prb_radiance(c, scene, ro, rd, key, args.depth)
                    return jnp.sum(rad) / n

                return jax.value_and_grad(loss)(colors)

            l, g = fwd_bwd_unsharded(colors, jax.random.key(0))
            float(l)
            t0 = time.perf_counter()
            outs = [fwd_bwd_unsharded(colors, jax.random.key(i))
                    for i in range(1, args.passes + 1)]
            np.asarray(outs[-1][0])
            dt_u = time.perf_counter() - t0
            rec["unsharded_same_work_s"] = dt_u / args.passes
            rec["sharded_s"] = dt / args.passes
            rec["sharding_overhead"] = dt / dt_u

        print(json.dumps(rec))
        sys.stdout.flush()

    if len(results) > 1:
        k_max = max(results)
        eff = results[k_max] / results[min(results)]
        print(json.dumps({
            "metric": f"scaling efficiency 1->{k_max} devices",
            "value": eff,
            "unit": "fraction",
            "target": 0.85,
            "note": ("virtual CPU devices share host cores; the >=85% "
                     "target applies on real multi-chip hardware"
                     if jax.default_backend() == "cpu" else
                     "real multi-device measurement"),
        }))


if __name__ == "__main__":
    main()
