"""CLI frontend: progressive render of a JSON scene to an image file.

Mirrors the reference binary (reference src/main.rs): ``-i scene.json
-o out.bmp``, one 1-spp full-image pass per iteration with per-iteration
timing logs (``Iter N +Ts``, main.rs:48-52), a periodic save every 5 s
when new iterations landed (``Iter N saved``, main.rs:65-79), and exit
on Enter (main.rs:80-83).  A ``--iterations`` flag is added for
non-interactive use; ``--seed`` pins the RNG (the reference cannot).

Run: ``python -m ray_tracing_tpu.cli -i data/zy_scene.json -o out.bmp``
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ray-tracing-tpu",
        description="TPU-native progressive Monte Carlo path tracer",
    )
    p.add_argument("-i", "--input", required=True, help="input scene JSON")
    p.add_argument("-o", "--output", required=True, help="output image (bmp/png/...; .hdr = linear Radiance RGBE)")
    p.add_argument(
        "--iterations", type=int, default=0,
        help="stop after N 1-spp passes (0 = run until Enter)",
    )
    p.add_argument("--seed", type=int, default=0, help="base RNG seed")
    p.add_argument(
        "--save-interval", type=float, default=5.0,
        help="seconds between progressive saves (reference: 5 s)",
    )
    p.add_argument(
        "--max-depth", type=int, default=None,
        help="override the scene's max ray depth",
    )
    p.add_argument(
        "--width", type=int, default=None, help="override render width"
    )
    p.add_argument(
        "--height", type=int, default=None, help="override render height"
    )
    p.add_argument(
        "--checkpoint", default=None,
        help="checkpoint file: resume from it if present, save to it on "
             "every progressive save",
    )
    p.add_argument(
        "--profile", default=None,
        help="capture an XLA profiler trace into this directory",
    )
    p.add_argument(
        "--stats", default=None,
        help="write per-pass timing/throughput JSON here on exit",
    )
    return p


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)

    import jax

    from ray_tracing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from ray_tracing_tpu import Renderer, RenderResult, load_scene_json
    from ray_tracing_tpu.utils.checkpoint import load_render, save_render
    from ray_tracing_tpu.utils.image import save_hdr, save_image
    from ray_tracing_tpu.utils.profiling import RenderStats, xla_trace

    bundle = load_scene_json(args.input, noise_seed=args.seed)
    rparam = bundle.renderer
    if args.width:
        rparam.width = args.width
    if args.height:
        rparam.height = args.height
    if args.max_depth:
        rparam.max_depth = args.max_depth

    renderer = Renderer(rparam, bundle.camera, bundle.scene)
    result = RenderResult(rparam.width, rparam.height)
    stats = RenderStats(verbose=False)
    if args.checkpoint and os.path.exists(args.checkpoint):
        result, ckpt_seed = load_render(args.checkpoint)
        if ckpt_seed != args.seed:
            print(
                f"warning: checkpoint seed {ckpt_seed} != --seed {args.seed}; "
                "using checkpoint seed", flush=True,
            )
            args.seed = ckpt_seed
        if (result.width, result.height) != (rparam.width, rparam.height):
            raise SystemExit("checkpoint resolution does not match the render")
        print(f"resumed at iteration {result.count}", flush=True)

    stop = threading.Event()
    if args.iterations == 0 and sys.stdin is not None and sys.stdin.isatty():
        def wait_enter():
            try:
                sys.stdin.readline()
            except Exception:
                pass
            stop.set()

        threading.Thread(target=wait_enter, daemon=True).start()
        print("rendering; press Enter to stop", flush=True)

    key = jax.random.key(args.seed)
    start = time.perf_counter()
    last_saved = 0
    last_save_time = start
    iteration = result.count  # continues a resumed render's key sequence
    try:
        with xla_trace(args.profile):
            while not stop.is_set():
                if args.iterations and iteration >= args.iterations:
                    break
                stats.start_pass()
                pass_key = jax.random.fold_in(key, iteration)
                if args.stats:
                    colors, segments = renderer.render_with_stats(pass_key)
                    colors = np.asarray(colors)
                    segments = float(segments)
                else:
                    colors = np.asarray(renderer.render(pass_key))
                    segments = 0.0
                iteration = result.add(colors)
                rec = stats.end_pass(segments)
                print(f"Iter {iteration} +{rec.seconds:.3f}s", flush=True)
                now = time.perf_counter()
                if now - last_save_time >= args.save_interval:
                    raw = result.get_raw(last_saved)
                    if raw is not None:
                        img, last_saved = raw
                        if args.output.lower().endswith(".hdr"):
                            save_hdr(args.output, result.mean())
                        else:
                            save_image(args.output, img)
                        if args.checkpoint:
                            save_render(args.checkpoint, result, args.seed)
                        print(f"Iter {last_saved} saved", flush=True)
                    last_save_time = now
    except KeyboardInterrupt:
        pass

    raw = result.get_raw(0)
    if raw is not None:
        img, n = raw
        if args.output.lower().endswith(".hdr"):
            save_hdr(args.output, result.mean())  # linear radiance out
        else:
            save_image(args.output, img)
        if args.checkpoint:
            save_render(args.checkpoint, result, args.seed)
        print(f"Iter {n} saved", flush=True)
    if args.stats:
        stats.dump(args.stats)
    return 0


if __name__ == "__main__":
    sys.exit(main())
