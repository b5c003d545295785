"""True motion blur demo (superset feature — the reference's camera
jitters ray time, src/camera.rs:113-129, but nothing consumes it).

Three spheres: static red, slow-moving green, fast-moving blue, over a
checker floor under a sky light.  Each primary ray samples one shutter
time from the camera's [time0, time1] window (id-keyed, so the image
is reproducible and compaction-invariant; ops/rng.ray_time).

Run: python examples/motion_blur.py [--out renders/motion_blur.png]
     [--size 384] [--spp 64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_scene():
    from ray_tracing_tpu import CameraParam, SceneBuilder

    b = SceneBuilder(background=(0.70, 0.80, 1.00))
    checker = b.add_lambertian(
        b.add_texture_checker(
            b.add_texture_solid((0.2, 0.3, 0.1)),
            b.add_texture_solid((0.9, 0.9, 0.9)),
            10.0,
        )
    )
    red = b.add_lambertian(b.add_texture_solid((0.85, 0.15, 0.1)))
    green = b.add_lambertian(b.add_texture_solid((0.15, 0.75, 0.2)))
    blue = b.add_lambertian(b.add_texture_solid((0.15, 0.25, 0.85)))
    b.add_rect("zx", -10, 10, -10, 10, 0.0, checker, positive=True)
    b.add_sphere((-1.2, 0.45, 0.0), 0.45, red)
    b.add_sphere_moving((-0.2, 0.45, 0.0), (0.3, 0.45, 0.0), 0.45, green)
    b.add_sphere_moving((0.9, 0.45, 0.0), (2.1, 0.45, 0.0), 0.45, blue)
    cam = CameraParam(
        (0.3, 1.5, 4.5), (0.3, 0.45, 0.0), 35, time0=0.0, time1=1.0
    )
    return b.build(), cam


def main():
    import jax

    from ray_tracing_tpu import Renderer, RendererParam

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="renders/motion_blur.png")
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--spp", type=int, default=64)
    args = ap.parse_args()

    scene, cam = build_scene()
    r = Renderer(
        RendererParam(args.size, args.size, max_depth=8), cam, scene
    )
    acc = None
    for i in range(args.spp):
        acc = r.accumulate(jax.random.fold_in(jax.random.key(0), i), acc)
    img = np.asarray(acc) / args.spp

    u8 = np.where(
        np.isnan(img), 0.0,
        np.clip(np.sqrt(np.maximum(img, 0.0)) * 256.0, 0.5, 255.5),
    ).astype(np.uint8)
    from PIL import Image

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    Image.fromarray(u8).save(args.out)
    print(f"motion blur demo -> {args.out}  mean={img.mean():.4f}")


if __name__ == "__main__":
    main()
