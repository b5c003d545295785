"""Render the BASELINE.md configurations (C1-C6) and record
throughput, producing the golden images the reference's CLI would
produce for side-by-side comparison.

  C1  data/scene.json            256^2 /  16 spp
  C2  data/zy_scene.json         512^2 /  64 spp   (mixture-PDF lights)
  C3  textured earth sphere      512^2 /  64 spp   (image texture + UV)
  C4  data/bunny.obj mesh        512^2 / 128 spp   (LBVH traversal)
  C5  data/zy_scene.json        1024^2 / 256 spp   (the headline config;
      its differentiable albedo fit lives in examples/fit_albedo.py)
  C6  4x4 bunny grid (79k tris)  512^2 /  32 spp   (large-mesh cluster
      kernel — a superset config; the reference has no >32k-tri scene)

Run: python examples/render_baselines.py [--out dir] [--configs C1,C2]
     [--spp-scale 0.25]   (scale spp for quick smoke runs)
"""



from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)  # runnable as `python examples/<name>.py` without installing

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _data(rel):
    """Resolve a repo-relative data path regardless of the cwd."""
    return rel if os.path.exists(rel) else os.path.join(_REPO, rel)


if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # some containers pin another platform in sitecustomize, overriding
    # the env var; re-assert the documented CPU recipe in-process
    import jax

    jax.config.update("jax_platforms", "cpu")


import argparse
import json
import os
import time

import numpy as np


def scene_c3():
    """Textured earth sphere over a light + sky (BASELINE C3)."""
    from ray_tracing_tpu import CameraParam, SceneBuilder
    from PIL import Image

    b = SceneBuilder(background=(0.7, 0.8, 1.0))
    with Image.open(_data("data/earthmap.jpg")) as im:
        earth_tex = b.add_texture_image(np.asarray(im.convert("RGB")))
    earth = b.add_lambertian(earth_tex)
    ground = b.add_lambertian(b.add_texture_solid((0.6, 0.6, 0.6)))
    light = b.add_diffuse_light(b.add_texture_solid((6.0, 6.0, 6.0)))
    b.add_sphere((0, 1.0, 0), 1.0, earth)
    b.add_rect("zx", -50, 50, -50, 50, 0.0, ground, positive=True)
    b.add_rect("zx", -1.5, 1.5, -1.5, 1.5, 4.0, light, positive=False,
               important=True)
    cam = CameraParam((0, 1.2, 4.0), (0, 1.0, 0), 40)
    return b, cam


def scene_c4():
    """Stanford bunny under the sky (BASELINE C4, traversal-bound)."""
    from ray_tracing_tpu import CameraParam, SceneBuilder
    from ray_tracing_tpu.models.mesh import load_triangles

    b = SceneBuilder(background=(0.7, 0.8, 1.0))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
    ground = b.add_lambertian(b.add_texture_solid((0.4, 0.5, 0.4)))
    pts, nrm, uvs = load_triangles(_data("data/bunny.obj"))
    b.add_mesh_triangles(pts, nrm, uvs, white)
    b.add_rect("zx", -5, 5, -5, 5, 0.033, ground, positive=True)
    cam = CameraParam((-0.2, 0.25, 0.35), (-0.02, 0.1, 0.0), 35)
    return b, cam


def scene_c6():
    """4x4 grid of bunnies, 79488 triangles (large-mesh traversal:
    the demand-fetched Pallas cluster sweep)."""
    from ray_tracing_tpu import CameraParam, SceneBuilder
    from ray_tracing_tpu.models.mesh import load_triangles

    b = SceneBuilder(background=(0.7, 0.8, 1.0))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
    ground = b.add_lambertian(b.add_texture_solid((0.4, 0.5, 0.4)))
    pts, nrm, uvs = load_triangles(_data("data/bunny.obj"))
    allp, alln, alluv = [], [], []
    for i in range(4):
        for j in range(4):
            off = np.asarray(
                [(i - 1.5) * 0.25, 0.0, (j - 1.5) * 0.25], np.float32
            )
            allp.append(pts + off)
            alln.append(nrm)
            alluv.append(uvs)
    b.add_mesh_triangles(
        np.concatenate(allp), np.concatenate(alln), np.concatenate(alluv),
        white,
    )
    b.add_rect("zx", -5, 5, -5, 5, 0.033, ground, positive=True)
    cam = CameraParam((-0.7, 0.8, 1.2), (0.0, 0.1, 0.0), 40)
    return b, cam


def main():
    import jax

    from ray_tracing_tpu import (
        Renderer,
        RendererParam,
        load_scene_json,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="baseline_renders")
    ap.add_argument("--configs", default="C1,C2,C3,C4,C5,C6")
    ap.add_argument("--spp-scale", type=float, default=1.0)
    ap.add_argument("--res-scale", type=float, default=1.0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    wanted = set(args.configs.split(","))

    def build(name):
        if name == "C1":
            bd = load_scene_json(_data("data/scene.json"))
            return bd.scene, bd.camera, 256, 16
        if name == "C2":
            bd = load_scene_json(_data("data/zy_scene.json"))
            return bd.scene, bd.camera, 512, 64
        if name == "C3":
            b, cam = scene_c3()
            return b.build(), cam, 512, 64
        if name == "C4":
            b, cam = scene_c4()
            return b.build(), cam, 512, 128
        if name == "C5":
            bd = load_scene_json(_data("data/zy_scene.json"))
            return bd.scene, bd.camera, 1024, 256
        if name == "C6":
            b, cam = scene_c6()
            return b.build(), cam, 512, 32
        raise KeyError(name)

    results = {}
    for name in ("C1", "C2", "C3", "C4", "C5", "C6"):
        if name not in wanted:
            continue
        scene, cam, size, spp = build(name)
        size = max(int(size * args.res_scale), 16)
        spp = max(int(spp * args.spp_scale), 1)
        r = Renderer(RendererParam(size, size, max_depth=None), cam, scene)
        acc = r.accumulate(jax.random.fold_in(jax.random.key(0), 0))
        np.asarray(acc)  # compile + first pass
        t0 = time.perf_counter()
        for i in range(1, spp):
            acc = r.accumulate(jax.random.fold_in(jax.random.key(0), i), acc)
            if i % 16 == 0:
                np.asarray(acc)  # sync so the progress line is honest
                print(f"  {name}: {i}/{spp} passes "
                      f"({(time.perf_counter()-t0)/i:.2f}s/pass)", flush=True)
        img = np.asarray(acc) / spp
        dt = time.perf_counter() - t0
        per_pass = dt / max(spp - 1, 1)

        u8 = np.where(
            np.isnan(img), 0.0,
            np.clip(np.sqrt(np.maximum(img, 0.0)) * 256.0, 0.5, 255.5),
        ).astype(np.uint8)
        from PIL import Image

        path = os.path.join(args.out, f"{name}_{size}x{size}_{spp}spp.png")
        Image.fromarray(u8).save(path)
        results[name] = {
            "size": size, "spp": spp, "seconds_per_pass": per_pass,
            "total_seconds": dt, "mean_radiance": float(img.mean()),
            "image": path,
        }
        print(f"{name}: {size}^2 x {spp}spp  {per_pass:.3f}s/pass  -> {path}",
              flush=True)

    # merge into any existing stats so a partial --configs run doesn't
    # drop the other configs' entries
    stats_path = os.path.join(args.out, "stats.json")
    merged = {}
    if os.path.exists(stats_path):
        try:
            with open(stats_path) as fh:
                merged = json.load(fh)
        except (OSError, ValueError):
            merged = {}
    merged.update(results)
    with open(stats_path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print("stats ->", stats_path)


if __name__ == "__main__":
    main()
