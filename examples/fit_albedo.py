"""Inverse rendering: recover material albedos / emitter radiance from a
target image by gradient descent through the path tracer (the new
capability the TPU build adds over the reference — BASELINE.md C5).

A Cornell box is rendered with ground-truth wall/sphere colors to make a
target; the colors are then re-initialized to gray and fitted by
path-replay gradients (fixed per-step keys) with Adam, optionally
sharded over all available devices (gradient psum via shard_map AD).

Run (CPU example):
  JAX_PLATFORMS=cpu python examples/fit_albedo.py --steps 60 --size 48
"""



from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)  # runnable as `python examples/<name>.py` without installing

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # some containers pin another platform in sitecustomize, overriding
    # the env var; re-assert the documented CPU recipe in-process
    import jax

    jax.config.update("jax_platforms", "cpu")


import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ray_tracing_tpu import Camera, CameraParam, SceneBuilder
from ray_tracing_tpu.parallel.mesh import make_mesh, sharded_render_pass
from ray_tracing_tpu.utils.checkpoint import load_fit, save_fit


def cornell(colors_override=None):
    b = SceneBuilder(background=(0, 0, 0))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
    red = b.add_lambertian(b.add_texture_solid((0.65, 0.05, 0.05)))
    green = b.add_lambertian(b.add_texture_solid((0.12, 0.45, 0.15)))
    light = b.add_diffuse_light(b.add_texture_solid((8.0, 8.0, 8.0)))
    blue = b.add_lambertian(b.add_texture_solid((0.2, 0.3, 0.7)))
    b.add_rect("xy", 0, 555, 0, 555, 555, white, positive=False)
    b.add_rect("zx", 0, 555, 0, 555, 0, white, positive=True)
    b.add_rect("zx", 0, 555, 0, 555, 555, white, positive=False)
    b.add_rect("yz", 0, 555, 0, 555, 555, red, positive=False)
    b.add_rect("yz", 0, 555, 0, 555, 0, green, positive=True)
    b.add_rect("zx", 187, 372, 187, 372, 554.9, light, positive=False,
               important=True)
    b.add_sphere((277, 140, 277), 120, blue)
    scene = b.build()
    if colors_override is not None:
        scene = scene.replace(
            textures=scene.textures.replace(color=colors_override)
        )
    return scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    w = h = args.size
    scene = cornell()
    camera = Camera.build(CameraParam((278, 278, -800), (278, 278, 0), 40), 1.0)
    mesh = make_mesh()
    true_colors = scene.textures.color

    def render(colors, key):
        s = cornell(colors)
        return sharded_render_pass(
            s, camera, key, width=w, height=h, max_depth=args.depth,
            antialias=True, mesh=mesh,
        )

    # targets: a pool of ground-truth passes with KNOWN keys.  Fitting
    # replays each pass with the same key (path replay, the "matched
    # seeds/spp" comparison of BASELINE.md): the MC noise is common to
    # prediction and target, so the loss is ~deterministic in the
    # parameters and reaches ~0 at the true colors.
    key = jax.random.key(args.seed)
    n_targets = 4
    target_keys = [jax.random.fold_in(key, 1000 + i) for i in range(n_targets)]
    targets = jnp.stack([render(true_colors, k) for k in target_keys])

    # start from gray (keep the light's emission as the only known).
    # check_fit_init guards against black starts: a PRB-driven fit gets
    # exactly-zero gradients on exactly-zero channels (render/prb.py).
    from ray_tracing_tpu.render.prb import check_fit_init

    init = jnp.full_like(true_colors, 0.5)
    colors = check_fit_init(init, nudge=1e-3)
    # emitter stays fixed below — re-pin AFTER the nudge so a
    # pure-colored light's zero channels are not lifted off the ground
    # truth the targets were rendered with
    colors = colors.at[3].set(true_colors[3])
    opt = optax.adam(args.lr)
    start_step = 0
    if args.checkpoint:
        try:
            start_step, restored, _ = load_fit(args.checkpoint)
            colors = jnp.asarray(restored)
            print(f"resumed at step {start_step}")
        except (FileNotFoundError, AssertionError):
            pass
    opt_state = opt.init(colors)

    fit_mask = jnp.ones((true_colors.shape[0], 1)).at[3].set(0.0)  # pin emitter

    @jax.jit
    def step(colors, opt_state, which):
        def loss_fn(c):
            img = render(c, jax.lax.switch(
                which, [lambda k=k: k for k in target_keys]))
            return jnp.mean((img - targets[which]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(colors)
        updates, opt_state = opt.update(g * fit_mask, opt_state)
        colors = optax.apply_updates(colors, updates)
        colors = jnp.where(fit_mask > 0, jnp.clip(colors, 0.0, 1.0), colors)
        return colors, opt_state, loss

    for i in range(start_step, args.steps):
        colors, opt_state, loss = step(colors, opt_state, jnp.int32(i % n_targets))
        if i % 10 == 0 or i == args.steps - 1:
            fitted = jnp.delete(colors, 3, axis=0)
            truth = jnp.delete(true_colors, 3, axis=0)
            err = float(jnp.abs(fitted - truth).max())
            print(f"step {i:4d} loss {float(loss):.6f} max|c-c*| {err:.4f}")
            if args.checkpoint:
                save_fit(args.checkpoint, step=i + 1, color_table=np.asarray(colors))

    err = np.abs(np.asarray(colors) - np.asarray(true_colors))
    err[3] = 0.0  # pinned emitter
    print("final per-texture error:", err.max(axis=1).round(3))
    return float(err.max())


if __name__ == "__main__":
    main()
