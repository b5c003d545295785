"""Inverse rendering over the FULL parameter set: recover metal fuzz,
dielectric refraction index, metal albedo and wall colors from target
images by gradient descent through the path tracer.

This exercises every gradient family the framework exposes
(render/prb.py for the color-linear parameters, render/prb_scalar.py's
forward-mode tangent replay for the direction-bending scalars) on the
compacted forward — the same program bench.py times.  The reference has
no gradients at all (its closest surface is the forward renderer,
reference src/renderer.rs:321-332).

Targets use fixed per-step keys, so each fit step replays the exact
paths of its target render (matched seeds, BASELINE.md): the MC noise
is common mode and the loss is ~deterministic in the parameters.

Run (CPU example):
  JAX_PLATFORMS=cpu python examples/fit_materials.py --steps 80 --size 32
"""

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
from ray_tracing_tpu.models.camera import camera_rays
from ray_tracing_tpu.render.prb_scalar import AllParams, params_of, prb_radiance_all


def cornell():
    """Cornell box with a fuzzy metal and a glass sphere (the two
    scalar-parameter carriers) plus colored walls."""
    b = SceneBuilder(background=(0, 0, 0))
    white = b.add_lambertian(b.add_texture_solid((0.73, 0.73, 0.73)))
    red = b.add_lambertian(b.add_texture_solid((0.65, 0.05, 0.05)))
    green = b.add_lambertian(b.add_texture_solid((0.12, 0.45, 0.15)))
    light = b.add_diffuse_light(b.add_texture_solid((8.0, 8.0, 8.0)))
    metal = b.add_metal((0.85, 0.75, 0.55), 0.25)   # fuzz 0.25 = truth
    glass = b.add_dielectric(1.5)                    # IR 1.5 = truth
    b.add_rect("xy", 0, 555, 0, 555, 555, white, positive=False)
    b.add_rect("zx", 0, 555, 0, 555, 0, white, positive=True)
    b.add_rect("zx", 0, 555, 0, 555, 555, white, positive=False)
    b.add_rect("yz", 0, 555, 0, 555, 555, red, positive=False)
    b.add_rect("yz", 0, 555, 0, 555, 0, green, positive=True)
    b.add_rect("zx", 187, 372, 187, 372, 554.9, light, positive=False,
               important=True)
    b.add_sphere((180, 130, 300), 110, metal)
    b.add_sphere((390, 110, 200), 90, glass)
    return b.build()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    w = h = args.size
    n = w * h
    scene = cornell()
    camera = Camera.build(CameraParam((278, 278, -800), (278, 278, 0), 40), 1.0)
    true_params = params_of(scene)

    def render(params, key):
        ro, rd, _, k_trace = camera_rays(camera, key, w, h, True)
        rad = prb_radiance_all(
            params, scene, ro, rd, k_trace, args.depth
        )
        return rad.reshape(h, w, 3)

    key = jax.random.key(args.seed)
    n_targets = 4
    target_keys = [jax.random.fold_in(key, 1000 + i) for i in range(n_targets)]
    targets = jnp.stack([render(true_params, k) for k in target_keys])

    # perturbed start: wrong fuzz, wrong IR, wrong metal albedo, gray
    # walls; the emitter (texture row 3) stays pinned at truth
    init = AllParams(
        color=jnp.full_like(true_params.color, 0.5).at[3].set(
            true_params.color[3]
        ),
        images=true_params.images,
        metal_albedo=jnp.full_like(true_params.metal_albedo, 0.5),
        fuzz=jnp.where(true_params.fuzz > 0, 0.05, true_params.fuzz),
        ir=jnp.where(true_params.ir > 1.0, 1.2, true_params.ir),
    )

    color_mask = jnp.ones((true_params.color.shape[0], 1)).at[3].set(0.0)
    opt = optax.adam(args.lr)
    params = init
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, which):
        # direct taped value-and-grad: the L2 loss is a cheap function
        # of the radiance, so the renderer needs no AD graph at all
        # (render/prb_scalar.prb_loss_and_grad_all — one traversal for
        # forward + color gradients, tangent batches for fuzz/IR)
        from ray_tracing_tpu.render.prb_scalar import prb_loss_and_grad_all

        k = jax.lax.switch(which, [lambda k=k: k for k in target_keys])
        ro, rd, _, k_trace = camera_rays(camera, k, w, h, True)

        def loss_fn(rad):
            return jnp.mean((rad.reshape(h, w, 3) - targets[which]) ** 2)

        loss, g = prb_loss_and_grad_all(
            loss_fn, params, scene, ro, rd, k_trace, args.depth
        )
        g = g._replace(color=g.color * color_mask)
        upd, opt_state = opt.update(g, opt_state)
        p = optax.apply_updates(params, upd)
        # physical boxes: colors in [0,1], fuzz in [0,1], IR in [1, 3]
        p = p._replace(
            color=jnp.where(
                color_mask > 0, jnp.clip(p.color, 0.0, 1.0), p.color
            ),
            metal_albedo=jnp.clip(p.metal_albedo, 0.0, 1.0),
            fuzz=jnp.clip(p.fuzz, 0.0, 1.0),
            ir=jnp.clip(p.ir, 1.0, 3.0),
        )
        return p, opt_state, loss

    mrow = int(np.nonzero(np.asarray(scene.materials.fuzz) > 0)[0][0])
    drow = int(np.nonzero(np.asarray(scene.materials.ir) > 1.0)[0][0])
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, jnp.int32(i % n_targets))
        if i % 10 == 0 or i == args.steps - 1:
            print(
                f"step {i:4d} loss {float(loss):.6f} "
                f"fuzz {float(params.fuzz[mrow]):.3f} (true 0.250) "
                f"ir {float(params.ir[drow]):.3f} (true 1.500)"
            )

    err_fuzz = abs(float(params.fuzz[mrow]) - 0.25)
    err_ir = abs(float(params.ir[drow]) - 1.5)
    err_col = float(
        jnp.abs(
            jnp.delete(params.color, 3, axis=0)
            - jnp.delete(true_params.color, 3, axis=0)
        ).max()
    )
    print(f"final |fuzz err| {err_fuzz:.4f}  |ir err| {err_ir:.4f}  "
          f"max wall-color err {err_col:.4f}")
    return err_fuzz, err_ir


if __name__ == "__main__":
    main()
