"""Multi-chip execution: ray-axis sharding over a jax device mesh.

The reference parallelizes by replicating the whole image per rayon
worker and averaging (reference src/main.rs:39-63, SURVEY §2.4 P2).
The TPU-native mapping shards the *ray axis* across devices instead
(the context-parallel analogue of the pixel/sample space): the scene is
tiny and replicated, rays are embarrassingly independent, and the only
cross-device communication is the gradient/image reduction — a single
``psum`` riding ICI, inserted automatically by shard_map's AD for the
replicated scene parameters.

Multi-host: call ``jax.distributed.initialize()`` first and build the
mesh over ``jax.devices()``; the same code path then spans hosts (DCN
for the final reduction only).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ray_tracing_tpu.models.camera import (
    Camera,
    camera_rays,
    stamp_shutter,
)
from ray_tracing_tpu.models.scene import SceneData
from ray_tracing_tpu.render.integrator import trace

RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D device mesh over the ray axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def _pad_to(n: int, mult: int) -> int:
    return -(-n // mult) * mult


def _shard_pad(n: int, n_dev: int) -> int:
    """Pad the ray axis so every shard's count is a multiple of 8;
    integrator.default_chunk_div then picks a chunk divisor that
    divides the shard exactly (it returns a true divisor of n, so odd
    shard sizes like 73736 are fine).  Padded rays are cropped or
    carry weight 0 downstream."""
    return _pad_to(n, n_dev * 8)


def sharded_trace(scene: SceneData, ro, rd, key, max_depth: int, mesh: Mesh):
    """Trace a ray wavefront sharded across ``mesh``.

    ro/rd: (N, 3) with N a multiple of the device count.  Each device
    folds its mesh position into the key so RNG streams are independent
    per shard (SURVEY §2.4: per-device fold-in RNG).
    """

    def shard_fn(scene, ro_s, rd_s, key):
        # ONE key + per-shard ids_base: the image is independent of the
        # device count and matches the unsharded trace to f32 fusion
        # rounding (paths/uniforms identical; >99% of pixels bit-equal
        # — the sharded XLA program fuses FMAs differently; tests) —
        # sharding is an execution strategy, like tiling / compaction
        dev = jax.lax.axis_index(RAY_AXIS)
        return trace(scene, ro_s, rd_s, key, max_depth,
                     ids_base=dev * ro_s.shape[0])

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )(scene, ro, rd, key)


def sharded_render_pass(
    scene: SceneData,
    camera: Camera,
    key: jax.Array,
    *,
    width: int,
    height: int,
    max_depth: int,
    antialias: bool,
    mesh: Mesh,
) -> jnp.ndarray:
    """One 1-spp pass with the ray axis sharded over ``mesh``.

    Returns (H, W, 3) linear radiance (device-sharded along rows once
    reshaped; materializes fine on any host).
    """
    n = width * height
    n_dev = mesh.devices.size
    n_pad = _shard_pad(n, n_dev)

    scene = stamp_shutter(scene, camera)
    ro, rd, _, k_trace = camera_rays(camera, key, width, height, antialias)
    if n_pad != n:
        ro = jnp.concatenate([ro, jnp.zeros((n_pad - n, 3), jnp.float32)])
        rd = jnp.concatenate(
            [rd, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n_pad - n, 1))]
        )
    colors = sharded_trace(scene, ro, rd, k_trace, max_depth, mesh)
    return colors[:n].reshape(height, width, 3)


def sharded_prb_render(
    colors: jnp.ndarray,
    scene: SceneData,
    camera: Camera,
    key: jax.Array,
    *,
    width: int,
    height: int,
    max_depth: int,
    mesh: Mesh,
    compaction: bool = True,
) -> jnp.ndarray:
    """One 1-spp pass, ray-axis sharded, differentiable w.r.t. the color
    table through path-replay backprop — the PRODUCTION gradient path:
    the compacted forward runs inside each shard (dynamic trip counts
    and all), PRB's custom_vjp replays it for the backward, and
    shard_map's transpose inserts the cross-device psum for the
    replicated color cotangent.  This is the multi-chip analogue of
    bench.py's single-chip fwd+bwd."""
    from ray_tracing_tpu.render.prb import prb_radiance

    n = width * height
    n_dev = mesh.devices.size
    n_pad = _shard_pad(n, n_dev)

    scene = stamp_shutter(scene, camera)
    ro, rd, _, k_trace = camera_rays(camera, key, width, height, True)
    if n_pad != n:
        ro = jnp.concatenate([ro, jnp.zeros((n_pad - n, 3), jnp.float32)])
        rd = jnp.concatenate(
            [rd, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                          (n_pad - n, 1))]
        )

    def shard_fn(colors, scene, ro_s, rd_s, key):
        dev = jax.lax.axis_index(RAY_AXIS)
        return prb_radiance(
            colors, scene, ro_s, rd_s, key,
            max_depth, compaction=compaction,
            ids_base=dev * ro_s.shape[0],
        )

    rad = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )(colors, scene, ro, rd, k_trace)
    return rad[:n].reshape(height, width, 3)


def sharded_prb_render_all(
    params,
    scene: SceneData,
    camera: Camera,
    key: jax.Array,
    *,
    width: int,
    height: int,
    max_depth: int,
    mesh: Mesh,
    compaction: bool = True,
    static_scene: SceneData = None,
):
    """One 1-spp pass, ray-axis sharded, differentiable w.r.t. the FULL
    parameter set (solid colors, atlas texels, metal albedo, fuzz,
    dielectric IR) — bench.py's full fwd+bwd, multi-chip.

    The scene rides through shard_map as an operand (a closed-over
    tracer would escape the enclosing trace), so the concrete compiled
    scene must be supplied as ``static_scene`` for the scalar-row
    extraction (which material rows carry a fuzz / IR tangent — a
    traced-shape decision).  ``params`` is a
    :class:`~ray_tracing_tpu.render.prb_scalar.AllParams`.
    """
    from ray_tracing_tpu.render.prb_scalar import prb_radiance_all

    if static_scene is None:
        static_scene = scene  # caller passed a concrete scene directly

    n = width * height
    n_dev = mesh.devices.size
    n_pad = _shard_pad(n, n_dev)

    scene = stamp_shutter(scene, camera)
    ro, rd, _, k_trace = camera_rays(camera, key, width, height, True)
    if n_pad != n:
        ro = jnp.concatenate([ro, jnp.zeros((n_pad - n, 3), jnp.float32)])
        rd = jnp.concatenate(
            [rd, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                          (n_pad - n, 1))]
        )

    def shard_fn(params, scene, ro_s, rd_s, key):
        dev = jax.lax.axis_index(RAY_AXIS)
        return prb_radiance_all(
            params, scene, ro_s, rd_s, key,
            max_depth, compaction=compaction,
            static_scene=static_scene,
            ids_base=dev * ro_s.shape[0],
        )

    rad = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )(params, scene, ro, rd, k_trace)
    return rad[:n].reshape(height, width, 3)


def make_prb_train_step_all(
    camera: Camera,
    template_scene: SceneData,
    *,
    width: int,
    height: int,
    max_depth: int,
    mesh: Mesh,
    lr: float = 0.5,
    compaction: bool = True,
):
    """Full-parameter data-parallel train step: compacted forward + PRB
    backward + scalar tangent replays per shard, psum'd gradients for
    EVERY differentiable scene parameter.

    ``template_scene`` is the concrete compiled scene; its material
    types fix the scalar-row structure once at build time (types never
    change during a fit).  Returns ``step(params, scene, key, target)
    -> (params', loss)`` with params an ``AllParams``.
    """
    def loss_fn(params, scene, key, target):
        img = sharded_prb_render_all(
            params, scene, camera, key,
            width=width, height=height, max_depth=max_depth, mesh=mesh,
            compaction=compaction, static_scene=template_scene,
        )
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(params, scene, key, target):
        loss, g = jax.value_and_grad(loss_fn)(params, scene, key, target)
        params = jax.tree.map(lambda p, gp: p - lr * gp, params, g)
        return params, loss

    return step


def make_prb_train_step_all_direct(
    camera: Camera,
    template_scene: SceneData,
    *,
    width: int,
    height: int,
    max_depth: int,
    mesh: Mesh,
    lr: float = 0.5,
    compaction: bool = True,
    use_tape: bool = True,
):
    """Full-parameter data-parallel train step on the DIRECT taped
    backward: each shard runs prb_loss_and_grad_all (forward writes the
    PRB tape, color gradients from the traversal-free sweep, scalar
    tangent batches), and the per-shard losses/gradients are psum'd
    over the ray axis — one explicit collective instead of the
    shard_map transpose.  Numerically matches make_prb_train_step_all
    (tests assert) at the single-traversal cost (494 vs 696 ms/pass at
    1024² single-chip).

    Returns ``step(params, scene, key, target) -> (params', loss)``.
    """
    from ray_tracing_tpu.render.prb_scalar import prb_loss_and_grad_all

    n = width * height
    n_dev = mesh.devices.size
    n_pad = _shard_pad(n, n_dev)

    def shard_fn(params, scene, ro_s, rd_s, w_s, target_s, key):
        dev = jax.lax.axis_index(RAY_AXIS)

        def loss_fn(rad):
            # masked L2: padded rays carry weight 0 so their (traced)
            # radiance never touches the loss
            return jnp.sum(w_s[:, None] * (rad - target_s) ** 2) / (n * 3)

        loss, g = prb_loss_and_grad_all(
            loss_fn, params, scene, ro_s, rd_s, key, max_depth,
            compaction=compaction, static_scene=template_scene,
            use_tape=use_tape, ids_base=dev * ro_s.shape[0],
        )
        return (
            jax.lax.psum(loss, RAY_AXIS),
            jax.lax.psum(g, RAY_AXIS),
        )

    @jax.jit
    def step(params, scene, key, target):
        scene = stamp_shutter(scene, camera)
        ro, rd, _, k_trace = camera_rays(camera, key, width, height, True)
        w = jnp.ones((n,), jnp.float32)
        t_flat = target.reshape(n, 3)
        if n_pad != n:
            pad = n_pad - n
            ro = jnp.concatenate([ro, jnp.zeros((pad, 3), jnp.float32)])
            rd = jnp.concatenate(
                [rd, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                              (pad, 1))]
            )
            w = jnp.concatenate([w, jnp.zeros((pad,), jnp.float32)])
            t_flat = jnp.concatenate(
                [t_flat, jnp.zeros((pad, 3), jnp.float32)]
            )

        loss, g = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS),
                      P(RAY_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, scene, ro, rd, w, t_flat, k_trace)
        params = jax.tree.map(lambda p, gp: p - lr * gp, params, g)
        return params, loss

    return step


def make_prb_train_step(
    camera: Camera,
    *,
    width: int,
    height: int,
    max_depth: int,
    mesh: Mesh,
    lr: float = 0.5,
    compaction: bool = True,
):
    """Data-parallel differentiable-rendering train step on the
    production path: compacted forward + PRB backward per shard, psum'd
    color gradients (the gradient all-reduce of BASELINE.md).

    Returns ``step(scene, key, target) -> (scene', loss)``.
    """

    def loss_fn(colors, scene, key, target):
        img = sharded_prb_render(
            colors, scene, camera, key,
            width=width, height=height, max_depth=max_depth, mesh=mesh,
            compaction=compaction,
        )
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(scene, key, target):
        loss, g = jax.value_and_grad(loss_fn)(
            scene.textures.color, scene, key, target
        )
        scene = scene.replace(
            textures=scene.textures.replace(
                color=scene.textures.color - lr * g
            )
        )
        return scene, loss

    return step


def make_train_step(
    camera: Camera,
    *,
    width: int,
    height: int,
    max_depth: int,
    mesh: Mesh,
    lr: float = 0.5,
):
    """Data-parallel differentiable-rendering train step.

    Loss = MSE(rendered image, target); gradients w.r.t. every scene
    table leaf (albedo texels, emission, material params) flow through
    the sharded path tracer; shard_map's reverse-mode AD inserts the
    cross-device ``psum`` for the replicated scene pytree — the gradient
    all-reduce of BASELINE.md, overlapped with the backward sweep by XLA.

    Returns ``step(scene, key, target) -> (scene', loss)``.
    """

    def loss_fn(colors, scene, key, target):
        scene = scene.replace(textures=scene.textures.replace(color=colors))
        img = sharded_render_pass(
            scene, camera, key,
            width=width, height=height, max_depth=max_depth,
            antialias=True, mesh=mesh,
        )
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(scene, key, target):
        # SGD on the texture color table (albedo / emission texels);
        # the rest of the scene pytree has integer id leaves, so the
        # differentiable parameter is passed explicitly.
        loss, g = jax.value_and_grad(loss_fn)(
            scene.textures.color, scene, key, target
        )
        scene = scene.replace(
            textures=scene.textures.replace(color=scene.textures.color - lr * g)
        )
        return scene, loss

    return step
