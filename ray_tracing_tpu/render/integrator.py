"""The bounce-loop path integrator.

Iterative rewrite of the reference's depth-first wavefront recursion
(reference src/renderer.rs:123-320).  The recursive accumulation
``colors[i] = emitted_or_background + coef * child_color`` becomes the
standard radiance/throughput form::

    radiance  += throughput * (emitted at hits | background at misses)
    throughput *= coef
    ... after max_depth bounces: radiance += throughput * environment

which is algebraically identical term-by-term, including the reference's
background-vs-environment distinction: *misses* contribute ``background``
(renderer.rs:184) and only *depth exhaustion* contributes ``environment``
(renderer.rs:128-130).  Absorbed paths (DiffuseLight / ScatterRecord::None)
stop after their emission term (renderer.rs:261).

Everything is a pure function of (scene, rays, key): per-bounce uniforms
come from ``fold_in(key, bounce)``, so a render is bit-reproducible and
replayable for path-replay differentiation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ray_tracing_tpu.models.scene import SceneData
from ray_tracing_tpu.ops.geometry import EPSILON, INF
from ray_tracing_tpu.ops.intersect import intersect_scene
from ray_tracing_tpu.ops.materials import N_SCATTER_U, shade


def trace(
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    *,
    remat: bool = False,
    with_stats: bool = False,
    early_exit: bool = False,
) -> jnp.ndarray:
    """Trace a wavefront to completion; returns (N, 3) linear radiance.

    remat: rematerialize each bounce in the backward pass
    (``jax.checkpoint``) so reverse-mode AD stores only the O(N) bounce
    state instead of the O(N x P) candidate grids — the standard
    FLOPs-for-HBM trade for differentiable rendering at full depth.
    with_stats: also return the total number of ray segments traced
    (sum over bounces of live rays), the honest numerator for rays/s.
    """
    n = ro.shape[0]
    rad = jnp.zeros((n, 3), dtype=jnp.float32)
    thr = jnp.ones((n, 3), dtype=jnp.float32)
    alive = jnp.ones((n,), dtype=bool)
    segments = jnp.zeros((), dtype=jnp.float32)

    def body(bounce, carry):
        rad, thr, ro, rd, alive, segments = carry
        segments = segments + jnp.sum(alive.astype(jnp.float32))
        kb = jax.random.fold_in(key, bounce)
        if scene.n_medium > 0:
            med_u = jax.random.uniform(
                jax.random.fold_in(kb, 1), (n, scene.n_medium), dtype=jnp.float32
            )
        else:
            med_u = None
        hit = intersect_scene(scene, ro, rd, EPSILON, INF, med_u)
        found = alive & hit.mask
        miss = alive & ~hit.mask

        rad = rad + jnp.where(
            miss[:, None], thr * scene.background[None, :], 0.0
        )
        u = jax.random.uniform(
            jax.random.fold_in(kb, 2), (n, N_SCATTER_U), dtype=jnp.float32
        )
        em, sc = shade(scene, hit, rd, u)
        rad = rad + jnp.where(found[:, None], thr * em, 0.0)
        new_alive = found & sc.scattered
        thr = jnp.where(new_alive[:, None], thr * sc.coef, thr)
        ro = jnp.where(found[:, None], hit.p, ro)
        rd = jnp.where(new_alive[:, None], sc.direction, rd)
        return rad, thr, ro, rd, new_alive, segments

    if remat:
        body = jax.checkpoint(body, static_argnums=())

    init = (rad, thr, ro, rd, alive, segments)
    if early_exit:
        # Stop as soon as the whole wavefront is dead (most of the
        # reference's fixed-depth budget is spent on dead lanes: zy at
        # depth 20 averages 3.85 live bounces).  while_loop is not
        # reverse-differentiable, so this is the forward-render path
        # only; gradients use the scan form below.
        def cond(state):
            b, carry = state
            return (b < max_depth) & jnp.any(carry[4])

        def wbody(state):
            b, carry = state
            return b + 1, body(b, carry)

        _, (rad, thr, ro, rd, alive, segments) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), init)
        )
    else:
        rad, thr, ro, rd, alive, segments = jax.lax.fori_loop(
            0, max_depth, body, init
        )
    # depth exhausted -> environment (reference renderer.rs:128-130)
    rad = rad + jnp.where(alive[:, None], thr * scene.environment[None, :], 0.0)
    if with_stats:
        return rad, segments
    return rad
