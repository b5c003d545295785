"""Path-replay backpropagation (PRB) for color-table gradients.

The AD path (render_pass + jax.checkpoint) differentiates the dense
bounce scan; correct but it re-materializes every bounce and cannot use
the compacted forward (dynamic trip counts are not transposable).  PRB
sidesteps AD entirely: the estimator

    rad = sum_k T_k e_k + T_end env,     T_k = prod_{j<k} A_j w_j

is *linear in each occurrence* of a color-table entry (A_j = albedo
color for lambertian/isotropic bounces, e_k = emit color at diffuse
lights; the MIS weights w_j are color-independent), so with one replay
of the same paths (same keys -> identical compaction schedule, RNG and
hits) the exact per-path derivative is

    d rad / d e_k = T_k                      (emission occurrences)
    d rad / d A_j = S_j / A_j                (albedo occurrences)

where ``S_j = rad_total - prefix_j`` is the radiance gathered strictly
after bounce j — every such term carries the factor A_j, hence the
division (the standard PRB "detach" trick; exact for A_j > 0, and at
A_j = 0 the suffix is 0 so the contribution collapses to 0 — the one
known deviation from true AD, which scenes with strictly positive
albedos never see).

Memory is O(N): the only residual is the forward radiance per ray.
The backward costs one (compacted) forward pass plus tiny one-hot
reductions — vs AD's rematerialized forward + transpose sweep.

Gradients cover ``scene.textures.color`` (solid-color leaves: wall /
sphere albedos and emitter radiance).  Atlas texels and metal albedo
keep the AD path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ray_tracing_tpu.models.scene import (
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    SceneData,
)
from ray_tracing_tpu.ops.geometry import EPSILON, INF
from ray_tracing_tpu.ops.intersect import intersect_scene
from ray_tracing_tpu.ops.materials import N_SCATTER_U, shade
from ray_tracing_tpu.render.integrator import trace, trace_compacted

_A_EPS = 1e-6


def _one_hot_add(gacc, leaf, contrib, mask):
    """gacc (T,3) += sum over masked rays of one_hot(leaf) x contrib.

    A one-hot matmul keeps this off the scalar (scatter) unit; highest
    precision so the MXU accumulates in f32.
    """
    t = gacc.shape[0]
    oh = jax.nn.one_hot(leaf, t, dtype=jnp.float32)  # (N, T)
    contrib = jnp.where(mask[:, None], contrib, 0.0)
    return gacc + jax.lax.dot_general(
        oh, contrib, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _prb_bounce(scene: SceneData, kb, carry):
    """One replayed bounce: identical control/RNG to integrator._bounce
    (kept in lock-step; tests assert the replayed radiance matches the
    forward bit-for-bit) plus the two gradient accumulations."""
    rad, thr, ro, rd, alive, gacc, g, rad_total = carry
    n = ro.shape[0]
    if scene.n_medium > 0:
        med_u = jax.random.uniform(
            jax.random.fold_in(kb, 1), (n, scene.n_medium), dtype=jnp.float32
        )
    else:
        med_u = None
    hit = intersect_scene(scene, ro, rd, EPSILON, INF, med_u)
    found = alive & hit.mask
    miss = alive & ~hit.mask

    rad = rad + jnp.where(miss[:, None], thr * scene.background[None, :], 0.0)
    u = jax.random.uniform(
        jax.random.fold_in(kb, 2), (n, N_SCATTER_U), dtype=jnp.float32
    )
    em, sc, aux = shade(scene, hit, rd, u, with_aux=True)

    mtype = scene.materials.mtype[hit.material]

    # emission gradient: d rad / d emit = T_k (one-sided emission)
    emit_mask = found & (mtype == MAT_DIFFUSE_LIGHT) & hit.front_face & aux.leaf_is_solid
    gacc = _one_hot_add(gacc, aux.leaf_tex, g * thr, emit_mask)

    rad = rad + jnp.where(found[:, None], thr * em, 0.0)
    new_alive = found & sc.scattered

    # albedo gradient: d rad / d A_j = (rad_total - prefix_j) / A_j
    albedo_mask = (
        new_alive
        & ((mtype == MAT_LAMBERTIAN) | (mtype == MAT_ISOTROPIC))
        & aux.leaf_is_solid
    )
    suffix = rad_total - rad  # radiance strictly after this bounce
    a_safe = jnp.maximum(aux.tex_value, _A_EPS)
    gacc = _one_hot_add(gacc, aux.leaf_tex, g * suffix / a_safe, albedo_mask)

    thr = jnp.where(new_alive[:, None], thr * sc.coef, thr)
    ro = jnp.where(found[:, None], hit.p, ro)
    rd = jnp.where(new_alive[:, None], sc.direction, rd)
    return rad, thr, ro, rd, new_alive, gacc, g, rad_total


def prb_grad_dense(scene, ro, rd, key, max_depth, rad_total, g):
    """Replay the dense loop; returns (gacc (T,3), replayed_rad (N,3))."""
    n = ro.shape[0]
    t = scene.textures.color.shape[0]
    carry = (
        jnp.zeros((n, 3), jnp.float32),
        jnp.ones((n, 3), jnp.float32),
        ro, rd,
        jnp.ones((n,), bool),
        jnp.zeros((t, 3), jnp.float32),
        g, rad_total,
    )

    def body(b, c):
        return _prb_bounce(scene, jax.random.fold_in(key, b), c)

    rad, thr, ro, rd, alive, gacc, _, _ = jax.lax.fori_loop(
        0, max_depth, body, carry
    )
    rad = rad + jnp.where(alive[:, None], thr * scene.environment[None, :], 0.0)
    return gacc, rad


def prb_grad_compacted(
    scene, ro, rd, key, max_depth, rad_total, g,
    *, stage_bounces: int = 4, chunk_div: int = 8,
):
    """Replay of integrator.trace_compacted's exact staged schedule
    (same keys -> same sorts -> same paths), accumulating gradients.
    Structure is deliberately kept in lock-step with trace_compacted;
    tests assert the replayed radiance equals the forward output."""
    n = ro.shape[0]
    chunk = n // chunk_div
    assert chunk * chunk_div == n
    t = scene.textures.color.shape[0]

    rad = jnp.zeros((n, 3), jnp.float32)
    thr = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    gacc = jnp.zeros((t, 3), jnp.float32)
    orig = jnp.arange(n, dtype=jnp.int32)

    n_stages = -(-max_depth // stage_bounces)
    for stage in range(n_stages):
        k_stage = jax.random.fold_in(key, 1000 + stage)
        bounces = min(stage_bounces, max_depth - stage * stage_bounces)

        if stage == 0:
            def body0(b, c):
                return _prb_bounce(scene, jax.random.fold_in(k_stage, b), c)

            rad, thr, ro, rd, alive, gacc, g, rad_total = jax.lax.fori_loop(
                0, bounces, body0,
                (rad, thr, ro, rd, alive, gacc, g, rad_total),
            )
            continue

        order = jnp.argsort(~alive, stable=True)
        orig = orig[order]
        rad = rad[order]
        thr = thr[order]
        ro = ro[order]
        rd = rd[order]
        alive = alive[order]
        g = g[order]
        rad_total = rad_total[order]
        alive_count = jnp.sum(alive.astype(jnp.int32))

        def chunk_body(state):
            ci, rad, thr, ro, rd, alive, gacc, g, rt = state
            start = ci * chunk
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, chunk)
            c_carry = (
                sl(rad), sl(thr), sl(ro), sl(rd), sl(alive),
                gacc, sl(g), sl(rt),
            )
            k_chunk = jax.random.fold_in(k_stage, ci)

            def bodyc(b, c):
                return _prb_bounce(scene, jax.random.fold_in(k_chunk, b), c)

            c_rad, c_thr, c_ro, c_rd, c_alive, gacc2, _, _ = jax.lax.fori_loop(
                0, bounces, bodyc, c_carry
            )
            upd = lambda x, v: jax.lax.dynamic_update_slice_in_dim(x, v, start, 0)
            return (
                ci + 1,
                upd(rad, c_rad), upd(thr, c_thr), upd(ro, c_ro),
                upd(rd, c_rd), upd(alive, c_alive), gacc2, g, rt,
            )

        def chunk_cond(state):
            return state[0] * chunk < alive_count

        _, rad, thr, ro, rd, alive, gacc, g, rad_total = jax.lax.while_loop(
            chunk_cond, chunk_body,
            (jnp.int32(0), rad, thr, ro, rd, alive, gacc, g, rad_total),
        )

    rad = rad + jnp.where(alive[:, None], thr * scene.environment[None, :], 0.0)
    rad_out = jnp.zeros_like(rad).at[orig].set(rad)
    return gacc, rad_out


def prb_radiance(
    colors: jnp.ndarray,
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    *,
    compaction: bool = True,
):
    """Per-ray radiance, differentiable w.r.t. ``colors``
    (= scene.textures.color) via path-replay backprop.

    Forward may use the compacted loop (AD could not); backward costs
    one replayed forward.  Scene/rays/key are treated as constants.
    """

    import numpy as np

    def run_fwd(c, ro, rd, keydata):
        k = jax.random.wrap_key_data(keydata)
        s = scene.replace(textures=scene.textures.replace(color=c))
        if compaction:
            return trace_compacted(s, ro, rd, k, max_depth)
        return trace(s, ro, rd, k, max_depth)

    # ro/rd/key pass through the custom_vjp as explicit inputs so they
    # may be tracers of an enclosing transformation (e.g. a lax.map over
    # tiles); only ``colors`` receives a real cotangent.
    @jax.custom_vjp
    def inner(c, ro, rd, keydata):
        return run_fwd(c, ro, rd, keydata)

    def fwd(c, ro, rd, keydata):
        rad = run_fwd(c, ro, rd, keydata)
        return rad, (c, ro, rd, keydata, rad)

    def bwd(res, g):
        c, ro, rd, keydata, rad = res
        k = jax.random.wrap_key_data(keydata)
        s = scene.replace(textures=scene.textures.replace(color=c))
        if compaction:
            gacc, _ = prb_grad_compacted(s, ro, rd, k, max_depth, rad, g)
        else:
            gacc, _ = prb_grad_dense(s, ro, rd, k, max_depth, rad, g)
        return (
            gacc,
            jnp.zeros_like(ro),
            jnp.zeros_like(rd),
            np.zeros((2,), jax.dtypes.float0),
        )

    inner.defvjp(fwd, bwd)
    return inner(colors, ro, rd, jax.random.key_data(key))
