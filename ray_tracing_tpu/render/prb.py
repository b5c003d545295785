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

Gradients cover every color-linear parameter in one replay:
``scene.textures.color`` (solid-color leaves: albedos and emitter
radiance), ``scene.textures.images`` (atlas texels — the C5 texture-fit
deliverable), and ``scene.materials.albedo`` (metal).  The non-linear
scalar parameters (metal fuzz, dielectric IR) move the scattered
*direction* rather than scale the throughput; they are handled by the
forward-mode tangent replay in ``render/prb_scalar.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu.models.scene import (
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
    SceneData,
)
from ray_tracing_tpu.ops.geometry import EPSILON, INF, take_rows
from ray_tracing_tpu.ops.intersect import intersect_scene
from ray_tracing_tpu.ops.materials import N_SCATTER_U, shade
_A_EPS = 1e-6


def zero_cotangent(tree):
    """Symbolic-zero cotangents for an arbitrary pytree passed through a
    custom_vjp as a constant: float leaves get zeros, int/bool leaves
    get float0 zeros (what JAX requires for non-differentiable dtypes)."""

    def z(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(jnp.shape(x), jax.dtypes.float0)

    return jax.tree.map(z, tree)


def check_fit_init(colors, *, nudge: float | None = None):
    """Guard a PRB fit's starting colors against the zero-albedo pin.

    PRB's albedo derivative is the suffix radiance divided by the albedo
    occurrence (module docstring), so an exactly-zero channel gets an
    exactly-zero gradient and an optimizer initialized at black never
    moves.  Warns on any zero channel; with ``nudge`` set, also returns
    the colors clamped to at least that value (callers fitting from
    dark starts should pass e.g. ``nudge=1e-3``)."""
    import warnings

    c = np.asarray(colors)
    if (c == 0.0).any():
        warnings.warn(
            "PRB fit initialized with exactly-zero color channel(s): "
            "their gradients are pinned to 0 (render/prb.py zero-albedo "
            "deviation); pass nudge= to lift them off zero.",
            UserWarning,
            stacklevel=2,
        )
    if nudge is not None:
        return jnp.maximum(jnp.asarray(colors), nudge)
    return colors


class PrbParams(NamedTuple):
    """The color-linear differentiable parameter set (one replay covers
    all three; see module docstring)."""

    color: jnp.ndarray  # (T, 3) = scene.textures.color
    images: jnp.ndarray  # (I, Hmax, Wmax, 3) = scene.textures.images
    metal_albedo: jnp.ndarray  # (M, 3) = scene.materials.albedo


def _one_hot_add(gacc, leaf, contrib, mask):
    """gacc (T,3) += sum over masked rays of one_hot(leaf) x contrib.

    A one-hot matmul keeps this off the scalar (scatter) unit; highest
    precision so the MXU accumulates in f32.

    contrib is stop_gradient'ed: the accumulators are primal-exact
    gradient OUTPUTS whose own tangents are never consumed (the scalar
    tangent replay in prb_scalar.py jacfwd's a radiance-only replay),
    so without the stop a jvp would drag a full-size accumulator
    tangent stream per scalar parameter through every loop carry.
    Second derivatives of the PRB gradients are not a supported
    surface.
    """
    t = gacc.shape[0]
    contrib = jax.lax.stop_gradient(contrib)
    oh = jax.nn.one_hot(leaf, t, dtype=jnp.float32)  # (N, T)
    contrib = jnp.where(mask[:, None], contrib, 0.0)
    return gacc + jax.lax.dot_general(
        oh, contrib, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _gimg_add(gimg, texel, contrib, mask):
    """gimg (3, rows, 128) channel-planar += masked scatter of contrib
    (N, 3) at flat texel ids, gated on any(mask).

    XLA's TPU scatter-add costs ~180 cycles PER ROW regardless of mask
    (measured: per-bounce texel scatters alone were 0.45-0.52 s/pass at
    1024² — 75%% of the whole backward; per-ray pending-slot deferral
    didn't help because zy paths routinely visit 3+ distinct earth
    texels, so the "rare" eviction fired in ~every image block).  On
    TPU the scatter runs as a Pallas kernel that keeps the planar table
    in VMEM and skips masked-out rows in a few cycles
    (ops/pallas_scatter.py); off-TPU / oversized atlases take the XLA
    scatter on the same planar layout.  stop_gradient for the same
    reason as _one_hot_add.
    """
    from ray_tracing_tpu.ops.pallas_scatter import (
        scatter_add_planar,
        use_pallas_scatter,
    )

    contrib = jax.lax.stop_gradient(contrib)
    p_texels = gimg.shape[1] * gimg.shape[2]

    if use_pallas_scatter(p_texels):
        def do(g):
            return scatter_add_planar(g, texel, contrib, mask)
    else:
        def do(g):
            j = texel // 128
            lane = texel % 128
            c = jnp.where(mask[:, None], contrib, 0.0)
            return g.at[:, j, lane].add(c.T)

    return jax.lax.cond(jnp.any(mask), do, lambda x: x, gimg)


def _prb_bounce(scene: SceneData, key, bounce, carry, accumulate=True):
    """One replayed bounce: identical control/RNG to integrator._bounce
    (same (ray id, bounce)-keyed uniforms; tests assert the replayed
    radiance matches the forward bit-for-bit) plus the gradient
    accumulations.  ``accumulate=False`` (static) skips every gradient
    accumulator — the radiance-only mode the scalar tangent replay
    jacfwd's (the subset pass needs tangents of rad alone, and dragging
    the 6 MB atlas accumulator through its loops costs real time)."""
    from ray_tracing_tpu.render.integrator import ray_uniforms

    rad, thr, ro, rd, alive, ids, touched, gacc, g, rad_total = carry
    gcol, gimg, gmet = gacc
    n_med = scene.n_medium
    u_all = ray_uniforms(key, ids, bounce, N_SCATTER_U + n_med)
    med_u = u_all[:, N_SCATTER_U:] if n_med > 0 else None
    from ray_tracing_tpu.render.integrator import _shutter_times

    t_ray = _shutter_times(scene, key, ids)
    hit = intersect_scene(scene, ro, rd, EPSILON, INF, med_u, t_ray)
    found = alive & hit.mask
    miss = alive & ~hit.mask

    rad = rad + jnp.where(miss[:, None], thr * scene.background[None, :], 0.0)
    u = u_all[:, :N_SCATTER_U]
    if accumulate:
        em, sc, aux = shade(scene, hit, rd, u, with_aux=True)
    else:
        em, sc = shade(scene, hit, rd, u)

    mtype = take_rows(scene.materials.mtype, hit.material)
    has_images = scene.textures.images.shape[0] > 0

    # emission gradient: d rad / d emit = T_k (one-sided emission)
    emit_mask = found & (mtype == MAT_DIFFUSE_LIGHT) & hit.front_face

    rad = rad + jnp.where(found[:, None], thr * em, 0.0)
    new_alive = found & sc.scattered

    if accumulate:
        # albedo gradient: d rad / d A_j = (rad_total - prefix_j) / A_j
        albedo_mask = new_alive & (
            (mtype == MAT_LAMBERTIAN) | (mtype == MAT_ISOTROPIC)
        )
        suffix = rad_total - rad  # radiance strictly after this bounce
        a_safe = jnp.maximum(aux.tex_value, _A_EPS)
        alb_contrib = g * suffix / a_safe

        # A diffuse light never scatters (emit_mask ⊆ ~new_alive) so the
        # emission and albedo masks are disjoint per ray — both
        # texture-leaf accumulations merge into ONE one-hot matmul and
        # ONE gated scatter per bounce.
        leaf_contrib = jnp.where(emit_mask[:, None], g * thr, alb_contrib)
        leaf_mask = emit_mask | albedo_mask
        gcol = _one_hot_add(
            gcol, aux.leaf_tex, leaf_contrib, leaf_mask & aux.leaf_is_solid
        )
        if has_images:
            gimg = _gimg_add(
                gimg, aux.texel, leaf_contrib, leaf_mask & aux.leaf_is_image
            )

        # metal albedo: the Specular coefficient is the albedo itself
        # (reference metal.rs:31-46), so the same suffix/A trick applies,
        # keyed by material row instead of texture leaf
        metal_mask = new_alive & (mtype == MAT_METAL)
        met_safe = jnp.maximum(
            take_rows(scene.materials.albedo, hit.material), _A_EPS
        )
        gmet = _one_hot_add(
            gmet, hit.material, g * suffix / met_safe, metal_mask
        )

    # scalar-parameter reach: a path's radiance depends on fuzz / IR
    # only if it hits a metal or dielectric somewhere — EXACTLY zero
    # derivative otherwise.  The flag feeds the subset tangent replay
    # (render/prb_scalar.py).
    from ray_tracing_tpu.models.scene import MAT_DIELECTRIC

    touched = touched | jnp.where(
        found & (mtype == MAT_METAL), 1, 0
    ) | jnp.where(found & (mtype == MAT_DIELECTRIC), 2, 0)

    thr = jnp.where(new_alive[:, None], thr * sc.coef, thr)
    ro = jnp.where(found[:, None], hit.p, ro)
    rd = jnp.where(new_alive[:, None], sc.direction, rd)
    return (rad, thr, ro, rd, new_alive, ids, touched, (gcol, gimg, gmet),
            g, rad_total)


def _zero_grads(scene):
    """(gcol (T,3), gimg (3, rows, 128) channel-planar, gmet (M,3))
    accumulators.  The image-texel accumulator lives in the planar
    layout the scatter kernel wants (ops/pallas_scatter.py); callers
    flatten it back to texel-major with ``from_planar``."""
    from ray_tracing_tpu.ops.pallas_scatter import planar_rows

    t = scene.textures.color.shape[0]
    i, h, w = scene.textures.images.shape[:3]
    m = scene.materials.albedo.shape[0]
    return (
        jnp.zeros((t, 3), jnp.float32),
        jnp.zeros((3, planar_rows(max(i * h * w, 1)), 128), jnp.float32),
        jnp.zeros((m, 3), jnp.float32),
    )


def _empty_grads():
    """Zero-size accumulators for radiance-only replays
    (accumulate=False): structurally identical pytree, no traffic."""
    return (
        jnp.zeros((0, 3), jnp.float32),
        jnp.zeros((3, 0, 128), jnp.float32),
        jnp.zeros((0, 3), jnp.float32),
    )


def grads_image_flat(gacc, scene):
    """The (I*H*W, 3) texel-major view of a replay's image gradient."""
    from ray_tracing_tpu.ops.pallas_scatter import from_planar

    i, h, w = scene.textures.images.shape[:3]
    return from_planar(gacc[1], max(i * h * w, 1))


def prb_grad_dense(scene, ro, rd, key, max_depth, rad_total, g,
                   alive0=None, ids0=None, accumulate=True):
    """Replay the dense loop; returns ((gcol, gimg_planar, gmet),
    replayed_rad (N,3), touched (N,) i32 bitmask (1 = path reaches a
    metal, 2 — a dielectric; the scalar tangent pass batches each
    family over its own rays) — rays whose path reaches a
    metal / dielectric).  ``alive0`` restricts the replay to a subset
    of rays (the rest output zero radiance); ``ids0`` supplies the rays'
    ORIGINAL ids so a gathered subset keeps its original uniforms;
    ``accumulate=False`` skips the gradient accumulators (radiance-only
    replay for the scalar tangent pass)."""
    n = ro.shape[0]
    alive = jnp.ones((n,), bool) if alive0 is None else alive0
    ids = jnp.arange(n, dtype=jnp.int32) if ids0 is None else ids0
    carry = (
        jnp.zeros((n, 3), jnp.float32),
        jnp.ones((n, 3), jnp.float32),
        ro, rd,
        alive,
        ids,
        jnp.zeros((n,), jnp.int32),
        _zero_grads(scene) if accumulate else _empty_grads(),
        g, rad_total,
    )

    def body(b, c):
        return _prb_bounce(scene, key, b, c, accumulate=accumulate)

    rad, thr, ro, rd, alive, ids, touched, gacc, _, _ = jax.lax.fori_loop(
        0, max_depth, body, carry
    )
    rad = rad + jnp.where(alive[:, None], thr * scene.environment[None, :], 0.0)
    if alive0 is not None:
        rad = jnp.where(alive0[:, None], rad, 0.0)
    return gacc, rad, touched


def prb_grad_compacted(
    scene, ro, rd, key, max_depth, rad_total, g,
    *, stage_bounces: int = 4, chunk_div: int | None = None,
    alive0=None, ids0=None, accumulate=True,
):
    """Replay of integrator.trace_compacted's staged compaction
    schedule, accumulating gradients.  Uniforms are keyed by (ray id,
    bounce), so the replayed paths are identical to the forward's no
    matter the layout; tests assert the replayed radiance equals the
    forward output bit-for-bit.

    ``alive0`` restricts the replay to a subset of rays (the scalar
    tangent pass runs only on rays that can reach a metal/dielectric);
    the wavefront is then compacted immediately, so the excluded rays
    cost one sort and nothing more.  ``ids0`` supplies the rays'
    ORIGINAL ids (a gathered subset keeps its original uniforms — the
    RNG is layout-invariant).  Returns ((gcol, gimg_planar, gmet),
    replayed_rad, touched) with rad/touched in input row order.
    """
    from ray_tracing_tpu.render.integrator import default_chunk_div

    n = ro.shape[0]
    if chunk_div is None:
        chunk_div = default_chunk_div(n)
    chunk = n // chunk_div
    assert chunk * chunk_div == n

    rad = jnp.zeros((n, 3), jnp.float32)
    thr = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool) if alive0 is None else alive0
    ids = jnp.arange(n, dtype=jnp.int32) if ids0 is None else ids0
    pos = jnp.arange(n, dtype=jnp.int32)  # sorted position -> input row
    touched = jnp.zeros((n,), jnp.int32)
    gacc = _zero_grads(scene) if accumulate else _empty_grads()

    from ray_tracing_tpu.render.integrator import (
        bounded_bounce_loop,
        stage_schedule,
    )

    offset = 0
    for stage, bounces in enumerate(stage_schedule(max_depth, stage_bounces)):
        if stage == 0 and alive0 is None:
            # full-width warm stage (everything is alive anyway)
            def body0(b, c, _offset=offset):
                return _prb_bounce(scene, key, _offset + b, c,
                                   accumulate=accumulate)

            rad, thr, ro, rd, alive, ids, touched, gacc, g, rad_total = (
                jax.lax.fori_loop(
                    0, bounces, body0,
                    (rad, thr, ro, rd, alive, ids, touched, gacc, g,
                     rad_total),
                )
            )
            offset += bounces
            continue

        from ray_tracing_tpu.render.integrator import compact_wavefront

        alive, (rad, thr, ro, rd, g, rad_total), (ids, pos, touched) = (
            compact_wavefront(
                alive, [rad, thr, ro, rd, g, rad_total],
                [ids, pos, touched],
            )
        )
        alive_count = jnp.sum(alive.astype(jnp.int32))

        def chunk_body(state, _offset=offset):
            ci, rad, thr, ro, rd, alive, ids, touched, gacc, g, rt = state
            start = ci * chunk
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, chunk)
            c_carry = (
                sl(rad), sl(thr), sl(ro), sl(rd), sl(alive), sl(ids),
                sl(touched), gacc, sl(g), sl(rt),
            )

            def bodyc(b, c):
                return _prb_bounce(scene, key, _offset + b, c,
                                   accumulate=accumulate)

            (c_rad, c_thr, c_ro, c_rd, c_alive, c_ids, c_touched, gacc2,
             _, _) = bounded_bounce_loop(
                bounces, bodyc, c_carry, lambda c: c[4]
            )
            upd = lambda x, v: jax.lax.dynamic_update_slice_in_dim(x, v, start, 0)
            return (
                ci + 1,
                upd(rad, c_rad), upd(thr, c_thr), upd(ro, c_ro),
                upd(rd, c_rd), upd(alive, c_alive), upd(ids, c_ids),
                upd(touched, c_touched), gacc2, g, rt,
            )

        def chunk_cond(state):
            return state[0] * chunk < alive_count

        _, rad, thr, ro, rd, alive, ids, touched, gacc, g, rad_total = (
            jax.lax.while_loop(
                chunk_cond, chunk_body,
                (jnp.int32(0), rad, thr, ro, rd, alive, ids, touched, gacc,
                 g, rad_total),
            )
        )
        offset += bounces

    rad = rad + jnp.where(alive[:, None], thr * scene.environment[None, :], 0.0)
    from ray_tracing_tpu.render.integrator import unsort_wavefront

    (rad_out,), (touched_out,) = unsort_wavefront(pos, [rad], [touched])
    return gacc, rad_out, touched_out


def prb_radiance_full(
    params: PrbParams,
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    *,
    compaction: bool = True,
    ids_base=0,
):
    """Per-ray radiance, differentiable w.r.t. every color-linear
    parameter (solid colors, atlas texels, metal albedo) via path-replay
    backprop.

    Forward may use the compacted loop (AD could not); backward costs
    one replayed forward.  Rays/key/scene may be tracers of an enclosing
    transformation — a lax.map over tiles, or a shard_map body (the
    multi-chip path); only ``params`` receives a real cotangent.

    Thin façade over :func:`prb_scalar.prb_radiance_all` with the scalar
    tangent replay disabled (``scalar_rows=((), ())`` — no concrete
    scene needed, so traced scenes stay supported); fuzz/IR enter
    stop_gradient'ed and their zero cotangents are dropped by the chain
    rule.
    """
    from ray_tracing_tpu.render.prb_scalar import AllParams, prb_radiance_all

    full = AllParams(
        color=params.color,
        images=params.images,
        metal_albedo=params.metal_albedo,
        fuzz=jax.lax.stop_gradient(scene.materials.fuzz),
        ir=jax.lax.stop_gradient(scene.materials.ir),
    )
    return prb_radiance_all(
        full, scene, ro, rd, key, max_depth,
        compaction=compaction, scalar_rows=((), ()), ids_base=ids_base,
    )


def prb_radiance(
    colors: jnp.ndarray,
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    *,
    compaction: bool = True,
    ids_base=0,
):
    """Colors-only convenience wrapper over ``prb_radiance_full`` (the
    texel/metal cotangents fall out of the same replay and are simply
    dropped by the chain rule)."""
    params = PrbParams(
        colors, scene.textures.images, scene.materials.albedo
    )
    return prb_radiance_full(
        params, scene, ro, rd, key, max_depth, compaction=compaction,
        ids_base=ids_base,
    )
