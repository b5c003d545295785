"""Forward-mode gradients for the scalar material parameters.

The color-linear parameters (solid colors, atlas texels, metal albedo)
get exact reverse-mode gradients from one path replay (render/prb.py).
The two *scalar* parameters — metal fuzz and dielectric refraction
index (reference metal.rs:31-46, dielectric.rs:39-50) — are different
in kind: they bend the scattered *direction* rather than scale the
throughput, so their derivative flows through every downstream
intersection and no linearity trick applies.

The TPU-native answer is forward-mode AD.  A JVP needs no transpose, so
— unlike reverse-mode — it differentiates straight through the
compacted trace's dynamic-trip-count ``while_loop``; the fast forward
path stays usable.  The full backward is: (1) color-linear gradients
from the PRB tape sweep (render/prb_tape.py; or the path replay,
render/prb.py, on the AD surface), whose forward also reports which
rays' paths reach a metal/dielectric at all; (2) a radiance-only
tangent replay over just those *touched* rays (exactly-zero fuzz/IR
derivative otherwise; ~2% on zy), gathered to static cap-sized batches
inside a cond-free while_loop — uniforms are keyed by (ray id,
bounce), so a gathered subset replays its paths bit-exactly — with
``jax.jacfwd`` pushing one batched tangent per active scalar (one fuzz
per metal row, one IR per dielectric row).  The dielectric's
stochastic reflect/refract branch is treated as fixed under
differentiation (reparameterized gradient; the branch-probability term
is dropped) — identical to what reverse-mode AD of the dense loop
computes, so the two agree to float tolerance.

``prb_radiance_all`` is the AD-surface entry point (custom_vjp);
``prb_loss_and_grad_all`` is the direct taped fast path (loss value +
full-parameter gradients in one traversal plus the tangent batches),
with a ``defer_scalars`` protocol for tiled callers to run ONE global
tangent pass via :func:`scalar_tangent_pass`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu.models.scene import (
    MAT_DIELECTRIC,
    MAT_METAL,
    SceneData,
)
from ray_tracing_tpu.render.integrator import trace, trace_compacted
from ray_tracing_tpu.render.prb import (
    PrbParams,
    prb_grad_compacted,
    prb_grad_dense,
    zero_cotangent,
)


class ScalarParams(NamedTuple):
    """The direction-bending scalar parameter set."""

    fuzz: jnp.ndarray  # (M,) = scene.materials.fuzz
    ir: jnp.ndarray  # (M,) = scene.materials.ir


class AllParams(NamedTuple):
    """Every differentiable scene parameter, in one pytree."""

    color: jnp.ndarray  # (T, 3) solid-color table
    images: jnp.ndarray  # (I, H, W, 3) texture atlas
    metal_albedo: jnp.ndarray  # (M, 3)
    fuzz: jnp.ndarray  # (M,)
    ir: jnp.ndarray  # (M,)


def params_of(scene: SceneData) -> AllParams:
    """The current parameter values of a compiled scene."""
    return AllParams(
        color=scene.textures.color,
        images=scene.textures.images,
        metal_albedo=scene.materials.albedo,
        fuzz=scene.materials.fuzz,
        ir=scene.materials.ir,
    )


def _with_all(scene: SceneData, p: AllParams) -> SceneData:
    return scene.replace(
        textures=scene.textures.replace(color=p.color, images=p.images),
        materials=scene.materials.replace(
            albedo=p.metal_albedo, fuzz=p.fuzz, ir=p.ir
        ),
    )


def _active_rows(scene: SceneData):
    """Material rows whose fuzz / ir actually matter (metal / dielectric
    rows).  Needs concrete material types: the scene must be a real
    compiled scene, not a tracer.  When the scene itself is a traced
    operand (a shard_map body — parallel/mesh.py passes the scene as an
    operand precisely so no tracer escapes), pass the concrete template
    scene as ``static_scene`` / ``scalar_rows`` instead."""
    try:
        mtype = np.asarray(scene.materials.mtype)
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError) as e:
        raise ValueError(
            "prb_radiance_all: the scene is a tracer, so the active "
            "scalar-parameter rows (metal fuzz / dielectric IR) cannot "
            "be read from it.  Pass the concrete compiled scene as "
            "static_scene=, or precomputed row indices as scalar_rows=."
        ) from e
    return (
        np.nonzero(mtype == MAT_METAL)[0],
        np.nonzero(mtype == MAT_DIELECTRIC)[0],
    )


def _resolve_scalar_rows(scene, static_scene, scalar_rows):
    """Concrete (fuzz_rows, ir_rows) as int32 NUMPY arrays (jnp.asarray
    with a dtype cast runs a traced convert_element_type, so calling
    this inside a lax.map / shard_map body would bake that trace's
    tracer into a later-traced closure; numpy indices are always
    concrete)."""
    if scalar_rows is not None:
        fuzz_rows, ir_rows = scalar_rows
    else:
        fuzz_rows, ir_rows = _active_rows(
            scene if static_scene is None else static_scene
        )
    return np.asarray(fuzz_rows, np.int32), np.asarray(ir_rows, np.int32)


def _tangent_batches(
    scene_of, theta0, mask, ro, rd, key, max_depth, rad, g,
    *, compaction, tangent_cap, tangent_chunk_div, ids_base,
):
    """d(vdot(g, rad)) / d(theta) restricted to rays where ``mask`` is
    set, via cap-sized forward-tangent batch replays.  The masked rays
    are sorted to the front and the tangent replay runs on STATIC
    cap-ray batches inside a while_loop: normally ONE iteration, ZERO
    when nothing is masked, and extra exact batches if the count ever
    exceeds the cap — no lax.cond fallback to a full-width replay (the
    cond alone cost ~15 ms/tile at 1024²: its giant dead branch
    blocked fusion around pass 2)."""
    replay_fn = prb_grad_compacted if compaction else prb_grad_dense
    n = ro.shape[0]
    # static batch size: n/8 with the replay's default chunk division
    # (production interleave at 1024²: 147 ms marginal vs 174-210 for
    # smaller caps / chunk_div=1 — an ISOLATED pass-2 microbench said
    # the opposite; fusion context flips it, trust only the production
    # interleave), at least 256 rays, never more than n, and a
    # multiple of 8 so the replay's chunk division is exact
    cap = tangent_cap if tangent_cap else max(256, n // 8)
    cap = min(n, cap)
    cap -= cap % 8
    if cap <= 0:
        cap = n

    count = jnp.sum(mask.astype(jnp.int32))
    # compact masked rays to the front.  argsort + prefix-gather beats
    # jnp.nonzero(size=cap) here: the nonzero lowering scatters and
    # measured ~100 ms/pass slower at 1024².
    order = jnp.argsort(~mask, stable=True)

    import os as _os

    lean = compaction and _os.environ.get("RAY_TPU_LEAN_TANGENT", "1") != "0"
    # one packed (n, 9) row gather per batch instead of three (n, 3)
    # gathers — random-index gathers ride the scalar core and bill per
    # LOOKUP, so fusing columns is ~3x fewer lookups (same trick as
    # tape_sweep's [g | rad_total] gather)
    fuse_gather = _os.environ.get("RAY_TPU_TANGENT_GATHER", "fused") != "split"
    rog = jnp.concatenate([ro, rd, g], axis=1) if fuse_gather else None

    def batch_val(theta, start):
        # dynamic_slice CLAMPS an out-of-range start to n - cap, so
        # compute the clamped window explicitly and mask each row by
        # its GLOBAL position: rows before ``start`` were processed
        # by an earlier batch, rows at/after ``count`` are fill.
        # (Without this, a final partial batch double-counted the
        # overlap and dropped the tail — wrong fuzz/IR gradients
        # whenever cap did not divide the touched prefix.)
        st = jnp.minimum(start, jnp.int32(n - cap))
        sub = jax.lax.dynamic_slice_in_dim(order, st, cap)
        if fuse_gather:
            row = rog[sub]
            ro_s, rd_s, g_s = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        else:
            ro_s, rd_s, g_s = ro[sub], rd[sub], g[sub]
        pos = st + jnp.arange(cap, dtype=jnp.int32)
        alive_s = (pos >= start) & (pos < count)

        if lean:
            # minimal compacted replay: only the vdot(g, rad) scalar is
            # needed under jacfwd, so skip the PRB replay's g/rad_total/
            # touched/gacc carries entirely (integrator.trace_subset_dot)
            from ray_tracing_tpu.render.integrator import trace_subset_dot

            kw = {"chunk_div": tangent_chunk_div} if tangent_chunk_div else {}
            return trace_subset_dot(
                scene_of(theta), ro_s, rd_s, key, max_depth,
                g_s, alive_s, ids_base + sub, **kw,
            )

        rad_s = rad[sub]
        # default chunk division (the dense replay has none)
        kw = (
            {"chunk_div": tangent_chunk_div}
            if compaction and tangent_chunk_div
            else {}
        )
        _, rad_t, _ = replay_fn(
            scene_of(theta), ro_s, rd_s, key, max_depth,
            rad_s, g_s, alive0=alive_s, ids0=ids_base + sub,
            accumulate=False, **kw,
        )
        return jnp.vdot(g_s, rad_t)

    def batch_body(state):
        start, acc = state
        gth = jax.jacfwd(batch_val)(theta0, start)
        return start + cap, acc + gth

    _, gtheta = jax.lax.while_loop(
        lambda s: s[0] < count, batch_body,
        (jnp.int32(0), jnp.zeros_like(theta0)),
    )
    return gtheta


def _scalar_tangent_pass(
    p: AllParams,
    sc: SceneData,
    ro, rd, key, max_depth, rad, g, touched,
    *,
    compaction, fuzz_rows_j, ir_rows_j,
    tangent_cap=None, tangent_chunk_div=None, ids_base=0,
):
    """Pass 2 — scalar tangents on the touched subset only.  A path
    that never hits a metal/dielectric has EXACTLY zero fuzz/IR
    derivative, and uniforms are keyed by (ray id, bounce), so a
    GATHERED subset replays its paths bit-exactly.

    ``touched`` is the replay/tape bitmask (1 = path reached a metal,
    2 — a dielectric; a plain bool mask is accepted as "both").  The
    two scalar FAMILIES batch independently over THEIR rays only
    (round 5): on zy at 1024² the metal- and dielectric-touching sets
    are ~5.5% each and nearly disjoint, so two 1-tangent passes over
    ~57k rays each beat one 2-tangent pass over the ~113k-ray union —
    the tangent-stream work drops by ~S×/families.

    Returns (gfuzz (M,), gir (M,))."""
    if touched.dtype == jnp.bool_:
        touched = jnp.where(touched, 3, 0)
    gfuzz = jnp.zeros_like(p.fuzz)
    gir = jnp.zeros_like(p.ir)
    common = dict(
        compaction=compaction, tangent_cap=tangent_cap,
        tangent_chunk_div=tangent_chunk_div, ids_base=ids_base,
    )
    if len(fuzz_rows_j):
        def scene_of_fuzz(theta):
            return _with_all(
                sc, p._replace(fuzz=p.fuzz.at[fuzz_rows_j].set(theta))
            )

        gth = _tangent_batches(
            scene_of_fuzz, p.fuzz[fuzz_rows_j], (touched & 1) != 0,
            ro, rd, key, max_depth, rad, g, **common,
        )
        gfuzz = gfuzz.at[fuzz_rows_j].set(gth)
    if len(ir_rows_j):
        def scene_of_ir(theta):
            return _with_all(
                sc, p._replace(ir=p.ir.at[ir_rows_j].set(theta))
            )

        gth = _tangent_batches(
            scene_of_ir, p.ir[ir_rows_j], (touched & 2) != 0,
            ro, rd, key, max_depth, rad, g, **common,
        )
        gir = gir.at[ir_rows_j].set(gth)
    return gfuzz, gir


def _assemble_grads(
    p: AllParams, gacc, gfuzz, gir, planar_images: bool = False
) -> AllParams:
    """(gcol, gimg_planar, gmet) + scalars -> AllParams cotangent.

    ``planar_images`` keeps the image gradient in the scatter kernel's
    channel-planar ``(3, rows, 128)`` layout instead of converting to
    the atlas shape — tiled callers summing many tile gradients convert
    ONCE at the end (``image_grads_from_planar``); the per-tile
    transpose of the ~6 MB table was real time (docs/PERFORMANCE.md)."""
    from ray_tracing_tpu.ops.pallas_scatter import from_planar

    gcol, gimg, gmet = gacc
    if planar_images:
        gimg_out = gimg
    elif p.images.size:
        gimg_out = from_planar(
            gimg, int(np.prod(p.images.shape[:3]))
        ).reshape(p.images.shape)
    else:
        gimg_out = jnp.zeros_like(p.images)
    return AllParams(
        color=gcol,
        images=gimg_out,
        metal_albedo=gmet,
        fuzz=gfuzz,
        ir=gir,
    )


def image_grads_from_planar(gimg_planar, images_shape) -> jnp.ndarray:
    """Convert a (summed) planar image-gradient table back to the atlas
    shape — the single end-of-pass counterpart of
    ``_assemble_grads(planar_images=True)``."""
    from ray_tracing_tpu.ops.pallas_scatter import from_planar

    p = int(np.prod(images_shape[:3]))
    if p == 0:
        return jnp.zeros(images_shape, jnp.float32)
    return from_planar(gimg_planar, p).reshape(images_shape)


def _prb_backward(
    p: AllParams,
    sc: SceneData,
    ro, rd, key, max_depth, rad, g,
    *,
    compaction, fuzz_rows_j, ir_rows_j,
    tangent_cap=None, tangent_chunk_div=None, ids_base=0,
) -> AllParams:
    """The full-parameter PRB backward: one accumulating color replay
    (pass 1) + the batched scalar tangent pass (pass 2).  Shared by the
    custom_vjp surface (prb_radiance_all) and the direct
    value-and-grad entry point (prb_loss_and_grad_all); ``rad`` is the
    forward radiance and ``g`` the per-ray loss cotangent."""
    replay_fn = prb_grad_compacted if compaction else prb_grad_dense

    # Pass 1 — primal replay over all rays: the PRB prefix sums
    # produce every color-linear gradient, and the bounce loop also
    # reports which rays' paths reach a metal / dielectric at all.
    # ids_base may be TRACED (a shard_map axis index), so always build
    # the explicit ids (base 0 reproduces the default arange exactly).
    ids0 = ids_base + jnp.arange(ro.shape[0], dtype=jnp.int32)
    gacc, rad_replay, touched = replay_fn(
        _with_all(sc, p), ro, rd, key, max_depth, rad, g, ids0=ids0
    )
    gfuzz, gir = _scalar_tangent_pass(
        p, sc, ro, rd, key, max_depth, rad, g, touched,
        compaction=compaction, fuzz_rows_j=fuzz_rows_j,
        ir_rows_j=ir_rows_j, tangent_cap=tangent_cap,
        tangent_chunk_div=tangent_chunk_div, ids_base=ids_base,
    )
    return _assemble_grads(p, gacc, gfuzz, gir)


def prb_radiance_all(
    params: AllParams,
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    *,
    compaction: bool = True,
    static_scene: SceneData | None = None,
    scalar_rows: tuple | None = None,
    tangent_cap: int | None = None,
    tangent_chunk_div: int | None = None,
    ids_base=0,
):
    """Per-ray radiance, differentiable w.r.t. the full parameter set.

    Backward = one reverse path replay (color-linear parameters, exact)
    plus one forward tangent replay per active scalar parameter.  The
    compacted loop is used throughout when ``compaction`` is on; nothing
    ever falls back to dense reverse-mode AD.

    The active scalar rows (which material rows carry a fuzz / IR
    tangent) must be CONCRETE — they set traced shapes.  By default they
    are read from ``scene``; when ``scene`` is itself a traced operand
    (a shard_map body), pass the concrete compiled scene as
    ``static_scene`` or the row indices as ``scalar_rows=(fuzz_rows,
    ir_rows)`` (``((), ())`` disables the scalar tangent replay
    entirely — what :func:`~ray_tracing_tpu.render.prb.prb_radiance_full`
    does for the color-linear-only surface).
    """
    # concrete numpy row indices: bwd is traced later (scan transpose)
    # and a traced cast here would leak a tracer into its closure
    fuzz_rows_j, ir_rows_j = _resolve_scalar_rows(
        scene, static_scene, scalar_rows
    )

    # keys ride through the custom_vjp as raw key_data (an extended
    # dtype can't take a float0 cotangent); the impl is a static python
    # value closed over so non-default PRNGs (rbg, unsafe_rbg) rewrap
    # correctly on both sides
    key_impl = jax.random.key_impl(key)

    def run_fwd(p, sc, ro, rd, keydata, base):
        k = jax.random.wrap_key_data(keydata, impl=key_impl)
        s = _with_all(sc, p)
        if compaction:
            return trace_compacted(s, ro, rd, k, max_depth, ids_base=base)
        return trace(s, ro, rd, k, max_depth, ids_base=base)

    # the scene passes through the custom_vjp as an explicit input with
    # zero cotangents so it may be a tracer of an enclosing shard_map /
    # lax.map (only the static row indices come from the concrete
    # scene); ids_base rides as an operand too — a traced shard index
    # closed over would leak when bwd is traced later (scan transpose)
    @jax.custom_vjp
    def inner(p, sc, ro, rd, keydata, base):
        return run_fwd(p, sc, ro, rd, keydata, base)

    def fwd(p, sc, ro, rd, keydata, base):
        rad = run_fwd(p, sc, ro, rd, keydata, base)
        return rad, (p, sc, ro, rd, keydata, base, rad)

    def bwd(res, g):
        p, sc, ro, rd, keydata, base, rad = res
        k = jax.random.wrap_key_data(keydata, impl=key_impl)
        gparams = _prb_backward(
            p, sc, ro, rd, k, max_depth, rad, g,
            compaction=compaction, fuzz_rows_j=fuzz_rows_j,
            ir_rows_j=ir_rows_j, tangent_cap=tangent_cap,
            tangent_chunk_div=tangent_chunk_div, ids_base=base,
        )
        return (
            gparams,
            zero_cotangent(sc),
            jnp.zeros_like(ro),
            jnp.zeros_like(rd),
            # key_data shape depends on the PRNG impl (threefry (2,),
            # rbg (4,)) — mirror the primal, don't hardcode
            np.zeros(jnp.shape(keydata), jax.dtypes.float0),
            np.zeros((), jax.dtypes.float0),
        )

    inner.defvjp(fwd, bwd)
    return inner(
        params, scene, ro, rd, jax.random.key_data(key),
        jnp.asarray(ids_base, jnp.int32),
    )


def prb_loss_and_grad_all(
    loss_fn,
    params: AllParams,
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    *,
    compaction: bool = True,
    static_scene: SceneData | None = None,
    scalar_rows: tuple | None = None,
    tangent_cap: int | None = None,
    tangent_chunk_div: int | None = None,
    use_tape: bool = True,
    ids_base: int = 0,
    defer_scalars: bool = False,
    planar_images: bool = False,
):
    """Loss value + full-parameter gradient with NO AD graph over the
    renderer — the fast path for fits whose loss is a cheap function of
    the per-ray radiance (L2 to a target image, mean brightness, ...).

    ``loss_fn(rad) -> scalar array`` is differentiated on its own (one
    tiny vjp over the (N, 3) radiance); the renderer gradient is the
    PRB backward invoked directly.  With ``use_tape`` (default, the
    compacted path), the forward itself writes the PRB tape and the
    color gradients come from a traversal-free sweep
    (render/prb_tape.py) — fwd + colors-bwd costs ONE traversal total.
    Otherwise (or with ``compaction=False``) the backward re-traces
    via the path replay.  Either way the result is numerically
    identical to
    ``jax.value_and_grad(lambda p: loss_fn(prb_radiance_all(p, ...)))``
    (tests assert equality) minus the custom_vjp residual plumbing and
    the enclosing map/scan transpose (those alone measured 76 ms/pass
    at 1024² on TPU).

    Returns ``(loss, grads: AllParams)``.  Composes with lax.map /
    shard_map over ray tiles exactly like prb_radiance_all; for a
    decomposable loss the per-tile losses and grads simply sum.

    ``ids_base`` offsets the per-ray RNG ids (see integrator.trace):
    tiles of a larger wavefront traced under ONE key with globally
    unique ids form a single logical wavefront.  With
    ``defer_scalars``, the fuzz/IR tangent pass is SKIPPED and the
    per-ray facts it needs are returned instead — callers tiling with
    ids_base run :func:`scalar_tangent_pass` ONCE over the gathered
    full wavefront (one argsort + one batch instead of per-tile
    sorts), and the return becomes ``(loss, grads, (rad, g,
    touched))`` with grads.fuzz/ir zero.
    """
    fuzz_rows_j, ir_rows_j = _resolve_scalar_rows(
        scene, static_scene, scalar_rows
    )
    s = _with_all(scene, params)
    if compaction and use_tape:
        from ray_tracing_tpu.render.prb_tape import tape_sweep, trace_taped

        rad, touched, tape = trace_taped(
            s, ro, rd, key, max_depth, ids_base=ids_base
        )
        loss, pull = jax.vjp(loss_fn, rad)
        (g,) = pull(jnp.ones_like(loss))
        gacc = tape_sweep(s, tape, rad, g, max_depth)
        if defer_scalars:
            gz = _assemble_grads(
                params, gacc, jnp.zeros_like(params.fuzz),
                jnp.zeros_like(params.ir), planar_images=planar_images,
            )
            return loss, gz, (rad, g, touched)
        gfuzz, gir = _scalar_tangent_pass(
            params, scene, ro, rd, key, max_depth, rad, g, touched,
            compaction=True, fuzz_rows_j=fuzz_rows_j,
            ir_rows_j=ir_rows_j, tangent_cap=tangent_cap,
            tangent_chunk_div=tangent_chunk_div, ids_base=ids_base,
        )
        return loss, _assemble_grads(params, gacc, gfuzz, gir,
                                     planar_images=planar_images)
    if compaction:
        rad = trace_compacted(s, ro, rd, key, max_depth, ids_base=ids_base)
    else:
        rad = trace(s, ro, rd, key, max_depth, ids_base=ids_base)
    loss, pull = jax.vjp(loss_fn, rad)
    (g,) = pull(jnp.ones_like(loss))
    if defer_scalars:
        replay_fn = prb_grad_compacted if compaction else prb_grad_dense
        kw = {"ids0": ids_base + jnp.arange(ro.shape[0], dtype=jnp.int32)}
        gacc, _, touched = replay_fn(
            _with_all(scene, params), ro, rd, key, max_depth, rad, g, **kw
        )
        gz = _assemble_grads(
            params, gacc, jnp.zeros_like(params.fuzz),
            jnp.zeros_like(params.ir), planar_images=planar_images,
        )
        return loss, gz, (rad, g, touched)
    gparams = _prb_backward(
        params, scene, ro, rd, key, max_depth, rad, g,
        compaction=compaction, fuzz_rows_j=fuzz_rows_j,
        ir_rows_j=ir_rows_j, tangent_cap=tangent_cap,
        tangent_chunk_div=tangent_chunk_div, ids_base=ids_base,
    )
    return loss, gparams


def scalar_tangent_pass(
    params: AllParams,
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    rad: jnp.ndarray,
    g: jnp.ndarray,
    touched: jnp.ndarray,
    *,
    compaction: bool = True,
    static_scene: SceneData | None = None,
    scalar_rows: tuple | None = None,
    tangent_cap: int | None = None,
    tangent_chunk_div: int | None = None,
    ids_base: int = 0,
):
    """The fuzz/IR forward-tangent pass as a standalone call: returns
    ``(gfuzz, gir)`` from the forward's (rad, g, touched) — the second
    half of :func:`prb_loss_and_grad_all`'s ``defer_scalars`` protocol.
    ``ro``/``rd``/``rad``/``g``/``touched`` may be the CONCATENATION of
    several tiles that were traced under one key with ``ids_base``
    offsets (pass the full wavefront's base, normally 0): uniforms are
    keyed by absolute ray id, so a gathered cross-tile subset replays
    its paths bit-exactly."""
    fuzz_rows_j, ir_rows_j = _resolve_scalar_rows(
        scene, static_scene, scalar_rows
    )
    return _scalar_tangent_pass(
        params, scene, ro, rd, key, max_depth, rad, g, touched,
        compaction=compaction, fuzz_rows_j=fuzz_rows_j,
        ir_rows_j=ir_rows_j, tangent_cap=tangent_cap,
        tangent_chunk_div=tangent_chunk_div, ids_base=ids_base,
    )


def scalar_radiance(
    params: ScalarParams,
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    *,
    compaction: bool = True,
):
    """Scalars-only convenience wrapper over ``prb_radiance_all``."""
    full = params_of(scene)._replace(fuzz=params.fuzz, ir=params.ir)

    rad = prb_radiance_all(
        full, scene, ro, rd, key, max_depth, compaction=compaction
    )
    return rad
