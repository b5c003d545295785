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
are keyed by **(ray id, global bounce index)** — NOT by the ray's
position in the wavefront — so a ray's path is identical no matter how
the wavefront is laid out.  Compaction (sorting rays alive-first and
bouncing only live chunks) therefore produces BIT-IDENTICAL radiance to
the dense loop, renders are reproducible, and the PRB replay can walk
any layout of the same rays.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ray_tracing_tpu.models.scene import SceneData
from ray_tracing_tpu.ops.geometry import EPSILON, INF
from ray_tracing_tpu.ops.intersect import intersect_scene
from ray_tracing_tpu.ops.materials import N_SCATTER_U, shade
from ray_tracing_tpu.ops.rng import ray_uniforms
# ray_uniforms is used by _bounce below AND re-exported: the PRB replays
# import it from here.  Canonical home: ops/rng.py.


def _shutter_times(scene: SceneData, key, ids):
    """Per-ray shutter times for motion-blur scenes, id-keyed so no
    carry is needed (ops/rng.ray_time); None when nothing moves.

    Ray-level entry points (trace, prb_*) read whatever
    ``scene.shutter`` the caller set; camera-having entry points stamp
    it (models/camera.stamp_shutter).  A motion scene with NO shutter
    set is almost always a caller forgetting the stamp — e.g. fitting
    a frozen forward against motion-blurred targets — so it warns
    (once per trace) before defaulting to the frozen t=0 window."""
    if not scene.has_motion:
        return None
    from ray_tracing_tpu.ops.rng import ray_time

    if scene.shutter is None:
        import warnings

        warnings.warn(
            "scene has moving spheres but scene.shutter is None: rays "
            "are traced at the frozen t=0 position.  Stamp the camera "
            "window first (models/camera.stamp_shutter) or set "
            "scene.shutter explicitly.",
            stacklevel=3,
        )
    shutter = (
        scene.shutter
        if scene.shutter is not None
        else jnp.zeros((2,), jnp.float32)
    )
    return ray_time(key, ids, shutter)


def _bounce(scene: SceneData, key, bounce, carry, count_segments=True,
            hint_slot=None):
    """One wavefront bounce: intersect, emit/background, scatter.
    carry = (rad, thr, ro, rd, alive, ids, segments[, hrows]); uniforms
    keyed by (ids, bounce) via :func:`ray_uniforms`.  ``count_segments``
    (static) gates the per-bounce live-lane sum: a scalar reduction
    inside the fused bounce body measured ~38 ms/pass at 1024² on TPU,
    so it runs only when the caller asked for stats.  ``hint_slot``
    (static presence, traced value): when not None the carry ends with
    a per-bounce i32 hint row written at that slot — see
    trace_compacted's fusion_hint."""
    if hint_slot is not None:
        rad, thr, ro, rd, alive, ids, segments, hrows = carry
    else:
        rad, thr, ro, rd, alive, ids, segments = carry
    if count_segments:
        segments = segments + jnp.sum(alive.astype(jnp.float32))
    n_med = scene.n_medium
    u_all = ray_uniforms(key, ids, bounce, N_SCATTER_U + n_med)
    med_u = u_all[:, N_SCATTER_U:] if n_med > 0 else None
    t_ray = _shutter_times(scene, key, ids)
    hit = intersect_scene(scene, ro, rd, EPSILON, INF, med_u, t_ray)
    found = alive & hit.mask
    miss = alive & ~hit.mask

    rad = rad + jnp.where(miss[:, None], thr * scene.background[None, :], 0.0)
    u = u_all[:, :N_SCATTER_U]
    em, sc = shade(scene, hit, rd, u)
    rad = rad + jnp.where(found[:, None], thr * em, 0.0)
    new_alive = found & sc.scattered
    thr = jnp.where(new_alive[:, None], thr * sc.coef, thr)
    ro = jnp.where(found[:, None], hit.p, ro)
    rd = jnp.where(new_alive[:, None], sc.direction, rd)
    if hint_slot is not None:
        flags = found.astype(jnp.int32) | (new_alive.astype(jnp.int32) << 1)
        hrows = jax.lax.dynamic_update_index_in_dim(
            hrows, flags, hint_slot, 0
        )
        return rad, thr, ro, rd, new_alive, ids, segments, hrows
    return rad, thr, ro, rd, new_alive, ids, segments


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
    ids_base: int = 0,
) -> jnp.ndarray:
    """Trace a wavefront to completion; returns (N, 3) linear radiance.

    remat: rematerialize each bounce in the backward pass
    (``jax.checkpoint``) so reverse-mode AD stores only the O(N) bounce
    state instead of the O(N x P) candidate grids — the standard
    FLOPs-for-HBM trade for differentiable rendering at full depth.
    with_stats: also return the total number of ray segments traced
    (sum over bounces of live rays), the honest numerator for rays/s.
    ids_base: offset added to the per-ray RNG ids — a caller tiling a
    larger wavefront can give every tile globally unique ids under ONE
    key, which makes the whole image a single logical wavefront
    (replays may then gather rays across tile boundaries).
    """
    n = ro.shape[0]
    rad = jnp.zeros((n, 3), dtype=jnp.float32)
    thr = jnp.ones((n, 3), dtype=jnp.float32)
    alive = jnp.ones((n,), dtype=bool)
    ids = ids_base + jnp.arange(n, dtype=jnp.int32)
    segments = jnp.zeros((), dtype=jnp.float32)

    def body(bounce, carry):
        return _bounce(scene, key, bounce, carry, count_segments=with_stats)

    if remat:
        body = jax.checkpoint(body, static_argnums=())

    init = (rad, thr, ro, rd, alive, ids, segments)
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

        _, (rad, thr, ro, rd, alive, ids, segments) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), init)
        )
    else:
        rad, thr, ro, rd, alive, ids, segments = jax.lax.fori_loop(
            0, max_depth, body, init
        )
    # depth exhausted -> environment (reference renderer.rs:128-130)
    rad = rad + jnp.where(alive[:, None], thr * scene.environment[None, :], 0.0)
    if with_stats:
        return rad, segments
    return rad


def compact_wavefront(alive, fmats, ivecs, mode: str | None = None):
    """Stable alive-first partition of the wavefront state.

    ``fmats``: f32 arrays of shape (n,) or (n, k); ``ivecs``: (n,)
    int32 / bool arrays (``alive`` itself is passed separately and
    returned first).  Every mode applies the SAME permutation — the
    stable partition by ``~alive`` is unique — so the outputs are
    bit-identical across modes; the mode is purely an execution
    strategy (like compaction itself):

    * ``gather``: ``argsort(~alive)`` + one gather per array (the
      round-2..5 form).
    * ``fused``: same argsort, but ALL columns are packed (ints
      bitcast, not converted) into one (n, K) f32 matrix and permuted
      with ONE row gather.  Random-index gathers ride the TPU scalar
      core (~2 ms per 64k lookups, CLAUDE.md hazard 4), so one gather
      of 64-byte rows beats ~16 gathers of 4-byte scalars — the same
      trick as tape_sweep's fused ``[g | rad_total]`` gather.
    * ``sort``: one variadic ``lax.sort`` moving every column through
      the sorting network alongside the key.

    Default: ``RAY_TPU_COMPACT`` env var, else ``sort`` — the
    interleaved whole-pass A/B on TPU v5e at 1024² measured 251.7
    (sort) vs 288.4 (fused) vs 297.9 (gather) ms/pass full-parameter
    fwd+bwd: a bool-keyed variadic sort beats argsort + scalar-core
    gathers outright (docs/PERFORMANCE.md).

    Returns ``(alive_sorted, fmats_sorted, ivecs_sorted)``.
    """
    if mode is None:
        mode = os.environ.get("RAY_TPU_COMPACT", "sort")
    key = ~alive
    if mode == "sort":
        cols = []
        splits = []  # (kind, ncols, orig_shape/dtype info)
        for f in fmats:
            f2 = f.reshape(f.shape[0], -1)
            splits.append(("f", f2.shape[1], f.shape))
            cols.extend(f2[:, j] for j in range(f2.shape[1]))
        for v in ivecs:
            splits.append(("i", 1, v.dtype))
            cols.append(v)
        out = jax.lax.sort((key, alive) + tuple(cols), num_keys=1,
                           is_stable=True)
        alive_s = out[1]
        rest = list(out[2:])
        fout, iout = [], []
        for kind, ncols, info in splits:
            if kind == "f":
                taken, rest = rest[:ncols], rest[ncols:]
                fout.append(jnp.stack(taken, axis=1).reshape(info))
            else:
                iout.append(rest.pop(0))
        return alive_s, fout, iout
    order = jnp.argsort(key, stable=True)
    if mode == "gather":
        return (
            alive[order],
            [f[order] for f in fmats],
            [v[order] for v in ivecs],
        )
    assert mode == "fused", f"unknown RAY_TPU_COMPACT mode {mode!r}"
    n = alive.shape[0]
    parts = [f.reshape(n, -1) for f in fmats]
    fcols = sum(p.shape[1] for p in parts)
    ints = [alive] + list(ivecs)
    parts += [
        jax.lax.bitcast_convert_type(
            v.astype(jnp.int32), jnp.float32
        ).reshape(n, 1)
        for v in ints
    ]
    packed = jnp.concatenate(parts, axis=1)[order]
    fout, at = [], 0
    for f in fmats:
        k = f.reshape(n, -1).shape[1]
        fout.append(packed[:, at:at + k].reshape(f.shape))
        at += k
    iraw = [
        jax.lax.bitcast_convert_type(packed[:, fcols + j], jnp.int32)
        for j in range(len(ints))
    ]
    alive_s = iraw[0] != 0
    iout = [
        r.astype(jnp.bool_) if v.dtype == jnp.bool_ else r.astype(v.dtype)
        for r, v in zip(iraw[1:], ivecs)
    ]
    return alive_s, fout, iout


def unsort_wavefront(pos, fmats, ivecs, mode: str | None = None):
    """Undo a tracked permutation: returns arrays ``out`` with
    ``out[pos[i]] = in[i]`` (``pos`` is a permutation of [0, n)).

    Modes (bit-identical results, execution strategy only):

    * ``scatter``: one ``zeros.at[pos].set(x)`` per array (the
      round-2..5 form).
    * ``sort``: ONE variadic ``lax.sort`` keyed by ``pos`` — sorting
      rows by their destination index IS the inverse permutation, and
      the TPU's vectorized sorting network beats per-row scatters just
      as it beats scalar-core gathers (compact_wavefront).

    Default: ``RAY_TPU_UNSORT`` env var, else ``sort``.
    """
    if mode is None:
        mode = os.environ.get("RAY_TPU_UNSORT", "sort")
    if mode == "scatter":
        return (
            [jnp.zeros_like(f).at[pos].set(f) for f in fmats],
            [jnp.zeros_like(v).at[pos].set(v) for v in ivecs],
        )
    assert mode == "sort", f"unknown RAY_TPU_UNSORT mode {mode!r}"
    cols = []
    fsplits = []
    for f in fmats:
        f2 = f.reshape(f.shape[0], -1)
        fsplits.append((f2.shape[1], f.shape))
        cols.extend(f2[:, j] for j in range(f2.shape[1]))
    out = jax.lax.sort((pos,) + tuple(cols) + tuple(ivecs), num_keys=1,
                       is_stable=False)
    rest = list(out[1:])
    fout = []
    for ncols, shape in fsplits:
        taken, rest = rest[:ncols], rest[ncols:]
        fout.append(jnp.stack(taken, axis=1).reshape(shape))
    return fout, rest


def stage_schedule(max_depth: int, stage_bounces: int) -> list:
    """Bounce counts per compaction stage.

    Early stages are ``stage_bounces`` wide; after two sorts the
    wavefront is nearly dead (zy_scene: <5% alive past bounce 8), so all
    remaining bounces run as ONE tail stage — each extra sort pass
    (argsort + 6 full-width gathers, ~2 ms per 65k-ray tile on TPU) was
    costing more than the dead-lane work it saved.  The early-exit
    while_loops below make long tail stages cheap: an all-dead chunk
    stops bouncing immediately, which is output-identical (dead lanes
    change nothing and consume no radiance-affecting randomness).

    Shared by trace_compacted and render/prb.py's replay — the two MUST
    walk the same schedule for path replay to reproduce the forward.
    ``RAY_TPU_STAGE_BOUNCES`` overrides the width (every caller flows
    through this function, so forward/tape/replay stay in lock-step) —
    a tuning knob only; results are bit-identical across schedules.
    """
    stage_bounces = int(
        os.environ.get("RAY_TPU_STAGE_BOUNCES", stage_bounces)
    )
    lead = int(os.environ.get("RAY_TPU_LEAD_STAGES", 2))
    sizes = []
    left = max_depth
    while left > 0 and len(sizes) < lead:
        sizes.append(min(stage_bounces, left))
        left -= sizes[-1]
    if left > 0:
        sizes.append(left)
    return sizes


def default_chunk_div(n: int) -> int:
    """Compaction chunk divisor: keep chunks at ~8192 rays (measured
    best at 1024²: chunk 8192 beat 2048 and 16384) while never going
    below 8 chunks per tile.  Always a DIVISOR of ``n`` — the largest
    one not exceeding the ~8192-ray target — so any multiple-of-8 ray
    count (parallel/mesh._shard_pad's guarantee) satisfies the
    compacted loop's divisibility requirement, e.g. a 73736-ray shard
    gets 8 chunks of 9217 instead of tripping the n % 9 assert.
    Shared by trace_compacted and the PRB replay — the two MUST agree
    for path replay to reproduce the forward.  ``RAY_TPU_CHUNK_TARGET``
    overrides the ~8192-ray chunk target (tuning knob; bit-identical
    across values)."""
    tgt = int(os.environ.get("RAY_TPU_CHUNK_TARGET", 8192))
    target = max(8, n // tgt)
    for d in range(target, 0, -1):
        if n % d == 0:
            return d
    return 1


def bounded_bounce_loop(bounces: int, body, carry, alive_of):
    """fori_loop(0, bounces, body, carry) that stops early once every
    lane is dead — exactly output-preserving (a bounce over an all-dead
    wavefront is a masked no-op) but skips the work."""

    def cond(state):
        b, c = state
        return (b < bounces) & jnp.any(alive_of(c))

    def step(state):
        b, c = state
        return b + 1, body(b, c)

    _, carry = jax.lax.while_loop(cond, step, (jnp.int32(0), carry))
    return carry


def trace_subset_dot(
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    g: jnp.ndarray,
    alive0: jnp.ndarray,
    ids0: jnp.ndarray,
    *,
    stage_bounces: int = 4,
    chunk_div: int | None = None,
) -> jnp.ndarray:
    """``vdot(g, radiance)`` of a gathered ray subset, compacted.

    The scalar-tangent pass (render/prb_scalar.py) only needs the
    tangent of this one scalar, so its jacfwd replay does not have to
    drag the PRB replay's full carry (g, rad_total, pos, touched and
    the gradient accumulators — 6 extra f32 sort columns and loop
    slots) through every bounce.  This is the minimal compacted
    replay: carry = (rad, thr, ro, rd, alive, ids, pos); uniforms are
    keyed by the ABSOLUTE ``ids0`` so the gathered subset replays its
    paths bit-exactly (ops/rng.ray_uniforms), and the final dot gathers
    ``g`` by the tracked input position instead of unsorting the
    radiance.  Rays with ``alive0`` unset cost one sort slot and
    nothing more (a dead lane accumulates nothing, including the
    depth-exhaustion environment term).

    Radiance-equality with the PRB replay's radiance output is pinned
    by tests; JVP-compatible throughout (while_loop trip counts need
    no transpose in forward mode).
    """
    n = ro.shape[0]
    if chunk_div is None:
        chunk_div = default_chunk_div(n)
    chunk = n // chunk_div
    assert chunk * chunk_div == n

    rad = jnp.zeros((n, 3), jnp.float32)
    thr = jnp.ones((n, 3), jnp.float32)
    alive = alive0
    ids = ids0
    pos = jnp.arange(n, dtype=jnp.int32)

    offset = 0
    for stage, bounces in enumerate(stage_schedule(max_depth, stage_bounces)):
        alive, (rad, thr, ro, rd), (ids, pos) = compact_wavefront(
            alive, [rad, thr, ro, rd], [ids, pos]
        )
        alive_count = jnp.sum(alive.astype(jnp.int32))

        def chunk_body(state, _offset=offset, _bounces=bounces):
            ci, rad, thr, ro, rd, alive, ids = state
            start = ci * chunk
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, chunk)
            c_carry = (
                sl(rad), sl(thr), sl(ro), sl(rd), sl(alive), sl(ids),
                jnp.zeros((), jnp.float32),
            )

            def bodyc(b, c):
                return _bounce(scene, key, _offset + b, c,
                               count_segments=False)

            outs = bounded_bounce_loop(_bounces, bodyc, c_carry,
                                       lambda c: c[4])
            upd = lambda x, v: jax.lax.dynamic_update_slice_in_dim(
                x, v, start, 0
            )
            return (
                ci + 1,
                upd(rad, outs[0]), upd(thr, outs[1]), upd(ro, outs[2]),
                upd(rd, outs[3]), upd(alive, outs[4]), upd(ids, outs[5]),
            )

        def chunk_cond(state, _alive_count=alive_count):
            return state[0] * chunk < _alive_count

        _, rad, thr, ro, rd, alive, ids = jax.lax.while_loop(
            chunk_cond, chunk_body,
            (jnp.int32(0), rad, thr, ro, rd, alive, ids),
        )
        offset += bounces

    rad = rad + jnp.where(alive[:, None], thr * scene.environment[None, :], 0.0)
    return jnp.vdot(g[pos], rad)


def trace_compacted(
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    *,
    stage_bounces: int = 4,
    chunk_div: int | None = None,
    with_stats: bool = False,
    ids_base: int = 0,
    fusion_hint: bool = False,
) -> jnp.ndarray:
    """Forward-only trace with staged wavefront compaction.

    A fixed-depth wavefront wastes most of its lanes: zy_scene at depth
    20 averages 3.85 live bounces, so ~80% of the dense loop shades dead
    rays.  Every ``stage_bounces`` bounces the wavefront is sorted
    alive-first (the permutation is tracked, radiance is unsorted once
    at the end) and the next stage runs over just ``ceil(alive/C)``
    chunks of C = N/chunk_div rays — a fixed-shape stream compaction,
    the TPU equivalent of the reference's scattered-ray re-packeting
    (renderer.rs:264-298).

    Not reverse-differentiable (dynamic chunk counts) — gradients go
    through the PRB replay.  Because per-bounce uniforms are keyed by
    (ray id, global bounce) — see :func:`ray_uniforms` — the result is
    BIT-IDENTICAL to :func:`trace` with the same key (a bounce over a
    dead ray is a masked no-op and consumes nothing).  N must be a
    multiple of chunk_div.

    ``fusion_hint``: additionally write a per-(bounce, ray) i32 flags
    row and return its reduction as an extra output the CALLER MUST
    KEEP LIVE (return it from the enclosing jit).  The row's content is
    junk; its presence flips XLA's fusion/layout decisions for the
    whole bounce loop: 231 → 182 ms/pass at 1024² on zy (TPU v5e,
    scratch/exp_r5_fuse.py — the taped forward's "consume the tape and
    get faster" effect, reproduced with a 10 MB/tile hint).  The
    radiance is bit-identical either way (tests assert).  Return
    becomes (rad[, segments], hint).
    """
    n = ro.shape[0]
    if chunk_div is None:
        chunk_div = default_chunk_div(n)
    chunk = n // chunk_div
    assert chunk * chunk_div == n, "ray count must be a multiple of chunk_div"

    rad = jnp.zeros((n, 3), dtype=jnp.float32)
    thr = jnp.ones((n, 3), dtype=jnp.float32)
    alive = jnp.ones((n,), dtype=bool)
    # sorted position -> pixel (ids double as the RNG ids; see trace's
    # ids_base note — the unsort below subtracts the base back off)
    ids = ids_base + jnp.arange(n, dtype=jnp.int32)
    segments = jnp.zeros((), dtype=jnp.float32)

    carry = (rad, thr, ro, rd, alive, ids, segments)
    if fusion_hint:
        carry = carry + (jnp.zeros((max_depth, n), jnp.int32),)
    offset = 0

    for stage, bounces in enumerate(stage_schedule(max_depth, stage_bounces)):
        if stage == 0:
            # full-width warm stage (everything is alive anyway)
            def body0(b, c, _offset=offset):
                return _bounce(scene, key, _offset + b, c,
                               count_segments=with_stats,
                               hint_slot=(_offset + b) if fusion_hint
                               else None)

            carry = jax.lax.fori_loop(0, bounces, body0, carry)
            offset += bounces
            continue

        rad, thr, ro, rd, alive, ids, segments = carry[:7]
        hrows = carry[7] if fusion_hint else None
        # compact: alive rays first (stable keeps pixel coherence)
        alive, (rad, thr, ro, rd), (ids,) = compact_wavefront(
            alive, [rad, thr, ro, rd], [ids]
        )
        alive_count = jnp.sum(alive.astype(jnp.int32))

        def chunk_body(state, _offset=offset, _bounces=bounces):
            ci, rad, thr, ro, rd, alive, ids, segments = state[:8]
            start = ci * chunk
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, chunk)
            c_carry = (
                sl(rad), sl(thr), sl(ro), sl(rd), sl(alive), sl(ids),
                jnp.zeros((), jnp.float32),
            )
            if fusion_hint:
                c_carry = c_carry + (
                    jnp.zeros((max_depth, chunk), jnp.int32),
                )

            def bodyc(b, c):
                return _bounce(scene, key, _offset + b, c,
                               count_segments=with_stats,
                               hint_slot=b if fusion_hint else None)

            outs = bounded_bounce_loop(_bounces, bodyc, c_carry,
                                       lambda c: c[4])
            (c_rad, c_thr, c_ro, c_rd, c_alive, c_ids, c_segs) = outs[:7]
            upd = lambda x, v: jax.lax.dynamic_update_slice_in_dim(x, v, start, 0)
            new = (
                ci + 1,
                upd(rad, c_rad), upd(thr, c_thr), upd(ro, c_ro),
                upd(rd, c_rd), upd(alive, c_alive), upd(ids, c_ids),
                segments + c_segs,
            )
            if fusion_hint:
                # hint content is junk; overwrite the whole column range
                new = new + (jax.lax.dynamic_update_slice(
                    state[8], outs[7], (0, start)),)
            return new

        def chunk_cond(state):
            ci = state[0]
            return ci * chunk < alive_count

        init = (jnp.int32(0), rad, thr, ro, rd, alive, ids, segments)
        if fusion_hint:
            init = init + (hrows,)
        out = jax.lax.while_loop(chunk_cond, chunk_body, init)
        _, rad, thr, ro, rd, alive, ids, segments = out[:8]
        carry = (rad, thr, ro, rd, alive, ids, segments)
        if fusion_hint:
            carry = carry + (out[8],)
        offset += bounces

    rad, thr, ro, rd, alive, ids, segments = carry[:7]
    rad = rad + jnp.where(alive[:, None], thr * scene.environment[None, :], 0.0)
    # unsort: sorted position i belongs to pixel ids[i] - ids_base
    (rad_out,), _ = unsort_wavefront(ids - ids_base, [rad], [])
    outs = (rad_out,)
    if with_stats:
        outs = outs + (segments,)
    if fusion_hint:
        outs = outs + (jnp.sum(carry[7]),)
    return outs if len(outs) > 1 else rad_out
