"""Taped path-replay backprop: gradients without a second traversal.

``prb_grad_compacted`` (render/prb.py) re-traces every path to
recover the per-bounce facts the PRB estimator needs — that second
traversal costs as much as the forward itself (~29 ms per 131072-ray
tile at 1024², round-4 ladder) while the accumulation work it feeds is
~2 ms.  This module removes the re-trace: the FORWARD writes a compact
per-(bounce, ray) tape — 36 bytes: leaf / texel / material ids, a
flags word, the contribution base ``c``, and the post-bounce prefix
radiance — and the backward becomes a traversal-free sweep over the
tape (elementwise + the same one-hot matmuls / Pallas scatter as the
replay).  Dense prototype on TPU: backward marginal 29.2 → 15.3
ms/tile at depth 8, gradients equal to the replay (f32-rounding
tolerance: the sweep multiplies by the reciprocal of the albedo where
the replay divides).

Tape semantics per bounce j (estimator of reference
src/renderer.rs:231-263, same derivation as render/prb.py):

* emission (one-sided diffuse light): d rad / d e = thr_j
  → flags F_SOLID/F_IMAGE, c = thr, no suffix scaling
* lambertian / isotropic albedo: d rad / d A = suffix_j / A
  → flags F_SOLID/F_IMAGE + F_SUFFIX, c = 1/max(A, eps)
* metal albedo: same suffix trick keyed by material row
  → flags F_METAL + F_SUFFIX, c = 1/max(albedo, eps)

with suffix_j = rad_total − rad_after_j (radiance gathered strictly
after bounce j).  The three masks are mutually exclusive per ray
(a diffuse light never scatters; mtype partitions the rest), so one
(leaf, texel, material, c) row serves all three.

Layout: tape rows live in the STAGE-LOCAL sorted coordinates of the
compaction schedule (integrator.trace_compacted); ``ids`` snapshots
per stage map positions back to original rays, so the sweep gathers
the loss cotangent ``g`` and ``rad_total`` into stage coordinates with
one permutation gather per stage — the same cost class as the
forward's own compaction sort.  The sweep walks the exact chunk
schedule the forward ran (alive counts are part of the tape), so
accumulation work stays proportional to live rays.

Memory: max_depth × N × 36 B per tile (94 MB at 131072 × 20) —
transient inside the per-tile jit, reused across lax.map iterations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ray_tracing_tpu.models.scene import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
    SceneData,
)
from ray_tracing_tpu.ops.geometry import EPSILON, INF, take_rows
from ray_tracing_tpu.ops.intersect import intersect_scene
from ray_tracing_tpu.ops.materials import N_SCATTER_U, shade
from ray_tracing_tpu.ops.rng import ray_uniforms
from ray_tracing_tpu.render.integrator import (
    bounded_bounce_loop,
    compact_wavefront,
    default_chunk_div,
    stage_schedule,
)
from ray_tracing_tpu.render.prb import (
    _A_EPS,
    _gimg_add,
    _one_hot_add,
    _zero_grads,
)

F_SOLID = 1   # leaf contribution reads textures.color
F_IMAGE = 2   # leaf contribution scatters into the atlas
F_METAL = 4   # material-row contribution
F_SUFFIX = 8  # scale by (rad_total - rad_after); else by 1 (emission)


class PrbTape(NamedTuple):
    """(D, n[, 3]) per-bounce rows in stage-local sorted coordinates,
    plus the per-stage layout needed to walk them back."""

    leaf: jnp.ndarray      # (D, n) i32
    texel: jnp.ndarray     # (D, n) i32
    mat: jnp.ndarray       # (D, n) i32
    flags: jnp.ndarray     # (D, n) i32
    c: jnp.ndarray         # (D, n, 3) f32
    rad_after: jnp.ndarray  # (D, n, 3) f32
    stage_ids: jnp.ndarray  # (S, n) i32: stage position -> original ray
    alive_counts: jnp.ndarray  # (S,) i32 live rays entering each stage


def _taped_bounce(scene: SceneData, key, bounce, slot, carry):
    """One bounce that is VALUE-IDENTICAL to integrator._bounce (same
    ops, same order — tests assert bit-equality of the radiance) and
    additionally writes the PRB tape row ``slot``."""
    rad, thr, ro, rd, alive, ids, touched, tape_rows = carry
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
    em, sc, aux = shade(scene, hit, rd, u, with_aux=True)
    mtype = take_rows(scene.materials.mtype, hit.material)

    emit_mask = found & (mtype == MAT_DIFFUSE_LIGHT) & hit.front_face
    rad = rad + jnp.where(found[:, None], thr * em, 0.0)
    new_alive = found & sc.scattered

    albedo_mask = new_alive & (
        (mtype == MAT_LAMBERTIAN) | (mtype == MAT_ISOTROPIC)
    )
    metal_mask = new_alive & (mtype == MAT_METAL)
    a_safe = jnp.maximum(aux.tex_value, _A_EPS)
    met_safe = jnp.maximum(
        take_rows(scene.materials.albedo, hit.material), _A_EPS
    )
    leaf_mask = emit_mask | albedo_mask
    flags = (
        jnp.where(leaf_mask & aux.leaf_is_solid, F_SOLID, 0)
        | jnp.where(leaf_mask & aux.leaf_is_image, F_IMAGE, 0)
        | jnp.where(metal_mask, F_METAL, 0)
        | jnp.where(albedo_mask | metal_mask, F_SUFFIX, 0)
    )
    c = jnp.where(
        emit_mask[:, None], thr,
        jnp.where(metal_mask[:, None], 1.0 / met_safe, 1.0 / a_safe),
    )
    tape_rows = jax.tree.map(
        lambda t, v: jax.lax.dynamic_update_index_in_dim(t, v, slot, 0),
        tape_rows,
        (aux.leaf_tex, aux.texel, hit.material, flags, c, rad),
    )

    # bitmask: bit0 = path reached a metal, bit1 = a dielectric; the
    # scalar tangent pass batches each family over ITS rays only
    touched = touched | jnp.where(
        found & (mtype == MAT_METAL), 1, 0
    ) | jnp.where(found & (mtype == MAT_DIELECTRIC), 2, 0)
    thr = jnp.where(new_alive[:, None], thr * sc.coef, thr)
    ro = jnp.where(found[:, None], hit.p, ro)
    rd = jnp.where(new_alive[:, None], sc.direction, rd)
    return rad, thr, ro, rd, new_alive, ids, touched, tape_rows


def _empty_rows(depth, n):
    i = lambda: jnp.zeros((depth, n), jnp.int32)
    return (
        i(), i(), i(), i(),
        jnp.zeros((depth, n, 3), jnp.float32),
        jnp.zeros((depth, n, 3), jnp.float32),
    )


def trace_taped(
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    *,
    stage_bounces: int = 4,
    chunk_div: int | None = None,
    ids_base: int = 0,
):
    """Compacted forward trace that also writes the PRB tape.

    Walks EXACTLY integrator.trace_compacted's schedule (same sorts,
    same chunks, same uniforms) — the radiance is bit-identical to it
    and to the dense loop.  Returns ``(rad (n,3), touched (n,) i32
    bitmask — 1: path reached a metal, 2: a dielectric — , tape)``
    with rad/touched in input-row order.  ``ids_base`` offsets the RNG
    ids (see integrator.trace) — tape.stage_ids stay tile-LOCAL.
    """
    n = ro.shape[0]
    if chunk_div is None:
        chunk_div = default_chunk_div(n)
    chunk = n // chunk_div
    assert chunk * chunk_div == n

    schedule = stage_schedule(max_depth, stage_bounces)
    n_stages = len(schedule)

    rad = jnp.zeros((n, 3), jnp.float32)
    thr = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    ids = ids_base + jnp.arange(n, dtype=jnp.int32)
    touched = jnp.zeros((n,), jnp.int32)
    rows = _empty_rows(max_depth, n)
    stage_ids = jnp.zeros((n_stages, n), jnp.int32)
    alive_counts = jnp.zeros((n_stages,), jnp.int32)

    carry = (rad, thr, ro, rd, alive, ids, touched, rows)
    offset = 0
    for stage, bounces in enumerate(schedule):
        if stage == 0:
            stage_ids = stage_ids.at[0].set(ids - ids_base)
            alive_counts = alive_counts.at[0].set(n)

            def body0(b, c, _offset=offset):
                return _taped_bounce(scene, key, _offset + b, _offset + b, c)

            carry = jax.lax.fori_loop(0, bounces, body0, carry)
            offset += bounces
            continue

        rad, thr, ro, rd, alive, ids, touched, rows = carry
        alive, (rad, thr, ro, rd), (ids, touched) = compact_wavefront(
            alive, [rad, thr, ro, rd], [ids, touched]
        )
        alive_count = jnp.sum(alive.astype(jnp.int32))
        stage_ids = stage_ids.at[stage].set(ids - ids_base)
        alive_counts = alive_counts.at[stage].set(alive_count)

        def chunk_body(state, _offset=offset, _bounces=bounces):
            ci, rad, thr, ro, rd, alive, ids, touched, rows = state
            start = ci * chunk
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, chunk)
            # stage-local chunk tape rows, written back after the loop
            c_rows = _empty_rows(_bounces, chunk)
            c_carry = (
                sl(rad), sl(thr), sl(ro), sl(rd), sl(alive), sl(ids),
                sl(touched), c_rows,
            )

            def bodyc(b, c):
                return _taped_bounce(scene, key, _offset + b, b, c)

            (c_rad, c_thr, c_ro, c_rd, c_alive, c_ids, c_touched,
             c_rows) = bounded_bounce_loop(
                _bounces, bodyc, c_carry, lambda c: c[4]
            )
            upd = lambda x, v: jax.lax.dynamic_update_slice_in_dim(
                x, v, start, 0
            )
            rows2 = jax.tree.map(
                lambda t, v: jax.lax.dynamic_update_slice(
                    t, v, (_offset, start) + (0,) * (t.ndim - 2)
                ),
                rows, c_rows,
            )
            return (
                ci + 1,
                upd(rad, c_rad), upd(thr, c_thr), upd(ro, c_ro),
                upd(rd, c_rd), upd(alive, c_alive), upd(ids, c_ids),
                upd(touched, c_touched), rows2,
            )

        def chunk_cond(state, _alive_count=alive_count):
            return state[0] * chunk < _alive_count

        _, rad, thr, ro, rd, alive, ids, touched, rows = jax.lax.while_loop(
            chunk_cond, chunk_body,
            (jnp.int32(0), rad, thr, ro, rd, alive, ids, touched, rows),
        )
        carry = (rad, thr, ro, rd, alive, ids, touched, rows)
        offset += bounces

    rad, thr, ro, rd, alive, ids, touched, rows = carry
    rad = rad + jnp.where(alive[:, None], thr * scene.environment[None, :], 0.0)
    from ray_tracing_tpu.render.integrator import unsort_wavefront

    (rad_out,), (touched_out,) = unsort_wavefront(
        ids - ids_base, [rad], [touched]
    )
    tape = PrbTape(*rows, stage_ids=stage_ids, alive_counts=alive_counts)
    return rad_out, touched_out, tape


def _accum_rows(scene, gacc, leaf, texel, mat, flags, c, rad_after,
                g_s, tot_s, has_images):
    """One tape row block -> the three accumulators (identical masks
    and merge order to prb._prb_bounce's accumulate block).

    Accepts either flat per-ray blocks (leaf (C,), c (C, 3), g_s
    (C, 3)) or bounce-vectorized blocks (leaf (B, C), c (B, C, 3),
    g_s (C, 3) broadcast over the bounce axis); vectorized blocks are
    flattened to B*C rows so the whole stage feeds ONE one-hot matmul
    / scatter call instead of one per bounce (the per-call dispatch
    dominated the sweep: 140 -> ~60 ms/pass at 1024²)."""
    gcol, gimg, gmet = gacc
    suffix = tot_s - rad_after
    scale = jnp.where((flags & F_SUFFIX)[..., None] != 0, suffix, 1.0)
    contrib = g_s * c * scale
    if leaf.ndim == 2:  # bounce-vectorized: flatten to rows
        rows = leaf.shape[0] * leaf.shape[1]
        leaf, texel, mat, flags = (
            x.reshape(rows) for x in (leaf, texel, mat, flags)
        )
        contrib = contrib.reshape(rows, 3)
    gcol = _one_hot_add(gcol, leaf, contrib, (flags & F_SOLID) != 0)
    if has_images:
        gimg = _gimg_add(gimg, texel, contrib, (flags & F_IMAGE) != 0)
    gmet = _one_hot_add(gmet, mat, contrib, (flags & F_METAL) != 0)
    return gcol, gimg, gmet


def tape_sweep(
    scene: SceneData,
    tape: PrbTape,
    rad_total: jnp.ndarray,
    g: jnp.ndarray,
    max_depth: int,
    *,
    stage_bounces: int = 4,
    chunk_div: int | None = None,
):
    """Accumulate (gcol, gimg_planar, gmet) from the tape.  No
    traversal: elementwise + one-hot matmuls + the Pallas scatter.
    ``rad_total``/``g`` are in ORIGINAL ray order.

    Cost structure (round-5 interleaved A/Bs at 1024²): the sweep's
    price is per-call dispatch and the per-stage permutation gathers,
    NOT the accumulation math, so each stage processes ALL its bounces
    in one vectorized block.  Stage 0's layout is the identity (no
    gather), and later stages gather ``[g | rad_total]`` fused as one
    (n, 6) row gather (random-index gathers ride the scalar core —
    CLAUDE.md hazard 4 — so halving the gather count matters).  Live
    chunk gating walks the forward's chunk schedule in ray-axis chunks
    only (bounces stay vectorized)."""
    n = g.shape[0]
    if chunk_div is None:
        chunk_div = default_chunk_div(n)
    chunk = n // chunk_div
    import os as _os

    # RAY_TPU_SWEEP_NOIMG: ablation-only switch (drops the atlas-texel
    # scatter from the sweep — WRONG image gradients; perf experiments)
    has_images = (
        scene.textures.images.shape[0] > 0
        and _os.environ.get("RAY_TPU_SWEEP_NOIMG") != "1"
    )
    gacc = _zero_grads(scene)
    gt = jnp.concatenate([g, rad_total], axis=1)  # fused gather source

    offset = 0
    for stage, bounces in enumerate(stage_schedule(max_depth, stage_bounces)):
        row_sl = lambda t, _o=offset, _b=bounces: jax.lax.slice_in_dim(
            t, _o, _o + _b, axis=0
        )
        stage_rows = (
            row_sl(tape.leaf), row_sl(tape.texel), row_sl(tape.mat),
            row_sl(tape.flags), row_sl(tape.c), row_sl(tape.rad_after),
        )
        if stage == 0:
            # stage 0 runs in input order: no gather needed
            gacc = _accum_rows(
                scene, gacc, *stage_rows, g, rad_total, has_images
            )
            offset += bounces
            continue

        ids_s = tape.stage_ids[stage]
        gt_s = gt[ids_s]
        g_s, tot_s = gt_s[:, :3], gt_s[:, 3:]
        alive_count = tape.alive_counts[stage]

        if _os.environ.get("RAY_TPU_SWEEP_FULL") == "1":
            # chunk-loop-free: one full-width accumulation per stage
            # (dead rows carry zero flags -> zero contribution; the
            # scatter's block-skip eats them).  Tuning alternative to
            # the alive-gated chunk walk below; same sums up to f32
            # reduction order (the one-hot matmul partial-sum split
            # changes, scatter row order does not).
            gacc = _accum_rows(
                scene, gacc, *stage_rows, g_s, tot_s, has_images
            )
            offset += bounces
            continue

        def chunk_body(state, _rows=stage_rows, _g_s=g_s, _tot_s=tot_s):
            ci, gacc = state
            start = ci * chunk
            ray_sl = lambda t: jax.lax.dynamic_slice_in_dim(
                t, start, chunk, axis=1
            )
            gacc = _accum_rows(
                scene, gacc, *(ray_sl(t) for t in _rows),
                jax.lax.dynamic_slice_in_dim(_g_s, start, chunk, 0),
                jax.lax.dynamic_slice_in_dim(_tot_s, start, chunk, 0),
                has_images,
            )
            return ci + 1, gacc

        def chunk_cond(state, _alive_count=alive_count):
            return state[0] * chunk < _alive_count

        _, gacc = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), gacc)
        )
        offset += bounces
    return gacc
