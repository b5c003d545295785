"""Pallas TPU kernel for the analytic-primitive nearest-hit sweep.

Phase A of the wavefront intersection (ops/intersect.py) evaluates every
sphere and rect against every ray and argmin-reduces.  The XLA version
materializes (N, P) candidate grids in HBM; this kernel keeps the whole
sweep in VMEM/registers: rays live as component-major (rows, 128) f32
blocks, primitive parameters sit in SMEM and the per-primitive loop is
fully unrolled (P is a small compile-time constant), so each ray block
is read once and only the per-ray winner (t, kind, index) is written.

Eligibility: any scene with analytic primitives, transformed or not.
When a table carries instancing transforms, each row packs its inverse
matrix and the kernel mirrors geometry.transform_ray in-register
(object-space test, world-space t via /nrm) — the identical math the
XLA path applies, so results remain bit-identical to the XLA kernels
(same formulas, same tie-breaking); tests compare them directly, in
interpreter mode on CPU and compiled on TPU.  Constant media keep their
own (tiny) XLA phase and never block the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ray_tracing_tpu.models.scene import SceneData
from ray_tracing_tpu.ops.intersect import KIND_RECT, KIND_SPHERE

LANES = 128
BLOCK_ROWS = 64  # 64 x 128 = 8192 rays per program

EPSILON = 1e-3
INF = np.float32(np.inf)


def _object_ray(ro, rd, inv, inv_t):
    """World ray block -> one primitive's object space (the in-kernel
    mirror of geometry.transform_ray): ro_o = inv@ro + inv_t, rd_o unit,
    plus nrm = |inv@rd| so that world t = object t / nrm."""
    i00, i01, i02, i10, i11, i12, i20, i21, i22 = inv
    t0, t1, t2 = inv_t
    rox = i00 * ro[0] + i01 * ro[1] + i02 * ro[2] + t0
    roy = i10 * ro[0] + i11 * ro[1] + i12 * ro[2] + t1
    roz = i20 * ro[0] + i21 * ro[1] + i22 * ro[2] + t2
    dx = i00 * rd[0] + i01 * rd[1] + i02 * rd[2]
    dy = i10 * rd[0] + i11 * rd[1] + i12 * rd[2]
    dz = i20 * rd[0] + i21 * rd[1] + i22 * rd[2]
    nrm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inv_n = 1.0 / jnp.maximum(nrm, 1e-30)
    return (rox, roy, roz), (dx * inv_n, dy * inv_n, dz * inv_n), nrm


def _sphere_block(ro, rd, c, r, t_min, best, nrm=None):
    """One sphere vs a ray block; returns updated (t, kind, idx) best.
    With ``nrm`` (object-space ray norm block), roots are object-space
    and the window/update run in world units via t_obj / nrm."""
    best_t, best_kind, best_idx, s_idx = best
    ocx = ro[0] - c[0]
    ocy = ro[1] - c[1]
    ocz = ro[2] - c[2]
    half_b = ocx * rd[0] + ocy * rd[1] + ocz * rd[2]
    cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = half_b * half_b - cc
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    root1 = -half_b - sq
    root2 = -half_b + sq
    lo = t_min if nrm is None else t_min * nrm
    hi = best_t if nrm is None else best_t * nrm
    mask1 = ok & (root1 >= lo) & (root1 <= hi)
    mask2 = ok & (root2 >= lo) & (root2 <= hi)
    t = jnp.where(mask1, root1, root2)
    if nrm is not None:
        t = t / nrm
    better = (mask1 | mask2) & (t < best_t)
    best_t = jnp.where(better, t, best_t)
    best_kind = jnp.where(better, KIND_SPHERE, best_kind)
    best_idx = jnp.where(better, s_idx, best_idx)
    return best_t, best_kind, best_idx


def _rect_block(ro, rd, basis, bounds, t_min, best, nrm=None):
    """One rect vs a ray block.  ``basis`` = (ua, ub, uk) each a 3-tuple
    of scalars; ``bounds`` = (a0, a1, b0, b1, k).  With ``nrm`` the ray
    is already in object space and t converts back via / nrm."""
    best_t, best_kind, best_idx, r_idx = best
    ua, ub, uk = basis
    a0, a1, b0, b1, k = bounds
    o2 = ro[0] * uk[0] + ro[1] * uk[1] + ro[2] * uk[2]
    d2 = rd[0] * uk[0] + rd[1] * uk[1] + rd[2] * uk[2]
    t = (k - o2) / d2
    lo = t_min if nrm is None else t_min * nrm
    hi = best_t if nrm is None else best_t * nrm
    mask = (t >= lo) & (t <= hi)
    a = (ro[0] * ua[0] + ro[1] * ua[1] + ro[2] * ua[2]) + t * (
        rd[0] * ua[0] + rd[1] * ua[1] + rd[2] * ua[2]
    )
    b = (ro[0] * ub[0] + ro[1] * ub[1] + ro[2] * ub[2]) + t * (
        rd[0] * ub[0] + rd[1] * ub[1] + rd[2] * ub[2]
    )
    mask = mask & (a >= a0) & (a <= a1) & (b >= b0) & (b <= b1)
    if nrm is not None:
        t = t / nrm
    better = mask & (t < best_t)
    best_t = jnp.where(better, t, best_t)
    best_kind = jnp.where(better, KIND_RECT, best_kind)
    best_idx = jnp.where(better, r_idx, best_idx)
    return best_t, best_kind, best_idx


def _kernel(n_spheres, n_rects, sph_tf, rect_tf, sph_motion,
            *refs):
    """sph_tf / rect_tf are STATIC flags: when set, every row of the
    table carries [inv(9), inv_t(3)] after its base columns (identity
    for slot-0 prims — same uniform treatment as the XLA path when a
    table has any transform) and the prim is tested in object space.
    ``sph_motion`` (static; mutually exclusive with sph_tf — the
    builder forbids mixing, models/compiler.py) adds a per-ray shutter
    time block and [vx vy vz] sphere columns: each sphere is tested at
    its ray-specific center c + t_ray * v (the in-kernel mirror of
    intersect._sphere_phase_a's motion branch)."""
    if sph_motion:
        (sph_ref, rect_ref, rox, roy, roz, rdx, rdy, rdz, tray_ref,
         t_out, kind_out, idx_out) = refs
        tray = tray_ref[:]
    else:
        (sph_ref, rect_ref, rox, roy, roz, rdx, rdy, rdz,
         t_out, kind_out, idx_out) = refs
        tray = None
    ro = (rox[:], roy[:], roz[:])
    rd = (rdx[:], rdy[:], rdz[:])
    shape = ro[0].shape
    best_t = jnp.full(shape, INF, jnp.float32)
    best_kind = jnp.full(shape, -1, jnp.int32)
    best_idx = jnp.zeros(shape, jnp.int32)

    for s in range(n_spheres):
        if sph_tf:
            ro_o, rd_o, nrm = _object_ray(
                ro, rd,
                tuple(sph_ref[s, 4 + j] for j in range(9)),
                tuple(sph_ref[s, 13 + j] for j in range(3)),
            )
        else:
            ro_o, rd_o, nrm = ro, rd, None
        center = (sph_ref[s, 0], sph_ref[s, 1], sph_ref[s, 2])
        if sph_motion:
            center = tuple(
                center[j] + tray * sph_ref[s, 4 + j] for j in range(3)
            )
        best_t, best_kind, best_idx = _sphere_block(
            ro_o, rd_o,
            center,
            sph_ref[s, 3],
            EPSILON,
            (best_t, best_kind, best_idx, s),
            nrm=nrm,
        )
    for r in range(n_rects):
        if rect_tf:
            ro_o, rd_o, nrm = _object_ray(
                ro, rd,
                tuple(rect_ref[r, 14 + j] for j in range(9)),
                tuple(rect_ref[r, 23 + j] for j in range(3)),
            )
        else:
            ro_o, rd_o, nrm = ro, rd, None
        best_t, best_kind, best_idx = _rect_block(
            ro_o, rd_o,
            (
                (rect_ref[r, 0], rect_ref[r, 1], rect_ref[r, 2]),
                (rect_ref[r, 3], rect_ref[r, 4], rect_ref[r, 5]),
                (rect_ref[r, 6], rect_ref[r, 7], rect_ref[r, 8]),
            ),
            (rect_ref[r, 9], rect_ref[r, 10], rect_ref[r, 11], rect_ref[r, 12],
             rect_ref[r, 13]),
            EPSILON,
            (best_t, best_kind, best_idx, r),
            nrm=nrm,
        )
    t_out[:] = best_t
    kind_out[:] = best_kind
    idx_out[:] = best_idx


def pack_primitive_tables(scene: SceneData):
    """Host/trace-time packing of primitive parameters into the SMEM
    scalar tables the kernel reads: spheres (S, 4) = [cx cy cz r];
    rects (R, 14) = [ua(3) ub(3) uk(3) a0 a1 b0 b1 k].  When a table has
    instancing transforms, every row is extended with [inv(9) inv_t(3)]
    (identity for slot 0) and the kernel tests in object space — the
    same uniform gather the XLA path does (intersect.py
    _sphere_object_ray / _rect_object_ray)."""
    from ray_tracing_tpu.ops.geometry import RECT_UA, RECT_UB, RECT_UK

    sp = scene.spheres
    sph = jnp.concatenate([sp.center, sp.radius[:, None]], axis=1)
    assert not (sp.has_transforms and sp.has_motion), (
        "builder forbids mixing moving and transformed spheres"
    )
    if sp.has_transforms:
        inv = scene.transforms.inv[sp.transform].reshape(-1, 9)
        inv_t = scene.transforms.inv_t[sp.transform]
        sph = jnp.concatenate([sph, inv, inv_t], axis=1)
    elif sp.has_motion:
        sph = jnp.concatenate([sph, sp.vel], axis=1)
    rc = scene.rects
    # rc.axis is traced under jit (the scene is a jit argument); the
    # RECT_* basis tables are host numpy, so index via jnp
    ua, ub, uk = (jnp.asarray(m) for m in (RECT_UA, RECT_UB, RECT_UK))
    rect = jnp.concatenate(
        [
            ua[rc.axis],
            ub[rc.axis],
            uk[rc.axis],
            rc.a0[:, None], rc.a1[:, None], rc.b0[:, None], rc.b1[:, None],
            rc.k[:, None],
        ],
        axis=1,
    )
    if rc.has_transforms:
        inv = scene.transforms.inv[rc.transform].reshape(-1, 9)
        inv_t = scene.transforms.inv_t[rc.transform]
        rect = jnp.concatenate([rect, inv, inv_t], axis=1)
    # Mosaic rejects zero-row SMEM operands (f32[0,k]); pad to one row —
    # the unrolled loops never read past the real count.
    if sph.shape[0] == 0:
        sph = jnp.zeros((1, 4), jnp.float32)
    if rect.shape[0] == 0:
        rect = jnp.zeros((1, 14), jnp.float32)
    return sph.astype(jnp.float32), rect.astype(jnp.float32)


def pallas_eligible(scene: SceneData) -> bool:
    """The kernel covers ALL analytic primitives — spheres and rects,
    transformed or not, moving or not (constant media live in their
    own table, ops/intersect.py:_medium_phase_a, so they never block
    eligibility).  Motion-blur scenes pass the per-ray shutter time as
    an extra ray block (round 5; they previously fell back to XLA)."""
    return (scene.n_spheres + scene.n_rects) > 0


@functools.partial(
    jax.jit,
    static_argnames=("n_spheres", "n_rects", "sph_tf", "rect_tf",
                     "sph_motion", "interpret"),
)
def _run(sph, rect, *ray_comps, n_spheres, n_rects,
         sph_tf, rect_tf, sph_motion, interpret):
    rows = ray_comps[0].shape[0]
    grid = (rows // BLOCK_ROWS,)
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    out_shape_i = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    kernel = functools.partial(_kernel, n_spheres, n_rects, sph_tf, rect_tf,
                               sph_motion)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [ray_spec] * len(ray_comps),
        out_specs=[ray_spec, ray_spec, ray_spec],
        out_shape=[out_shape, out_shape_i, out_shape_i],
        interpret=interpret,
    )(sph, rect, *ray_comps)


def pallas_phase_a(scene: SceneData, ro, rd, t_ray=None,
                   interpret: bool = False):
    """Nearest analytic-primitive candidate per ray via the Pallas sweep.

    ro, rd: (N, 3); ``t_ray``: optional (N,) per-ray shutter times for
    motion-blur scenes (None on a motion scene tests the frozen t=0
    positions, matching the XLA phase's t_ray=None behavior).  Returns
    (t (N,), kind (N,), idx (N,)) with kind -1 on miss.  N is padded
    internally to a block multiple.
    """
    # Selection is discrete (like the BVH walk): run on stop_gradient'ed
    # inputs; gradients flow through the phase-B record rebuild instead.
    ro = jax.lax.stop_gradient(ro)
    rd = jax.lax.stop_gradient(rd)
    scene = jax.lax.stop_gradient(scene)
    n = ro.shape[0]
    block = BLOCK_ROWS * LANES
    n_pad = -(-n // block) * block
    ro_p = jnp.pad(ro, ((0, n_pad - n), (0, 0)))
    rd_p = jnp.pad(rd, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    rows = n_pad // LANES

    comps = [ro_p[:, i].reshape(rows, LANES) for i in range(3)]
    comps += [rd_p[:, i].reshape(rows, LANES) for i in range(3)]
    sph_motion = bool(scene.n_spheres) and scene.spheres.has_motion
    if sph_motion:
        t_blk = (jnp.zeros((n,), jnp.float32) if t_ray is None
                 else jax.lax.stop_gradient(t_ray))
        comps.append(jnp.pad(t_blk, (0, n_pad - n)).reshape(rows, LANES))
    sph, rect = pack_primitive_tables(scene)
    t, kind, idx = _run(
        sph, rect, *comps,
        n_spheres=scene.n_spheres, n_rects=scene.n_rects,
        sph_tf=scene.spheres.has_transforms,
        rect_tf=scene.rects.has_transforms,
        sph_motion=sph_motion,
        interpret=interpret,
    )
    return (
        t.reshape(-1)[:n],
        kind.reshape(-1)[:n],
        idx.reshape(-1)[:n],
    )
