"""Ray-primitive intersection kernels, batched over struct-of-arrays.

TPU-native re-expression of the reference's per-packet hit methods
(reference src/hittable/sphere.rs:60-92, triangle.rs:56-95,
aa_rect.rs:114-144, constant_medium.rs:41-85, transform.rs:64-95,
src/ray.rs:167-189).  Every function broadcasts over arbitrary leading
batch shapes: pass rays shaped ``(N, 1, 3)`` against primitive tables
shaped ``(P, 3)`` to get an ``(N, P)`` candidate grid, or gather one
primitive per ray and pass ``(N, 3)`` vs ``(N, 3)`` for the full-record
phase.  Masks replace the reference's SIMD lane masks.

All math is float32; ``t`` of a masked-out candidate is +inf so that a
plain ``argmin`` implements the reference's nearest-hit merge
(reference src/renderer.rs:170-182).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

EPSILON = 1e-3  # reference src/lib.rs:34
INF = jnp.inf


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


# Row gathers `tab[idx]` from small scene tables are a TPU trap twice
# over: XLA lowers them as standalone gather kernels (no fusion with the
# consumer), and it assigns the (N, 3) output the row-major
# {1,0:T(8,128)} layout whose lane axis is the SIZE-3 one — padded
# 3 -> 128, a 42x HBM blowup per materialized array (profiled: ~0.1 ms
# per lookup per 65k-ray bounce, ~50 ms/pass on zy_scene).  For tables
# of at most TAKE_ONEHOT_MAX rows the one-hot select-sum below is pure
# elementwise+reduce, so it fuses into the consumer and the (N, M[, C])
# intermediate never touches HBM.  The selected value is returned
# EXACTLY (each index matches one row; summing one selected float is
# exact), so this is a layout/fusion rewrite, not a numerical change.
TAKE_ONEHOT_MAX = 32


def take_rows(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``tab[idx]`` for a (M, ...) table and (...,) int indices, lowered
    fusably (one-hot select-sum) when M <= TAKE_ONEHOT_MAX."""
    tab = jnp.asarray(tab)  # host-numpy tables + traced idx must gather in jnp
    m = tab.shape[0]
    if m == 0 or m > TAKE_ONEHOT_MAX:
        return tab[idx]
    oh = idx[..., None] == jnp.arange(m, dtype=idx.dtype)  # (..., M)
    trail = tab.ndim - 1
    oh = oh.reshape(oh.shape + (1,) * trail)  # (..., M, 1*trail)
    t = tab.reshape((1,) * idx.ndim + tab.shape)
    if tab.dtype == jnp.bool_:
        return jnp.any(oh & t, axis=idx.ndim)
    return jnp.sum(jnp.where(oh, t, 0), axis=idx.ndim, dtype=tab.dtype)


def norm(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def safe_sqrt(x):
    """sqrt(maximum(x, 0)) with a finite VJP at x <= 0.

    The naive form pairs sqrt'(0) = inf with the zero cotangent of a
    masked lane, producing NaN parameter gradients; the double-where
    keeps the primal bit-identical while zeroing the dead branch."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def safe_div(num, den, fallback=0.0):
    """num / den where den != 0, else ``fallback`` — with the VJP of the
    dead branch fully severed (no 0 * inf)."""
    ok = den != 0.0
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), fallback)


def normalize(a):
    # double-where keeps the sqrt VJP finite on degenerate (masked) lanes:
    # sqrt'(0) = inf would otherwise turn their zero cotangent into NaN
    s = jnp.sum(a * a, axis=-1)
    n = jnp.sqrt(jnp.where(s > 1e-24, s, 1.0))
    return a / jnp.maximum(n, 1e-30)[..., None]


def cross(a, b):
    return jnp.cross(a, b)


class SphereHit(NamedTuple):
    """Phase-A candidate output (t/mask) plus enough to rebuild a record."""

    t: jnp.ndarray
    mask: jnp.ndarray


def sphere_uv(p):
    """Spherical UV of a unit outward normal (reference sphere.rs:38-45)."""
    theta = jnp.arccos(jnp.clip(-p[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(-p[..., 2], p[..., 0]) + jnp.pi
    u = phi / (2.0 * jnp.pi)
    v = theta / jnp.pi
    return jnp.stack([u, v], axis=-1)


def sphere_roots(ro, rd, center, radius):
    """Both quadratic roots of |ro + t*rd - c|^2 = r^2 with unit rd.

    Returns (root1, root2, disc_ok).  Matches reference sphere.rs:60-71:
    half_b = oc.dot(d), c = |oc|^2 - r^2, disc = half_b^2 - c.
    """
    oc = ro - center
    half_b = dot(oc, rd)
    c = dot(oc, oc) - radius * radius
    disc = half_b * half_b - c
    disc_ok = disc >= 0.0
    # safe_sqrt: miss lanes (disc < 0) are masked by disc_ok, but
    # sqrt'(0) = inf times their zero cotangent would NaN reverse-mode
    # gradients flowing through rd (e.g. d radiance / d metal fuzz)
    sqrt_d = safe_sqrt(disc)
    return -half_b - sqrt_d, -half_b + sqrt_d, disc_ok


def sphere_t(ro, rd, center, radius, t_min, t_max):
    """Nearest-root selection exactly as reference sphere.rs:72-82."""
    root1, root2, disc_ok = sphere_roots(ro, rd, center, radius)
    mask1 = disc_ok & (root1 >= t_min) & (root1 <= t_max)
    mask2 = disc_ok & (root2 >= t_min) & (root2 <= t_max)
    t = jnp.where(mask1, root1, root2)
    return SphereHit(t=t, mask=mask1 | mask2)


def sphere_medium_t(ro, rd, center, radius, t_min, t_max, neg_inv_density, u):
    """Constant-density medium inside a sphere boundary.

    Mirrors reference constant_medium.rs:41-85 specialized to a sphere
    inner shape: hit1 over (-inf, inf) always selects root1, hit2 over
    (t1+EPS, inf) selects root2.  ``u`` is this candidate's uniform draw
    (the reference draws from the thread RNG inside hit()).
    Note the reference quirk kept on purpose: the scatter distance is
    measured from max(t1, t_min, 0) but the returned t is t1 + flight.
    """
    root1, root2, disc_ok = sphere_roots(ro, rd, center, radius)
    mask = disc_ok  # hit1 over (-inf, inf)
    mask = mask & (root2 >= root1 + EPSILON)  # hit2 over (t1+eps, inf)
    lo = jnp.maximum(root1, t_min)
    hi = jnp.minimum(root2, t_max)
    mask = mask & (lo < hi)
    lo = jnp.maximum(lo, 0.0)
    dist_inside = hi - lo
    # exponential free flight; guard log(0)
    flight = neg_inv_density * jnp.log(jnp.maximum(u, 1e-38))
    mask = mask & (flight <= dist_inside)
    t = root1 + flight
    return SphereHit(t=t, mask=mask)


def triangle_t(ro, rd, v0, e12, e13, t_min, t_max):
    """Moeller-Trumbore with the reference's exact mask chain
    (reference triangle.rs:56-95).  Returns (t, mask, u, v, det)."""
    p_vec = cross(rd, e13)
    det = dot(e12, p_vec)
    mask = jnp.abs(det) > 0.0
    inv_det = jnp.where(mask, 1.0 / jnp.where(mask, det, 1.0), 0.0)
    t_vec = ro - v0
    u = inv_det * dot(t_vec, p_vec)
    mask = mask & (u >= 0.0) & (u <= 1.0)
    q_vec = cross(t_vec, e12)
    v = inv_det * dot(rd, q_vec)
    mask = mask & (v >= 0.0) & (u + v <= 1.0)
    t = inv_det * dot(e13, q_vec)
    mask = mask & (t >= t_min) & (t <= t_max)
    return t, mask, u, v, det


def _bdot3(a, b):
    """(N, 3) x (T, 3) -> (N, T) dot-product grid as three broadcasted
    multiply-adds — never materializes an (N, T, 3) intermediate and
    never touches the MXU (see matvec3 for why bf16 matmuls are unsafe
    for geometry)."""
    return (
        a[:, 0:1] * b[None, :, 0]
        + a[:, 1:2] * b[None, :, 1]
        + a[:, 2:3] * b[None, :, 2]
    )


def triangle_sweep_tables(v0, e12, e13, dtype=None):
    """Per-triangle constants for the triple-product sweep (host, numpy).

    Rewrites Möller–Trumbore's per-pair dot/cross products as scalar
    triple products so the (ray x triangle) sweep needs only (N, T)
    grids:  with m = ro x rd,

        det   = -(rd . n)            n  = e12 x e13
        u*det =  m . e13 - rd . g1   g1 = e13 x v0
        v*det =  rd . g2 - m . e12   g2 = e12 x v0
        t*det =  ro . n  - d0        d0 = v0 . n

    (each line is one determinant identity, e.g. tvec.(rd x e13) =
    det[ro,rd,e13] - det[v0,rd,e13]).  All constants are computed in
    f64 against a translated origin (the centroid) because the two
    determinant terms cancel catastrophically at scene scale otherwise.
    Returns (origin (3,), n, g1, g2 (T,3), d0 (T,)) as float32.
    """
    import numpy as np

    v0 = np.asarray(v0, np.float64)
    e12 = np.asarray(e12, np.float64)
    e13 = np.asarray(e13, np.float64)
    origin = v0.mean(axis=0) if v0.shape[0] else np.zeros(3)
    v0s = v0 - origin
    n = np.cross(e12, e13)
    g1 = np.cross(e13, v0s)
    g2 = np.cross(e12, v0s)
    d0 = np.sum(v0s * n, axis=-1)
    f = np.float32
    return origin.astype(f), n.astype(f), g1.astype(f), g2.astype(f), d0.astype(f)


def triangle_sweep_t(ro, rd, e12, e13, origin, n, g1, g2, d0, t_min, t_max):
    """Dense (N, T) nearest-candidate sweep over a whole triangle table.

    The TPU-native replacement for per-ray BVH traversal on small-to-mid
    meshes: instead of a divergent pointer walk (reference
    src/bvh/bvh.rs:182-239), every ray tests every triangle with the
    precomputed triple-product constants of :func:`triangle_sweep_tables`
    — pure broadcasted VPU FMAs, no gathers, no while_loop.  Masks match
    reference triangle.rs:56-95's chain exactly (same inequalities on
    u, v, t, det); u/v/t values differ only by f32 rounding from the
    sequential form, so Phase B re-derives the record with triangle_t.

    ro, rd: (N, 3); e12/e13/n/g1/g2: (T, 3); d0: (T,); origin: (3,).
    Returns (t, mask) each (N, T).
    """
    ro_s = ro - origin
    m = cross(ro_s, rd)
    det = -_bdot3(rd, n)
    mask = jnp.abs(det) > 0.0
    inv = jnp.where(mask, 1.0 / jnp.where(mask, det, 1.0), 0.0)
    u = inv * (_bdot3(m, e13) - _bdot3(rd, g1))
    mask = mask & (u >= 0.0) & (u <= 1.0)
    v = inv * (_bdot3(rd, g2) - _bdot3(m, e12))
    mask = mask & (v >= 0.0) & (u + v <= 1.0)
    t = inv * (_bdot3(ro_s, n) - d0[None, :])
    mask = mask & (t >= t_min) & (t <= t_max)
    return t, mask


def triangle_cluster_sweep_t(
    ro, rd, origin, cl_lo, cl_hi,
    cl_e12, cl_e13, cl_n, cl_g1, cl_g2, cl_d0,
    t_min, t_max,
):
    """Two-level cluster sweep: the large-mesh replacement for both the
    dense (N, T) sweep (HBM-quadratic) and the skip-link BVH walk
    (divergence/gather-bound; reference src/bvh/bvh.rs:182-239).

    Triangles arrive Morton-sorted (models/compiler.py:_build_bvh), cut
    into K contiguous clusters of C triangles with per-cluster AABBs.
    A ``lax.scan`` visits clusters in order; each step slab-tests the
    whole ray block against one AABB (branch-free, (N,) work) and only
    when ANY ray's interval [t_min, min(best_t, t_max)] overlaps does a
    scalar ``lax.cond`` fire the dense (N, C) triple-product sweep for
    that cluster.  Coherent ray blocks skip most clusters (the Morton
    order keeps spatially close triangles in the same cluster), while
    the inner sweep stays pure VPU FMAs — no per-ray pointer chase, no
    scalar-unit gathers.  The shrinking per-ray ``best_t`` both culls
    later clusters and tightens their inner sweeps.

    Tie rule matches the dense sweep's argmin exactly: within a cluster
    the lowest local index wins, across clusters a later cluster must be
    strictly nearer — so equal-t ties resolve to the lowest global
    index, and (t, idx) is bit-identical to ``triangle_sweep_t`` +
    argmin whenever no cluster is (correctly) culled.

    ro, rd: (N, 3); origin: (3,) shared translated origin (same one the
    sweep constants were built against — cl_lo/cl_hi are stored already
    translated); cl_lo/cl_hi: (K, 3); cl_e12/cl_e13/cl_n/cl_g1/cl_g2:
    (K, C, 3); cl_d0: (K, C).  Padded rows carry n == 0 so their det
    masks out.  Returns (t_best, index, mask) each (N,).
    """
    from jax import lax

    n_rays = ro.shape[0]
    k, c = cl_d0.shape
    ro_s = ro - origin
    m = cross(ro_s, rd)
    # IEEE 1/0 = inf is what the slab test wants; 0*inf NaNs only when
    # ro sits exactly on a slab plane of a parallel ray — the same
    # corner the BVH walk (aabb_hit) accepts, and NaN near/far fails
    # the <= comparisons, i.e. a conservative miss, identical there.
    inv_rd = 1.0 / rd

    def sweep(carry, xs):
        best_t, best_i = carry
        lo, hi, e12, e13, nrm, g1, g2, d0, base = xs
        t0 = (lo[None, :] - ro_s) * inv_rd
        t1 = (hi[None, :] - ro_s) * inv_rd
        near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), t_min)
        far = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), t_max)
        window = jnp.minimum(best_t, t_max)
        alive = (near <= jnp.minimum(far, window))

        def hit_cluster(carry):
            best_t, best_i = carry
            det = -_bdot3(rd, nrm)
            mask = jnp.abs(det) > 0.0
            inv = jnp.where(mask, 1.0 / jnp.where(mask, det, 1.0), 0.0)
            u = inv * (_bdot3(m, e13) - _bdot3(rd, g1))
            mask = mask & (u >= 0.0) & (u <= 1.0)
            v = inv * (_bdot3(rd, g2) - _bdot3(m, e12))
            mask = mask & (v >= 0.0) & (u + v <= 1.0)
            t = inv * (_bdot3(ro_s, nrm) - d0[None, :])
            mask = mask & (t >= t_min) & (t <= t_max)
            tm = jnp.where(mask, t, INF)
            li = jnp.argmin(tm, axis=1).astype(jnp.int32)
            tb = jnp.take_along_axis(tm, li[:, None], axis=1)[:, 0]
            better = tb < best_t  # strict: earlier cluster keeps ties
            return (
                jnp.where(better, tb, best_t),
                jnp.where(better, base + li, best_i),
            )

        carry = lax.cond(jnp.any(alive), hit_cluster, lambda cr: cr, carry)
        return carry, None

    init = (
        jnp.full((n_rays,), INF, dtype=jnp.float32),
        jnp.zeros((n_rays,), dtype=jnp.int32),
    )
    base = jnp.arange(k, dtype=jnp.int32) * c
    (t_best, idx), _ = lax.scan(
        sweep, init,
        (cl_lo, cl_hi, cl_e12, cl_e13, cl_n, cl_g1, cl_g2, cl_d0, base),
    )
    return t_best, idx, t_best < INF


# Rect axis permutations: variant -> (idx0, idx1, idx2) where idx2 is the
# plane axis (reference aa_rect.rs rect_shape! instantiations):
#   0 = XYRect (x0 x1 y0 y1, k on z), 1 = YZRect (y0 y1 z0 z1, k on x),
#   2 = ZXRect (z0 z1 x0 x1, k on y)
RECT_AXES = np.array([[0, 1, 2], [1, 2, 0], [2, 0, 1]], dtype=np.int32)
# One-hot basis row per variant for each role: ua on idx0, ub on idx1,
# uk on idx2.  Axis selection becomes three dot products (pure VPU) —
# dynamic-axis gathers (take_along_axis) cost ~100x more on TPU.
RECT_UA = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32)
RECT_UB = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], dtype=np.float32)
RECT_UK = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], dtype=np.float32)


def rect_t(ro, rd, axis, a0, a1, b0, b1, k, t_min, t_max):
    """Axis-aligned rect hit (reference aa_rect.rs:114-144).

    ``axis`` is the variant id (0=xy,1=yz,2=zx); a/b/k are the rect
    params in the variant's own (a0,a1,b0,b1,k) order.  Returns
    (t, mask, a, b) where (a, b) are the in-plane hit coordinates.
    """
    ua = take_rows(RECT_UA, axis)  # (..., 3)
    ub = take_rows(RECT_UB, axis)
    uk = take_rows(RECT_UK, axis)
    o2 = jnp.sum(ro * uk, axis=-1)
    d2 = jnp.sum(rd * uk, axis=-1)
    # double-where the parallel-ray division: an unguarded inf t would
    # NaN the VJP of the in-plane coordinates below (0 cotangent x inf)
    d2_ok = d2 != 0.0
    t = jnp.where(d2_ok, (k - o2) / jnp.where(d2_ok, d2, 1.0), INF)
    t_safe = jnp.where(d2_ok, t, 0.0)
    mask = d2_ok & (t >= t_min) & (t <= t_max)
    a = jnp.sum(ro * ua, axis=-1) + t_safe * jnp.sum(rd * ua, axis=-1)
    b = jnp.sum(ro * ub, axis=-1) + t_safe * jnp.sum(rd * ub, axis=-1)
    mask = mask & (a >= a0) & (a <= a1) & (b >= b0) & (b <= b1)
    return t, mask, a, b


def rect_normal(axis, positive):
    """Outward normal of a rect variant before face flipping."""
    sign = jnp.where(positive, 1.0, -1.0)
    return take_rows(RECT_UK, axis) * sign[..., None]


def aabb_hit(ro, rd_inv, bb_min, bb_max, t_min, t_max):
    """Slab test (reference src/ray.rs:167-189).  rd_inv = 1/rd."""
    t0 = (bb_min - ro) * rd_inv
    t1 = (bb_max - ro) * rd_inv
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(lo, axis=-1), t_min)
    far = jnp.minimum(jnp.min(hi, axis=-1), t_max)
    return near <= far


def face_normal(rd, outward_normal):
    """Flip the geometric normal against the ray
    (reference src/hittable/mod.rs:145-155)."""
    front_face = dot(rd, outward_normal) < 0.0
    normal = jnp.where(front_face[..., None], outward_normal, -outward_normal)
    return front_face, normal


def matvec3(m, v):
    """(..., 3, 3) @ (..., 3) as explicit f32 multiply-adds on the VPU.

    NEVER use einsum/@ for these: XLA routes them to the MXU, which
    multiplies in bf16 by default — an O(1e-3) relative error that moves
    ray origins by whole units at Cornell-box scale and causes
    self-intersection (observed: transformed-scene walls going black on
    TPU while CPU renders were correct).
    """
    return jnp.sum(m * v[..., None, :], axis=-1)


def transform_ray(inv, inv_t, ro, rd):
    """World ray -> object space (reference transform.rs:72-83).

    Returns (ro_obj, rd_obj_unit, norm) where world t = object t / norm.
    ``inv`` is (..., 3, 3) row-major, ``inv_t`` (..., 3).
    """
    ro_obj = matvec3(inv, ro) + inv_t
    d = matvec3(inv, rd)
    n = norm(d)
    return ro_obj, d / jnp.maximum(n[..., None], 1e-30), n


def transform_point(fwd, fwd_t, p):
    return matvec3(fwd, p) + fwd_t


def transform_dir(fwd, d):
    return matvec3(fwd, d)
