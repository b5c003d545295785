"""Scene-wide nearest-hit intersection: the wavefront replacement for the
reference's per-shape bucketing pipeline (reference src/renderer.rs:131-183).

Two phases, both dense and branch-free:

* **Phase A** sweeps every primitive table against the ray block and
  produces only a ``(N, P)`` grid of candidate ``t`` values (masked to
  +inf), reduced by ``argmin`` per type and then across types.  This is
  the memory- and FLOP-dominant part and stays cheap: ~5 f32 temporaries
  per (ray, primitive) pair.
* **Phase B** gathers the single winning primitive per ray and re-runs
  the same hit math once to build the full hit record (p, normal, uv,
  front_face).  Re-running instead of storing keeps Phase A's footprint
  at O(N*P) scalars instead of O(N*P) records.

Medium primitives draw their free-flight uniform from ``med_u`` (one
column per medium primitive), so Phase B reproduces Phase A's stochastic
``t`` exactly.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ray_tracing_tpu.models.scene import SceneData
from ray_tracing_tpu.ops import geometry as geo
from ray_tracing_tpu.ops.geometry import take_rows

INF = jnp.inf

# primitive kind tags for the winning-type select (order = tie-break order;
# the reference breaks ties by global shape index, which type grouping
# cannot reproduce — ties only occur on measure-zero coincident surfaces)
KIND_NONE = -1
KIND_SPHERE = 0
KIND_TRIANGLE = 1
KIND_RECT = 2
KIND_MEDIUM = 3  # index = medium id (constant media live in scene.media)


@struct.dataclass
class Hit:
    """Batched hit record (reference src/hittable/mod.rs:24-32)."""

    p: jnp.ndarray  # (N, 3)
    normal: jnp.ndarray  # (N, 3) unit, flipped toward the ray
    t: jnp.ndarray  # (N,)
    uv: jnp.ndarray  # (N, 2)
    front_face: jnp.ndarray  # (N,) bool
    mask: jnp.ndarray  # (N,) bool — whether anything was hit
    material: jnp.ndarray  # (N,) i32 material id of the winner
    kind: jnp.ndarray  # (N,) i32 KIND_* of the winner
    index: jnp.ndarray  # (N,) i32 index within the winner's type table


def _sphere_object_ray(scene: SceneData, ro, rd, t_min, t_max):
    """Rays in each sphere's object space: (N,S,3) grids plus scaled
    t bounds (reference transform.rs:72-83).  Identity-only tables skip
    the matmuls entirely (static switch)."""
    sp = scene.spheres
    ro_n = ro[:, None, :]
    rd_n = rd[:, None, :]
    if sp.has_transforms:
        inv = scene.transforms.inv[sp.transform]
        inv_t = scene.transforms.inv_t[sp.transform]
        ro_o, rd_o, nrm = geo.transform_ray(inv, inv_t, ro_n, rd_n)
        return ro_o, rd_o, nrm, t_min * nrm, t_max * nrm
    return ro_n, rd_n, None, t_min, t_max


def _sphere_phase_a(scene: SceneData, ro, rd, t_min, t_max, t_ray=None):
    sp = scene.spheres
    ro_o, rd_o, nrm, t_min_o, t_max_o = _sphere_object_ray(
        scene, ro, rd, t_min, t_max
    )
    center = sp.center
    if sp.has_motion and t_ray is not None:
        # motion blur: each ray sees the sphere at its own shutter time
        # (builder guarantees motion and transforms never mix)
        center = center[None, :, :] + t_ray[:, None, None] * sp.vel[None]
    solid = geo.sphere_t(ro_o, rd_o, center, sp.radius, t_min_o, t_max_o)
    t, mask = solid.t, solid.mask
    if nrm is not None:
        t = t / nrm
    return t, mask


def _sphere_phase_b(scene: SceneData, ro, rd, t_min, t_max, idx, t_ray=None):
    """Full record for one gathered sphere per ray; idx: (N,)."""
    sp = scene.spheres
    center = take_rows(sp.center, idx)  # (N, 3)
    if sp.has_motion and t_ray is not None:
        center = center + t_ray[:, None] * take_rows(sp.vel, idx)
    radius = take_rows(sp.radius, idx)
    if sp.has_transforms:
        tr = take_rows(sp.transform, idx)
        inv = take_rows(scene.transforms.inv, tr)
        inv_t = take_rows(scene.transforms.inv_t, tr)
        fwd = take_rows(scene.transforms.fwd, tr)
        fwd_t = take_rows(scene.transforms.fwd_t, tr)
        ro_o, rd_o, nrm = geo.transform_ray(inv, inv_t, ro, rd)
        t_min_o, t_max_o = t_min * nrm, t_max * nrm
    else:
        ro_o, rd_o, nrm = ro, rd, None
        t_min_o, t_max_o = t_min, t_max

    root1, root2, disc_ok = geo.sphere_roots(ro_o, rd_o, center, radius)
    mask1 = disc_ok & (root1 >= t_min_o) & (root1 <= t_max_o)
    t_obj = jnp.where(mask1, root1, root2)

    p_obj = ro_o + rd_o * t_obj[..., None]
    outward = geo.normalize(p_obj - center)
    front_face, normal_obj = geo.face_normal(rd_o, outward)
    uv = geo.sphere_uv(outward)

    if sp.has_transforms:
        p = geo.transform_point(fwd, fwd_t, p_obj)
        normal = geo.normalize(geo.transform_dir(fwd, normal_obj))
        t = t_obj / nrm
    else:
        p, normal, t = p_obj, normal_obj, t_obj
    return p, normal, t, uv, front_face


def _triangle_phase_a(scene: SceneData, ro, rd, t_min, t_max):
    tr = scene.triangles
    t, mask, _, _, _ = geo.triangle_t(
        ro[:, None, :], rd[:, None, :], tr.v0, tr.e12, tr.e13, t_min, t_max
    )
    return t, mask


# Above this triangle count the dense sweep's O(N*T) work loses to the
# two-level cluster sweep (and that to nothing: it subsumes the BVH walk
# for every mesh size we can build); below it the flat sweep's
# branch-free VPU FMAs win by an order of magnitude (bunny 512^2:
# 19.6 s/pass BVH -> sweep, see git log).  Override with
# RAY_TPU_MESH=sweep|cluster|bvh|brute.
SWEEP_MAX_TRIS = 32768


def mesh_strategy(scene: SceneData) -> str:
    """Static choice of triangle intersection strategy: 'sweep' (dense
    triple-product grid), 'cluster' (two-level AABB-culled sweep for
    large meshes), 'bvh' (skip-link traversal), or 'brute' (legacy
    broadcast Möller–Trumbore for tables without sweep data)."""
    if scene.n_triangles == 0:
        return "none"
    mode = os.environ.get("RAY_TPU_MESH", "auto")
    if mode == "bvh":
        if scene.bvh is None:
            raise ValueError(
                "RAY_TPU_MESH=bvh requested but the scene has no BVH "
                "(built by SceneBuilder for mesh scenes); refusing to "
                "fall back silently — an A/B run would mislabel its "
                "numbers"
            )
        return "bvh"
    if mode == "sweep":
        if not scene.triangles.has_sweep:
            raise ValueError(
                "RAY_TPU_MESH=sweep requested but the triangle table "
                "has no sweep data (pack_triangle_sweep); refusing to "
                "fall back silently"
            )
        return "sweep"
    if mode == "cluster":
        if not scene.triangles.has_clusters:
            raise ValueError(
                "RAY_TPU_MESH=cluster requested but the triangle table "
                "has no cluster data (pack_triangle_clusters, built "
                "alongside the BVH); refusing to fall back silently"
            )
        return "cluster"
    if mode == "brute":
        return "brute"
    if scene.triangles.has_sweep and scene.n_triangles <= SWEEP_MAX_TRIS:
        return "sweep"
    if scene.triangles.has_clusters:
        return "cluster"
    if scene.bvh is not None:
        return "bvh"
    return "sweep" if scene.triangles.has_sweep else "brute"


def _triangle_sweep_phase_a(scene: SceneData, ro, rd, t_min, t_max):
    """Selection-only (like the BVH walk): gradients flow through the
    Phase B record rebuild, so the sweep runs on detached inputs."""
    tr = scene.triangles
    sg = jax.lax.stop_gradient
    return geo.triangle_sweep_t(
        sg(ro), sg(rd), sg(tr.e12), sg(tr.e13), sg(tr.sw_origin),
        sg(tr.sw_n), sg(tr.sw_g1), sg(tr.sw_g2), sg(tr.sw_d0),
        t_min, t_max,
    )


def _triangle_cluster_phase_a(scene: SceneData, ro, rd, t_min, t_max):
    """Selection-only two-level cluster sweep; per-ray (t, idx, mask)."""
    tr = scene.triangles
    sg = jax.lax.stop_gradient
    return geo.triangle_cluster_sweep_t(
        sg(ro), sg(rd), sg(tr.sw_origin), sg(tr.cl_lo), sg(tr.cl_hi),
        sg(tr.cl_e12), sg(tr.cl_e13), sg(tr.cl_n), sg(tr.cl_g1),
        sg(tr.cl_g2), sg(tr.cl_d0), t_min, t_max,
    )


def _triangle_phase_b(scene: SceneData, ro, rd, t_min, t_max, idx):
    tr = scene.triangles
    v0, e12, e13 = tr.v0[idx], tr.e12[idx], tr.e13[idx]
    t, mask, u, v, det = geo.triangle_t(ro, rd, v0, e12, e13, t_min, t_max)
    w = 1.0 - u - v
    p = ro + rd * t[..., None]
    normal = geo.normalize(
        tr.n0[idx] * w[..., None] + tr.n1[idx] * u[..., None] + tr.n2[idx] * v[..., None]
    )
    uv = tr.uv0[idx] * w[..., None] + tr.uv1[idx] * u[..., None] + tr.uv2[idx] * v[..., None]
    front_face = det > 0.0  # winding, not view (reference triangle.rs:92)
    return p, normal, t, uv, front_face


def _rect_object_ray(scene: SceneData, ro, rd, t_min, t_max):
    rc = scene.rects
    ro_n = ro[:, None, :]
    rd_n = rd[:, None, :]
    if rc.has_transforms:
        inv = scene.transforms.inv[rc.transform]
        inv_t = scene.transforms.inv_t[rc.transform]
        ro_o, rd_o, nrm = geo.transform_ray(inv, inv_t, ro_n, rd_n)
        return ro_o, rd_o, nrm, t_min * nrm, t_max * nrm
    return ro_n, rd_n, None, t_min, t_max


def _rect_phase_a(scene: SceneData, ro, rd, t_min, t_max):
    rc = scene.rects
    ro_o, rd_o, nrm, t_min_o, t_max_o = _rect_object_ray(scene, ro, rd, t_min, t_max)
    t, mask, _, _ = geo.rect_t(
        ro_o, rd_o, rc.axis, rc.a0, rc.a1, rc.b0, rc.b1, rc.k, t_min_o, t_max_o
    )
    if nrm is not None:
        t = t / nrm
    return t, mask


def _rect_phase_b(scene: SceneData, ro, rd, t_min, t_max, idx):
    rc = scene.rects
    axis = take_rows(rc.axis, idx)
    a0, a1 = take_rows(rc.a0, idx), take_rows(rc.a1, idx)
    b0, b1 = take_rows(rc.b0, idx), take_rows(rc.b1, idx)
    k = take_rows(rc.k, idx)
    positive = take_rows(rc.positive, idx)
    if rc.has_transforms:
        tr = take_rows(rc.transform, idx)
        inv = take_rows(scene.transforms.inv, tr)
        inv_t = take_rows(scene.transforms.inv_t, tr)
        fwd = take_rows(scene.transforms.fwd, tr)
        fwd_t = take_rows(scene.transforms.fwd_t, tr)
        ro_o, rd_o, nrm = geo.transform_ray(inv, inv_t, ro, rd)
        t_min_o, t_max_o = t_min * nrm, t_max * nrm
    else:
        ro_o, rd_o, nrm = ro, rd, None
        t_min_o, t_max_o = t_min, t_max
    t_obj, mask, a, b = geo.rect_t(
        ro_o, rd_o, axis, a0, a1, b0, b1, k, t_min_o, t_max_o
    )
    u = (a - a0) / (a1 - a0)
    v = (b - b0) / (b1 - b0)
    uv = jnp.stack([u, v], axis=-1)
    outward = geo.rect_normal(axis, positive)
    front_face, normal_obj = geo.face_normal(rd_o, outward)
    p_obj = ro_o + rd_o * t_obj[..., None]
    if rc.has_transforms:
        p = geo.transform_point(fwd, fwd_t, p_obj)
        normal = geo.normalize(geo.transform_dir(fwd, normal_obj))
        t = t_obj / nrm
    else:
        p, normal, t = p_obj, normal_obj, t_obj
    return p, normal, t, uv, front_face


def _boundary_nearest(bd, ro, rd, t_lo, t_hi):
    """Nearest hit of rays against one medium's boundary group
    (reference HittableGroup closest-hit fold, group.rs:58-67).

    t_lo may be a per-ray (N,) array (the second hit's window starts at
    the first hit + EPSILON).  Returns (t (N,), mask (N,)).
    """
    n = ro.shape[0]
    best_t = jnp.full((n,), INF, jnp.float32)
    found = jnp.zeros((n,), bool)
    lo = jnp.broadcast_to(jnp.asarray(t_lo, jnp.float32), (n,))[:, None]

    def fold(t_grid, mask_grid):
        nonlocal best_t, found
        t_masked = jnp.where(mask_grid, t_grid, INF)
        t_best = jnp.min(t_masked, axis=1)
        better = t_best < best_t
        best_t = jnp.where(better, t_best, best_t)
        found = found | jnp.any(mask_grid, axis=1)

    ro_n, rd_n = ro[:, None, :], rd[:, None, :]
    if bd.n_sph:
        # per-prim nearest-root select within the window, exactly the
        # sphere hit the group would fold (reference sphere.rs:72-82)
        root1, root2, disc_ok = geo.sphere_roots(
            ro_n, rd_n, bd.sph_center, bd.sph_radius
        )
        mask1 = disc_ok & (root1 >= lo) & (root1 <= t_hi)
        mask2 = disc_ok & (root2 >= lo) & (root2 <= t_hi)
        fold(jnp.where(mask1, root1, root2), mask1 | mask2)
    if bd.n_rect:
        t, mask, _, _ = geo.rect_t(
            ro_n, rd_n, bd.rect_axis, bd.rect_a0, bd.rect_a1,
            bd.rect_b0, bd.rect_b1, bd.rect_k, lo, t_hi,
        )
        fold(t, mask)
    if bd.n_tri:
        t, mask, _, _, _ = geo.triangle_t(
            ro_n, rd_n, bd.tri_v0, bd.tri_e12, bd.tri_e13, lo, t_hi
        )
        fold(t, mask)
    return best_t, found


def _medium_phase_a(scene: SceneData, ro, rd, t_min, t_max, med_u):
    """Free-flight candidate t per constant medium: the generic
    double-hit of reference constant_medium.rs:41-75 — first boundary
    hit over (-inf, inf), second over (t1+EPSILON, inf), exponential
    flight between them.  Returns (t (N, M), mask (N, M)); column m
    consumes uniform ``med_u[:, m]``."""
    from ray_tracing_tpu.ops.geometry import EPSILON

    ts, masks = [], []
    for m, bd in enumerate(scene.media.boundaries):
        slot = scene.media.transform[m]
        if slot:
            inv = scene.transforms.inv[slot]
            inv_t = scene.transforms.inv_t[slot]
            ro_o, rd_o, nrm = geo.transform_ray(inv, inv_t, ro, rd)
            t_min_o, t_max_o = t_min * nrm, t_max * nrm
        else:
            ro_o, rd_o, nrm = ro, rd, None
            t_min_o, t_max_o = t_min, t_max
        t1, m1 = _boundary_nearest(bd, ro_o, rd_o, -INF, INF)
        t2, m2 = _boundary_nearest(bd, ro_o, rd_o, t1 + EPSILON, INF)
        mask = m1 & m2
        lo = jnp.maximum(t1, t_min_o)
        hi = jnp.minimum(t2, t_max_o)
        mask = mask & (lo < hi)
        lo = jnp.maximum(lo, 0.0)
        flight = scene.media.niv[m] * jnp.log(jnp.maximum(med_u[:, m], 1e-38))
        mask = mask & (flight <= hi - lo)
        # reference quirk kept (constant_medium.rs:67-75): flight runs
        # from the clamped window but t is measured from the raw t1
        t = t1 + flight
        if nrm is not None:
            t = t / nrm
        ts.append(t)
        masks.append(mask)
    return jnp.stack(ts, axis=1), jnp.stack(masks, axis=1)


def intersect_scene(
    scene: SceneData,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_min: float,
    t_max: float,
    med_u: Optional[jnp.ndarray] = None,
    t_ray: Optional[jnp.ndarray] = None,
) -> Hit:
    """Nearest hit of each ray against the whole scene.

    ro, rd: (N, 3); med_u: (N, n_medium) uniforms for constant-medium
    free-flight sampling (may be None when the scene has no media);
    t_ray: (N,) per-ray shutter times for motion blur (None for
    shutter-less scenes — only moving spheres consume it).
    """
    n = ro.shape[0]
    best_t = jnp.full((n,), INF, dtype=jnp.float32)
    best_kind = jnp.full((n,), KIND_NONE, dtype=jnp.int32)
    best_idx = jnp.zeros((n,), dtype=jnp.int32)

    def consider(t_grid, mask_grid, kind):
        nonlocal best_t, best_kind, best_idx
        t_masked = jnp.where(mask_grid, t_grid, INF)
        idx = jnp.argmin(t_masked, axis=1).astype(jnp.int32)
        t_best = jnp.take_along_axis(t_masked, idx[:, None], axis=1)[:, 0]
        better = t_best < best_t
        best_t = jnp.where(better, t_best, best_t)
        best_kind = jnp.where(better, kind, best_kind)
        best_idx = jnp.where(better, idx, best_idx)

    def consider_per_ray(t_best, idx, mask_best, kind):
        nonlocal best_t, best_kind, best_idx
        better = mask_best & (t_best < best_t)
        best_t = jnp.where(better, t_best, best_t)
        best_kind = jnp.where(better, kind, best_kind)
        best_idx = jnp.where(better, idx, best_idx)

    # Pallas fast path for the analytic sweep: spheres + rects —
    # transformed or not — go through one fused VMEM kernel on TPU
    # (ops/pallas_intersect.py); set RAY_TPU_NO_PALLAS=1 to disable.
    use_pallas = False
    if os.environ.get("RAY_TPU_NO_PALLAS") != "1":
        from ray_tracing_tpu.ops.pallas_intersect import (
            pallas_eligible,
            pallas_phase_a,
        )

        # the kernel hardcodes the (EPSILON, INF) window every render
        # call uses; honor any other bounds via the XLA path
        use_pallas = (
            pallas_eligible(scene)
            and t_min == geo.EPSILON
            and t_max == INF
            and jax.default_backend() in ("tpu", "axon")
        )
    if use_pallas:
        pt, pkind, pidx = pallas_phase_a(scene, ro, rd, t_ray)
        better = (pkind >= 0) & (pt < best_t)
        best_t = jnp.where(better, pt, best_t)
        best_kind = jnp.where(better, pkind, best_kind)
        best_idx = jnp.where(better, pidx, best_idx)
    elif scene.n_spheres:
        consider(
            *_sphere_phase_a(scene, ro, rd, t_min, t_max, t_ray),
            KIND_SPHERE,
        )
    if scene.n_triangles:
        strategy = mesh_strategy(scene)
        if strategy == "bvh":
            from ray_tracing_tpu.ops.bvh import bvh_traverse_triangles

            bh = bvh_traverse_triangles(scene.bvh, ro, rd, t_min, t_max)
            consider_per_ray(bh.t, bh.index, bh.mask, KIND_TRIANGLE)
        elif strategy in ("sweep", "cluster"):
            # both kernels hardcode the (EPSILON, INF) window.  "sweep"
            # (<= SWEEP_MAX_TRIS) gets the fixed-grid SMEM streamer;
            # "cluster" gets the demand-fetched two-level kernel — the
            # fixed streamer degenerates to O(rays x tris) at cluster
            # scale (measured 8.6 s/pass vs 2.1 for the XLA cluster
            # sweep on a 79k-tri bunny grid at 512^2 before the DMA
            # kernel existed).  Each strategy checks its OWN
            # eligibility: the cluster kernel's 1-D AABB tables reach
            # ~1M triangles while the fixed kernel caps at 128k.
            pallas_window = (
                os.environ.get("RAY_TPU_NO_PALLAS") != "1"
                and t_min == geo.EPSILON
                and t_max == INF
                and jax.default_backend() in ("tpu", "axon")
            )
            use_tri_pallas = False
            if pallas_window:
                from ray_tracing_tpu.ops.pallas_triangles import (
                    pallas_cluster_eligible,
                    pallas_cluster_sweep,
                    pallas_triangle_sweep,
                    pallas_triangles_eligible,
                )

                use_tri_pallas = (
                    pallas_cluster_eligible(scene)
                    if strategy == "cluster"
                    else pallas_triangles_eligible(scene)
                )
            if use_tri_pallas and strategy == "cluster":
                tt, ti, tm = pallas_cluster_sweep(scene, ro, rd)
                consider_per_ray(tt, ti, tm, KIND_TRIANGLE)
            elif use_tri_pallas:
                tt, ti, tm = pallas_triangle_sweep(scene, ro, rd)
                consider_per_ray(tt, ti, tm, KIND_TRIANGLE)
            elif strategy == "sweep":
                consider(
                    *_triangle_sweep_phase_a(scene, ro, rd, t_min, t_max),
                    KIND_TRIANGLE,
                )
            else:
                ct, ci, cm = _triangle_cluster_phase_a(
                    scene, ro, rd, t_min, t_max
                )
                consider_per_ray(ct, ci, cm, KIND_TRIANGLE)
        else:
            consider(*_triangle_phase_a(scene, ro, rd, t_min, t_max), KIND_TRIANGLE)
    if scene.n_rects and not use_pallas:
        consider(*_rect_phase_a(scene, ro, rd, t_min, t_max), KIND_RECT)
    if scene.n_medium:
        consider(
            *_medium_phase_a(scene, ro, rd, t_min, t_max, med_u), KIND_MEDIUM
        )

    mask = best_kind != KIND_NONE

    # Phase B: rebuild the winner's full record (one primitive per ray).
    p = jnp.zeros_like(ro)
    normal = jnp.zeros_like(ro).at[..., 1].set(1.0)
    uv = jnp.zeros((n, 2), dtype=jnp.float32)
    front_face = jnp.zeros((n,), dtype=bool)
    material = jnp.zeros((n,), dtype=jnp.int32)

    def merge(kind, rec, mat_ids):
        nonlocal p, normal, uv, front_face, material
        sel = best_kind == kind
        bp, bn, _bt, buv, bf = rec
        p = jnp.where(sel[:, None], bp, p)
        normal = jnp.where(sel[:, None], bn, normal)
        uv = jnp.where(sel[:, None], buv, uv)
        front_face = jnp.where(sel, bf, front_face)
        material = jnp.where(sel, mat_ids, material)

    if scene.n_spheres:
        rec = _sphere_phase_b(scene, ro, rd, t_min, t_max, best_idx, t_ray)
        merge(KIND_SPHERE, rec, take_rows(scene.spheres.material, best_idx))
    if scene.n_triangles:
        rec = _triangle_phase_b(scene, ro, rd, t_min, t_max, best_idx)
        merge(KIND_TRIANGLE, rec, take_rows(scene.triangles.material, best_idx))
    if scene.n_rects:
        rec = _rect_phase_b(scene, ro, rd, t_min, t_max, best_idx)
        merge(KIND_RECT, rec, take_rows(scene.rects.material, best_idx))
    if scene.n_medium:
        # reference constant_medium.rs:77-84: fixed +x normal, front
        # face true, uv zero; p follows from the world-space ray
        sel = best_kind == KIND_MEDIUM
        p = jnp.where(sel[:, None], ro + rd * best_t[:, None], p)
        med_n = jnp.zeros((n, 3), jnp.float32).at[:, 0].set(1.0)
        normal = jnp.where(sel[:, None], med_n, normal)
        uv = jnp.where(sel[:, None], 0.0, uv)
        front_face = jnp.where(sel, True, front_face)
        material = jnp.where(sel, take_rows(scene.media.material, best_idx), material)

    return Hit(
        p=p,
        normal=normal,
        t=best_t,
        uv=uv,
        front_face=front_face,
        mask=mask,
        material=material,
        kind=best_kind,
        index=best_idx,
    )
