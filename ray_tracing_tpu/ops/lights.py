"""Light importance sampling: pdf values and direction generation for the
scene's "important" primitives.

Re-expresses the reference's ``Samplable`` trait + ``HittableGroup``
uniform mixture (reference src/hittable/sphere.rs:100-144,
triangle.rs:103-146, aa_rect.rs:146-185, hittables/group.rs:76-95) as
statically-unrolled per-light blocks: the light list is tiny and fixed
per scene, so each light contributes one fused pdf/sample expression
instead of dynamic dispatch.

Transform semantics follow reference transform.rs:98-125: pdf values are
evaluated in *object* space (distances and cosines measured there), and
generated directions are mapped back through the forward matrix.
"""

from __future__ import annotations

import jax.numpy as jnp

from ray_tracing_tpu.models.scene import (
    LIGHT_RECT,
    LIGHT_SPHERE,
    LIGHT_TRIANGLE,
    SceneData,
)
from ray_tracing_tpu.ops import geometry as geo
from ray_tracing_tpu.ops.geometry import take_rows
from ray_tracing_tpu.ops import sampling as smp

EPSILON = geo.EPSILON
INF = jnp.inf


def _to_object(scene: SceneData, tidx: int, p, d_unit):
    """origin/direction -> object space with direction re-normalized
    (reference transform.rs:105-112).  tidx is a static int."""
    if tidx == 0:
        return p, d_unit
    inv = scene.transforms.inv[tidx]
    inv_t = scene.transforms.inv_t[tidx]
    p_o = geo.matvec3(inv, p) + inv_t
    d_o = geo.normalize(geo.matvec3(inv, d_unit))
    return p_o, d_o


def _sphere_value(scene, index, tidx, p, d):
    sp = scene.spheres
    p_o, d_o = _to_object(scene, tidx, p, d)
    center, radius = sp.center[index], sp.radius[index]
    hit = geo.sphere_t(p_o, d_o, center, radius, EPSILON, INF)
    co = center - p_o
    dist_sq = geo.dot(co, co)
    # safe_sqrt/safe_div: a sample point inside the light sphere (or at
    # its center) makes the cone degenerate; the reference's scalar math
    # NaNs there (sqrt of negative) — here the pdf saturates to INF so
    # the MIS weight cleanly collapses to 0, and the guarded forms keep
    # parameter gradients NaN-free (tests/test_lights_edges.py)
    cos_max = geo.safe_sqrt(1.0 - geo.safe_div(radius * radius, dist_sq, INF))
    solid_angle = 2.0 * jnp.pi * (1.0 - cos_max)
    val = geo.safe_div(jnp.ones_like(solid_angle), solid_angle, INF)
    return jnp.where(hit.mask, val, 0.0)


def _sphere_generate(scene, index, tidx, p, u1, u2):
    sp = scene.spheres
    p_o, _ = _to_object(scene, tidx, p, jnp.zeros_like(p).at[..., 0].set(1.0))
    center, radius = sp.center[index], sp.radius[index]
    direction = center - p_o
    local = smp.random_to_sphere(u1, u2, radius, geo.dot(direction, direction))
    d_o = geo.normalize(smp.rotate_local(direction, local))
    if tidx != 0:
        fwd = scene.transforms.fwd[tidx]
        return geo.normalize(geo.matvec3(fwd, d_o))
    return d_o


def _triangle_value(scene, index, tidx, p, d):
    tr = scene.triangles
    p_o, d_o = _to_object(scene, tidx, p, d)
    v0, e12, e13 = tr.v0[index], tr.e12[index], tr.e13[index]
    t, mask, u, v, det = geo.triangle_t(p_o, d_o, v0, e12, e13, EPSILON, INF)
    w = 1.0 - u - v
    normal = geo.normalize(
        tr.n0[index] * w[..., None]
        + tr.n1[index] * u[..., None]
        + tr.n2[index] * v[..., None]
    )
    area = 0.5 * geo.norm(jnp.cross(e12, e13))
    cosine = jnp.abs(geo.dot(d_o, normal))
    # grazing-cosine pdf saturates to INF (MIS weight -> 0); safe forms
    # keep the VJP finite on masked lanes (t may be INF there)
    t_s = jnp.where(mask, t, 0.0)
    val = geo.safe_div(t_s * t_s, cosine * area, INF)
    return jnp.where(mask, val, 0.0)


def _triangle_generate(scene, index, tidx, p, u1, u2):
    tr = scene.triangles
    p_o, _ = _to_object(scene, tidx, p, jnp.zeros_like(p).at[..., 0].set(1.0))
    v0, e12, e13 = tr.v0[index], tr.e12[index], tr.e13[index]
    # uniform barycentric with EPSILON margins + fold-over
    # (reference triangle.rs:134-146)
    x = EPSILON + u1 * (1.0 - 2.0 * EPSILON)
    y = EPSILON + u2 * (1.0 - 2.0 * EPSILON)
    over = (x + y) > 1.0
    x = jnp.where(over, 1.0 - EPSILON - x, x)
    y = jnp.where(over, 1.0 - EPSILON - y, y)
    point = v0 + e12 * x[..., None] + e13 * y[..., None]
    d_o = geo.normalize(point - p_o)
    if tidx != 0:
        fwd = scene.transforms.fwd[tidx]
        return geo.normalize(geo.matvec3(fwd, d_o))
    return d_o


def _rect_value(scene, index, tidx, p, d):
    rc = scene.rects
    p_o, d_o = _to_object(scene, tidx, p, d)
    axis = rc.axis[index]
    a0, a1, b0, b1 = rc.a0[index], rc.a1[index], rc.b0[index], rc.b1[index]
    t, mask, _, _ = geo.rect_t(
        p_o, d_o, axis, a0, a1, b0, b1, rc.k[index], EPSILON, INF
    )
    area = (a1 - a0) * (b1 - b0)
    outward = geo.rect_normal(axis, rc.positive[index])
    _, normal = geo.face_normal(d_o, outward)
    cosine = jnp.abs(geo.dot(d_o, normal))
    # grazing-cosine pdf saturates to INF (MIS weight -> 0); safe forms
    # keep the VJP finite on masked lanes (t may be INF there)
    t_s = jnp.where(mask, t, 0.0)
    val = geo.safe_div(t_s * t_s, cosine * area, INF)
    return jnp.where(mask, val, 0.0)


def _rect_generate(scene, index, tidx, p, u1, u2):
    rc = scene.rects
    p_o, _ = _to_object(scene, tidx, p, jnp.zeros_like(p).at[..., 0].set(1.0))
    axis = rc.axis[index]
    a = rc.a0[index] + u1 * (rc.a1[index] - rc.a0[index])
    b = rc.b0[index] + u2 * (rc.b1[index] - rc.b0[index])
    k = jnp.broadcast_to(rc.k[index], a.shape)
    point = (
        take_rows(geo.RECT_UA, axis) * a[..., None]
        + take_rows(geo.RECT_UB, axis) * b[..., None]
        + take_rows(geo.RECT_UK, axis) * k[..., None]
    )
    d_o = geo.normalize(point - p_o)
    if tidx != 0:
        fwd = scene.transforms.fwd[tidx]
        return geo.normalize(geo.matvec3(fwd, d_o))
    return d_o


_VALUE = {LIGHT_SPHERE: _sphere_value, LIGHT_TRIANGLE: _triangle_value,
          LIGHT_RECT: _rect_value}
_GENERATE = {LIGHT_SPHERE: _sphere_generate, LIGHT_TRIANGLE: _triangle_generate,
             LIGHT_RECT: _rect_generate}


def lights_value(scene: SceneData, p, d):
    """Uniform-mixture pdf over all lights: mean of per-light values
    (reference group.rs:76-89)."""
    lt = scene.lights
    n = len(lt)
    total = jnp.zeros(p.shape[:-1], dtype=jnp.float32)
    for kind, index, tidx in zip(lt.kind, lt.index, lt.transform):
        total = total + _VALUE[kind](scene, index, tidx, p, d)
    return total / float(n)


def lights_generate(scene: SceneData, p, u_pick, u1, u2):
    """Pick one light uniformly and sample a direction toward it
    (reference group.rs:91-95).  All lights are sampled and the pick is
    a gather — the light count is tiny and static."""
    lt = scene.lights
    n = len(lt)
    dirs = []
    for kind, index, tidx in zip(lt.kind, lt.index, lt.transform):
        dirs.append(_GENERATE[kind](scene, index, tidx, p, u1, u2))
    if n == 1:  # no pick needed (gathers are expensive on TPU)
        return dirs[0]
    pick = jnp.minimum((u_pick * n).astype(jnp.int32), n - 1)
    # static unrolled select over the small light list
    out = dirs[0]
    for i in range(1, n):
        out = jnp.where((pick == i)[..., None], dirs[i], out)
    return out
