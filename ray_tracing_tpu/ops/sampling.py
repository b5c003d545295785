"""Directional samplers and PDFs, driven by explicit uniform draws.

TPU-native counterparts of the reference's lane-by-lane RNG helpers
(reference src/random.rs:6-65) and PDF framework (reference
src/pdf/cosine.rs, mixture.rs).  Every sampler takes its uniforms as
arguments so the whole render is a pure function of one threefry key —
the property that makes multi-host determinism and path-replay
differentiation possible (the reference's ThreadRng has neither).

All functions broadcast over leading batch dims; vectors are (..., 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from ray_tracing_tpu.ops.geometry import (
    cross,
    dot,
    normalize,
    safe_div,
    safe_sqrt,
)

TWO_PI = 2.0 * jnp.pi


def uniform_in_range(u, lo, hi):
    """Map U[0,1) draw into [lo, hi) (reference random.rs:6-16)."""
    return lo + u * (hi - lo)


def random_in_unit_disk(u1, u2):
    """(reference random.rs:18-25)"""
    r = jnp.sqrt(u1)
    theta = TWO_PI * u2
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def random_to_sphere(u1, u2, radius, distance_squared):
    """Cone sample toward a sphere (reference random.rs:27-39).
    Local frame: +z points at the sphere center."""
    phi = TWO_PI * u1
    # safe forms: sample points inside/at the sphere give a degenerate
    # cone; keep primal identical, VJP finite (see geometry.safe_sqrt)
    cos_max = safe_sqrt(1.0 - safe_div(radius * radius, distance_squared,
                                       jnp.inf))
    z = 1.0 + u2 * (cos_max - 1.0)
    xy = safe_sqrt(1.0 - z * z)
    return jnp.stack([jnp.cos(phi) * xy, jnp.sin(phi) * xy, z], axis=-1)


def random_on_unit_sphere(u1, u2):
    """(reference random.rs:41-51)"""
    z = uniform_in_range(u1, -1.0, 1.0)
    theta = TWO_PI * u2
    xy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([jnp.cos(theta) * xy, jnp.sin(theta) * xy, z], axis=-1)


def random_in_unit_sphere(u1, u2, u3):
    """(reference random.rs:53-65)"""
    theta = TWO_PI * u1
    cos_phi = uniform_in_range(u2, -1.0, 1.0)
    r = jnp.cbrt(u3)
    sin_phi = jnp.sqrt(jnp.maximum(1.0 - cos_phi * cos_phi, 0.0))
    return jnp.stack(
        [
            r * sin_phi * jnp.cos(theta),
            r * sin_phi * jnp.sin(theta),
            r * cos_phi,
        ],
        axis=-1,
    )


def face_towards(direction, up):
    """Rotation whose local +z maps to ``direction`` (nalgebra
    Rotation3::face_towards semantics, used by reference cosine.rs:25
    and sphere.rs:137-141).  Returns the three world-frame columns
    (xaxis, yaxis, zaxis)."""
    zaxis = normalize(direction)
    xaxis = normalize(cross(up, zaxis))
    yaxis = cross(zaxis, xaxis)
    return xaxis, yaxis, zaxis


def onb_up(direction):
    """The reference's up-vector pick: (0,1,0) when |dir.x| > 0.9 else
    (1,0,0) (reference cosine.rs:18-24, sphere.rs:133-138)."""
    selector = jnp.abs(direction[..., 0]) > 0.9
    zeros = jnp.zeros_like(direction[..., 0])
    up = jnp.stack(
        [jnp.where(selector, zeros, 1.0), jnp.where(selector, 1.0, zeros), zeros],
        axis=-1,
    )
    return up


def rotate_local(direction, local):
    """Map a local-frame vector into world via face_towards(direction)."""
    xaxis, yaxis, zaxis = face_towards(direction, onb_up(direction))
    return (
        xaxis * local[..., 0:1] + yaxis * local[..., 1:2] + zaxis * local[..., 2:3]
    )


def cosine_pdf_value(normal, direction):
    """cos(theta)/pi over the hemisphere around ``normal``
    (reference cosine.rs:32-37)."""
    cosine = dot(direction, normal)
    return jnp.where(cosine > 0.0, cosine / jnp.pi, 0.0)


def cosine_pdf_generate(normal, u1, u2):
    """Cosine-weighted hemisphere around ``normal``
    (reference cosine.rs:38-48)."""
    z = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    phi = TWO_PI * u1
    sqrt_r2 = jnp.sqrt(u2)
    local = jnp.stack([jnp.cos(phi) * sqrt_r2, jnp.sin(phi) * sqrt_r2, z], axis=-1)
    return rotate_local(normal, local)


def reflect(v, n):
    """(reference material/mod.rs:47-52)"""
    return v - n * (2.0 * dot(v, n))[..., None]


def refract(uv, n, etai_over_etat):
    """Snell refraction of unit vectors (reference material/mod.rs:54-63)."""
    cos_theta = -dot(uv, n)
    r_out_perp = (uv + n * cos_theta[..., None]) * etai_over_etat[..., None]
    k = 1.0 - jnp.sum(r_out_perp * r_out_perp, axis=-1)
    # double-where: total-internal-reflection lanes (k <= 0) are selected
    # away by the caller, but sqrt'(0)=inf times their zero cotangent
    # would NaN reverse-mode gradients of the refraction ratio
    k_pos = k > 0.0
    root = jnp.where(k_pos, jnp.sqrt(jnp.where(k_pos, k, 1.0)), 0.0)
    return r_out_perp - n * root[..., None]


def schlick_reflectance(cosine, ref_idx):
    """(reference dielectric.rs:23-27)"""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5
