"""Thin-lens perspective camera (reference src/camera.rs).

``CameraParam`` mirrors the reference serde schema (camera.rs:16-32);
``Camera`` precomputes the viewport basis on the host (camera.rs:64-112)
and generates whole blocks of rays from pixel coordinates + uniforms
(camera.rs:113-129) — the batched version of ``get_ray``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ray_tracing_tpu.ops import geometry as geo
from ray_tracing_tpu.ops import sampling as smp


@dataclasses.dataclass
class CameraParam:
    """Serde-schema-compatible camera description (reference camera.rs:16-32)."""

    look_from: Sequence[float]
    look_at: Sequence[float]
    vfov: float
    up: Optional[Sequence[float]] = None
    aspect_ratio: Optional[float] = None
    aperture: Optional[float] = None
    focus_dist: Optional[float] = None
    time0: Optional[float] = None
    time1: Optional[float] = None

    @classmethod
    def from_json(cls, d: dict) -> "CameraParam":
        return cls(
            look_from=d["look_from"],
            look_at=d["look_at"],
            vfov=d["vfov"],
            up=d.get("up"),
            aspect_ratio=d.get("aspect_ratio"),
            aperture=d.get("aperture"),
            focus_dist=d.get("focus_dist"),
            time0=d.get("time0"),
            time1=d.get("time1"),
        )


@struct.dataclass
class Camera:
    origin: jnp.ndarray  # (3,)
    lower_left_corner: jnp.ndarray  # (3,)
    horizontal: jnp.ndarray  # (3,)
    vertical: jnp.ndarray  # (3,)
    u: jnp.ndarray  # (3,) unit
    v: jnp.ndarray  # (3,) unit
    lens_radius: jnp.ndarray  # ()
    time0: jnp.ndarray  # ()
    time1: jnp.ndarray  # ()

    @classmethod
    def build(cls, param: CameraParam, default_aspect_ratio: float) -> "Camera":
        """Host-side precompute (reference camera.rs:86-112)."""
        look_from = np.asarray(param.look_from, np.float32)
        look_at = np.asarray(param.look_at, np.float32)
        theta = float(param.vfov) * np.pi / 180.0
        h = np.tan(theta / 2.0)
        viewport_height = 2.0 * h
        aspect = (
            float(param.aspect_ratio)
            if param.aspect_ratio is not None
            else float(default_aspect_ratio)
        )
        viewport_width = aspect * viewport_height

        w = look_from - look_at
        w = w / np.linalg.norm(w)
        up = np.asarray(
            param.up if param.up is not None else [0.0, 1.0, 0.0], np.float32
        )
        u = np.cross(up, w)
        u = u / np.linalg.norm(u)
        v = np.cross(w, u)
        v = v / np.linalg.norm(v)

        focus_dist = (
            float(param.focus_dist)
            if param.focus_dist is not None
            else float(np.linalg.norm(look_from - look_at))
        )
        horizontal = u * (focus_dist * viewport_width)
        vertical = v * (focus_dist * viewport_height)
        lower_left = look_from - horizontal / 2.0 - vertical / 2.0 - w * focus_dist

        aperture = float(param.aperture) if param.aperture is not None else 0.0
        return cls(
            origin=jnp.asarray(look_from, jnp.float32),
            lower_left_corner=jnp.asarray(lower_left, jnp.float32),
            horizontal=jnp.asarray(horizontal, jnp.float32),
            vertical=jnp.asarray(vertical, jnp.float32),
            u=jnp.asarray(u, jnp.float32),
            v=jnp.asarray(v, jnp.float32),
            lens_radius=jnp.float32(aperture / 2.0),
            time0=jnp.float32(param.time0 if param.time0 is not None else 0.0),
            time1=jnp.float32(param.time1 if param.time1 is not None else 0.0),
        )

    def get_rays(
        self, st: jnp.ndarray, u_lens1, u_lens2, u_time
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Batched get_ray (reference camera.rs:113-129).

        st: (N, 2) viewport coordinates in [0, 1]^2;
        returns (origin (N,3), direction (N,3) unit, time (N,)).
        """
        rd = smp.random_in_unit_disk(u_lens1, u_lens2) * self.lens_radius
        offset = self.u[None, :] * rd[..., 0:1] + self.v[None, :] * rd[..., 1:2]
        source = self.origin[None, :] + offset
        target = (
            self.lower_left_corner[None, :]
            + self.horizontal[None, :] * st[..., 0:1]
            + self.vertical[None, :] * st[..., 1:2]
        )
        direction = geo.normalize(target - source)
        time = self.time0 + u_time * (self.time1 - self.time0)
        return source, direction, time


def camera_rays(camera: "Camera", key, width: int, height: int,
                antialias: bool = True):
    """Primary rays + the trace subkey for one full-image 1-spp pass.

    The five per-ray camera uniforms (pixel jitter x2, lens x2, shutter
    time) come from the same (ray id)-keyed double-PCG counter hash the
    bounce loop uses (ops/rng.ray_uniforms) instead of threefry draws:
    generating ~5M threefry floats for a 1024x1024 pass measured ~60 ms
    on the TPU VPU, the counter hash ~2 ms, and the per-(key, ray id,
    column) independence argument is the bounce uniforms' own.  Returns
    ``(ro, rd, time, k_trace)`` — ``k_trace`` is the subkey the caller
    hands to the integrator, so primary and bounce streams stay
    independent (reference camera.rs:113-129 for the ray model).
    """
    import jax

    from ray_tracing_tpu.ops.rng import ray_uniforms

    n = width * height
    k_prim, k_trace = jax.random.split(key)
    u = ray_uniforms(k_prim, jnp.arange(n, dtype=jnp.int32), 0, 5)
    cols = jnp.arange(width, dtype=jnp.float32)[None, :]  # i
    rows = jnp.arange(height - 1, -1, -1, dtype=jnp.float32)[:, None]
    if antialias:
        s = (cols + u[:, 0].reshape(height, width) - 0.5) / width
        t = (rows + u[:, 1].reshape(height, width) - 0.5) / height
    else:
        s = jnp.broadcast_to(cols / width, (height, width))
        t = jnp.broadcast_to(rows / height, (height, width))
    st = jnp.stack([s.reshape(-1), t.reshape(-1)], axis=-1)
    ro, rd, time = camera.get_rays(st, u[:, 2], u[:, 3], u[:, 4])
    return ro, rd, time, k_trace


def sample_st(key, width: int, height: int, antialias: bool) -> jnp.ndarray:
    """Viewport sample positions for one full-image pass, top row first
    (reference renderer.rs:94-122: iproduct!((0..h).rev(), 0..w)).

    Returns (H*W, 2) f32.  With antialias, each pixel jitters uniformly
    in its footprint: (i + U - 0.5)/W; without, exactly (i/W, j/H).
    """
    import jax

    cols = jnp.arange(width, dtype=jnp.float32)[None, :]  # i
    rows = jnp.arange(height - 1, -1, -1, dtype=jnp.float32)[:, None]  # j, top first
    if antialias:
        u = jax.random.uniform(key, (height, width, 2), dtype=jnp.float32)
        s = (cols + u[..., 0] - 0.5) / width
        t = (rows + u[..., 1] - 0.5) / height
    else:
        s = jnp.broadcast_to(cols / width, (height, width))
        t = jnp.broadcast_to(rows / height, (height, width))
    return jnp.stack([s.reshape(-1), t.reshape(-1)], axis=-1)


def stamp_shutter(scene, camera: "Camera"):
    """Stamp the camera's [time0, time1] window into ``scene.shutter``
    when the scene has moving spheres — per-ray shutter times are
    derived id-keyed from it inside the bounce loop (ops/rng.ray_time).
    No-op for motionless scenes.  Every camera-having entry point
    (render_pass, the sharded helpers) calls this; ray-level APIs
    (trace, prb_*) read whatever ``scene.shutter`` the caller set."""
    if scene.has_motion:
        return scene.replace(
            shutter=jnp.stack([camera.time0, camera.time1])
        )
    return scene
