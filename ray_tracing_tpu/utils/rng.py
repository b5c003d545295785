"""Counter-based RNG plumbing.

The reference uses per-thread ``ThreadRng`` drawn lane-by-lane
(reference src/random.rs:6-16); that is neither reproducible nor
TPU-friendly. Here every random draw comes from a threefry key derived as
``fold_in(base_key, (iteration, bounce, purpose))`` so renders are exactly
reproducible across hosts/devices and differentiable replays see identical
noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Purpose tags: keep stable so a render is bit-reproducible across versions.
P_PIXEL_JITTER = 0
P_LENS = 1
P_TIME = 2
P_BOUNCE = 3


def iteration_key(base_key: jax.Array, iteration) -> jax.Array:
    """Key for one full-image 1-spp pass (the reference's rayon job unit,
    reference src/main.rs:39-63)."""
    return jax.random.fold_in(base_key, iteration)


def purpose_key(it_key: jax.Array, purpose: int, extra: int = 0) -> jax.Array:
    k = jax.random.fold_in(it_key, purpose)
    if extra:
        k = jax.random.fold_in(k, extra)
    return k


def bounce_uniforms(it_key: jax.Array, bounce, n_rays: int, n_cols: int) -> jax.Array:
    """All uniforms one bounce consumes, as one (n_rays, n_cols) f32 draw in
    [0, 1)."""
    k = jax.random.fold_in(purpose_key(it_key, P_BOUNCE), bounce)
    return jax.random.uniform(k, (n_rays, n_cols), dtype=jnp.float32)
