"""Counter-hash RNG for per-ray uniforms.

TPU-native replacement for per-ray ``fold_in`` + ``uniform`` draws:
threefry is ALU-heavy on the VPU (a 1024x1024 pass needs ~5M primary
uniforms — ~60 ms measured as threefry, ~2 ms as this hash), while a
double-PCG counter hash is a handful of uint32 VPU ops in ray-major
layout.  Every uniform is a pure function of (key, ray id, stream
index, column) — independent of where the ray sits in any wavefront —
which is what makes compaction bit-identical to the dense loop and the
PRB replays layout-invariant (render/integrator.py docstring).

Statistical quality is the PCG-RXS-M-XS output permutation applied
twice with independent key-derived offsets; the estimator test battery
(furnace, MIS unbiasedness, closed-form oracles, PRB==AD==FD) pins the
Monte Carlo quality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pcg(x):
    """One PCG-RXS-M-XS round on uint32 — a well-mixed permutation."""
    x = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    x = ((x >> ((x >> jnp.uint32(28)) + jnp.uint32(4))) ^ x) * jnp.uint32(
        277803737
    )
    return (x >> jnp.uint32(22)) ^ x


def ray_uniforms(key, ids, stream, n_cols: int):
    """(n, n_cols) uniforms keyed per **ray id** — a pure function of
    (key, ray id, stream, column), independent of wavefront layout.

    ``stream`` selects an independent block of columns (the integrator
    passes the global bounce index; the camera passes 0 under its own
    subkey)."""
    kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    # fold every key word plus the stream index into two 32-bit seeds
    s1 = jnp.uint32(0x9E3779B9)
    for w in kd:
        s1 = pcg(s1 ^ w)
    s1 = pcg(s1 + jnp.asarray(stream, jnp.uint32))
    s2 = pcg(s1 ^ jnp.uint32(0x85EBCA6B))

    base = pcg(ids.astype(jnp.uint32) ^ s1)  # (n,)
    cols = pcg(
        jnp.arange(n_cols, dtype=jnp.uint32) * jnp.uint32(0x632BE59B) + s2
    )  # (n_cols,)
    h = pcg(base[:, None] + cols[None, :])  # (n, n_cols)
    # 24 high bits -> [0, 1), the jax.random.uniform convention
    return (h >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2**-24)
