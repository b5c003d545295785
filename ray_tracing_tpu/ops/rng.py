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
Monte Carlo quality, and tests/test_ray_uniforms.py runs marginal /
decorrelation / chi-square checks at two sample sizes.

Collision / period envelope (everything below is per 32-bit word):

- ``pcg`` is a bijection of uint32, so for a fixed (key, stream,
  column) the map id -> h is ``pcg(pcg(id ^ s1) + c)`` — a composition
  of bijections — i.e. a PERMUTATION of the 2^32 id space.  Distinct
  ray ids never collide in h; marginal uniformity over the full id
  space is exact (each 24-bit output value appears exactly 256 times).
- The 24-bit truncation (matching ``jax.random.uniform``) means
  *values* repeat among ~2^12+ draws (birthday bound) — expected and
  benign for Monte Carlo; it is h-collisions that would correlate
  paths, and those cannot happen within a column.
- Across streams: s1 = pcg(fold(key) + stream) with stream a uint32,
  so at most 2^32 distinct streams per key and birthday s1-collisions
  at ~2^16 streams.  The integrator passes the bounce index as the
  stream (<= max_depth ~ 50), far inside the safe regime.
- Across columns: column offsets are ``pcg(c * 0x632BE59B + s2)`` —
  distinct per column for n_cols < 2^32; in practice n_cols <= ~16.
- DEGRADATION REGIME: ids are cast to uint32, so a wavefront of more
  than 2^32 rays *per (key, stream)* would alias ids and replay
  earlier rays' uniforms exactly.  The renderer never approaches this
  (one pass = W*H <= 2^24 ids) and every pass re-keys, so exceeding
  2^32 rays*bounces per key requires deliberately reusing one key for
  ~256 full 1024^2 passes WITHOUT per-pass fold-in — don't do that;
  fold the pass index into the key (renderer.py does).
- This is a statistical PRF, not a cryptographic one: 2 PCG rounds
  give full avalanche for these counter patterns (verified by the
  chi-square battery) but an adversarial chosen-id pattern could in
  principle find structure a la PractRand; irrelevant for rendering.

Replaces the reference's per-lane ThreadRng draws
(reference src/random.rs:6-65), which are not reproducible at all.
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


# dedicated stream id for the per-ray shutter time: far outside any real
# bounce index, so it never collides with scatter/medium draws
TIME_STREAM = 0x7F000001


def ray_time(key, ids, shutter):
    """(n,) shutter times in [shutter[0], shutter[1]], a pure function
    of (key, ray id) — the motion-blur analogue of ray_uniforms.  Being
    id-keyed (not position- or carry-based), the whole path sees one
    instant, compaction keeps it bit-identical, and every replay (PRB,
    tangent subsets, the tape) recomputes it exactly — no per-ray time
    needs to ride the carries."""
    u = ray_uniforms(key, ids, TIME_STREAM, 1)[:, 0]
    return shutter[0] + u * (shutter[1] - shutter[0])
