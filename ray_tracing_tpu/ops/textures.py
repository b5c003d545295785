"""Texture evaluation over flat texture tables.

TPU re-design of the reference's ``Texture`` trait objects (reference
src/texture/): recursion through checker sub-textures becomes a bounded
pointer-chasing loop; image sampling becomes an atlas gather; Perlin
noise becomes table gathers + Hermite interpolation.  One call
evaluates a *batch* of texture indices — each ray carries the texture
id of the material it hit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ray_tracing_tpu.ops.geometry import take_rows

from ray_tracing_tpu.models.scene import (
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_NOISE,
    TEX_SOLID,
    TextureTable,
)

def _lattice_hash(i, j, k):
    """Integer hash of a lattice point — the TPU-native replacement for
    the reference's permutation-table gathers (reference noise.rs:20-39,
    63-87).  Table gathers cost ~2 ms per 64k lookups on TPU
    (scalar-unit bound); this is a handful of VPU integer ops."""
    h = (
        i.astype(jnp.uint32) * jnp.uint32(73856093)
        ^ j.astype(jnp.uint32) * jnp.uint32(19349663)
        ^ k.astype(jnp.uint32) * jnp.uint32(83492791)
    )
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 16)
    return h


def _grad_dot(h, x, y, z):
    """Ken Perlin's improved-noise gradient dot: the hash selects one of
    12 edge directions (+-1,+-1,0 permutations) and the dot product is
    two adds with sign flips — no transcendentals.  The reference draws
    random unit gradients instead (noise.rs:20-23); the noise field
    class is the same and this costs ~100x less on the VPU."""
    h4 = h & jnp.uint32(15)
    u = jnp.where(h4 < 8, x, y)
    v = jnp.where(h4 < 4, y, jnp.where((h4 == 12) | (h4 == 14), x, z))
    return jnp.where((h4 & 1) == 0, u, -u) + jnp.where((h4 & 2) == 0, v, -v)


def perlin_noise(tt: TextureTable, p):
    """Gradient noise with Hermite smoothing (reference noise.rs:41-140,
    perlin_interp at noise.rs:117-140), gradients via ``_grad_dot``.

    ``p`` is (..., 3); returns (...,) f32 in roughly [-1, 1].
    """
    fl = jnp.floor(p)
    uvw = p - fl
    ijk = fl.astype(jnp.int32)
    uu = uvw * uvw * (3.0 - 2.0 * uvw)  # (..., 3)

    x, y, z = uvw[..., 0], uvw[..., 1], uvw[..., 2]
    accum = jnp.zeros(p.shape[:-1], dtype=jnp.float32)
    for corner in range(8):
        di, dj, dk = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        h = _lattice_hash(
            ijk[..., 0] + di, ijk[..., 1] + dj, ijk[..., 2] + dk
        )
        w = (
            (uu[..., 0] if di else 1.0 - uu[..., 0])
            * (uu[..., 1] if dj else 1.0 - uu[..., 1])
            * (uu[..., 2] if dk else 1.0 - uu[..., 2])
        )
        accum = accum + w * _grad_dot(h, x - di, y - dj, z - dk)
    # scale so the amplitude matches unit-gradient noise (~[-1, 1])
    return accum * jnp.float32(0.7071)


def perlin_turb(tt: TextureTable, p, depth, max_depth: int):
    """fBm turbulence |sum w_i noise(2^i p)| (reference noise.rs:91-107).
    ``depth`` is per-element; ``max_depth`` the static octave bound."""
    accum = jnp.zeros(p.shape[:-1], dtype=jnp.float32)
    temp_p = p
    weight = 1.0
    for octave in range(max_depth):
        live = octave < depth
        accum = accum + jnp.where(live, weight * perlin_noise(tt, temp_p), 0.0)
        weight = weight * 0.5
        temp_p = temp_p * 2.0
    return jnp.abs(accum)


def image_texel_index(tt: TextureTable, img_idx, uv):
    """(row j, col i) of the nearest texel, with u clamped and v flipped
    (reference image.rs:26-48)."""
    u = jnp.clip(uv[..., 0], 0.0, 1.0)
    v = 1.0 - jnp.clip(uv[..., 1], 0.0, 1.0)
    dims = take_rows(tt.image_dims, img_idx)  # (..., 2) = (h, w)
    h = dims[..., 0]
    w = dims[..., 1]
    i = jnp.minimum((w.astype(jnp.float32) * u).astype(jnp.int32), w - 1)
    j = jnp.minimum((h.astype(jnp.float32) * v).astype(jnp.int32), h - 1)
    return j, i


def image_value(tt: TextureTable, img_idx, uv):
    """Nearest-texel lookup (reference image.rs:26-72).

    The gather uses ONE linearized index into the flattened (P, 3)
    atlas: the 3-index form ``images[img, j, i]`` lowers to a gather
    that measured ~26 ms per 64k lookups SLOWER on TPU v5e than the
    flat row gather (same values, bit-identical; the flat form is at
    the scalar-core floor — docs/PERFORMANCE.md round-5 cont.)."""
    j, i = image_texel_index(tt, img_idx, uv)
    hmax, wmax = tt.images.shape[1], tt.images.shape[2]
    flat_idx = (img_idx * hmax + j) * wmax + i
    return tt.images.reshape(-1, 3)[flat_idx]  # (..., 3), already /255


def _image_lanes_value(tt: TextureTable, idx, uv, is_img):
    """Atlas colors for the ``is_img`` lanes (junk elsewhere — callers
    mask).  Three execution strategies, value-identical on the is_img
    lanes:

    * no lane needs it → zeros (the old any-gate);
    * FEW lanes need it (count ≤ n/16 — the common path-tracing case:
      zy measures ~4% image lanes per bounce) → sort the image lanes
      to the front, run the uv→texel math and the atlas gather on a
      static n/16-lane prefix only, and scatter the values back with
      one index-keyed variadic sort (TPU-native inverse permutation,
      integrator.unsort_wavefront's trick);
    * dense images (a C5-style textured-quad fit) → the full-width
      gather, as before.

    ``RAY_TPU_PACKED_IMG=0`` forces the old two-way gate (perf knob;
    results are bit-identical either way since gathered values and the
    final mask-select are unchanged)."""
    import os as _os

    n = is_img.shape[0] if is_img.ndim == 1 else 0
    zeros = lambda: jnp.zeros(uv.shape[:-1] + (3,), jnp.float32)
    full = lambda: image_value(tt, take_rows(tt.image, idx), uv)
    packed_ok = (
        is_img.ndim == 1
        and uv.ndim == 2
        and n >= 1024
        and _os.environ.get("RAY_TPU_PACKED_IMG", "1") != "0"
    )
    if not packed_ok:
        return jax.lax.cond(jnp.any(is_img), full, zeros)

    # n/16 beat n/8 interleaved (210.0 vs 212.6 ms/pass at 1024²): the
    # prefix gather halves while the two n-row sorts are K-independent;
    # zy's ~4% image lanes stay well under the cap (overflow is CORRECT
    # either way — it just takes the full-width branch)
    div = int(_os.environ.get("RAY_TPU_IMG_CAP_DIV", 16))
    k = max(128, n // div)
    count = jnp.sum(is_img.astype(jnp.int32))

    def packed():
        # stable partition: image lanes first (positions < count)
        order = jnp.argsort(~is_img, stable=True)
        top = jax.lax.slice_in_dim(order, 0, k)
        vals = image_value(tt, take_rows(tt.image, idx[top]), uv[top])
        live = jnp.arange(k, dtype=jnp.int32) < count
        vals = jnp.where(live[:, None], vals, 0.0)
        vfull = jnp.concatenate(
            [vals, jnp.zeros((n - k, 3), jnp.float32)], axis=0
        )
        # rows keyed by their destination lane = inverse permutation
        srt = jax.lax.sort(
            (order, vfull[:, 0], vfull[:, 1], vfull[:, 2]), num_keys=1,
            is_stable=False,
        )
        return jnp.stack(srt[1:], axis=1)

    return jax.lax.cond(
        count == 0, zeros,
        lambda: jax.lax.cond(count <= k, packed, full),
    )


def resolve_leaf(tt: TextureTable, idx, p):
    """Walk checker indirection to the leaf texture id per ray
    (reference checker.rs:31-38 selects a sub-texture by
    sin(d x) sin(d y) sin(d z) sign)."""
    for _ in range(max(tt.max_checker_depth, 1)):
        is_checker = take_rows(tt.ttype, idx) == TEX_CHECKER
        d = take_rows(tt.density, idx)[..., None] * p  # (..., 3)
        sines = jnp.sin(d[..., 0]) * jnp.sin(d[..., 1]) * jnp.sin(d[..., 2])
        child = jnp.where(sines > 0.0, take_rows(tt.child_even, idx), take_rows(tt.child_odd, idx))
        idx = jnp.where(is_checker, child, idx)
    return idx


def texture_value(tt: TextureTable, idx, uv, p, *, with_leaf: bool = False):
    """Evaluate texture ``idx`` at (uv, p) for a batch of rays.

    idx: (...,) i32, uv: (..., 2), p: (..., 3) -> (..., 3) color, or
    (color, resolved_leaf) with ``with_leaf`` (so callers that also need
    the leaf — shade's PRB aux — don't walk the checker chain twice).
    """
    idx = resolve_leaf(tt, idx, p)
    ttype = take_rows(tt.ttype, idx)
    out = take_rows(tt.color, idx)  # TEX_SOLID default (reference solid_color.rs:21-28)

    # The expensive families are gated with lax.cond on "does any ray in
    # this block actually need it": atlas point-gathers cost ~2 ms per
    # 64k rays on TPU and noise is 8 corner-hashes x octaves, but most
    # bounce blocks contain no ray that hit those materials.
    if tt.images.shape[0] > 0:
        # NB a masked Pallas VMEM gather (serial row loop, skip-if-masked
        # — the mirror of ops/pallas_scatter.py) measured SLOWER here:
        # 39.8 vs 34.4 ms zy forward/tile — earth-sphere hits are dense
        # enough in the warm stage that the serial per-ray loop loses to
        # the XLA point gather (docs/PERFORMANCE.md).
        is_img = ttype == TEX_IMAGE
        img = _image_lanes_value(tt, idx, uv, is_img)
        out = jnp.where(is_img[..., None], img, out)

    if tt.max_noise_depth > 0:
        is_noise = ttype == TEX_NOISE
        turb = jax.lax.cond(
            jnp.any(is_noise),
            lambda: perlin_turb(
                tt,
                take_rows(tt.scale, idx)[..., None] * p + take_rows(tt.noise_offset, idx),
                take_rows(tt.noise_depth, idx),
                tt.max_noise_depth,
            ),
            lambda: jnp.zeros(p.shape[:-1], jnp.float32),
        )
        # white * turb (reference noise.rs:160-171)
        out = jnp.where(is_noise[..., None], turb[..., None], out)

    return (out, idx) if with_leaf else out
