"""Pallas TPU scatter-add kernel for atlas-texel gradient accumulation.

XLA's scatter-add on TPU costs ~180 cycles per row regardless of mask
(measured 0.19 µs/row at 1024²: the per-bounce image-texel gradient
scatters alone were 0.45-0.52 s/pass — 75% of the whole PRB backward,
reference estimator at src/renderer.rs:231-263).  Sort-based and
one-hot-matmul reformulations don't help: the target table is ~500k
rows (a full texture atlas) and the live rows per call are few but
scattered across every 8k-ray bounce block.

This kernel exploits exactly that sparsity: the accumulator lives in
VMEM in channel-planar layout ``(3, P/128, 128)`` (≈6 MB for a 512×1024
atlas — fits the ~16 MB VMEM), rows stream through SMEM in chunks, and
a serial loop predicates the read-modify-write on ``texel >= 0`` — a
masked-out row costs a few cycles instead of a full scatter row.  Rows
with duplicate texels are correct by construction (serial RMW).

Falls back to ``jnp``'s scatter-add off-TPU, under
``RAY_TPU_NO_PALLAS=1``, or when the atlas exceeds the VMEM budget.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 8  # f32 sublane granularity
ROW_CHUNK = 1024  # default scatter rows per grid step (SMEM resident);
# must be a MULTIPLE of 1024 to match XLA's T(1024) tiling for 1-D
# s32/f32 operands or Mosaic rejects the layout ("XLA layout
# {0:T(1024)S(1)} does not match Mosaic")


def _row_chunk() -> int:
    """Rows per grid step; ``RAY_TPU_SCATTER_CHUNK`` is read per call
    (tuning knob; sums are identical for any multiple of 1024 — the
    serial row order never changes)."""
    return int(os.environ.get("RAY_TPU_SCATTER_CHUNK", ROW_CHUNK))
def _skip_block() -> int:
    """Rows per block-skip flag (see _kernel); ``RAY_TPU_SCATTER_SKIP``
    is read per call — a tuning knob only (sums are identical for any
    divisor of ROW_CHUNK)."""
    return int(os.environ.get("RAY_TPU_SCATTER_SKIP", 8))

# planar accumulator budget: 3 * P floats; keep well under VMEM
MAX_PLANAR_TEXELS = 1 << 21  # 2M texels -> 24 MB... gated tighter below
VMEM_BUDGET_BYTES = 10 * (1 << 20)  # leave room for Mosaic overhead


def planar_rows(p: int) -> int:
    """Number of 128-lane rows per channel for a p-texel atlas, rounded
    to the f32 sublane granularity so the kernel's (8, 128) dynamic
    block never runs off the table."""
    return -(-(-(-p // LANES)) // SUB) * SUB


def planar_eligible(p: int) -> bool:
    """Whole planar accumulator must fit the VMEM budget."""
    return 3 * planar_rows(p) * LANES * 4 <= VMEM_BUDGET_BYTES


def to_planar(gimg_flat: jnp.ndarray) -> jnp.ndarray:
    """(P, 3) -> (3, rows, 128) with zero padding."""
    p = gimg_flat.shape[0]
    rows = planar_rows(p)
    pad = rows * LANES - p
    g = jnp.pad(gimg_flat, ((0, pad), (0, 0)))
    return g.T.reshape(3, rows, LANES)


def from_planar(gplanar: jnp.ndarray, p: int) -> jnp.ndarray:
    """(3, rows, 128) -> (P, 3)."""
    return gplanar.reshape(3, -1)[:, :p].T


def _kernel(clive_ref, blive_ref, texel_ref, cr_ref, cg_ref, cb_ref,
            g_in, g_out, *, skip_block):
    """One grid step: accumulate ROW_CHUNK rows into the planar table.

    The table stays resident in VMEM across grid steps (constant index
    map = revisiting) and the grid is sequential on a TPU core, so the
    serial RMW is race-free.  OUTPUT BLOCKS ARE WRITE-ONLY-UNDEFINED at
    entry — they are NOT populated from the aliased input buffer — so
    the first step must copy the table in explicitly or every
    never-touched (8, 128) region writes garbage back (observed on real
    TPU as ~1e3 gradient norms; interpret mode hides it).

    ``blive_ref`` holds one precomputed flag per SKIP_BLOCK rows (any
    row live in the block) — in gradient sweeps >90% of rows are
    masked out, and skipping them in SKIP_BLOCK-sized groups instead
    of row-by-row cut the sweep scatter from 114 to ~10 ms/pass at
    1024² (the serial loop's per-row branch was ~19 cycles even for
    dead rows).  Skipping never reorders live rows, so sums are
    bit-identical."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        g_out[:] = g_in[:]

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)

    def row_body(r, _):
        # Round-5 ablations on the live path (scratch/exp_r5_scatter2):
        # of the remaining ~24 ms/pass, the three (8, 128) RMWs cost
        # ~1 ms and a branch-free masked-RMW variant measured WORSE
        # (+4 ms) — the per-row cost is the serial SMEM load + address
        # math itself, so the branched form stays.
        t = texel_ref[r]

        @pl.when(t >= 0)
        def _():
            blk = pl.multiple_of((t // (SUB * LANES)) * SUB, SUB)
            sub = (t // LANES) % SUB
            lane = t % LANES
            oh = (sub_iota == sub) & (lane_iota == lane)
            for ch, c_ref in ((0, cr_ref), (1, cg_ref), (2, cb_ref)):
                blkv = g_out[ch, pl.ds(blk, SUB), :]
                g_out[ch, pl.ds(blk, SUB), :] = blkv + jnp.where(
                    oh, c_ref[r], 0.0
                )

        return 0

    def blk_body(b, _):
        # blive is broadcast to row granularity (XLA's 1-D SMEM layout
        # is T(1024); a (ROW_CHUNK/SKIP_BLOCK,) operand would need its
        # own incompatible tiling) — one flag read per block
        @pl.when(blive_ref[b * skip_block] != 0)
        def _():
            jax.lax.fori_loop(
                b * skip_block, (b + 1) * skip_block, row_body, 0
            )

        return 0

    # chunk-level skip: a grid step whose whole ROW_CHUNK is masked out
    # costs one scalar test (gradient sweeps are mostly dead tail rows)
    @pl.when(clive_ref[0] != 0)
    def _():
        jax.lax.fori_loop(0, texel_ref.shape[0] // skip_block, blk_body, 0)


@functools.partial(
    jax.jit, static_argnames=("interpret", "skip_block", "row_chunk")
)
def _run(gplanar, clive, blive, texel, cr, cg, cb, *, interpret,
         skip_block, row_chunk):
    n = texel.shape[0]
    grid = (n // row_chunk,)
    chunk_spec = pl.BlockSpec(
        (row_chunk,), lambda i: (i,), memory_space=pltpu.SMEM
    )
    blive_spec = chunk_spec  # row-granularity broadcast (see _kernel)
    table_spec = pl.BlockSpec(
        gplanar.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, skip_block=skip_block),
        grid=grid,
        in_specs=[blive_spec, blive_spec, chunk_spec, chunk_spec,
                  chunk_spec, chunk_spec, table_spec],
        out_specs=table_spec,
        out_shape=jax.ShapeDtypeStruct(gplanar.shape, jnp.float32),
        input_output_aliases={6: 0},
        interpret=interpret,
    )(clive, blive, texel, cr, cg, cb, gplanar)


def scatter_add_planar(gplanar, texel, contrib, mask, interpret: bool = False):
    """gplanar (3, rows, 128) += masked scatter of contrib (N, 3) at
    flat texel ids (N,).  Rows with mask False cost ~nothing: the
    block-live flags are reduced on the VPU here and dead SKIP_BLOCK
    row groups are skipped inside the kernel."""
    n = texel.shape[0]
    rc = _row_chunk()
    pad = -n % rc
    t = jnp.where(mask, texel, -1).astype(jnp.int32)
    if pad:
        t = jnp.pad(t, (0, pad), constant_values=-1)
    c = jnp.where(mask[:, None], contrib, 0.0).astype(jnp.float32)
    if pad:
        c = jnp.pad(c, ((0, pad), (0, 0)))
    sb = _skip_block()
    blk_live = jnp.max(t.reshape(-1, sb), axis=1) >= 0
    blive = jnp.broadcast_to(
        blk_live.astype(jnp.int32)[:, None],
        (t.shape[0] // sb, sb),
    ).reshape(-1)
    clive = jnp.broadcast_to(
        jnp.max(
            blk_live.reshape(-1, rc // sb), axis=1
        ).astype(jnp.int32)[:, None],
        (t.shape[0] // rc, rc),
    ).reshape(-1)
    return _run(gplanar, clive, blive, t, c[:, 0], c[:, 1], c[:, 2],
                interpret=interpret, skip_block=sb, row_chunk=rc)


def use_pallas_scatter(p: int) -> bool:
    return (
        os.environ.get("RAY_TPU_NO_PALLAS") != "1"
        and planar_eligible(p)
        and jax.default_backend() in ("tpu", "axon")
    )
