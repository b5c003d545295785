"""Pallas TPU kernel for the dense triangle sweep.

The XLA triple-product sweep (geometry.triangle_sweep_t) materializes
(N, T) candidate grids through HBM between the dot products, the mask
chain and the argmin.  This kernel keeps a (64, 128)-ray block resident
in VMEM and streams the triangle constants through SMEM in chunks,
reducing to the per-ray winner in registers — each ray block is read
once and only (t, index, found) come back.  An MXU formulation was
measured 1.8x SLOWER (the K=3 contraction uses 2% of the systolic
array), so the inner loop is pure VPU FMAs like the XLA path.

Grid = (ray blocks, triangle chunks) with the triangle axis iterated
fastest: the per-ray winner blocks use a constant index map along that
axis, so Mosaic keeps them resident across chunk steps (revisiting) —
and, because output blocks are write-only-UNDEFINED at entry, the first
chunk step initializes them explicitly (the same gotcha
ops/pallas_scatter.py documents).

Math and tie-breaking match geometry.triangle_sweep_t + argmin exactly:
strictly-smaller t wins, so equal-t ties keep the lowest global index;
padded rows carry n == 0 whose det masks out (the cluster sweep's
convention).  Selection-only, like the other Pallas paths: gradients
flow through Phase B's record rebuild.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 64  # 8192 rays per program
TRI_CHUNK = 1024  # triangle constants per SMEM block (64 KB)

EPSILON = 1e-3
INF = np.float32(np.inf)


def pack_triangle_table(tr) -> jnp.ndarray:
    """(16, T) sweep constants (component-major: SMEM windows pad the
    MINOR dimension to 128, so a (chunk, 16) layout would waste 8x and
    overflow SMEM — measured: a (1024, 16) window allocated 1 MB):
    rows = [e12(3) e13(3) n(3) g1(3) g2(3) d0], zero-padded to a
    TRI_CHUNK multiple (padded rows have n == 0 so the det mask kills
    them)."""
    tbl = jnp.concatenate(
        [tr.e12, tr.e13, tr.sw_n, tr.sw_g1, tr.sw_g2, tr.sw_d0[:, None]],
        axis=1,
    ).astype(jnp.float32)
    t = tbl.shape[0]
    pad = -t % TRI_CHUNK
    if pad:
        tbl = jnp.pad(tbl, ((0, pad), (0, 0)))
    return tbl.T


def pack_chunk_aabbs(tr, chunk: int = TRI_CHUNK) -> jnp.ndarray:
    """(6, Kc) per-``chunk`` AABBs in sweep-origin space: rows
    [lo(3) hi(3)].  Triangles arrive Morton-sorted for mesh scenes
    (models/compiler.py), so contiguous chunks are spatially tight —
    the same property the two-level cluster sweep exploits.  Padded
    rows use ±inf corners so they never widen a box.  ``chunk`` must
    divide TRI_CHUNK so a TRI_CHUNK-padded table is also a multiple."""
    assert TRI_CHUNK % chunk == 0
    v0 = tr.v0 - tr.sw_origin[None, :]
    corners = jnp.stack([v0, v0 + tr.e12, v0 + tr.e13])  # (3, T, 3)
    t = v0.shape[0]
    pad = -t % TRI_CHUNK
    lo_c = jnp.pad(corners, ((0, 0), (0, pad), (0, 0)),
                   constant_values=np.inf)
    hi_c = jnp.pad(corners, ((0, 0), (0, pad), (0, 0)),
                   constant_values=-np.inf)
    kc = (t + pad) // chunk
    lo = jnp.min(lo_c.reshape(3, kc, chunk, 3), axis=(0, 2))  # (Kc, 3)
    hi = jnp.max(hi_c.reshape(3, kc, chunk, 3), axis=(0, 2))
    return jnp.concatenate([lo, hi], axis=1).T.astype(jnp.float32)



def _tri_sweep_body(tri_ref, ro, rd, m, base):
    """fori_loop body: one triangle of ``tri_ref`` (component-major
    constants, see pack_triangle_table) against the whole ray block —
    the Moeller-Trumbore triple-product chain with the strictly-less
    tie rule.  SHARED by the fixed-grid and cluster kernels so the
    mask chain / tie rule can never silently diverge between them."""
    mx, my, mz = m

    def body(t, carry):
        best_t, best_idx, found = carry
        e12x, e12y, e12z = tri_ref[0, t], tri_ref[1, t], tri_ref[2, t]
        e13x, e13y, e13z = tri_ref[3, t], tri_ref[4, t], tri_ref[5, t]
        nx, ny, nz = tri_ref[6, t], tri_ref[7, t], tri_ref[8, t]
        g1x, g1y, g1z = tri_ref[9, t], tri_ref[10, t], tri_ref[11, t]
        g2x, g2y, g2z = tri_ref[12, t], tri_ref[13, t], tri_ref[14, t]
        d0 = tri_ref[15, t]

        det = -(rd[0] * nx + rd[1] * ny + rd[2] * nz)
        mask = jnp.abs(det) > 0.0
        inv = jnp.where(mask, 1.0 / jnp.where(mask, det, 1.0), 0.0)
        u = inv * (
            (mx * e13x + my * e13y + mz * e13z)
            - (rd[0] * g1x + rd[1] * g1y + rd[2] * g1z)
        )
        mask = mask & (u >= 0.0) & (u <= 1.0)
        v = inv * (
            (rd[0] * g2x + rd[1] * g2y + rd[2] * g2z)
            - (mx * e12x + my * e12y + mz * e12z)
        )
        mask = mask & (v >= 0.0) & (u + v <= 1.0)
        tt = inv * ((ro[0] * nx + ro[1] * ny + ro[2] * nz) - d0)
        mask = mask & (tt >= EPSILON)

        better = mask & (tt < best_t)
        best_t = jnp.where(better, tt, best_t)
        best_idx = jnp.where(better, base + t, best_idx)
        found = jnp.where(better, 1, found)
        return best_t, best_idx, found

    return body


def _blocked_rays(scene, ro, rd, block):
    """Detach + translate rays to sweep-origin space and pad/reshape
    into (rows, 128) component planes (pad rays sit far outside every
    AABB so they never veto a cull).  Shared launch prologue of both
    kernels; crop outputs with [:n]."""
    tr = scene.triangles
    sg = jax.lax.stop_gradient
    ro = sg(ro) - sg(tr.sw_origin)[None, :]
    rd = sg(rd)
    n = ro.shape[0]
    n_pad = -(-n // block) * block
    ro_p = jnp.pad(ro, ((0, n_pad - n), (0, 0)), constant_values=1e30)
    rd_p = jnp.pad(rd, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    rows = n_pad // LANES
    comps = [ro_p[:, i].reshape(rows, LANES) for i in range(3)]
    comps += [rd_p[:, i].reshape(rows, LANES) for i in range(3)]
    return comps, n


def _kernel(n_tri, aabb_ref, tri_ref,
            rox, roy, roz, rdx, rdy, rdz,
            t_out, idx_out, found_out):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_out[:] = jnp.full(t_out.shape, INF, jnp.float32)
        idx_out[:] = jnp.zeros(idx_out.shape, jnp.int32)
        found_out[:] = jnp.zeros(found_out.shape, jnp.int32)

    ro = (rox[:], roy[:], roz[:])  # already origin-translated
    rd = (rdx[:], rdy[:], rdz[:])

    # chunk-AABB cull against the block's rays, windowed by the running
    # per-ray best_t (slab corner semantics as geometry.triangle_cluster
    # _sweep_t: IEEE 1/0 = inf; the rare 0*inf NaN compares false = a
    # conservative miss)
    window = t_out[:]
    inv0 = 1.0 / rd[0]
    inv1 = 1.0 / rd[1]
    inv2 = 1.0 / rd[2]
    near = jnp.full(window.shape, EPSILON, jnp.float32)
    far = window
    for ax, inv in ((0, inv0), (1, inv1), (2, inv2)):
        a = (aabb_ref[ax, j] - ro[ax]) * inv
        b_ = (aabb_ref[3 + ax, j] - ro[ax]) * inv
        near = jnp.maximum(near, jnp.minimum(a, b_))
        far = jnp.minimum(far, jnp.maximum(a, b_))

    @pl.when(jnp.any(near <= far))
    def _():
        # m = ro_s x rd, shared across all triangles of this ray block
        mx = ro[1] * rd[2] - ro[2] * rd[1]
        my = ro[2] * rd[0] - ro[0] * rd[2]
        mz = ro[0] * rd[1] - ro[1] * rd[0]

        body = _tri_sweep_body(
            tri_ref, ro, rd, (mx, my, mz), j * TRI_CHUNK
        )
        best = jax.lax.fori_loop(
            0, TRI_CHUNK, body, (t_out[:], idx_out[:], found_out[:])
        )
        t_out[:], idx_out[:], found_out[:] = best

    del n_tri


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(aabb, tri, rox, roy, roz, rdx, rdy, rdz, *, interpret):
    rows = rox.shape[0]
    n_chunks = tri.shape[1] // TRI_CHUNK
    grid = (rows // BLOCK_ROWS, n_chunks)
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        (16, TRI_CHUNK), lambda i, j: (0, j), memory_space=pltpu.SMEM
    )
    aabb_spec = pl.BlockSpec(memory_space=pltpu.SMEM)  # whole (6, Kc)
    shape_f = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    shape_i = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    kernel = functools.partial(_kernel, tri.shape[1])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[aabb_spec, tri_spec, ray_spec, ray_spec, ray_spec,
                  ray_spec, ray_spec, ray_spec],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[shape_f, shape_i, shape_i],
        interpret=interpret,
    )(aabb, tri, rox, roy, roz, rdx, rdy, rdz)


def pallas_triangle_sweep(scene, ro, rd, interpret: bool = False):
    """Per-ray nearest-triangle candidate via the Pallas sweep.

    ro, rd: (N, 3) world-space rays.  Returns (t (N,), idx (N,),
    mask (N,)).  Selection-only: inputs are detached (gradients flow
    through Phase B), mirroring _triangle_sweep_phase_a."""
    tr_sg = jax.tree.map(jax.lax.stop_gradient, scene.triangles)
    tri = pack_triangle_table(tr_sg)
    aabb = pack_chunk_aabbs(tr_sg)
    comps, n = _blocked_rays(scene, ro, rd, BLOCK_ROWS * LANES)

    t, idx, found = _run(aabb, tri, *comps, interpret=interpret)
    return (
        t.reshape(-1)[:n],
        idx.reshape(-1)[:n],
        found.reshape(-1)[:n] != 0,
    )


def pallas_triangles_eligible(scene) -> bool:
    """Kernel needs the sweep constants.  The (6, Kc) chunk-AABB
    operand is a 2-D SMEM array, which misindexes beyond one 128-lane
    tile on real TPU (see pallas_cluster_eligible) — auto-routing caps
    at SWEEP_MAX_TRIS (Kc <= 32) but an explicit RAY_TPU_MESH=sweep
    override must not cross Kc = 128 either."""
    return (
        scene.n_triangles > 0
        and scene.triangles.has_sweep
        and scene.n_triangles <= 128 * TRI_CHUNK
    )


# ---------------------------------------------------------------------------
# Two-level cluster sweep with data-dependent DMA (large meshes)
# ---------------------------------------------------------------------------
#
# The fixed-grid kernel above streams EVERY triangle chunk through SMEM
# for every ray block — at 79k tris that degenerates to O(rays x tris)
# and loses 4x to the XLA cluster sweep (whose own cost is the HBM
# round-trips of its (N, C) candidate grids).  This kernel keeps the
# triangle table in HBM and fetches a cluster's 64 KB of constants into
# SMEM only when the block's windowed slab test says some ray can still
# hit it — the per-ray best_t shrinks as clusters resolve, so later
# clusters cull against an ever-tighter window, exactly like
# geometry.triangle_cluster_sweep_t but with zero intermediate HBM
# traffic and a scalar-side cull.

CL_BLOCK_ROWS = 16
CL_CHUNK = 128
# (16 rows x 2048 rays, 128-tri clusters) measured best on the 79k
# bunny grid at 512^2: 1.31 s/pass vs 2.60 at (32, 1024), 2.08 for
# the XLA cluster sweep, 4.7/9.9 at 64/128 rows — cull selectivity
# dominates, so finer blocks AND finer clusters win until the Kc<=1024
# single-tile cap (cl_chunk must divide TRI_CHUNK; 64-tri clusters
# would overflow the cap beyond 65k tris).  Override with
# RAY_TPU_CL_BLOCK_ROWS / RAY_TPU_CL_CHUNK (read at trace time).


CL_GROUP = 1024  # clusters per SMEM page of the paged kernel (one
# XLA T(1024) tile per 1-D table; the page is DMA'd HBM -> SMEM when
# the sweep crosses into a new group)


def _cluster_kernel_paged(n_clusters, cl_chunk,
                          lox, loy, loz, hix, hiy, hiz, tri_hbm,
                          rox, roy, roz, rdx, rdy, rdz,
                          t_out, idx_out, found_out,
                          lox_s, loy_s, loz_s, hix_s, hiy_s, hiz_s,
                          tri_smem, sem_a, sem_t):
    """Cluster sweep for Kc > CL_GROUP: the six 1-D AABB tables live in
    HBM and are paged into six 1-D SMEM scratches CL_GROUP entries at a
    time (1-D scratch indexing is the layout-safe pattern — 2-D SMEM
    operands AND >1-tile 1-D operands misindex on real TPU, see
    _cluster_kernel).  ``n_clusters`` is padded to a CL_GROUP multiple;
    padding boxes are lo=hi=+1e30, which every ray's slab test culls,
    so padded slots cost one vector compare and never DMA."""
    ro = (rox[:], roy[:], roz[:])
    rd = (rdx[:], rdy[:], rdz[:])
    inv0 = 1.0 / rd[0]
    inv1 = 1.0 / rd[1]
    inv2 = 1.0 / rd[2]
    mx = ro[1] * rd[2] - ro[2] * rd[1]
    my = ro[2] * rd[0] - ro[0] * rd[2]
    mz = ro[0] * rd[1] - ro[1] * rd[0]

    t_out[:] = jnp.full(t_out.shape, INF, jnp.float32)
    idx_out[:] = jnp.zeros(idx_out.shape, jnp.int32)
    found_out[:] = jnp.zeros(found_out.shape, jnp.int32)

    pages = (
        (lox, lox_s), (loy, loy_s), (loz, loz_s),
        (hix, hix_s), (hiy, hiy_s), (hiz, hiz_s),
    )

    def cluster(k, _):
        g = k // CL_GROUP
        kk = k % CL_GROUP

        @pl.when(kk == 0)
        def _():
            for hbm, smem in pages:
                cp = pltpu.make_async_copy(
                    hbm.at[pl.ds(g * CL_GROUP, CL_GROUP)], smem, sem_a
                )
                cp.start()
                cp.wait()

        window = t_out[:]
        near = jnp.full(window.shape, EPSILON, jnp.float32)
        far = window
        for lo_s, hi_s, ax, inv in (
            (lox_s, hix_s, 0, inv0), (loy_s, hiy_s, 1, inv1),
            (loz_s, hiz_s, 2, inv2),
        ):
            a = (lo_s[kk] - ro[ax]) * inv
            b_ = (hi_s[kk] - ro[ax]) * inv
            near = jnp.maximum(near, jnp.minimum(a, b_))
            far = jnp.minimum(far, jnp.maximum(a, b_))

        @pl.when(jnp.any(near <= far))
        def _():
            cp = pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(k * cl_chunk, cl_chunk)],
                tri_smem, sem_t,
            )
            cp.start()
            cp.wait()
            body = _tri_sweep_body(
                tri_smem, ro, rd, (mx, my, mz), k * cl_chunk
            )
            best = jax.lax.fori_loop(
                0, cl_chunk, body, (t_out[:], idx_out[:], found_out[:])
            )
            t_out[:], idx_out[:], found_out[:] = best

        return 0

    jax.lax.fori_loop(0, n_clusters, cluster, 0)


def _cluster_kernel(n_clusters, cl_chunk,
                    lox, loy, loz, hix, hiy, hiz, tri_hbm,
                    rox, roy, roz, rdx, rdy, rdz,
                    t_out, idx_out, found_out,
                    tri_smem, sem):
    ro = (rox[:], roy[:], roz[:])  # origin-translated
    rd = (rdx[:], rdy[:], rdz[:])
    inv0 = 1.0 / rd[0]
    inv1 = 1.0 / rd[1]
    inv2 = 1.0 / rd[2]
    # m = ro_s x rd, shared across all triangles
    mx = ro[1] * rd[2] - ro[2] * rd[1]
    my = ro[2] * rd[0] - ro[0] * rd[2]
    mz = ro[0] * rd[1] - ro[1] * rd[0]

    t_out[:] = jnp.full(t_out.shape, INF, jnp.float32)
    idx_out[:] = jnp.zeros(idx_out.shape, jnp.int32)
    found_out[:] = jnp.zeros(found_out.shape, jnp.int32)

    def cluster(k, _):
        # windowed slab cull of the whole block vs this cluster's AABB;
        # the window is the CURRENT per-ray best_t, so clusters behind
        # already-found hits cull away as the sweep progresses
        window = t_out[:]
        near = jnp.full(window.shape, EPSILON, jnp.float32)
        far = window
        # six 1-D SMEM tables, NOT one (6, Kc) array: a 2-D SMEM
        # operand's tiled layout misindexes once Kc exceeds one
        # 128-lane tile (observed: exact at Kc<=78, ~half the hits
        # lost at Kc=156)
        for lo_r, hi_r, ax, inv in (
            (lox, hix, 0, inv0), (loy, hiy, 1, inv1), (loz, hiz, 2, inv2)
        ):
            a = (lo_r[k] - ro[ax]) * inv
            b_ = (hi_r[k] - ro[ax]) * inv
            near = jnp.maximum(near, jnp.minimum(a, b_))
            far = jnp.minimum(far, jnp.maximum(a, b_))

        @pl.when(jnp.any(near <= far))
        def _():
            # fetch this cluster's constants: HBM -> SMEM, on demand —
            # a culled cluster costs neither DMA nor sweep
            cp = pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(k * cl_chunk, cl_chunk)],
                tri_smem, sem,
            )
            cp.start()
            cp.wait()
            body = _tri_sweep_body(
                tri_smem, ro, rd, (mx, my, mz), k * cl_chunk
            )
            best = jax.lax.fori_loop(
                0, cl_chunk, body, (t_out[:], idx_out[:], found_out[:])
            )
            t_out[:], idx_out[:], found_out[:] = best

        return 0

    jax.lax.fori_loop(0, n_clusters, cluster, 0)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_rows", "cl_chunk")
)
def _run_cluster(aabb6, tri, rox, roy, roz, rdx, rdy, rdz, *, interpret,
                 block_rows=CL_BLOCK_ROWS, cl_chunk=TRI_CHUNK):
    rows = rox.shape[0]
    n_clusters = tri.shape[1] // cl_chunk
    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(memory_space=pltpu.ANY)  # stays in HBM
    aabb_spec = pl.BlockSpec(memory_space=pltpu.SMEM)  # whole (Kc,) each
    shape_f = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    shape_i = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    kernel = functools.partial(_cluster_kernel, n_clusters, cl_chunk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[aabb_spec] * 6 + [tri_spec, ray_spec, ray_spec, ray_spec,
                                    ray_spec, ray_spec, ray_spec],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[shape_f, shape_i, shape_i],
        scratch_shapes=[
            pltpu.SMEM((16, cl_chunk), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(*aabb6, tri, rox, roy, roz, rdx, rdy, rdz)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_rows", "cl_chunk")
)
def _run_cluster_paged(aabb6, tri, rox, roy, roz, rdx, rdy, rdz, *,
                       interpret, block_rows=CL_BLOCK_ROWS,
                       cl_chunk=TRI_CHUNK):
    rows = rox.shape[0]
    n_clusters = aabb6[0].shape[0]  # CL_GROUP multiple (padded boxes cull)
    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    hbm_spec = pl.BlockSpec(memory_space=pltpu.ANY)  # stays in HBM
    shape_f = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    shape_i = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    kernel = functools.partial(_cluster_kernel_paged, n_clusters, cl_chunk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[hbm_spec] * 7 + [ray_spec] * 6,
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[shape_f, shape_i, shape_i],
        scratch_shapes=[pltpu.SMEM((CL_GROUP,), jnp.float32)] * 6 + [
            pltpu.SMEM((16, cl_chunk), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(*aabb6, tri, rox, roy, roz, rdx, rdy, rdz)


def _auto_cl_chunk(n_triangles: int) -> int:
    """Cluster granularity: finer clusters cull better (measured ranking
    128 < 256 < 512 < 1024 at 79k tris), and the paged kernel removes
    the old one-tile table cap, so the finest chunk is always used.
    An explicit RAY_TPU_CL_CHUNK wins."""
    env = os.environ.get("RAY_TPU_CL_CHUNK", "")
    if env:
        return int(env)
    return CL_CHUNK


def pallas_cluster_eligible(scene) -> bool:
    """Any sweep-packed mesh: <= CL_GROUP clusters take the single-page
    kernel (six one-tile SMEM tables), larger meshes the paged kernel
    (tables in HBM, CL_GROUP-entry SMEM pages DMA'd on demand) — the
    old ~131k-triangle cap is gone (round 5)."""
    return scene.n_triangles > 0 and scene.triangles.has_sweep


def pallas_cluster_sweep(scene, ro, rd, interpret: bool = False,
                         block_rows: int | None = None,
                         cl_chunk: int | None = None):
    """Per-ray nearest-triangle candidate via the demand-fetched
    two-level cluster sweep — the large-mesh (> SWEEP_MAX_TRIS) path.

    Same (t, idx, mask) contract and tie rule as pallas_triangle_sweep
    / the XLA cluster sweep (strictly-smaller t wins -> lowest global
    index on ties).  Selection-only: inputs are detached, gradients
    flow through Phase B.  Beyond CL_GROUP clusters the paged kernel
    takes over (identical math, AABB tables paged through SMEM)."""
    tr_sg = jax.tree.map(jax.lax.stop_gradient, scene.triangles)
    tri = pack_triangle_table(tr_sg)

    if block_rows is None:
        block_rows = int(
            os.environ.get("RAY_TPU_CL_BLOCK_ROWS", "") or CL_BLOCK_ROWS
        )
    if cl_chunk is None:
        cl_chunk = _auto_cl_chunk(scene.n_triangles)
    # validate an explicit cl_chunk (parameter or RAY_TPU_CL_CHUNK env):
    # it must divide TRI_CHUNK so the padded table tiles exactly
    if TRI_CHUNK % cl_chunk != 0:
        raise ValueError(
            f"cl_chunk={cl_chunk} must divide TRI_CHUNK={TRI_CHUNK} "
            "(set via pallas_cluster_sweep(cl_chunk=) or RAY_TPU_CL_CHUNK)"
        )
    aabb = pack_chunk_aabbs(tr_sg, chunk=cl_chunk)
    comps, n = _blocked_rays(scene, ro, rd, block_rows * LANES)

    kc = aabb.shape[1]
    if kc <= CL_GROUP:
        aabb6 = tuple(aabb[i] for i in range(6))  # six (Kc,) rows
        t, idx, found = _run_cluster(
            aabb6, tri, *comps, interpret=interpret,
            block_rows=block_rows, cl_chunk=cl_chunk,
        )
    else:
        # pad to a whole number of SMEM pages; lo=hi=+1e30 boxes fail
        # every slab test (any +inv axis puts near at +1e30 > window;
        # any -inv axis puts far at -1e30), so padded slots never DMA
        pad = -kc % CL_GROUP
        aabb_p = jnp.pad(aabb, ((0, 0), (0, pad)), constant_values=1e30)
        aabb6 = tuple(aabb_p[i] for i in range(6))
        t, idx, found = _run_cluster_paged(
            aabb6, tri, *comps, interpret=interpret,
            block_rows=block_rows, cl_chunk=cl_chunk,
        )
    return (
        t.reshape(-1)[:n],
        idx.reshape(-1)[:n],
        found.reshape(-1)[:n] != 0,
    )
