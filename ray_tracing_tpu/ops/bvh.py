"""Linear BVH for the triangle-mesh path.

The reference builds a binned-SAH BVH with recursive packet traversal
returning per-lane candidate lists (reference src/bvh/bvh.rs:34-239) —
a pointer-chasing design that XLA cannot express.  The TPU-native
replacement:

* **Build** (host, scene-compile time): triangles are sorted by the
  Morton code of their AABB centroid, a binary tree is built by
  median-splitting the sorted range (an LBVH), and nodes are laid out
  in **DFS pre-order with skip links**: on AABB hit the next node is
  simply ``node + 1``; on miss it is ``miss_link[node]``.  Node indices
  therefore increase monotonically along any traversal path, so the
  whole traversal is one bounded ``while_loop`` with no stack — the
  XLA-friendly equivalent of the reference's recursion.
* **Traverse** (device): every ray carries one node pointer; each
  iteration gathers the node's AABB, slab-tests it (reference
  src/ray.rs:167-189 semantics), intersects the leaf's triangle when
  the node is a leaf, and advances.  Rays finish independently; the
  loop ends when every ray's pointer reaches the sentinel.

Traversal only *selects* the winning primitive (discrete); gradients
flow through the differentiable hit-record rebuild in intersect.py, so
the while_loop runs on ``stop_gradient``-ed inputs.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ray_tracing_tpu.ops import geometry as geo

LEAF_SIZE = 4  # triangles per leaf


@struct.dataclass
class BVHTable:
    node_min: jnp.ndarray  # (M, 3) f32
    node_max: jnp.ndarray  # (M, 3) f32
    miss_link: jnp.ndarray  # (M,) i32 — next node on AABB miss (M = done)
    leaf_start: jnp.ndarray  # (M,) i32 — first sorted-triangle id, -1 internal
    leaf_count: jnp.ndarray  # (M,) i32
    # packed per-node rows for the traversal loop: TPU gathers are
    # scalar-unit bound (~2 ms per 64k lookups), so each while-loop
    # iteration fetches at most three rows per ray instead of ~17
    # scattered scalars: geometry (min|max), topology (miss|start|count)
    # and the leaf's LEAF_SIZE triangles embedded as one row.
    node_f: jnp.ndarray = None  # (M, 6) f32 [min(3) max(3)]
    node_i: jnp.ndarray = None  # (M, 3) i32 [miss leaf_start leaf_count]
    leaf_tris: jnp.ndarray = None  # (M, LEAF_SIZE*9) f32 [v0 e12 e13]*K
    n_nodes: int = struct.field(pytree_node=False, default=0)


def pack_bvh(bvh: "BVHTable", v0, e12, e13) -> "BVHTable":
    """Attach the packed traversal rows (host-side, numpy in/out).

    v0/e12/e13: (T, 3) triangle data in the table's (Morton) order.
    """
    node_min = np.asarray(bvh.node_min)
    node_max = np.asarray(bvh.node_max)
    miss = np.asarray(bvh.miss_link)
    start = np.asarray(bvh.leaf_start)
    count = np.asarray(bvh.leaf_count)
    m = node_min.shape[0]
    node_f = np.concatenate([node_min, node_max], axis=1).astype(np.float32)
    node_i = np.stack([miss, start, count], axis=1).astype(np.int32)
    tris = np.concatenate(
        [np.asarray(v0), np.asarray(e12), np.asarray(e13)], axis=1
    ).astype(np.float32)  # (T, 9)
    leaf_tris = np.zeros((m, LEAF_SIZE * 9), np.float32)
    leaf = start >= 0
    for i in np.nonzero(leaf)[0]:
        c = count[i]
        leaf_tris[i, : c * 9] = tris[start[i] : start[i] + c].reshape(-1)
    return bvh.replace(
        node_f=jnp.asarray(node_f),
        node_i=jnp.asarray(node_i),
        leaf_tris=jnp.asarray(leaf_tris),
    )


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit coordinates into 30-bit Morton codes."""

    def expand(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    q = np.clip((x * 1024.0), 0, 1023).astype(np.uint32)
    return (
        expand(q[:, 0]) << np.uint64(2)
    ) | (expand(q[:, 1]) << np.uint64(1)) | expand(q[:, 2])


def morton_order(tri_min: np.ndarray, tri_max: np.ndarray) -> np.ndarray:
    """Morton-sort permutation of triangles by AABB centroid (host)."""
    centroid = (tri_min + tri_max) * 0.5
    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    norm = (centroid - lo) / np.maximum(hi - lo, 1e-30)
    return np.argsort(_morton3(norm), kind="stable").astype(np.int32)


def build_lbvh(tri_min: np.ndarray, tri_max: np.ndarray) -> BVHTable:
    """Host-side LBVH build from per-triangle AABBs **already in Morton
    order** (the compiler permutes the triangle table itself, so leaf
    ids equal table ids); numpy in, jnp out."""
    t = tri_min.shape[0]
    smin = tri_min
    smax = tri_max

    node_min, node_max, lstart, lcount = [], [], [], []
    node_ranges = []  # sorted-triangle range [lo, hi) covered by each node

    # iterative DFS pre-order emission (no recursion; bunny depth ~ 11)
    stack = [(0, t)]
    while stack:
        lo_i, hi_i = stack.pop()
        node_min.append(smin[lo_i:hi_i].min(axis=0))
        node_max.append(smax[lo_i:hi_i].max(axis=0))
        node_ranges.append((lo_i, hi_i))
        if hi_i - lo_i <= LEAF_SIZE:
            lstart.append(lo_i)
            lcount.append(hi_i - lo_i)
        else:
            lstart.append(-1)
            lcount.append(0)
            mid = (lo_i + hi_i) // 2
            # DFS pre-order: left child next -> push right first
            stack.append((mid, hi_i))
            stack.append((lo_i, mid))

    m = len(node_min)
    # In DFS pre-order, node i's subtree is the consecutive run of nodes
    # whose triangle ranges nest inside i's; the miss link is the first
    # node after that run (or m).  One monotone stack pass computes it.
    miss_arr = np.empty(m, dtype=np.int32)
    open_nodes: list = []  # (hi_bound, node_id)
    for i in range(m):
        lo_i, hi_i = node_ranges[i]
        while open_nodes and open_nodes[-1][0] <= lo_i:
            _, nid = open_nodes.pop()
            miss_arr[nid] = i
        open_nodes.append((hi_i, i))
    while open_nodes:
        _, nid = open_nodes.pop()
        miss_arr[nid] = m

    return BVHTable(
        node_min=jnp.asarray(np.stack(node_min).astype(np.float32)),
        node_max=jnp.asarray(np.stack(node_max).astype(np.float32)),
        miss_link=jnp.asarray(miss_arr),
        leaf_start=jnp.asarray(np.asarray(lstart, np.int32)),
        leaf_count=jnp.asarray(np.asarray(lcount, np.int32)),
        n_nodes=m,
    )


class BVHHit(NamedTuple):
    t: jnp.ndarray  # (N,) f32, +inf on miss
    index: jnp.ndarray  # (N,) i32 triangle-table id of the winner
    mask: jnp.ndarray  # (N,) bool


def bvh_traverse_triangles(
    bvh: BVHTable,
    ro: jnp.ndarray,  # (N, 3)
    rd: jnp.ndarray,
    t_min,
    t_max,
) -> BVHHit:
    """Stackless skip-link traversal; nearest triangle hit per ray.

    The candidate set the reference's packet traversal produces
    (bvh.rs:182-239) is here consumed immediately: leaves intersect
    their LEAF_SIZE triangles in-line (embedded in the packed node row),
    shrinking t_max as hits land (the nearest-hit merge of
    renderer.rs:170-182).
    """
    n = ro.shape[0]
    m = bvh.n_nodes
    rd_inv = 1.0 / jnp.where(jnp.abs(rd) > 1e-30, rd, 1e-30)

    ro_s = jax.lax.stop_gradient(ro)
    rd_s = jax.lax.stop_gradient(rd)
    rd_inv = jax.lax.stop_gradient(rd_inv)
    node_f = jax.lax.stop_gradient(bvh.node_f)
    node_i = bvh.node_i
    leaf_tris = jax.lax.stop_gradient(bvh.leaf_tris)

    def cond(state):
        node, best_t, best_i = state
        return jnp.any(node < m)

    def body(state):
        node, best_t, best_i = state
        nd = jnp.minimum(node, m - 1)
        nf = node_f[nd]  # (N, 6)
        ni = node_i[nd]  # (N, 3)
        hit_box = geo.aabb_hit(ro_s, rd_inv, nf[:, 0:3], nf[:, 3:6], t_min, best_t)
        active = node < m
        hit_box = hit_box & active

        miss = ni[:, 0]
        start = ni[:, 1]
        count = ni[:, 2]
        is_leaf = (start >= 0) & hit_box

        # leaf: test the embedded LEAF_SIZE triangles (masked past count)
        lt = leaf_tris[nd]  # (N, LEAF_SIZE*9)
        for k in range(LEAF_SIZE):
            row = lt[:, k * 9 : (k + 1) * 9]
            valid = is_leaf & (k < count)
            t, mask, _, _, _ = geo.triangle_t(
                ro_s, rd_s, row[:, 0:3], row[:, 3:6], row[:, 6:9], t_min, best_t
            )
            take = valid & mask & (t < best_t)
            best_t = jnp.where(take, t, best_t)
            best_i = jnp.where(take, start + k, best_i)

        # advance: internal hit -> node+1; leaf or miss -> skip subtree
        descend = hit_box & (start < 0)
        next_node = jnp.where(descend, node + 1, miss)
        next_node = jnp.where(active, next_node, node)
        return next_node, best_t, best_i

    node0 = jnp.zeros((n,), jnp.int32)
    best_t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    best_i0 = jnp.full((n,), -1, jnp.int32)
    _, best_t, best_i = jax.lax.while_loop(cond, body, (node0, best_t0, best_i0))

    mask = best_i >= 0
    return BVHHit(
        t=jnp.where(mask, best_t, jnp.inf),
        index=jnp.where(mask, best_i, 0),
        mask=mask,
    )
