"""Flat tensor scene representation (the TPU replacement for the
reference's ``Arc<dyn Hittable>`` object graph, reference src/scene.rs).

The scene compiler (models/compiler.py) expands every JSON object into
primitive records grouped *by type* — spheres, triangles, axis-aligned
rects — so each intersection kernel is a dense vectorized sweep with no
dynamic dispatch.  Instancing transforms live in a side table indexed
per primitive (identity at slot 0); triangles have their transforms
baked into the vertices at compile time instead (reference
transform.rs semantics are preserved either way).

Material / texture parameters are small parallel tables; gradients flow
through them (they are ordinary pytree leaves), which is what makes the
renderer differentiable w.r.t. albedo, texel colors, and emission.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

# --- type tags ------------------------------------------------------------

# material types (reference src/json.rs:198-207 AnyMaterial, kebab-case)
MAT_LAMBERTIAN = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
MAT_DIFFUSE_LIGHT = 3
MAT_ISOTROPIC = 4

# texture types (reference src/json.rs:147-155 AnyTexture)
TEX_SOLID = 0
TEX_CHECKER = 1
TEX_IMAGE = 2
TEX_NOISE = 3

# light (samplable) primitive kinds
LIGHT_SPHERE = 0
LIGHT_TRIANGLE = 1
LIGHT_RECT = 2


def _f32(x):
    return jnp.asarray(np.asarray(x, dtype=np.float32))


def _i32(x):
    return jnp.asarray(np.asarray(x, dtype=np.int32))


@struct.dataclass
class SphereTable:
    center: jnp.ndarray  # (S, 3) f32 — position at absolute time 0
    radius: jnp.ndarray  # (S,) f32
    material: jnp.ndarray  # (S,) i32 index into MaterialTable
    transform: jnp.ndarray  # (S,) i32 index into TransformTable (0 = identity)
    has_transforms: bool = struct.field(pytree_node=False, default=False)
    # true motion blur (superset: the reference jitters ray time but
    # nothing consumes it — camera.rs:113-129): center(t) = center +
    # t * vel, with t the ray's shutter time.  None == all static.
    vel: Optional[jnp.ndarray] = None  # (S, 3) f32
    has_motion: bool = struct.field(pytree_node=False, default=False)

    def __len__(self):
        return self.center.shape[0]


@struct.dataclass
class TriangleTable:
    v0: jnp.ndarray  # (T, 3)
    e12: jnp.ndarray  # (T, 3) v1 - v0 (reference triangle.rs:26-32)
    e13: jnp.ndarray  # (T, 3) v2 - v0
    n0: jnp.ndarray  # (T, 3) per-vertex shading normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray  # (T, 2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    material: jnp.ndarray  # (T,) i32
    # triple-product sweep constants (ops/geometry.py:triangle_sweep_t);
    # None when the table was built without pack_triangle_sweep
    sw_origin: jnp.ndarray = None  # (3,) f32 translated origin
    sw_n: jnp.ndarray = None  # (T, 3) e12 x e13
    sw_g1: jnp.ndarray = None  # (T, 3) e13 x (v0 - origin)
    sw_g2: jnp.ndarray = None  # (T, 3) e12 x (v0 - origin)
    sw_d0: jnp.ndarray = None  # (T,) (v0 - origin) . n
    # two-level cluster sweep (ops/geometry.py:triangle_cluster_sweep_t):
    # the same sweep constants re-cut into K Morton-contiguous clusters
    # of C triangles with per-cluster AABBs (translated by sw_origin);
    # None when the table was built without pack_triangle_clusters
    cl_lo: jnp.ndarray = None  # (K, 3) f32 cluster AABB min - sw_origin
    cl_hi: jnp.ndarray = None  # (K, 3)
    cl_e12: jnp.ndarray = None  # (K, C, 3)
    cl_e13: jnp.ndarray = None  # (K, C, 3)
    cl_n: jnp.ndarray = None  # (K, C, 3); zero rows = padding (det masks out)
    cl_g1: jnp.ndarray = None  # (K, C, 3)
    cl_g2: jnp.ndarray = None  # (K, C, 3)
    cl_d0: jnp.ndarray = None  # (K, C)

    def __len__(self):
        return self.v0.shape[0]

    @property
    def has_sweep(self) -> bool:
        return self.sw_n is not None

    @property
    def has_clusters(self) -> bool:
        return self.cl_d0 is not None


def pack_triangle_sweep(tris: TriangleTable) -> TriangleTable:
    """Attach the dense-sweep triple-product constants (host, numpy)."""
    from ray_tracing_tpu.ops.geometry import triangle_sweep_tables

    origin, n, g1, g2, d0 = triangle_sweep_tables(
        np.asarray(tris.v0), np.asarray(tris.e12), np.asarray(tris.e13)
    )
    return tris.replace(
        sw_origin=_f32(origin), sw_n=_f32(n), sw_g1=_f32(g1),
        sw_g2=_f32(g2), sw_d0=_f32(d0),
    )


# Cluster width for the two-level sweep.  Measured on TPU v5e (16-bunny
# grid, 79,488 tris, 512^2): C=4096 with tile 2048 = 2.88 s/pass vs
# 5.7 (C=512), 4.6 (C=2048), 3.4 (C=8192+) — wide enough that the dense
# inner sweep amortizes the per-cluster cond, small enough that a
# coherent ray block still skips most of the mesh.  Override
# per-process with RAY_TPU_CLUSTER for A/B runs.
CLUSTER_SIZE = 4096


def pack_triangle_clusters(tris: TriangleTable, cluster_size: int = None) -> TriangleTable:
    """Cut a Morton-sorted, sweep-packed triangle table into contiguous
    clusters for :func:`ops.geometry.triangle_cluster_sweep_t` (host,
    numpy).  Padding rows get ``n = 0`` so their det masks out; the
    per-cluster AABBs use the same degenerate-triangle padding as the
    LBVH build (flat axes grown by 1e-3, models/compiler.py:_build_bvh)
    and are stored translated by ``sw_origin`` so the kernel's slab test
    shares the sweep's cancellation-safe frame."""
    import os

    if not tris.has_sweep:
        raise ValueError("pack_triangle_clusters needs sweep constants first")
    c = cluster_size or int(os.environ.get("RAY_TPU_CLUSTER", CLUSTER_SIZE))
    t = len(tris)
    if t == 0:
        return tris
    k = -(-t // c)
    pad = k * c - t

    def padded(x, fill=0.0):
        x = np.asarray(x, np.float32)
        if pad:
            x = np.concatenate(
                [x, np.full((pad,) + x.shape[1:], fill, np.float32)]
            )
        return x.reshape((k, c) + x.shape[1:])

    v0 = np.asarray(tris.v0, np.float32)
    v1 = v0 + np.asarray(tris.e12, np.float32)
    v2 = v0 + np.asarray(tris.e13, np.float32)
    origin = np.asarray(tris.sw_origin, np.float32)
    tmin = np.minimum(np.minimum(v0, v1), v2) - origin
    tmax = np.maximum(np.maximum(v0, v1), v2) - origin
    flat = tmax - tmin == 0.0
    tmin = np.where(flat, tmin - 1e-3, tmin)
    tmax = np.where(flat, tmax + 1e-3, tmax)
    return tris.replace(
        cl_lo=_f32(padded(tmin, np.inf).min(axis=1)),
        cl_hi=_f32(padded(tmax, -np.inf).max(axis=1)),
        cl_e12=_f32(padded(tris.e12)),
        cl_e13=_f32(padded(tris.e13)),
        cl_n=_f32(padded(tris.sw_n)),
        cl_g1=_f32(padded(tris.sw_g1)),
        cl_g2=_f32(padded(tris.sw_g2)),
        cl_d0=_f32(padded(tris.sw_d0)),
    )


@struct.dataclass
class RectTable:
    axis: jnp.ndarray  # (R,) i32 variant: 0=xy, 1=yz, 2=zx
    a0: jnp.ndarray  # (R,) f32 params in the variant's own order
    a1: jnp.ndarray
    b0: jnp.ndarray
    b1: jnp.ndarray
    k: jnp.ndarray
    positive: jnp.ndarray  # (R,) bool outward-normal sign
    material: jnp.ndarray  # (R,) i32
    transform: jnp.ndarray  # (R,) i32
    has_transforms: bool = struct.field(pytree_node=False, default=False)

    def __len__(self):
        return self.axis.shape[0]


@struct.dataclass
class TransformTable:
    """Affine instancing transforms (reference transform.rs:16-31).
    Slot 0 is always the identity."""

    fwd: jnp.ndarray  # (X, 3, 3)
    fwd_t: jnp.ndarray  # (X, 3)
    inv: jnp.ndarray  # (X, 3, 3)
    inv_t: jnp.ndarray  # (X, 3)


@struct.dataclass
class MaterialTable:
    mtype: jnp.ndarray  # (M,) i32
    tex: jnp.ndarray  # (M,) i32 texture index (lambertian albedo /
    #                     isotropic albedo / diffuse-light emit)
    albedo: jnp.ndarray  # (M, 3) f32 metal albedo
    fuzz: jnp.ndarray  # (M,) f32 metal fuzz
    ir: jnp.ndarray  # (M,) f32 dielectric refraction index

    def __len__(self):
        return self.mtype.shape[0]


@struct.dataclass
class TextureTable:
    ttype: jnp.ndarray  # (T,) i32
    color: jnp.ndarray  # (T, 3) f32 solid color
    density: jnp.ndarray  # (T,) f32 checker density
    child_odd: jnp.ndarray  # (T,) i32 checker sub-textures
    child_even: jnp.ndarray  # (T,) i32
    scale: jnp.ndarray  # (T,) f32 noise scale
    noise_depth: jnp.ndarray  # (T,) i32 noise turbulence octaves
    noise_offset: jnp.ndarray  # (T, 3) f32 decorrelation offset (the
    #   reference builds an independent Perlin per noise texture,
    #   json.rs:355-359; we share tables and shift the domain instead)
    image: jnp.ndarray  # (T,) i32 index into images
    # shared assets
    images: jnp.ndarray  # (I, Hmax, Wmax, 3) f32 texel atlas (0..1)
    image_dims: jnp.ndarray  # (I, 2) i32 (height, width)
    max_checker_depth: int = struct.field(pytree_node=False, default=1)
    max_noise_depth: int = struct.field(pytree_node=False, default=0)

    def __len__(self):
        return self.ttype.shape[0]


@struct.dataclass
class MediumBoundary:
    """Boundary primitives of one constant medium (reference
    constant_medium.rs:41-60 is generic over any inner Hittable; a
    multi-primitive inner shape — the RTNW smoke cuboid — becomes a
    HittableGroup, reference json.rs:565-576).  Prim counts per kind are
    static compile-time facts."""

    sph_center: jnp.ndarray  # (Bs, 3)
    sph_radius: jnp.ndarray  # (Bs,)
    rect_axis: jnp.ndarray  # (Br,) i32 variant 0=xy/1=yz/2=zx
    rect_a0: jnp.ndarray
    rect_a1: jnp.ndarray
    rect_b0: jnp.ndarray
    rect_b1: jnp.ndarray
    rect_k: jnp.ndarray
    tri_v0: jnp.ndarray  # (Bt, 3)
    tri_e12: jnp.ndarray
    tri_e13: jnp.ndarray
    n_sph: int = struct.field(pytree_node=False, default=0)
    n_rect: int = struct.field(pytree_node=False, default=0)
    n_tri: int = struct.field(pytree_node=False, default=0)


def make_medium_boundary(spheres=(), rects=(), tris=()) -> MediumBoundary:
    """spheres: [(center, radius)]; rects: [(axis, a0, a1, b0, b1, k)];
    tris: (Bt, 3, 3) vertex array."""
    f32 = np.float32
    sc = np.stack([np.asarray(c, f32) for c, _ in spheres]) if spheres else np.zeros((0, 3), f32)
    sr = np.asarray([r for _, r in spheres], f32)
    ra = np.asarray([r[0] for r in rects], np.int32)
    rf = [np.asarray([r[i] for r in rects], f32) for i in range(1, 6)]
    tv = np.asarray(tris, f32).reshape(-1, 3, 3) if len(tris) else np.zeros((0, 3, 3), f32)
    return MediumBoundary(
        sph_center=_f32(sc), sph_radius=_f32(sr),
        rect_axis=_i32(ra), rect_a0=_f32(rf[0]), rect_a1=_f32(rf[1]),
        rect_b0=_f32(rf[2]), rect_b1=_f32(rf[3]), rect_k=_f32(rf[4]),
        tri_v0=_f32(tv[:, 0]), tri_e12=_f32(tv[:, 1] - tv[:, 0]),
        tri_e13=_f32(tv[:, 2] - tv[:, 0]),
        n_sph=len(spheres), n_rect=len(rects), n_tri=tv.shape[0],
    )


@struct.dataclass
class MediumTable:
    """All constant media in the scene.  ``boundaries`` is a static
    tuple (one MediumBoundary per medium — the member list changes the
    traced program, like LightTable); ``transform`` holds static
    transform-table slots applied around the whole medium (reference
    wraps the ConstantMedium itself in TransformHittable,
    json.rs:549-576)."""

    boundaries: tuple = ()  # of MediumBoundary (pytree leaves inside)
    niv: jnp.ndarray = None  # (M,) f32 neg_inv_density
    material: jnp.ndarray = None  # (M,) i32 phase-function material
    transform: tuple = struct.field(pytree_node=False, default=())

    def __len__(self):
        return len(self.boundaries)


def empty_medium_table() -> MediumTable:
    return MediumTable(
        boundaries=(), niv=_f32(np.zeros((0,))), material=_i32(np.zeros((0,))),
        transform=(),
    )


@struct.dataclass
class LightTable:
    """Importance-sampled ("important") primitives — the reference's
    ``Scene::lights`` HittableGroup (reference src/scene.rs:52-61).

    The member list is a *static* compile-time fact (it changes the
    traced program: one unrolled pdf/sample block per light), so kinds
    and indices are plain Python tuples, not arrays."""

    kind: tuple = struct.field(pytree_node=False, default=())
    index: tuple = struct.field(pytree_node=False, default=())
    transform: tuple = struct.field(pytree_node=False, default=())

    def __len__(self):
        return len(self.kind)


@struct.dataclass
class SceneData:
    """The whole compiled scene as one jit-traversable pytree."""

    spheres: SphereTable
    triangles: TriangleTable
    rects: RectTable
    transforms: TransformTable
    materials: MaterialTable
    textures: TextureTable
    lights: LightTable
    background: jnp.ndarray  # (3,) color for rays that miss everything
    #                           (reference renderer.rs:184)
    environment: jnp.ndarray  # (3,) color at depth exhaustion
    #                           (reference renderer.rs:128-130)
    bvh: Any = None  # Optional[ops.bvh.BVHTable] over the triangle table
    media: MediumTable = None  # constant media (None only on legacy pytrees)
    # static layout facts (compile-time constants)
    n_spheres: int = struct.field(pytree_node=False, default=0)
    n_triangles: int = struct.field(pytree_node=False, default=0)
    n_rects: int = struct.field(pytree_node=False, default=0)
    n_lights: int = struct.field(pytree_node=False, default=0)
    n_medium: int = struct.field(pytree_node=False, default=0)
    # shutter window [t0, t1] for motion blur; the renderer stamps the
    # camera's time0/time1 here when the scene has moving spheres (ray
    # time is derived per ray id from the counter hash — ops/rng.py —
    # so it needs no per-ray carry and replays bit-exactly)
    shutter: Optional[jnp.ndarray] = None  # (2,) f32

    @property
    def has_lights(self) -> bool:
        return self.n_lights > 0

    @property
    def has_motion(self) -> bool:
        return self.n_spheres > 0 and self.spheres.has_motion


def identity_transform_table(extra: Optional[list] = None) -> TransformTable:
    """Build a transform table whose slot 0 is the identity; ``extra`` is
    a list of (fwd 3x3, translate 3) numpy pairs appended after it."""
    fwds = [np.eye(3, dtype=np.float32)]
    ts = [np.zeros(3, dtype=np.float32)]
    invs = [np.eye(3, dtype=np.float32)]
    inv_ts = [np.zeros(3, dtype=np.float32)]
    for fwd, t in extra or []:
        fwd = np.asarray(fwd, dtype=np.float32)
        t = np.asarray(t, dtype=np.float32)
        # inverse of x -> fwd @ x + t as in reference transform.rs:18-22
        m = np.eye(4, dtype=np.float64)
        m[:3, :3] = fwd
        m[:3, 3] = t
        mi = np.linalg.inv(m)
        fwds.append(fwd)
        ts.append(t)
        invs.append(mi[:3, :3].astype(np.float32))
        inv_ts.append(mi[:3, 3].astype(np.float32))
    return TransformTable(
        fwd=_f32(np.stack(fwds)),
        fwd_t=_f32(np.stack(ts)),
        inv=_f32(np.stack(invs)),
        inv_t=_f32(np.stack(inv_ts)),
    )


def empty_sphere_table() -> SphereTable:
    z3 = np.zeros((0, 3), np.float32)
    z = np.zeros((0,), np.float32)
    zi = np.zeros((0,), np.int32)
    return SphereTable(
        center=_f32(z3), radius=_f32(z), material=_i32(zi), transform=_i32(zi),
    )


def empty_triangle_table() -> TriangleTable:
    z3 = np.zeros((0, 3), np.float32)
    z2 = np.zeros((0, 2), np.float32)
    zi = np.zeros((0,), np.int32)
    return TriangleTable(
        v0=_f32(z3), e12=_f32(z3), e13=_f32(z3),
        n0=_f32(z3), n1=_f32(z3), n2=_f32(z3),
        uv0=_f32(z2), uv1=_f32(z2), uv2=_f32(z2),
        material=_i32(zi),
    )


def empty_rect_table() -> RectTable:
    z = np.zeros((0,), np.float32)
    zi = np.zeros((0,), np.int32)
    zb = np.zeros((0,), bool)
    return RectTable(
        axis=_i32(zi), a0=_f32(z), a1=_f32(z), b0=_f32(z), b1=_f32(z),
        k=_f32(z), positive=jnp.asarray(zb), material=_i32(zi),
        transform=_i32(zi),
    )


def empty_light_table() -> LightTable:
    return LightTable(kind=(), index=(), transform=())
