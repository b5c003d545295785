"""Renderer frontend: progressive one-sample-per-pixel passes.

Mirrors the reference's ``Renderer`` / ``RenderResult`` split
(reference src/renderer.rs:72-332, 335-406): ``Renderer.render(key)``
produces one full-image 1-spp pass of *linear* radiance (the unit of
work a rayon job renders in the reference, src/main.rs:39-63), and
``RenderResult`` accumulates passes and tone-maps (mean → sqrt gamma →
×256 → clamp 0.5..255.5 → u8, NaN→0, renderer.rs:369-406).

Rays are traced in fixed-size tiles (lax.map) so the (rays × primitives)
candidate grids stay within a bounded memory footprint regardless of
resolution.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu.models.camera import Camera, CameraParam, camera_rays
from ray_tracing_tpu.models.scene import SceneData
from ray_tracing_tpu.render.integrator import trace, trace_compacted


@dataclasses.dataclass
class RendererParam:
    """reference renderer.rs:42-51 (max_depth default 20: renderer.rs:331;
    antialias default true: renderer.rs:49-50)."""

    width: int
    height: int
    max_depth: Optional[int] = None
    antialias: Optional[bool] = None

    @classmethod
    def from_json(cls, d: dict) -> "RendererParam":
        return cls(
            width=d["width"],
            height=d["height"],
            max_depth=d.get("max_depth"),
            antialias=d.get("antialias"),
        )


def _pick_tile_size(n_rays: int, n_prims: int, grid_budget: int = 4_194_304) -> int:
    """Bound the (tile × primitives) candidate grid to ``grid_budget``
    entries (16 MB of f32 at the default).  Cap at 64k rays: re-measured
    round 5 at 1024² on zy (TPU v5e) after the fusion/schedule changes —
    65536 beats 131072 by 7% on the plain render pass (267 vs 287 ms)
    and by ~0.6% on the gradient pass; 262144+ still regresses on the
    compaction argsorts.  (Round 3 measured the opposite ranking under
    the old fusion regime; the A/B lives in scratch/exp_r5_tile.py.)"""
    budget = grid_budget // max(n_prims, 1)
    tile = 512
    while tile * 2 <= min(budget, n_rays, 65536):
        tile *= 2
    return tile


def render_pass(
    scene: SceneData,
    camera: Camera,
    key: jax.Array,
    *,
    width: int,
    height: int,
    max_depth: int,
    antialias: bool,
    tile_size: int,
    remat: bool = False,
    with_stats: bool = False,
    early_exit: bool = False,
    compaction: bool = False,
    fusion_hint: bool = False,
) -> jnp.ndarray:
    """One full-image 1-spp pass -> (H, W, 3) linear radiance.

    Pure function of (scene, camera, key); differentiable w.r.t. scene
    and camera pytree leaves.  Keyword args are static.  With
    ``with_stats`` also returns the total ray-segment count (see
    integrator.trace).  With ``fusion_hint`` (compaction only) the
    return gains a junk scalar the caller's jit must also return —
    keeping it live flips XLA's bounce-loop fusion in our favor
    (231 → 182 ms/pass at 1024²; integrator.trace_compacted); the
    image is bit-identical either way.
    """
    assert not (fusion_hint and not compaction)
    n = width * height
    from ray_tracing_tpu.models.camera import stamp_shutter

    scene = stamp_shutter(scene, camera)
    ro, rd, _time, k_trace = camera_rays(camera, key, width, height, antialias)

    n_tiles = -(-n // tile_size)
    pad = n_tiles * tile_size - n
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), jnp.float32)])
        rd = jnp.concatenate(
            [rd, jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (pad, 1))]
        )
    ro = ro.reshape(n_tiles, tile_size, 3)
    rd = rd.reshape(n_tiles, tile_size, 3)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)

    def run_tile(args):
        # ONE key + per-tile ids_base (globally unique RNG ids): the
        # image is a pure function of (scene, camera, key) INDEPENDENT
        # of tile_size — tiling is an execution strategy, like
        # compaction (tests assert bit-equality across tile sizes).
        ro_t, rd_t, tid = args
        base = tid * tile_size
        if compaction:
            out = trace_compacted(
                scene, ro_t, rd_t, k_trace, max_depth,
                with_stats=with_stats, ids_base=base,
                fusion_hint=fusion_hint,
            )
        else:
            out = trace(
                scene, ro_t, rd_t, k_trace, max_depth,
                remat=remat, with_stats=with_stats, early_exit=early_exit,
                ids_base=base,
            )
        return out if isinstance(out, tuple) else (out,)

    if n_tiles == 1:
        out = tuple(x[None] for x in run_tile((ro[0], rd[0], tile_ids[0])))
    else:
        out = jax.lax.map(run_tile, (ro, rd, tile_ids))
    colors = out[0]
    colors = colors.reshape(n_tiles * tile_size, 3)[:n]
    img = colors.reshape(height, width, 3)
    outs = (img,)
    pos = 1
    if with_stats:
        outs = outs + (jnp.sum(out[pos]),)
        pos += 1
    if fusion_hint:
        outs = outs + (jnp.sum(out[pos]),)
    return outs if len(outs) > 1 else img


class Renderer:
    """Holds a compiled scene + camera and a jitted render pass
    (reference Renderer::new, renderer.rs:84-93)."""

    def __init__(
        self,
        param: RendererParam,
        camera: CameraParam,
        scene: SceneData,
        tile_size: Optional[int] = None,
        early_exit: Optional[bool] = None,
        compaction: bool = True,
    ):
        # compaction: staged alive-first stream compaction (2.7x on
        # deep closed scenes).  Since uniforms are keyed by
        # (ray id, bounce) it is BIT-IDENTICAL to the dense loop --
        # a pure execution strategy (tests/test_fuzz_scenes.py asserts
        # equality); compaction=False only switches the schedule.
        self.param = param
        self.scene = scene
        aspect = param.width / param.height
        self.camera = Camera.build(camera, aspect)
        # the (rays x prims) grid budget only covers brute-forced
        # primitives; BVH'd triangles traverse with O(1) live state
        from ray_tracing_tpu.ops.intersect import mesh_strategy

        strategy = mesh_strategy(scene)
        n_prims = scene.n_spheres + scene.n_rects
        grid_budget = 4_194_304
        if strategy in ("sweep", "brute"):
            n_prims += scene.n_triangles
        if strategy == "sweep":
            # the sweep's (N, T) grids are lean (~5 f32 scalars per
            # pair, no (N, T, 3) temps), so a larger grid keeps tiles
            # wide enough to amortize per-tile overhead (measured on
            # C4/bunny: tile 8192 = 0.365 s/pass vs 0.557 at 4096)
            grid_budget = 67_108_864
        self.tile_size = tile_size or _pick_tile_size(
            param.width * param.height, n_prims, grid_budget
        )
        if strategy == "bvh":
            # BVH traversal cost per tile is the MAX path length over
            # its rays; small coherent tiles beat wide ones (measured:
            # 4096 ≈ 2x faster than 32768 on scene.json)
            self.tile_size = min(self.tile_size, 4096)
        elif strategy == "cluster":
            # same coherence argument for the cluster sweep's any-ray
            # AABB cull (XLA-sweep era: 2.88 s/pass at 2048 vs 3.53 at
            # 65536 on the 79k bunny grid).  Under the Pallas cluster
            # kernel the cull is per 2048-ray BLOCK, so the tile size
            # is ~flat (re-measured round 4: 1.34/1.35/1.35 s at
            # 2048/4096/8192); keep 2048 for the XLA fallback's sake.
            self.tile_size = min(self.tile_size, 2048)
        self.max_depth = param.max_depth if param.max_depth is not None else 20
        self.antialias = param.antialias if param.antialias is not None else True
        if early_exit is None:
            # Heuristic: open scenes (no importance-sampled lights, rays
            # escape to the background quickly) gain a lot from stopping
            # when the wavefront dies; closed Cornell-style scenes keep a
            # tail of live rays to full depth and the while_loop's lost
            # cross-bounce pipelining costs ~10%.
            early_exit = not scene.has_lights
        self._pass_opts = dict(
            width=param.width,
            height=param.height,
            max_depth=self.max_depth,
            antialias=self.antialias,
            tile_size=self.tile_size,
            early_exit=early_exit and not compaction,
            compaction=compaction,
            # fusion_hint flips XLA's bounce-loop fusion when the
            # radiance is consumed REDUCED (231 -> 182 ms/pass at
            # 1024², scratch/exp_r5_fuse.py), but with the full image
            # as the jit output the effect measured noise-level
            # (1.01x +-0.04 interleaved), so it stays off here; the
            # capability + bit-identity test remain for scalar-consumer
            # callers
            fusion_hint=False,
        )
        self._render = jax.jit(partial(render_pass, **self._pass_opts))
        self._hint = False

    @staticmethod
    def _as_key(key):
        if not (
            isinstance(key, jax.Array)
            and jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key)
        ):
            key = jax.random.key(int(key))
        return key

    def render(self, key) -> jnp.ndarray:
        """One 1-spp pass; ``key`` is a PRNG key or an int seed.
        Returns (H, W, 3) float32 linear radiance on device."""
        out = self._render(self.scene, self.camera, self._as_key(key))
        return out[0] if self._hint else out

    def render_with_stats(self, key):
        """(image, traced_segment_count) — the honest rays/s numerator,
        measured on the SAME code path render() runs (compaction /
        early-exit settings included)."""
        if not hasattr(self, "_render_stats"):
            self._render_stats = jax.jit(
                partial(render_pass, with_stats=True, **self._pass_opts)
            )
        out = self._render_stats(self.scene, self.camera, self._as_key(key))
        return out[:2]

    def accumulate(self, key, acc=None):
        """Fold one pass into a device-resident sum image and return it
        (asynchronously dispatched — no host sync).

        Through a high-latency link (the axon tunnel pays ~30-100 ms per
        device->host sync) per-pass ``np.asarray`` dominates progressive
        rendering; accumulate K passes on device and materialize only
        when displaying/saving::

            acc = None
            for i in range(64):
                acc = renderer.accumulate(i, acc)
            image = np.asarray(acc) / 64
        """
        if not hasattr(self, "_accum_fn"):
            render = self._render
            hint = self._hint

            @jax.jit
            def accum(scene, camera, k, a):
                out = render(scene, camera, k)
                if hint:
                    # the junk hint must remain a live OUTPUT of this
                    # jit too, or XLA DCEs it and the fusion win is lost
                    return a + out[0], out[1]
                return a + out, jnp.int32(0)

            self._accum_fn = accum
        if acc is None:
            acc = jnp.zeros(
                (self.param.height, self.param.width, 3), jnp.float32
            )
        acc, _ = self._accum_fn(
            self.scene, self.camera, self._as_key(key), acc
        )
        return acc

    def render_to_noise(
        self,
        key,
        *,
        target_rel_err: float = 0.02,
        max_passes: int = 4096,
        min_passes: int = 8,
        check_every: int = 16,
    ):
        """Render passes until the Monte-Carlo error estimate drops
        below ``target_rel_err`` (production noise-targeted rendering;
        the reference only offers a fixed manual pass count).

        Tracks per-pixel (sum, sum of squares) on device; every
        ``check_every`` passes one SCALAR — the mean over pixels of the
        luminance stderr / (luminance + 1e-3) — is synced to the host
        (a single cheap device->host round-trip).  Returns
        ``(mean_image (H, W, 3) np.float32, passes, rel_err)``.
        """
        if not hasattr(self, "_accum2_fn"):
            render = self._render
            hint = self._hint

            @jax.jit
            def accum2(scene, camera, k, s, s2):
                out = render(scene, camera, k)
                img, h = (out if hint else (out, jnp.int32(0)))
                return s + img, s2 + img * img, h

            @jax.jit
            def criterion(s, s2, n):
                mean = s / n
                var = jnp.maximum(s2 / n - mean * mean, 0.0) * n / jnp.maximum(n - 1, 1)
                lum = jnp.sum(mean * jnp.asarray([0.2126, 0.7152, 0.0722]), -1)
                lvar = jnp.sum(var * jnp.asarray([0.2126, 0.7152, 0.0722]) ** 2, -1)
                stderr = jnp.sqrt(lvar / n)
                return jnp.mean(stderr / (lum + 1e-3))

            self._accum2_fn, self._crit_fn = accum2, criterion

        key = self._as_key(key)
        shape = (self.param.height, self.param.width, 3)
        s = jnp.zeros(shape, jnp.float32)
        s2 = jnp.zeros(shape, jnp.float32)
        n = 0
        rel = float("inf")
        while n < max_passes:
            s, s2, _ = self._accum2_fn(
                self.scene, self.camera, jax.random.fold_in(key, n), s, s2
            )
            n += 1
            if n >= min_passes and (n % check_every == 0 or n == max_passes):
                rel = float(self._crit_fn(s, s2, jnp.float32(n)))
                if rel <= target_rel_err:
                    break
        return np.asarray(s) / n, n, rel

    async def render_async(self, key):
        """Awaitable render matching the reference's async Python API
        (reference renderer.rs:449-476) — returns an (H, W, 3) numpy
        array of linear radiance."""
        import asyncio

        loop = asyncio.get_running_loop()

        def work():
            return np.asarray(self.render(key))

        return await loop.run_in_executor(None, work)


class RenderResult:
    """Progressive accumulator (reference renderer.rs:335-406).

    Thread-safe enough for the reference's usage pattern (single writer);
    ``add`` folds in one 1-spp pass, ``get_raw`` tone-maps to u8 bytes.
    """

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height
        self.sum = np.zeros((height, width, 3), dtype=np.float32)
        self.count = 0

    def add(self, colors) -> int:
        """colors: (H, W, 3) linear radiance of one pass."""
        self.sum += np.asarray(colors, dtype=np.float32)
        self.count += 1
        return self.count

    def get_raw(self, last: int = 0):
        """u8 RGB bytes after mean + sqrt gamma (renderer.rs:369-406);
        returns (bytes_array (H, W, 3) u8, count) or None when no new
        passes landed since ``last``."""
        if self.count <= last:
            return None
        vals = np.sqrt(self.sum / self.count) * 256.0
        vals = np.where(np.isnan(vals), 0.0, np.clip(vals, 0.5, 255.5))
        return vals.astype(np.uint8), self.count

    def mean(self) -> np.ndarray:
        """Linear mean image (the GUI's display path, main.py:1136-1153)."""
        return self.sum / max(self.count, 1)
