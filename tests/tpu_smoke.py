"""Compiled-Mosaic smoke run on the real TPU (VERDICT r3 item 4).

The pytest suite forces CPU (tests/conftest.py), so the two compiled
Pallas test paths are skipped there and a Mosaic-only bug (like round
3's uninitialized output table, commit a9514aa) could ship silently.
This harness runs ON THE DEFAULT (TPU) BACKEND:

  1. the compiled scatter-add kernel test body,
  2. the compiled triangle-sweep kernel test body,
  3. a winner-equality check of the fused intersect kernel against the
     XLA phase-A sweep (same device, same scene, same rays),
  4. one zy_scene gallery pass, recording mean + sha256 of the raw
     float image (bit-reproducible on TPU for a fixed key),

and writes the results under the "tpu_smoke" key of renders/stats.json
so every round leaves a recorded compiled-Mosaic result.

Run:  python -m tests.tpu_smoke        (exit 0 = all checks passed)
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATS = os.path.join(REPO, "renders", "stats.json")


def _record(results: dict) -> None:
    stats = {}
    if os.path.exists(STATS):
        with open(STATS) as f:
            stats = json.load(f)
    stats["tpu_smoke"] = results
    with open(STATS, "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(results, indent=1))


def main() -> int:
    import jax

    results = {
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "backend": jax.default_backend(),
        "checks": {},
    }
    if jax.default_backend() not in ("tpu", "axon"):
        results["checks"]["backend"] = (
            "SKIPPED: default backend is not a TPU — nothing recorded"
        )
        _record(results)
        return 1

    import jax.numpy as jnp
    import numpy as np

    from ray_tracing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    def run(name, fn):
        try:
            fn()
            results["checks"][name] = "ok"
        except Exception:
            results["checks"][name] = "FAIL: " + traceback.format_exc(-3)

    # 1-2. the compiled kernel test bodies (import, don't pytest: the
    # suite's conftest forces CPU, which is exactly what this bypasses)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import test_pallas_scatter
    import test_pallas_triangles

    run("pallas_scatter_compiled",
        test_pallas_scatter.test_kernel_compiled_on_tpu_matches_direct)
    run("pallas_triangles_compiled",
        test_pallas_triangles.test_compiled_on_tpu_matches_xla_sweep)
    run("pallas_cluster_compiled",
        test_pallas_triangles.test_cluster_kernel_compiled_on_tpu_matches_xla)
    run("pallas_cluster_paged_500k_compiled",
        test_pallas_triangles.test_cluster_paged_compiled_500k_matches_xla_cluster)

    # 3. fused intersect kernel vs the XLA phase-A winner, same device
    def intersect_winner_check():
        from ray_tracing_tpu import load_scene_json
        from ray_tracing_tpu.models.camera import Camera, camera_rays
        from ray_tracing_tpu.ops import intersect as isect
        from ray_tracing_tpu.ops.pallas_intersect import (
            pallas_eligible,
            pallas_phase_a,
        )

        bundle = load_scene_json(os.path.join(REPO, "data/zy_scene.json"))
        scene = bundle.scene
        assert pallas_eligible(scene)
        cam = Camera.build(bundle.camera, 1.0)
        ro, rd, _, _ = camera_rays(cam, jax.random.key(3), 128, 128, True)

        @jax.jit
        def both(s, ro, rd):
            pt, pk, pi = pallas_phase_a(s, ro, rd)
            st, sm = isect._sphere_phase_a(
                s, ro, rd, isect.geo.EPSILON, isect.INF)
            rt, rm = isect._rect_phase_a(
                s, ro, rd, isect.geo.EPSILON, isect.INF)
            return pt, pk, pi, st, sm, rt, rm

        pt, pk, pi, st, sm, rt, rm = map(
            np.asarray, both(scene, ro, rd))
        st = np.where(sm, st, np.inf)
        rt = np.where(rm, rt, np.inf)
        xs, xr = st.min(1), rt.min(1)
        xt = np.minimum(xs, xr)
        xkind = np.where(xs <= xr, isect.KIND_SPHERE, isect.KIND_RECT)
        xidx = np.where(xs <= xr, st.argmin(1), rt.argmin(1))
        xfound = np.isfinite(xt)
        pfound = pk >= 0
        np.testing.assert_array_equal(pfound, xfound)
        # rtol 1e-4: the kernel and the XLA sweep order their f32 FMAs
        # differently (measured 5.8e-5 max relative on 0.15% of rays)
        np.testing.assert_allclose(pt[pfound], xt[xfound], rtol=1e-4)
        same = pk[pfound] == xkind[xfound]
        # ties across kinds at equal t are legitimate; t must agree
        assert (
            np.array_equal(pi[pfound][same], xidx[xfound][same])
        ), "winner indices diverge"
        assert same.mean() > 0.999, "kind winners diverge beyond ties"

    run("pallas_intersect_winner", intersect_winner_check)

    # 3b. motion-blur intersect kernel (per-ray time operand), compiled
    import test_motion

    run("pallas_motion_compiled",
        lambda: test_motion.motion_kernel_matches_xla_body(interpret=False))

    # 4. one zy gallery pass: mean + sha256 of the raw floats
    def gallery_pass():
        from ray_tracing_tpu import Renderer, RendererParam, load_scene_json

        bundle = load_scene_json(os.path.join(REPO, "data/zy_scene.json"))
        r = Renderer(
            RendererParam(128, 128, max_depth=bundle.renderer.max_depth or 20),
            bundle.camera,
            bundle.scene,
        )
        img = np.asarray(r.render(42))
        assert np.isfinite(img).all() and (img >= 0).all()
        results["zy_128_mean"] = float(img.mean())
        results["zy_128_sha256"] = hashlib.sha256(
            np.ascontiguousarray(img).tobytes()
        ).hexdigest()
        assert 0.1 < img.mean() < 0.4, f"zy mean {img.mean()} out of family"

    run("gallery_pass", gallery_pass)

    _record(results)
    return 0 if all(v == "ok" for v in results["checks"].values()) else 1


if __name__ == "__main__":
    sys.exit(main())
