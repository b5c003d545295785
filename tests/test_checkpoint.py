"""Checkpoint/resume + profiling utility tests."""

import json
import os
import subprocess
import sys

import numpy as np

from ray_tracing_tpu.render.renderer import RenderResult
from ray_tracing_tpu.utils.checkpoint import (
    load_fit,
    load_render,
    save_fit,
    save_render,
)
from ray_tracing_tpu.utils.profiling import RenderStats


def test_render_checkpoint_roundtrip(tmp_path):
    result = RenderResult(8, 6)
    rng = np.random.RandomState(0)
    for _ in range(3):
        result.add(rng.uniform(0, 1, (6, 8, 3)).astype(np.float32))
    path = str(tmp_path / "render.ckpt")
    save_render(path, result, seed=42)
    restored, seed = load_render(path)
    assert seed == 42
    assert restored.count == 3
    np.testing.assert_array_equal(restored.sum, result.sum)
    # accumulation continues seamlessly
    restored.add(np.zeros((6, 8, 3), np.float32))
    assert restored.count == 4


def test_fit_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "fit.ckpt")
    colors = np.random.RandomState(1).uniform(0, 1, (5, 3)).astype(np.float32)
    save_fit(path, step=17, color_table=colors, extra={"lr": np.float32(0.5)})
    step, restored, extra = load_fit(path)
    assert step == 17
    np.testing.assert_array_equal(restored, colors)
    assert float(extra["lr"]) == 0.5


def test_render_stats():
    stats = RenderStats()
    for _ in range(3):
        stats.start_pass()
        stats.end_pass(segments=1000.0)
    s = stats.summary()
    assert s["passes"] == 3
    assert s["total_segments"] == 3000.0
    assert s["rays_per_s"] > 0


def test_cli_resume_continues_key_sequence(tmp_path):
    """Rendering 4 passes in one run == 2 passes, checkpoint, resume,
    2 more passes — bit-identical accumulators."""
    scene = {
        "renderer": {"width": 16, "height": 12, "max_depth": 2},
        "camera": {"look_from": [0, 0, 1], "look_at": [0, 0, -1], "vfov": 60},
        "background": [0.4, 0.5, 0.6],
        "objects": [
            {
                "shape": {"type": "sphere", "center": [0, 0, -3], "radius": 1},
                "material": {
                    "type": "metal", "albedo": [0.9, 0.8, 0.7], "fuzz": 0.2,
                },
            }
        ],
    }
    scene_path = tmp_path / "scene.json"
    scene_path.write_text(json.dumps(scene))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd()

    def run(out, iters, ckpt=None):
        cmd = [
            sys.executable, "-m", "ray_tracing_tpu.cli",
            "-i", str(scene_path), "-o", str(out),
            "--iterations", str(iters),
        ]
        if ckpt:
            cmd += ["--checkpoint", str(ckpt)]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=300, env=env)
        assert proc.returncode == 0, proc.stderr
        return proc.stdout

    # one-shot 4 passes
    run(tmp_path / "a.png", 4, tmp_path / "a.ckpt")
    sum_a, _ = load_render(str(tmp_path / "a.ckpt"))
    # split 2 + resume to 4
    run(tmp_path / "b.png", 2, tmp_path / "b.ckpt")
    out = run(tmp_path / "b.png", 4, tmp_path / "b.ckpt")
    assert "resumed at iteration 2" in out
    sum_b, _ = load_render(str(tmp_path / "b.ckpt"))
    np.testing.assert_allclose(sum_a.sum, sum_b.sum, rtol=1e-6)
    assert sum_a.count == sum_b.count == 4
