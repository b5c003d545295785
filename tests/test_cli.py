"""CLI frontend test (reference src/main.rs behavior)."""

import json
import os
import subprocess
import sys


def test_cli_renders_scene(tmp_path):
    scene = {
        "renderer": {"width": 24, "height": 16, "max_depth": 3},
        "camera": {"look_from": [0, 0, 1], "look_at": [0, 0, -1], "vfov": 60},
        "background": [0.6, 0.7, 0.9],
        "objects": [
            {
                "shape": {"type": "sphere", "center": [0, 0, -3], "radius": 1},
                "material": {
                    "type": "lambertian",
                    "texture": {"type": "solid-color", "color": [0.8, 0.2, 0.2]},
                },
            }
        ],
    }
    scene_path = tmp_path / "scene.json"
    scene_path.write_text(json.dumps(scene))
    out_path = tmp_path / "out.bmp"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd()
    proc = subprocess.run(
        [
            sys.executable, "-m", "ray_tracing_tpu.cli",
            "-i", str(scene_path), "-o", str(out_path),
            "--iterations", "2",
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    assert "Iter 1 +" in proc.stdout  # reference main.rs:48-52 log format
    assert "Iter 2 +" in proc.stdout
    assert "saved" in proc.stdout
    assert out_path.exists()

    from PIL import Image

    with Image.open(out_path) as im:
        assert im.size == (24, 16)
