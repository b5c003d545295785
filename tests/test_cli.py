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


def test_hdr_roundtrip(tmp_path):
    """save_hdr/load_hdr round-trip linear radiance within RGBE's 1/256
    mantissa quantization, including HDR values > 1 and exact zeros."""
    import numpy as np

    from ray_tracing_tpu.utils.image import load_hdr, save_hdr

    rng = np.random.RandomState(0)
    img = (rng.uniform(0, 1, (7, 5, 3)) ** 2).astype(np.float32)
    img *= rng.choice([0.01, 1.0, 37.5], size=(7, 5, 1)).astype(np.float32)
    img[0, 0] = 0.0  # exact-zero pixel
    path = str(tmp_path / "t.hdr")
    save_hdr(path, img)
    back = load_hdr(path)
    assert back.shape == img.shape
    assert (back[0, 0] == 0).all()
    bright = img.max(axis=-1, keepdims=True)
    tol = np.maximum(bright / 256.0, 1e-7)
    assert (np.abs(back - img) <= tol + 1e-6).all()


def test_cli_hdr_output(tmp_path):
    """-o out.hdr writes linear Radiance RGBE (mean radiance, no tone
    map) the CLI can produce alongside bmp/png."""
    import numpy as np

    from ray_tracing_tpu.cli import main
    from ray_tracing_tpu.utils.image import load_hdr

    out = str(tmp_path / "r.hdr")
    rc = main([
        "-i", "data/zy_scene.json", "-o", out,
        "--iterations", "1", "--width", "24", "--height", "24",
        "--max-depth", "3",
    ])
    assert rc == 0
    img = load_hdr(out)
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all() and img.max() > 0
