"""Smoke tests for the runnable examples (user-facing deliverables)."""

import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script,args,expect", [
    ("examples/fit_albedo.py", ["--steps", "6", "--size", "16"],
     "final per-texture error"),
    ("examples/fit_materials.py",
     ["--steps", "12", "--size", "16", "--depth", "4"],
     "final |fuzz err|"),
    ("examples/fit_geometry.py", ["--steps", "8", "--size", "16"],
     "final geometry error"),
])
def test_example_runs_standalone(script, args, expect):
    """Examples must run as plain scripts (no install, forced CPU) and
    reach their final report line."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert expect in proc.stdout, proc.stdout[-2000:]
