"""Checkpoint / resume.

Progressive rendering is checkpoint-shaped: the image is a monotone
``(sum, count)`` accumulator (reference RenderResult, renderer.rs:335-368)
and the RNG is a counter-based key, so ``(sum, count, seed)`` fully
captures a render in flight.  The reference only persists GUI undo
state; renders restart from zero (SURVEY §5).  Here a render resumes
exactly: pass ``i`` of a resumed render draws the same key it would have
drawn originally.

Differentiable-fit state (parameter tables + optimizer step) uses the
same npz container.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ray_tracing_tpu.render.renderer import RenderResult

_MAGIC = "ray_tracing_tpu.render.v1"
_FIT_MAGIC = "ray_tracing_tpu.fit.v1"


def save_render(path: str, result: RenderResult, seed: int) -> None:
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp + ".npz",
        magic=_MAGIC,
        sum=result.sum,
        count=result.count,
        seed=seed,
        width=result.width,
        height=result.height,
    )
    actual = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual, path)


def load_render(path: str) -> Tuple[RenderResult, int]:
    """-> (RenderResult with accumulated passes, seed)."""
    with np.load(path, allow_pickle=False) as data:
        assert str(data["magic"]) == _MAGIC, "not a render checkpoint"
        result = RenderResult(int(data["width"]), int(data["height"]))
        result.sum = np.asarray(data["sum"], np.float32)
        result.count = int(data["count"])
        return result, int(data["seed"])


def save_fit(path: str, *, step: int, color_table: np.ndarray,
             extra: Optional[dict] = None) -> None:
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp, magic=_FIT_MAGIC, step=step, color=np.asarray(color_table),
        **{f"extra_{k}": np.asarray(v) for k, v in (extra or {}).items()},
    )
    os.replace(tmp, path)


def load_fit(path: str) -> Tuple[int, np.ndarray, dict]:
    with np.load(path, allow_pickle=False) as data:
        assert str(data["magic"]) == _FIT_MAGIC, "not a fit checkpoint"
        extra = {
            k[len("extra_"):]: np.asarray(v)
            for k, v in data.items() if k.startswith("extra_")
        }
        return int(data["step"]), np.asarray(data["color"]), extra
