"""Tracing / profiling / metrics.

The reference's only observability is wall-clock iteration logging
(reference src/main.rs:48-52); production TPU rendering needs more:
per-pass throughput counters (honest rays/s from traced-segment counts),
and on-demand XLA profiler traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class PassRecord:
    iteration: int
    seconds: float
    segments: float  # traced ray segments (sum over bounces of live rays)

    @property
    def rays_per_s(self) -> float:
        return self.segments / self.seconds if self.seconds > 0 else 0.0


@dataclass
class RenderStats:
    """Accumulates per-pass timing/throughput; prints reference-style
    ``Iter N +Ts`` lines when ``verbose``."""

    verbose: bool = False
    passes: List[PassRecord] = field(default_factory=list)
    _t0: Optional[float] = None

    def start_pass(self) -> None:
        self._t0 = time.perf_counter()

    def end_pass(self, segments: float = 0.0) -> PassRecord:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        rec = PassRecord(
            iteration=len(self.passes) + 1, seconds=dt, segments=float(segments)
        )
        self.passes.append(rec)
        if self.verbose:
            print(f"Iter {rec.iteration} +{dt:.3f}s", flush=True)
        return rec

    @property
    def total_seconds(self) -> float:
        return sum(p.seconds for p in self.passes)

    @property
    def total_segments(self) -> float:
        return sum(p.segments for p in self.passes)

    @property
    def rays_per_s(self) -> float:
        t = self.total_seconds
        return self.total_segments / t if t > 0 else 0.0

    def summary(self) -> dict:
        return {
            "passes": len(self.passes),
            "total_seconds": self.total_seconds,
            "total_segments": self.total_segments,
            "rays_per_s": self.rays_per_s,
            "seconds_per_pass": (
                self.total_seconds / len(self.passes) if self.passes else 0.0
            ),
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(
                {
                    "summary": self.summary(),
                    "passes": [
                        {"iteration": p.iteration, "seconds": p.seconds,
                         "segments": p.segments}
                        for p in self.passes
                    ],
                },
                fh,
                indent=1,
            )


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """Capture an XLA profiler trace into ``log_dir`` (open with
    TensorBoard/XProf); no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
