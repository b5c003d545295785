"""Persistent XLA compilation cache.

The axon TPU backend compiles remotely; a congested compiler queue can
take minutes even for small programs (and a killed process leaves its
queued compiles behind — CLAUDE.md hazard 5).  The persistent cache
makes every compile a one-time cost per (program, backend): entry
points call :func:`enable_compile_cache` before building graphs, so a
benchmark or render that compiled once — ever — starts in seconds.

Backend type is part of JAX's cache key, so CPU-forced tests and TPU
runs coexist in the same directory.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``<repo>/.jax_cache``; override with $RAY_TPU_COMPILE_CACHE; set
    $RAY_TPU_NO_COMPILE_CACHE=1 to disable).  Idempotent."""
    if os.environ.get("RAY_TPU_NO_COMPILE_CACHE") == "1":
        return ""
    import jax

    path = path or os.environ.get("RAY_TPU_COMPILE_CACHE") or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
