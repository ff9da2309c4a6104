"""Profiling helpers (SURVEY.md §5.1 rebuild requirement).

The reference has only ad-hoc timing prints; here ``jax.profiler`` tracing
is a first-class flag: wrap any region in ``trace(logdir)`` and inspect in
TensorBoard, or use ``timed`` for block_until_ready-fenced wall timing.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace when logdir is set; no-op otherwise."""
    if logdir:
        jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        if logdir:
            jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, results: dict | None = None):
    """Wall-clock a region with a device fence on entry and exit."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = dt
    else:
        print(f"[timed] {name}: {dt * 1000:.2f} ms")
