"""Benchmark/timing helpers.

Unlike the reference's wall-clock pairs (``infer.py:52-54,70-79``) these are
async-dispatch-correct: JAX returns futures, so every measured call is
``jax.block_until_ready``-fenced, and compile time is excluded by a warmup
call.  ``jax.profiler`` trace capture is exposed behind a flag for real
kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


class Timer:
    def __init__(self):
        self.spans = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        yield
        self.spans.setdefault(name, []).append(time.perf_counter() - t0)

    def total(self, name: str) -> float:
        return sum(self.spans.get(name, []))


def benchmark_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    iters: int = 10,
    profile_dir: Optional[str] = None,
):
    """Time ``fn(*args)`` with block_until_ready fencing.

    Returns dict with mean/median/min seconds over ``iters`` runs.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    ctx = (
        jax.profiler.trace(profile_dir) if profile_dir else contextlib.nullcontext()
    )
    with ctx:
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            times.append(time.perf_counter() - t0)
    t = np.asarray(times)
    return {
        "mean_s": float(t.mean()),
        "median_s": float(np.median(t)),
        "min_s": float(t.min()),
        "std_s": float(t.std()),
        "iters": iters,
    }
