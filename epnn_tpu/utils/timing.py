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


def benchmark_chained(
    fn: Callable,
    q0,
    iters: int = 20,
    warmup_loops: int = 2,
    profile_dir: Optional[str] = None,
    operands=None,
    cost_analysis: bool = False,
):
    """Serialized-chain latency: the honest per-graph number on tunneled
    backends (benchmarks/RESULTS.md "round-3 measurement pitfall").

    Per-call ``block_until_ready`` timing (:func:`benchmark_fn`) adds the
    full host→device dispatch round-trip to EVERY call — ~25 ms/call at
    protein scale through the TPU tunnel, where the device time is ~2 ms.
    Worse, ``block_until_ready`` can return early on tunneled backends.
    This helper times ``iters`` back-to-back calls where each iteration's
    ``q0`` carries a zero-weighted dependency on the previous output (so
    the chain serializes on device) and the chain ends in ONE host
    readback (a true sync); total/iters is the steady-state per-graph
    latency with dispatch pipelined, exactly bench.py's methodology.

    ``fn(q0) -> out`` must accept the chained array as its only positional
    argument AND be purely JAX-traceable — it is wrapped in ``jax.jit``
    (with the chain dependency fused in), so per-call host work
    (np.asarray, device_put, Python side effects) would be traced once,
    not executed per iteration; ``warmup_loops`` full loops run first
    (the first compiles;
    execution-time inflation is per compiled executable on the tunnel, so
    a whole measurement loop is discarded after every fresh compile).

    ``operands``: optional pytree of LARGE arrays forwarded to ``fn`` as a
    second argument (``fn(q0, operands)``).  Arrays closed over by ``fn``
    are embedded in the lowered program as dense constants — at huge N the
    serialized payload exceeds remote-compile body limits (HTTP 413 at
    568k atoms: ~300 MB of neighbor tables) and bloats the executable on
    any backend; explicit operands stay runtime parameters.
    """
    import jax.numpy as jnp

    # the zero-weighted dependency rides INSIDE the jitted call: one
    # dispatch per iteration instead of forward + an eager chain-add (the
    # eager add is a second tunnel RPC — ~1.6 ms/iter of pure dispatch on
    # the hosted tunnel, r4c battery); shape-agnostic scalar broadcast
    if operands is None:
        fn_chained = jax.jit(lambda q0_base, prev: fn(
            q0_base + 0.0 * jnp.reshape(prev, (-1,))[:1]))
        call = lambda prev: fn_chained(q0, prev)  # noqa: E731
    else:
        fn_chained = jax.jit(lambda q0_base, prev, ops: fn(
            q0_base + 0.0 * jnp.reshape(prev, (-1,))[:1], ops))
        call = lambda prev: fn_chained(q0, prev, operands)  # noqa: E731

    def loop():
        prev = q0
        for _ in range(iters):
            prev = call(prev)
        np.asarray(prev)  # terminal readback = true sync

    for _ in range(max(warmup_loops, 1)):
        loop()
    ctx = (
        jax.profiler.trace(profile_dir) if profile_dir
        else contextlib.nullcontext()
    )
    with ctx:
        t0 = time.perf_counter()
        loop()
        dt = time.perf_counter() - t0
    out = {
        "mean_s": dt / iters,
        "iters": iters,
        "method": "chained",
        "warmup_loops": warmup_loops,
    }
    if cost_analysis:
        # XLA's own post-fusion flop count for the measured program —
        # achieved FLOP/s = flops / mean_s (the lowering/compile hits the
        # already-populated compile caches; done AFTER timing regardless)
        try:
            prev0 = call(q0)
            lowered = (fn_chained.lower(q0, prev0, operands)
                       if operands is not None
                       else fn_chained.lower(q0, prev0))
            ca = lowered.compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            fl = float(ca.get("flops", 0.0))
            if fl > 0:
                out["flops"] = fl
        except Exception:
            pass
    return out


def benchmark_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    iters: int = 10,
    profile_dir: Optional[str] = None,
):
    """Time ``fn(*args)`` with per-call block_until_ready fencing.

    Returns dict with mean/median/min seconds over ``iters`` runs.

    NOTE: on tunneled TPU backends this measures per-call DISPATCH latency,
    not device latency — every call pays the host round-trip, and
    ``block_until_ready`` may return early.  Steady-state serving latency
    should use :func:`benchmark_chained` (what ``cli bench`` does by
    default on device-array-capable paths).
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
