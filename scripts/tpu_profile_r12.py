"""Round-12 TPU batteries: the huge-N serving frontier's two open edges.

Stages (run on the axon tunnel, ONE process at a time):

  skin568  — Verlet-skin MD per-step cost at 568,320 atoms through the
             PUBLIC Predictor (skin selection at cutoff+S once, per-step
             in-graph d2 re-gather, chunked+windowed near path, C=32
             clustered far tier).  Nobody has measured moving-coordinate
             MD at this scale; the fixed-geometry reuse number is 1,078 ms
             (RESULTS.md r11).
  trace568 — jax.profiler trace of the steady-state windowed serving step
             at 568,320 atoms; parse with scripts/trace_parse.py to split
             the ~1.07 s between gathers and near-chain compute (the r11
             estimate was ~0.6 s gathers + ~0.45 s compute from end-to-end
             arithmetic, never from a trace).

Usage: python scripts/tpu_profile_r12.py [skin568] [trace568] [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from scripts.profile_util import load_decay, setup_cache, synth_molecule

setup_cache()

import jax  # noqa: E402

from epnn_tpu.data.dataset import pad_molecules  # noqa: E402
from epnn_tpu.infer import Predictor  # noqa: E402


def _system(n, seed=0):
    params, cfg, table, fused = load_decay()
    mol = synth_molecule(n, np.random.default_rng(seed))
    batch = pad_molecules([mol], table, pad_to=n)
    return params, cfg.replace(matmul_precision="default"), batch


def stage_skin568(n=568320, skin=0.5, iters=8):
    """MD with MOVING coordinates at 568k atoms on one chip: the skin
    predictor selects once at cutoff+skin, then every timed step gathers
    pair d2 from the CURRENT coordinates in-graph (2-tuple neighbors) —
    the honest per-step cost of an MD loop, vs the fixed-geometry reuse
    lower bound (1,078 ms at r11)."""
    params, cfg, batch = _system(n)
    for s in (skin, 0.0):
        pred = Predictor(params=params, cfg=cfg, reuse_neighbors=True,
                         neighbor_skin=s, far_cluster=32)
        t0 = time.time()
        pred.predict_batch(batch)
        print(f"N={n:,} skin={s} cold predict (one-offs): "
              f"{time.time()-t0:.1f}s", flush=True)
        stats = pred.benchmark_batch(batch, iters=iters)
        print(f"N={n:,} skin={s} steady-state chained: "
              f"{stats['mean_s']*1e3:.1f} ms  ({stats})", flush=True)
    # drift within skin/2: the skin predictor must keep its tables and
    # stay exact (charges match a fresh-selection predictor)
    pred = Predictor(params=params, cfg=cfg, reuse_neighbors=True,
                     neighbor_skin=skin, far_cluster=32)
    q0 = pred.predict_batch(batch)
    rng = np.random.default_rng(1)
    batch.xyz[0, :, :] += rng.uniform(-0.05, 0.05,
                                      batch.xyz[0].shape).astype(np.float32)
    t0 = time.time()
    q1 = pred.predict_batch(batch)
    dt = time.time() - t0
    fresh = Predictor(params=params, cfg=cfg, reuse_neighbors=True,
                      far_cluster=32)
    qf = fresh.predict_batch(batch)
    print(f"drift step (no rebuild, per-call incl host I/O): {dt:.2f}s; "
          f"rebuilds={pred.skin_rebuilds}; max|dq| vs fresh selection = "
          f"{np.abs(q1 - qf).max():.2e}; max|dq| vs frame0 = "
          f"{np.abs(q1 - q0).max():.2e} (should be >0: coords moved)",
          flush=True)


def stage_trace568(n=568320, iters=4):
    """Trace the shipped steady-state serving step at 568k and print the
    trace dir; parse with `python scripts/trace_parse.py <dir> <iters>`
    for the per-op device-time split (gathers vs near-chain compute vs
    far grid)."""
    params, cfg, batch = _system(n)
    pred = Predictor(params=params, cfg=cfg, reuse_neighbors=True,
                     far_cluster=32)
    t0 = time.time()
    pred.predict_batch(batch)
    print(f"cold predict (one-offs): {time.time()-t0:.1f}s", flush=True)
    trace_dir = f"/tmp/r12_trace_{n}"
    stats = pred.benchmark_batch(batch, iters=iters,
                                 profile_dir=trace_dir)
    print(f"N={n:,} traced steady-state: {stats['mean_s']*1e3:.1f} ms "
          f"({iters} iters) -> {trace_dir}", flush=True)
    print(f"parse: python scripts/trace_parse.py {trace_dir} {iters}",
          flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.isdigit()] or ["skin568",
                                                            "trace568"]
    nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
    n = nums[0] if nums else 568320
    for s in args:
        {"skin568": stage_skin568,
         "trace568": stage_trace568}[s](n)
