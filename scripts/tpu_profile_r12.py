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

  train568 — TRAINING at 568,320 atoms on one chip: remat + chunked near
             path with the chunk body checkpointed (TrainConfig.
             near_row_chunk) + windowed gathers on cell-sorted atoms
             (TrainConfig.near_window) + fc32 exact-VJP clustered far
             tier + precomputed cell-built tables.  Extends the r9
             142k-train frontier (1,226 ms/step) 4×; A/Bs windowed vs
             plain chunked gathers in the backward.

Usage: python scripts/tpu_profile_r12.py [skin568] [trace568] [train568] [n]
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


def stage_train568(n=568320, iters=4):
    """One fused train step at 568k atoms: remat + chunk-body checkpoint
    (backward recomputes chunk-by-chunk — one chunk's residuals peak
    instead of ~140 GB full-width) + windowed gathers (the r11 serving
    lever, now in the backward too) on cell-sorted atoms."""
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.ops.fused import (balanced_row_chunk, build_neighbors_cell,
                                    cell_grid_params, max_neighbor_count,
                                    neighbor_window_width)
    from epnn_tpu.train.loop import (TrainConfig, create_state,
                                     make_optimizer, train_step_fused)

    params, cfg, table, fused = load_decay()
    c = cfg.replace(matmul_precision="default")
    rng = np.random.default_rng(0)
    mol = synth_molecule(n, rng)
    # cell-sort the atoms on the host (the Predictor's serving ordering,
    # shared key helper) so neighbor indices are local and the window
    # width comes out compact
    from epnn_tpu.ops.fused import cell_sort_key

    key, _span = cell_sort_key(mol.xyz, c.cutoff)
    order = np.argsort(key, kind="stable")
    mol.xyz[:] = mol.xyz[order]
    labels = rng.normal(0, 0.05, size=n).astype(np.float32)
    labels -= labels.mean()
    bb = pad_molecules([mol], table, pad_to=n)

    chunk = balanced_row_chunk(n, 65536)
    t0 = time.time()
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        c.cutoff) + 4, 8))
    print(f"host cell-binned safe k = {k} ({time.time()-t0:.1f}s)",
          flush=True)
    ncb, capb = cell_grid_params(bb.xyz[0], bb.node_mask[0], c.cutoff)
    grid = (int(round_up(ncb, 512)), int(round_up(capb, 4)))
    put = jax.device_put
    z, m = put(np.asarray(bb.xyz[0])), put(np.asarray(bb.node_mask[0]))
    t0 = time.time()
    # row_chunk: the builder's full-width (N, 27, 5*cap+d2) candidate
    # gather is 8.7 GB padded at 568k — OOMs without chunking (the
    # shipped Predictor always chunks the builder at huge N)
    nbrs = jax.block_until_ready(build_neighbors_cell(
        z, m, c.cutoff, k, grid[0], grid[1], with_d2=True,
        row_chunk=chunk))
    print(f"neighbor build: {time.time()-t0:.1f}s (incl compile)",
          flush=True)
    tabs = tuple(a[None] for a in nbrs)
    win = neighbor_window_width(nbrs[0], nbrs[1], chunk)
    print(f"chunk {chunk}, window {win} ({win/n:.2f} of n)", flush=True)

    x, q0 = put(np.asarray(bb.x)), put(np.asarray(bb.q0))
    xyzb, maskb = z[None], m[None]
    y = put(labels[None])
    wt = put(np.ones(1, np.float32))

    tc = TrainConfig(batch_size=1, far_cluster=32, loss="masked_mse",
                     remat=True, near_row_chunk=chunk, near_window=win)
    opt = make_optimizer(tc)
    state = create_state(cfg, tc, jax.random.key(0))
    state = state.replace(params=params)

    for label, w_ in (("windowed", win), ("plain-gather", 0)):
        def call(st, w_=w_):
            return train_step_fused(
                st, c, tc.loss, opt, 256, k, x, q0, xyzb, maskb, y, wt,
                use_pallas=True, uniform_q0=True, far_cluster=32,
                far_cluster_grad=True, remat=True, neighbors=tabs,
                near_row_chunk=chunk, near_window=w_)

        st = state
        t0 = time.time()
        st, loss, _, mets = call(st)
        print(f"{label}: first step (incl compile): {time.time()-t0:.1f}s, "
              f"loss {float(loss):.4f}", flush=True)
        losses = [float(loss)]
        for _ in range(3):  # inflation discard
            st, loss, _, _ = call(st)
        losses.append(float(loss))
        for rep in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                st, loss, _, _ = call(st)
            float(loss)
            print(f"{n:,}-atom train step fc32+remat+chunk {label} "
                  f"rep{rep}: {(time.perf_counter()-t0)/iters*1e3:.1f} "
                  f"ms/step", flush=True)
        assert losses[-1] < losses[0], losses
        print(f"{label}: loss {losses[0]:.4f} -> {losses[-1]:.4f} over 4 "
              f"steps", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.isdigit()] or ["skin568",
                                                            "trace568"]
    nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
    n = nums[0] if nums else 568320
    for s in args:
        {"skin568": stage_skin568,
         "trace568": stage_trace568,
         "train568": stage_train568}[s](n)
