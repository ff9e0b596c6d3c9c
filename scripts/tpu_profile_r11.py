"""Round-11 battery (one TPU process): the v5e gather cost model at
huge N, and levers against it.

  python scripts/tpu_profile_r11.py gatherbench

Motivation (r10 trace + HLO of the 568k chunked serving forward,
/tmp/r10_568k_serving.hlo): 2.4 s of the 3.6 s forward is TWO pure row
gathers — pp[idx] in the pass rounds (fusion.374: (2.53M, 64) from
(568k, 64) row-major, 13.2 ns/row) and pj[idx] in the message rounds
(fusion.362: (2.53M, 32) from a column-major (568k, 32) table,
9.8 ns/row).  r7g/r10 order A/Bs show spatial locality is NEUTRAL even
at 568k (3613 vs 3624 ms), so the cost is per-row dispatch.  This
battery pins the model: ns/row as a function of table rows, row width,
dtype, index order, and chunking — the numbers decide between
"halve the rows" restructurings (undirected pair lists + scatter-add)
and "free width" ones (wider fused gathers).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts.profile_util import scan_time, setup_cache  # noqa: E402

setup_cache()


def _time_gather(tag, table, idx, iters=30):
    """ns/row for y = table[idx] with a data dependency through the chain
    (y's first element feeds the next iteration's index offset mod 1)."""
    m = int(np.prod(idx.shape))

    def step(carry, ops):
        tbl, ix = ops
        # fold the carry into the index stream so iterations serialize
        ix = jnp.clip(ix + carry.astype(jnp.int32), 0, tbl.shape[0] - 1)
        y = tbl[ix]
        # consume EVERY gathered element (y[0,0]-style probes get the rest
        # of the gather DCE'd to a 1-row gather) and keep the value ~0 so
        # the index stream is unchanged while the compiler can't know it
        return jnp.sum(y, dtype=jnp.float32) * jnp.float32(1e-38), None

    @jax.jit
    def run(c0, ops):
        c, _ = jax.lax.scan(lambda c, _: step(c, ops), c0, None,
                            length=iters)
        return c

    ops = (table, idx)
    # HOST READBACK, not block_until_ready — the tunnel acks early
    # (CLAUDE.md timing rule); np.asarray forces the real round trip
    np.asarray(run(jnp.zeros((), jnp.float32), ops))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(jnp.zeros((), jnp.float32), ops))
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{tag:<58s} {best*1e3:9.3f} ms  {best*1e9/m:7.2f} ns/row",
          flush=True)
    return best


def stage_gatherbench():
    rng = np.random.default_rng(0)
    m = 2_529_280  # one 568k chunk's rows (63232 x 40)

    for n in (17_760, 142_080, 568_320):
        idx_r = jnp.asarray(rng.integers(0, n, size=m, dtype=np.int32))
        idx_s = jnp.sort(idx_r)
        for w in (8, 32, 64, 128):
            tbl = jnp.asarray(rng.standard_normal((n, w)), jnp.float32)
            _time_gather(f"N={n:>7,} w={w:>3} f32 random", tbl, idx_r)
        tbl64 = jnp.asarray(rng.standard_normal((n, 64)), jnp.float32)
        _time_gather(f"N={n:>7,} w= 64 f32 sorted", tbl64, idx_s)
        tb16 = tbl64.astype(jnp.bfloat16)
        _time_gather(f"N={n:>7,} w= 64 bf16 random", tb16, idx_r)

    # row-count scaling at fixed table (does ns/row depend on M?)
    n = 568_320
    tbl = jnp.asarray(rng.standard_normal((n, 64)), jnp.float32)
    for mm in (316_160, 632_320, 2_529_280, 5_058_560):
        idx = jnp.asarray(rng.integers(0, n, size=mm, dtype=np.int32))
        _time_gather(f"N={n:>7,} w= 64 f32 M={mm:>9,}", tbl, idx)

    # 2-D (rows, k) index shape as the forward uses it (vs flat)
    idx2 = jnp.asarray(
        rng.integers(0, n, size=(63_232, 40), dtype=np.int32))
    _time_gather(f"N={n:>7,} w= 64 f32 idx2d (63232,40)", tbl, idx2)


def stage_gathercliff():
    """Pin the fast->slow gather boundary in table BYTES (gatherbench:
    36 MB tables gather at 2.8 ns/row, 72 MB at 10.9 — width and row
    count ruled out), then A/B the WINDOWED pattern: lax.map chunks that
    dynamic-slice a contiguous sub-table under the cliff and gather with
    window-relative indices — the exact-value fix if it hits the fast
    rate (gather semantics unchanged, same rows, same order)."""
    rng = np.random.default_rng(0)
    m = 2_529_280
    w = 64

    # bytes sweep at fixed M and width: rows -> table MB
    for n in (142_080, 196_608, 229_376, 262_144, 294_912, 393_216,
              568_320):
        idx = jnp.asarray(rng.integers(0, n, size=m, dtype=np.int32))
        tbl = jnp.asarray(rng.standard_normal((n, w)), jnp.float32)
        mb = n * w * 4 / 2**20
        _time_gather(f"bytes sweep N={n:>7,} ({mb:6.1f} MB)", tbl, idx)

    # windowed gather: 9 chunks of 63232 rows; chunk c's indices fall in
    # [start_c, start_c + win) — the cell-sorted neighbor structure
    n = 568_320
    tbl = jnp.asarray(rng.standard_normal((n, w)), jnp.float32)
    nch, rows, k = 9, 63_232, 40
    for win in (98_304, 131_072):
        starts = np.minimum(np.maximum(np.arange(nch) * rows - 17_536, 0),
                            n - win).astype(np.int32)
        idx_rel = rng.integers(0, win, size=(nch, rows, k),
                               dtype=np.int32)
        idx_abs = jnp.asarray(idx_rel + starts[:, None, None])
        idx_rel = jnp.asarray(idx_rel)
        starts_d = jnp.asarray(starts)

        # direct: one flat gather of the same absolute indices
        _time_gather(f"direct   568k win={win:>7,}", tbl,
                     idx_abs.reshape(-1))

        # windowed: slice + relative gather per chunk
        def step_w(carry, ops):
            tbl_, idxr, sts = ops

            def one(ops_c):
                idx_c, s_c = ops_c
                window = jax.lax.dynamic_slice(
                    tbl_, (s_c + carry.astype(jnp.int32), 0), (win, w))
                return jnp.sum(window[idx_c], dtype=jnp.float32)

            tot = jax.lax.map(one, (idxr, sts))
            return jnp.sum(tot) * jnp.float32(1e-38), None

        @jax.jit
        def run_w(c0, ops):
            c, _ = jax.lax.scan(lambda c, _: step_w(c, ops), c0, None,
                                length=30)
            return c

        ops = (tbl, idx_rel, starts_d)
        np.asarray(run_w(jnp.zeros((), jnp.float32), ops))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run_w(jnp.zeros((), jnp.float32), ops))
            dt = (time.perf_counter() - t0) / 30
            best = dt if best is None else min(best, dt)
        mtot = nch * rows * k
        print(f"{f'windowed 568k win={win:>7,}':<58s} {best*1e3:9.3f} ms"
              f"  {best*1e9/mtot:7.2f} ns/row", flush=True)


def stage_window568(n=568320):
    """Hardware A/B of the windowed chunked forward at 568k (cell-sorted
    atoms): exactness gate (windowed vs plain chunked on the SAME order
    must be bitwise — same gathered values, same sum order) + reuse
    timing.  Expected from the microbench: the 2.4 s gather bill drops
    ~4× -> forward ~3.6 -> ~1.8-2.0 s."""
    from scripts.tpu_profile_r10 import _setup
    from epnn_tpu.ops.fused import (balanced_row_chunk,
                                    neighbor_window_width)

    chunk = balanced_row_chunk(n, 65536)
    fwd, q0, ops_all, k, grid, mol = _setup(n, chunk=chunk, k_hint=40,
                                            order="cell")
    idx_b, mask_b = ops_all[3][0], ops_all[3][1]
    win = neighbor_window_width(np.asarray(idx_b), np.asarray(mask_b),
                                chunk)
    print(f"chunk={chunk}  near_window={win} "
          f"({win * 64 * 4 / 2**20:.1f} MB pp window)", flush=True)

    from epnn_tpu.ops.fused import forward_blocked

    # rebuild the closure with near_window (mirrors _setup's fwd)
    from scripts.profile_util import load_decay
    params, cfg, table, fused = load_decay()
    c = cfg.replace(matmul_precision="default")

    def fwd2(q0_in, ops_, fc, window=0):
        x_, z_, m_, nbrs_ = ops_
        return forward_blocked(
            fused, x_[None], q0_in[None], z_[None], m_[None], c, block=256,
            neighbor_k=k, use_pallas=True, neighbors=nbrs_,
            neighbor_grid=grid, uniform_q0=True, far_cluster=fc,
            near_row_chunk=chunk, near_window=window)[0]

    q_plain = np.asarray(jax.block_until_ready(fwd2(q0, ops_all, 32)))
    q_win = np.asarray(jax.block_until_ready(fwd2(q0, ops_all, 32,
                                                  window=win)))
    dq = float(np.abs(q_plain - q_win).max())
    print(f"windowed vs plain max|dq| = {dq:.3e} "
          f"({'BITWISE' if dq == 0 else 'NOT bitwise'})", flush=True)
    cons = abs(float(q_win.sum()) - mol.total_charge)
    print(f"windowed conservation |dQ| = {cons:.2e}", flush=True)

    scan_time(f"{n:,} reuse C=32 plain    ", lambda qi, o: fwd2(qi, o, 32),
              q0, iters=10, operands=ops_all)
    scan_time(f"{n:,} reuse C=32 windowed ",
              lambda qi, o: fwd2(qi, o, 32, window=win),
              q0, iters=10, operands=ops_all)
    # exact far field is the frontier's other mode; window the near path
    # under it too (far_cluster=0 faults at 568k per r10 — skip; use C=256)
    scan_time(f"{n:,} reuse C=256 windowed",
              lambda qi, o: fwd2(qi, o, 256, window=win),
              q0, iters=3, operands=ops_all)


def stage_predictor(n=568320):
    """End-to-end SHIPPED serving surface at huge N: Predictor with all
    knobs on auto (balanced chunk, cell sort, measured window, clustered
    far tier) fed a RANDOM-order synthetic system — cold call incl. every
    one-off (k, tables, sort, window, compiles), then the steady-state
    chained benchmark.  Validates that the auto policies reproduce the
    hand-tuned window568 numbers through the public API."""
    from scripts.profile_util import load_decay, synth_molecule
    from epnn_tpu.data.dataset import pad_molecules
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.infer import Predictor

    params, cfg, table, fused = load_decay()
    mol = synth_molecule(n, np.random.default_rng(0))
    batch = pad_molecules([mol], table, pad_to=n)
    pred = Predictor(params=params,
                     cfg=cfg.replace(matmul_precision="default"),
                     reuse_neighbors=True, far_cluster=32,
                     renormalize=True)
    t0 = time.time()
    q = pred.predict_batch(batch)
    print(f"{n:,} cold predict_batch (ALL one-offs): {time.time()-t0:.1f}s",
          flush=True)
    print(f"conservation |dQ| = "
          f"{abs(float(q.astype(np.float64).sum())):.2e} (renormalized, "
          f"f64-summed — an f32 np.sum at 1M+ entries adds ~1e-4 of its "
          f"own pairwise noise)", flush=True)
    wins = [w for d in pred._winw_cache.values() for w in d.values()]
    print(f"auto window widths: {wins}  (chunk "
          f"{pred._near_chunk(batch)})", flush=True)
    t0 = time.time()
    q2 = pred.predict_batch(batch)
    print(f"warm predict_batch (per-call, incl host I/O): "
          f"{time.time()-t0:.2f}s", flush=True)
    stats = pred.benchmark_batch(batch, iters=10)
    print(f"{n:,} steady-state chained: {stats['mean_s']*1e3:.1f} ms "
          f"({stats})", flush=True)


def stage_bf16(n=568320):
    """bf16 compute_dtype A/B at huge N: neutral at 17,760 (r2 — the
    tunnel-dispatch floor hid it), but the windowed 568k forward is
    gather/bandwidth-bound, where halving the pj/pp bytes could matter.
    Conservation stays f32-grade by design (pass rounds stay f32)."""
    from scripts.profile_util import load_decay, scan_time, synth_molecule
    from epnn_tpu.data.dataset import pad_molecules
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.infer import Predictor

    params, cfg, table, fused = load_decay()
    mol = synth_molecule(n, np.random.default_rng(0))
    batch = pad_molecules([mol], table, pad_to=n)
    for tag, c in (("f32 ", cfg.replace(matmul_precision="default")),
                   ("bf16", cfg.replace(matmul_precision="default",
                                        compute_dtype="bfloat16"))):
        pred = Predictor(params=params, cfg=c, reuse_neighbors=True,
                         far_cluster=32, renormalize=True)
        q = pred.predict_batch(batch)
        stats = pred.benchmark_batch(batch, iters=10)
        print(f"{n:,} {tag} steady {stats['mean_s']*1e3:8.1f} ms  "
              f"|dQ|={abs(float(q.astype(np.float64).sum())):.1e}",
              flush=True)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "gatherbench"
    kw = {"n": int(sys.argv[2])} if (len(sys.argv) > 2 and stage in
                                     ("window568", "predictor", "bf16")) \
        else {}
    {"gatherbench": stage_gatherbench,
     "gathercliff": stage_gathercliff,
     "window568": stage_window568,
     "predictor": stage_predictor,
     "bf16": stage_bf16}[stage](**kw)
