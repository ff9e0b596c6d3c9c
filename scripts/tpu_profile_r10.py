"""Round-10 battery (one TPU process): serving frontier toward 10⁶ atoms.

  python scripts/tpu_profile_r10.py frontier 568320
  python scripts/tpu_profile_r10.py frontier 1136640

The clustered far-field tier made serving O(N·k + N·C) per round; r7e
proved linear scaling to 142,080 atoms (201 ms).  This battery pushes
the single-chip frontier further:

  - 568,320 atoms = 4× r7e = 256× the reference's protein
  - 1,136,640 atoms = 8× r7e = 512× the reference's protein

Memory notes: the near path's largest transients are (N, k, h) class —
~1 GB per 142k atoms at k≈40, h=48 — so 1.14M atoms puts ~8 GB-class
tensors in 16 GB HBM; the battery prints device memory stats after the
first forward so an OOM boundary is recorded rather than guessed.  The
EXACT control forward is O(N²) in the far field (~272 s/call projected
at 1.14M) — run only at the 568k stage and below, 1 chained iter.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from scripts.profile_util import load_decay, scan_time, setup_cache, \
    synth_molecule  # noqa: E402

setup_cache()

from epnn_tpu.data.dataset import pad_molecules, round_up  # noqa: E402
from epnn_tpu.ops.fused import (build_neighbors_cell, cell_grid_params,  # noqa: E402
                                forward_blocked)


def _mem(tag):
    try:
        s = jax.local_devices()[0].memory_stats()
        print(f"[{tag}] HBM in use: {s['bytes_in_use']/2**30:.2f} GiB "
              f"(peak {s.get('peak_bytes_in_use', 0)/2**30:.2f})",
              flush=True)
    except Exception:
        pass


def _cell_sorted(mol, cutoff):
    """r7g's spatial ordering: stable-sort atoms by cutoff-sided cell id
    (z-major).  Neutral at 17,760 where the gather tables fit on-chip;
    at 568k the r10 trace shows the pj/pp row gathers pay DRAM-page
    misses (13 ns/row vs 4.6 small-N), so locality is re-tested here."""
    xyz = mol.xyz
    lo = xyz.min(0)
    cell = np.floor((xyz - lo) / cutoff).astype(np.int64)
    nmax = int(cell.max()) + 1
    key = (cell[:, 0] * nmax + cell[:, 1]) * nmax + cell[:, 2]
    perm = np.argsort(key, kind="stable")
    return type(mol)(name=mol.name,
                     symbols=[mol.symbols[i] for i in perm],
                     xyz=xyz[perm], total_charge=mol.total_charge)


def _setup(n, chunk=None, k_hint=0, order="random"):
    """Shared stage setup: synth system, device arrays, neighbor tables,
    and the jittable forward closure.  Returns (fwd, q0, ops_all, k,
    grid, mol)."""
    params, cfg, table, fused = load_decay()
    t0 = time.time()
    mol = synth_molecule(n, np.random.default_rng(0))
    if order == "cell":
        mol = _cell_sorted(mol, cfg.cutoff)
    bb = pad_molecules([mol], table, pad_to=n)
    print(f"host featurize+pad: {time.time()-t0:.1f}s", flush=True)
    c = cfg.replace(matmul_precision="default")
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    x, q0, z, m = (put(bb.x[0]), put(bb.q0[0]), put(bb.xyz[0]),
                   put(bb.node_mask[0]))

    ncb, capb = cell_grid_params(bb.xyz[0], bb.node_mask[0], c.cutoff)
    # row_chunk bounds the builder's candidate gather: full-width
    # (N, 27, 5·cap) tile-padded OOMed the chip at 568k (16.2 GB asked)
    if chunk is None:
        chunk = 65536 if n > 200000 else 0
    grid = (int(round_up(ncb, 512)), int(round_up(capb, 4)), "slices",
            chunk)
    if k_hint:
        k = int(k_hint)
        print(f"k={k} (hint), grid={grid}", flush=True)
    else:
        t0 = time.time()
        kcnt = int(build_neighbors_cell(z, m, c.cutoff, 1, grid[0],
                                        grid[1], count_only=True,
                                        row_chunk=chunk))
        k = int(round_up(kcnt + 4, 8))
        print(f"cell count_only: k={k}, grid={grid} "
              f"({time.time()-t0:.1f}s incl compile)", flush=True)

    t0 = time.time()
    nbrs = jax.block_until_ready(build_neighbors_cell(
        z, m, c.cutoff, k, grid[0], grid[1], with_d2=True,
        row_chunk=chunk))
    print(f"neighbor build (cold): {time.time()-t0:.2f}s", flush=True)
    _mem("tables")
    nbrs_b = tuple(a[None] for a in nbrs)

    # the batch arrays + neighbor tables ride as EXPLICIT operands — as
    # closure constants they embed in the lowered MLIR and the 568k scan
    # payload (~300 MB of tables) 413s the remote-compile helper
    ops_all = (x, z, m, nbrs_b)

    def fwd(q0_in, ops_, fc, cold=False):
        x_, z_, m_, nbrs_ = ops_
        return forward_blocked(
            fused, x_[None], q0_in[None], z_[None], m_[None], c, block=256,
            neighbor_k=k, use_pallas=True,
            neighbors=(None if cold else nbrs_),
            neighbor_grid=grid, uniform_q0=True, far_cluster=fc,
            near_row_chunk=chunk)[0]

    return fwd, q0, ops_all, k, grid, mol


def stage_frontier(n=568320, with_exact=None, chunk=None, k_hint=0,
                   skip_consistency=False):
    if with_exact is None:
        # the exact O(N²) far-field control hit a TPU device error at 568k
        # (the packed kernel's grid is ~4.9M cells there — past whatever
        # Mosaic tolerates); past r7e scale the accuracy control is the
        # C=256 self-consistency diagnostic instead
        with_exact = n <= 150000
    fwd, q0, ops_all, k, grid, mol = _setup(n, chunk=chunk, k_hint=k_hint)

    t0 = time.time()
    q_cl = np.asarray(jax.block_until_ready(fwd(q0, ops_all, 32)))
    print(f"first clustered forward: {time.time()-t0:.1f}s (incl compile)",
          flush=True)
    _mem("fc32")
    cons = abs(float(q_cl.sum()) - mol.total_charge)
    print(f"{n:,} clustered conservation |dQ| = {cons:.2e}", flush=True)
    scan_time(f"{n:,} reuse C=32", lambda qi, o: fwd(qi, o, 32), q0,
              iters=3, operands=ops_all)
    scan_time(f"{n:,} cold C=32", lambda qi, o: fwd(qi, o, 32, cold=True),
              q0, iters=3, operands=ops_all)

    if with_exact:
        q_ex = np.asarray(jax.block_until_ready(fwd(q0, ops_all, 0)))
        dq = float(np.abs(q_cl - q_ex).max())
        print(f"{n:,} clustered max|dq| vs exact = {dq:.2e}", flush=True)
        scan_time(f"{n:,} reuse exact", lambda qi, o: fwd(qi, o, 0), q0,
                  iters=1, operands=ops_all)
    elif not skip_consistency:
        # self-consistency diagnostic in place of the exact control (too
        # slow past r7e scale, and the O(N²) far-field kernel grid faults
        # at 568k): an 8x finer tier should move charges by less than the
        # coarse tier's own error scale if the approximation is stable
        q_fine = np.asarray(jax.block_until_ready(fwd(q0, ops_all, 256)))
        print(f"{n:,} |q(C=32) - q(C=256)|max = "
              f"{float(np.abs(q_cl - q_fine).max()):.2e}", flush=True)
    return k


def stage_chunksweep(n=568320, chunks=(65536, 131072, 196608)):
    """A/B the huge-N chunk size at fixed N: bigger chunks mean fewer
    lax.map iterations (less per-chunk launch + boundary-relayout
    overhead) at more peak HBM — full-width at 142k fit, so ~131k-row
    chunks should too.  Include 0 at sizes where full-width fits to
    attribute the chunking overhead directly."""
    k = 0
    for chunk in chunks:
        print(f"=== chunk={chunk} ===", flush=True)
        k = stage_frontier(n, with_exact=False, chunk=chunk, k_hint=k,
                           skip_consistency=True)


def stage_verify568(n=568320):
    """Attribute the 568k scaling anomaly (18.4× of 142k for 4× atoms ×
    1.25 k — pad waste + intrinsic chunking measured only ~10% at 142k):

      1. re-measure reuse at the BALANCED chunk (the new Predictor auto
         policy) with iters=10 — the frontier's 3-iter scans leave the
         executable inside the per-executable inflation window;
      2. trace 3 iters and report the parsed device-time anatomy
         (``python scripts/trace_parse.py /tmp/trace_r10_568k 3``).
    """
    from epnn_tpu.ops.fused import balanced_row_chunk

    chunk = balanced_row_chunk(n, 65536)
    print(f"balanced chunk = {chunk}", flush=True)
    fwd, q0, ops_all, k, grid, mol = _setup(n, chunk=chunk, k_hint=40)

    q_cl = np.asarray(jax.block_until_ready(fwd(q0, ops_all, 32)))
    cons = abs(float(q_cl.sum()) - mol.total_charge)
    print(f"{n:,} clustered conservation |dQ| = {cons:.2e}", flush=True)
    _mem("fc32")
    scan_time(f"{n:,} reuse C=32 balanced i10", lambda qi, o: fwd(qi, o, 32),
              q0, iters=10, operands=ops_all)

    trace_dir = "/tmp/trace_r10_568k"
    step = jax.jit(lambda qi, o: fwd(qi, o, 32))
    step(q0, ops_all).block_until_ready()
    with jax.profiler.trace(trace_dir):
        qq = q0
        for _ in range(3):
            qq = step(qq, ops_all)
        qq.block_until_ready()
    print(f"trace written to {trace_dir} (3 iters)", flush=True)


def stage_order568(n=568320):
    """A/B spatial atom ordering at huge N (one process, one compile —
    both orders share every shape).  The r10 trace attributes 2.4 s of
    the 3.6 s 568k forward to the per-round pj/pp row gathers
    (fusion.362/374); r7g measured ordering NEUTRAL at 17,760, but
    there the (N, 64) gather table is ~4.5 MB (on-chip) — at 568k it is
    145 MB and every random row is a DRAM page miss."""
    from epnn_tpu.ops.fused import balanced_row_chunk

    chunk = balanced_row_chunk(n, 65536)
    print(f"balanced chunk = {chunk}", flush=True)
    for order in ("random", "cell"):
        fwd, q0, ops_all, k, grid, mol = _setup(n, chunk=chunk, k_hint=40,
                                                order=order)
        q_cl = np.asarray(jax.block_until_ready(fwd(q0, ops_all, 32)))
        cons = abs(float(q_cl.sum()) - mol.total_charge)
        scan_time(f"{n:,} reuse C=32 {order:6s} (|dQ|={cons:.1e})",
                  lambda qi, o: fwd(qi, o, 32), q0, iters=10,
                  operands=ops_all)


def stage_hlo568(n=568320):
    """Dump the optimized HLO of the exact program stage_verify568 traced
    (same chunk/k/shapes) and report the definitions of the named hot
    fusions from the parsed trace, so 'fusion.374' etc. become ops."""
    from epnn_tpu.ops.fused import balanced_row_chunk

    chunk = balanced_row_chunk(n, 65536)
    print(f"balanced chunk = {chunk}", flush=True)
    fwd, q0, ops_all, k, grid, mol = _setup(n, chunk=chunk, k_hint=40)

    print("lower+compile...", flush=True)
    t0 = time.time()
    compiled = jax.jit(lambda qi, o: fwd(qi, o, 32)).lower(
        q0, ops_all).compile()
    txt = compiled.as_text()
    path = "/tmp/r10_568k_serving.hlo"
    with open(path, "w") as f:
        f.write(txt)
    print(f"optimized HLO: {len(txt)/1e6:.1f} MB -> {path} "
          f"({time.time()-t0:.1f}s)", flush=True)

    want = [w + " = " for w in sys.argv[3].split(",")] if len(
        sys.argv) > 3 else ["fusion.374 = ", "fusion.362 = "]
    for ln in txt.splitlines():
        s = ln.strip()
        if any(s.startswith(w) or s.split("%")[-1].startswith(w)
               for w in want):
            print(s[:400], flush=True)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "frontier"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 568320
    kw = {}
    if stage == "chunksweep" and len(sys.argv) > 3:
        kw["chunks"] = tuple(int(c) for c in sys.argv[3].split(","))
    {"frontier": stage_frontier,
     "chunksweep": stage_chunksweep,
     "verify568": stage_verify568,
     "order568": stage_order568,
     "hlo568": stage_hlo568}[stage](n, **kw)
