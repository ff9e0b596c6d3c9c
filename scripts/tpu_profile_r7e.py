"""Round-7e battery (one TPU process): scaling frontier past 100k atoms.

  python scripts/tpu_profile_r7e.py          # all stages
  python scripts/tpu_profile_r7e.py huge     # just the 142k run

The clustered far-field tier turned the per-round O(N²) wall into
O(N·C), so a single v5e chip should now hold protein-density systems
far beyond the 17,760-atom scaling benchmark.  Stage ``huge`` runs
142,080 atoms (8× the 17,760 benchmark, 64× the reference's 2,220-atom
protein):

- cell-list neighbor build + cold forward (far_cluster=32)
- serving reuse latency (precomputed tables)
- one EXACT forward for max|dq| + conservation (O(N²) far field — a few
  seconds per call at this size; timed with 2 chained iters only)

Memory notes: near-path transients are (N, k, ·) — at N=142k, k≈40 the
largest live tensors are ~1 GB class, well inside 16 GB HBM.  The exact
far field is compute-bound, not memory-bound (the packed kernel streams
(BI, BJP) tiles).
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


def stage_huge(n=142080):
    params, cfg, table, fused = load_decay()
    t0 = time.time()
    mol = synth_molecule(n, np.random.default_rng(0))
    bb = pad_molecules([mol], table, pad_to=n)
    print(f"host featurize+pad: {time.time()-t0:.1f}s", flush=True)
    c = cfg.replace(matmul_precision="default")
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    x, q0, z, m = (put(bb.x[0]), put(bb.q0[0]), put(bb.xyz[0]),
                   put(bb.node_mask[0]))

    # device-side exact safe k via the cell builder's count_only mode
    ncb, capb = cell_grid_params(bb.xyz[0], bb.node_mask[0], c.cutoff)
    grid = (int(round_up(ncb, 512)), int(round_up(capb, 4)))
    t0 = time.time()
    kcnt = int(build_neighbors_cell(z, m, c.cutoff, 1, grid[0], grid[1],
                                    count_only=True))
    k = int(round_up(kcnt + 4, 8))
    print(f"cell count_only: k={k} ({time.time()-t0:.1f}s incl compile)",
          flush=True)

    t0 = time.time()
    nbrs = jax.block_until_ready(build_neighbors_cell(
        z, m, c.cutoff, k, grid[0], grid[1], with_d2=True))
    print(f"neighbor build (cold): {time.time()-t0:.2f}s", flush=True)
    nbrs_b = tuple(a[None] for a in nbrs)

    def fwd(q0_in, fc, neighbors=nbrs_b):
        return forward_blocked(
            fused, x[None], q0_in[None], z[None], m[None], c, block=256,
            neighbor_k=k, use_pallas=True, neighbors=neighbors,
            neighbor_grid=grid, uniform_q0=True, far_cluster=fc)[0]

    # clustered serving reuse — the headline
    q_cl = np.asarray(jax.block_until_ready(fwd(q0, 32)))
    cons = abs(float(q_cl.sum()) - mol.total_charge)
    print(f"142k clustered conservation |dQ| = {cons:.2e}", flush=True)
    scan_time("142,080 reuse C=32", lambda qi: fwd(qi, 32), q0, iters=4)
    # cold (in-forward cell selection)
    scan_time("142,080 cold C=32",
              lambda qi: fwd(qi, 32, None), q0, iters=4)

    # exact control: accuracy + a 2-iter timing (O(N²) far field)
    q_ex = np.asarray(jax.block_until_ready(fwd(q0, 0)))
    dq = float(np.abs(q_cl - q_ex).max())
    print(f"142k clustered max|dq| vs exact = {dq:.2e}", flush=True)
    scan_time("142,080 reuse exact", lambda qi: fwd(qi, 0), q0, iters=2)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["huge"]
    for s in stages:
        {"huge": stage_huge}[s]()
