"""Round-7g battery (one TPU process): does spatial atom ordering speed
the near-path gathers?

  python scripts/tpu_profile_r7g.py

The r7d C=32 trace shows the 17,760-atom serving floor (~22 ms device)
is ~9.3 ms of (N·k)-row gathers + ~5.7 ms of gathered-tensor layout
copies — the far-field kernel is 0.24 ms.  The r3 finding was "gather
cost is per-row, not per-byte", but LOCALITY was never tested: the
synthetic benchmark system has atoms in RANDOM order, so every gathered
row is a far HBM fetch.  Sorting atoms by cell id makes neighbor
indices (and thus gathered rows) near-contiguous.  If this wins, the
Predictor can permute once per geometry (serving amortizes it) and
unpermute the charges.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from scripts.profile_util import load_decay, scan_time, setup_cache, \
    synth_molecule  # noqa: E402

setup_cache()

from epnn_tpu.data.dataset import pad_molecules, round_up  # noqa: E402
from epnn_tpu.ops.fused import (build_neighbors, forward_blocked,  # noqa: E402
                                max_neighbor_count)


def _system(order: str, n=17760):
    params, cfg, table, fused = load_decay()
    mol = synth_molecule(n, np.random.default_rng(0))
    if order == "cell":
        # sort atoms by cutoff-sided cell id (z-major), ties by position —
        # the same binning the cell-list builder uses
        xyz = mol.xyz
        lo = xyz.min(0)
        cell = np.floor((xyz - lo) / cfg.cutoff).astype(np.int64)
        nmax = int(cell.max()) + 1
        key = (cell[:, 0] * nmax + cell[:, 1]) * nmax + cell[:, 2]
        perm = np.argsort(key, kind="stable")
        mol = type(mol)(name=mol.name,
                        symbols=[mol.symbols[i] for i in perm],
                        xyz=xyz[perm], total_charge=mol.total_charge)
    bb = pad_molecules([mol], table, pad_to=n)
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    c = cfg.replace(matmul_precision="default")
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    x, q0, z, m = (put(bb.x[0]), put(bb.q0[0]), put(bb.xyz[0]),
                   put(bb.node_mask[0]))
    nbrs = jax.block_until_ready(
        build_neighbors(z, m, c.cutoff, k, with_d2=True))
    nbrs = tuple(a[None] for a in nbrs)
    return fused, c, k, x, q0, z, m, nbrs


def main():
    for order in ("random", "cell"):
        fused, c, k, x, q0, z, m, nbrs = _system(order)

        def fwd(q0_in, fc):
            return forward_blocked(
                fused, x[None], q0_in[None], z[None], m[None], c, block=256,
                neighbor_k=k, use_pallas=True, neighbors=nbrs,
                uniform_q0=True, far_cluster=fc)[0]

        for fc in (32, 0):
            q = np.asarray(jax.block_until_ready(fwd(q0, fc)))
            cons = abs(float(q.sum()))
            scan_time(f"17760 reuse {order:6s} fc={fc} (|dQ|={cons:.1e})",
                      lambda qi: fwd(qi, fc), q0, iters=8)


if __name__ == "__main__":
    main()
