"""Round-6b: device-time breakdown at 17,760 atoms with the collapse on.

Captures two jax.profiler traces (cold = in-forward cell-list selection;
reuse = prebuilt neighbors) of the uniform_q0 forward and prints where
the remaining device time goes.  Parse with scripts/trace_parse.py.

  python scripts/tpu_profile_r6b.py
  python scripts/trace_parse.py /tmp/trace_r6b_cold 10
  python scripts/trace_parse.py /tmp/trace_r6b_reuse 10
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
from epnn_tpu.ops.fused import (build_neighbors, cell_grid_params,  # noqa: E402
                                forward_blocked, max_neighbor_count)


def main():
    params, cfg, table, fused = load_decay()
    n = 17760
    mol = synth_molecule(n, np.random.default_rng(0))
    bb = pad_molecules([mol], table, pad_to=n)
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    nc_, cap_ = cell_grid_params(bb.xyz[0], bb.node_mask[0], cfg.cutoff)
    grid = (round_up(nc_, 512), round_up(cap_, 4))
    c = cfg.replace(matmul_precision="default")
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    x, q0, z, m = (put(bb.x[0]), put(bb.q0[0]), put(bb.xyz[0]),
                   put(bb.node_mask[0]))
    nbrs = jax.block_until_ready(
        build_neighbors(z, m, c.cutoff, k, with_d2=True))
    nbrs = tuple(a[None] for a in nbrs)

    def fwd(q0_in, neighbors, g):
        return forward_blocked(
            fused, x[None], q0_in[None], z[None], m[None], c, block=256,
            neighbor_k=k, use_pallas=True, neighbors=neighbors,
            neighbor_grid=g, uniform_q0=True)[0]

    for tag, kw in (("cold", dict(neighbors=None, g=grid)),
                    ("reuse", dict(neighbors=nbrs, g=None))):
        f = lambda qi: fwd(qi, **kw)  # noqa: E731
        scan_time(f"17760 {tag} uq0=1", f, q0, iters=8)
        with jax.profiler.trace(f"/tmp/trace_r6b_{tag}"):
            o = q0
            for _ in range(10):
                o = q0 + 0.0 * f(o)
            np.asarray(o)
        print(f"{tag} trace captured", flush=True)


if __name__ == "__main__":
    main()
