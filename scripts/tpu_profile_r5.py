"""Round-5 TPU battery: cell-table layout variants (rows vs flat vs
slices) — the r4 cold-trace "fusion.4 ~0.5 ms" lever — standalone and
end-to-end.  One process, one chip.

Run:  python scripts/tpu_profile_r5.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts.profile_util import (load_decay, scan_time, setup_cache,  # noqa: E402
                                  synth_molecule)

setup_cache()

LAYOUTS = ("rows", "flat", "slices")


def main():
    print("device:", jax.devices()[0])
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.ops.fused import (build_neighbors_cell, cell_grid_params,
                                    forward_blocked, max_neighbor_count)

    params, cfg, table, fused = load_decay()

    for natoms in (2220, 17760):
        print(f"== builder layouts, N={natoms} ==")
        bb = pad_molecules([synth_molecule(natoms,
                                           np.random.default_rng(0))],
                           table, pad_to=natoms)
        z = jax.device_put(np.asarray(bb.xyz[0]))
        m = jax.device_put(np.asarray(bb.node_mask[0]))
        k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                            cfg.cutoff) + 4, 8))
        nc_, cap_ = cell_grid_params(bb.xyz[0], bb.node_mask[0], cfg.cutoff)
        ncells, cap = round_up(nc_, 512), round_up(cap_, 4)
        print(f"  k={k} ncells={ncells} cap={cap}")
        cutoff = float(cfg.cutoff)

        for lay in LAYOUTS:
            def full(zz, lay=lay):
                return build_neighbors_cell(zz, m, cutoff, k, ncells, cap,
                                            with_d2=True, table_layout=lay)

            scan_time(f"  full builder [{lay}]",
                      lambda p, f=full: z + 0.0 * f(p)[2].sum(), z, iters=10)

        # end-to-end cold fast-mode forward (in-forward selection)
        x = jax.device_put(np.asarray(bb.x[0]))
        q0 = jax.device_put(np.asarray(bb.q0[0]))
        c_fast = cfg.replace(matmul_precision="default")
        for lay in LAYOUTS:
            def fwd(zz, lay=lay):
                return forward_blocked(
                    fused, x[None], q0[None], zz[None], m[None], c_fast,
                    block=256, neighbor_k=k, use_pallas=True,
                    neighbor_grid=(ncells, cap, lay))

            scan_time(f"  cold fwd [{lay}]",
                      lambda p, f=fwd: z + 0.0 * f(p).sum(), z, iters=10)


if __name__ == "__main__":
    main()
