"""Round-5e check: builder + cold forward after the r5 sort-claim and
sort-payload (top_k -> payload sort) changes.

Run:  python scripts/tpu_profile_r5e.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from scripts.profile_util import (load_decay, scan_time, setup_cache,  # noqa: E402
                                  synth_molecule)

setup_cache()


def main():
    print("device:", jax.devices()[0])
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.ops.fused import (build_neighbors_cell, cell_grid_params,
                                    forward_blocked, max_neighbor_count)

    params, cfg, table, fused = load_decay()

    for natoms in (17760, 2220):
        print(f"== N={natoms} ==")
        bb = pad_molecules([synth_molecule(natoms,
                                           np.random.default_rng(0))],
                           table, pad_to=natoms)
        z = jax.device_put(np.asarray(bb.xyz[0]))
        m = jax.device_put(np.asarray(bb.node_mask[0]))
        k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                            cfg.cutoff) + 4, 8))
        nc_, cap_ = cell_grid_params(bb.xyz[0], bb.node_mask[0], cfg.cutoff)
        ncells, cap = round_up(nc_, 512), round_up(cap_, 4)
        cutoff = float(cfg.cutoff)

        def builder(zz):
            return zz + 0.0 * build_neighbors_cell(
                zz, m, cutoff, k, ncells, cap, with_d2=True)[2].sum()

        scan_time("  builder [slices+sort]", builder, z, iters=10)

        x = jax.device_put(np.asarray(bb.x[0]))
        q0 = jax.device_put(np.asarray(bb.q0[0]))
        c_fast = cfg.replace(matmul_precision="default")

        def fwd(zz):
            return zz + 0.0 * forward_blocked(
                fused, x[None], q0[None], zz[None], m[None], c_fast,
                block=256, neighbor_k=k, use_pallas=True,
                neighbor_grid=(ncells, cap, "slices")).sum()

        scan_time("  cold fwd", fwd, z, iters=10)


if __name__ == "__main__":
    main()
