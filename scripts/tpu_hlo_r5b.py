"""Dump the optimized HLO of the 17,760-atom cold forward (the exact
program scripts/tpu_profile_r5b.py traced) so trace op names (copy.216,
fusion.450, ...) can be matched to source ops.

Run:  python scripts/tpu_hlo_r5b.py > /tmp/r5b_hlo.txt
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts.profile_util import load_decay, setup_cache, synth_molecule  # noqa: E402

setup_cache()


def main():
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.ops.fused import (cell_grid_params, forward_blocked,
                                    max_neighbor_count)

    params, cfg, table, fused = load_decay()
    natoms = 17760
    bb = pad_molecules([synth_molecule(natoms, np.random.default_rng(0))],
                       table, pad_to=natoms)
    z = jax.device_put(np.asarray(bb.xyz[0]))
    m = jax.device_put(np.asarray(bb.node_mask[0]))
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    nc_, cap_ = cell_grid_params(bb.xyz[0], bb.node_mask[0], cfg.cutoff)
    ncells, cap = round_up(nc_, 512), round_up(cap_, 4)
    x = jax.device_put(np.asarray(bb.x[0]))
    q0 = jax.device_put(np.asarray(bb.q0[0]))
    c_fast = cfg.replace(matmul_precision="default")

    def fwd(zz):
        return zz + 0.0 * forward_blocked(
            fused, x[None], q0[None], zz[None], m[None], c_fast,
            block=256, neighbor_k=k, use_pallas=True,
            neighbor_grid=(ncells, cap, "slices")).sum()

    run = jax.jit(lambda zz: jax.lax.scan(
        lambda c, _: (fwd(c), None), zz, None, length=10)[0])
    compiled = run.lower(z).compile()
    for mod in compiled.runtime_executable().hlo_modules():
        print(mod.to_string())


if __name__ == "__main__":
    main()
