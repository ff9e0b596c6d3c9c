"""Round-4b TPU battery: far-field kernel block sweep + cell-builder stage
breakdown.  One process, one chip.

Run:  python scripts/tpu_profile_r4b.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts.profile_util import scan_time, setup_cache, synth_molecule  # noqa: E402

setup_cache()


def main():
    print("device:", jax.devices()[0])
    from epnn_tpu.ops.pallas_kernels import dense_message_rowsum

    # ---- A. far-field kernel block sweep (N_pad=2304, H=32) -----------
    print("== A. kernel block sweep ==")
    n_pad, h = 2304, 32
    g = np.random.default_rng(0)
    pi = jax.device_put(g.normal(size=(n_pad, h)).astype(np.float32))
    pj = jax.device_put(g.normal(size=(n_pad, h)).astype(np.float32))
    cv = jax.device_put(np.ones(n_pad, np.float32))
    w2 = jax.device_put((g.normal(size=(h, h)) * 0.3).astype(np.float32))
    b2 = jax.device_put((g.normal(size=h) * 0.1).astype(np.float32))

    for bi, bjp in ((128, 64), (128, 32), (128, 128), (256, 64), (64, 64),
                    (256, 128), (128, 192), (384, 64)):
        if n_pad % bi or (n_pad // 4) % bjp:
            continue

        def fn(p, bi=bi, bjp=bjp):
            return dense_message_rowsum(p, pj, cv, w2, b2, block_i=bi,
                                        block_jp=bjp, precision="default")

        scan_time(f"kernel bi={bi} bjp={bjp}",
                  lambda p, f=fn: pi + 0.0 * f(p), pi, iters=30)

    # ---- B. cell-builder stage breakdown at N=17,760 ------------------
    print("== B. cell builder stages (N=17,760) ==")
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.io.tf_import import import_reference_model
    from epnn_tpu.ops.fused import (build_neighbors_cell, cell_grid_params,
                                    max_neighbor_count)

    _, cfg = import_reference_model(
        os.path.join(os.environ.get("EPNN_REFERENCE_DIR", "/root/reference"),
                     "models"), "decay_model")
    table = table_for_n_elems(cfg.n_elems)
    big = synth_molecule(17760, np.random.default_rng(0))
    bb = pad_molecules([big], table, pad_to=17760)
    z = jax.device_put(np.asarray(bb.xyz[0]))
    m = jax.device_put(np.asarray(bb.node_mask[0]))
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    ncells, cap = cell_grid_params(bb.xyz[0], bb.node_mask[0], cfg.cutoff)
    print(f"  k={k} ncells={ncells} cap={cap}")
    cutoff = float(cfg.cutoff)
    n = z.shape[0]

    def stage_sort(zz):
        real = m > 0
        big_ = jnp.float32(3e38)
        origin = jnp.min(jnp.where(real[:, None], zz, big_), axis=0)
        c3 = jnp.clip(jnp.floor((zz - origin) / cutoff).astype(jnp.int32),
                      0, 2**30)
        dims = jnp.max(jnp.where(real[:, None], c3, 0), axis=0) + 1
        lid = c3[:, 0] + dims[0] * (c3[:, 1] + dims[1] * c3[:, 2])
        lid = jnp.where(real, jnp.minimum(lid, ncells - 1), ncells)
        order = jnp.argsort(lid)
        return order

    def stage_table(zz):
        real = m > 0
        big_ = jnp.float32(3e38)
        origin = jnp.min(jnp.where(real[:, None], zz, big_), axis=0)
        c3 = jnp.clip(jnp.floor((zz - origin) / cutoff).astype(jnp.int32),
                      0, 2**30)
        dims = jnp.max(jnp.where(real[:, None], c3, 0), axis=0) + 1
        lid = c3[:, 0] + dims[0] * (c3[:, 1] + dims[1] * c3[:, 2])
        lid = jnp.where(real, jnp.minimum(lid, ncells - 1), ncells)
        order = jnp.argsort(lid)
        s_lid = lid[order]
        pos = jnp.arange(n, dtype=jnp.int32)
        head = jnp.concatenate([jnp.ones((1,), bool),
                                s_lid[1:] != s_lid[:-1]])
        first = jax.lax.cummax(jnp.where(head, pos, 0))
        rank = pos - first
        slot = jnp.where(rank < cap, s_lid * cap + rank, (ncells + 1) * cap)
        xyzmi = jnp.concatenate(
            [zz, m.astype(jnp.float32)[:, None],
             pos.astype(jnp.float32)[:, None]], axis=1)
        tblx = jnp.zeros(((ncells + 1) * cap, 5), jnp.float32)
        tblx = tblx.at[slot].set(xyzmi[order], mode="drop")
        return tblx

    def full(zz):
        return build_neighbors_cell(zz, m, cutoff, k, ncells, cap,
                                    with_d2=True)

    scan_time("  sort only", lambda p: z + 0.0 * stage_sort(p)[0], z,
              iters=10)
    scan_time("  sort+rank+scatter", lambda p: z + 0.0 * stage_table(p)[0, 0],
              z, iters=10)
    scan_time("  full builder", lambda p: z + 0.0 * full(p)[2].sum(), z,
              iters=10)


if __name__ == "__main__":
    main()
