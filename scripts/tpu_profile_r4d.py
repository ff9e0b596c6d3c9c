"""Round-4d: cell-builder tail decomposition at N=17,760 + packed-key sort.

Stages: packed-key sort variant vs argsort; through-gather; through-score;
full (adds top_k).  Run: python scripts/tpu_profile_r4d.py
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
    print("device:", jax.devices()[0], "N:", sys.argv[1] if len(sys.argv) > 1 else 17760)
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.io.tf_import import import_reference_model
    from epnn_tpu.ops.fused import cell_grid_params, max_neighbor_count

    _, cfg = import_reference_model(
        os.path.join(os.environ.get("EPNN_REFERENCE_DIR", "/root/reference"),
                     "models"), "decay_model")
    table = table_for_n_elems(cfg.n_elems)
    nn = int(sys.argv[1]) if len(sys.argv) > 1 else 17760
    big = synth_molecule(nn, np.random.default_rng(0))
    bb = pad_molecules([big], table, pad_to=nn)
    z = jax.device_put(np.asarray(bb.xyz[0]))
    m = jax.device_put(np.asarray(bb.node_mask[0]))
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    ncells, cap = cell_grid_params(bb.xyz[0], bb.node_mask[0], cfg.cutoff)
    cutoff = float(cfg.cutoff)
    n = z.shape[0]
    print(f"  k={k} ncells={ncells} cap={cap}")

    def prelude(zz):
        real = m > 0
        big_ = jnp.float32(3e38)
        origin = jnp.min(jnp.where(real[:, None], zz, big_), axis=0)
        c3 = jnp.clip(jnp.floor((zz - origin) / cutoff).astype(jnp.int32),
                      0, 2**30)
        dims = jnp.max(jnp.where(real[:, None], c3, 0), axis=0) + 1
        lid = c3[:, 0] + dims[0] * (c3[:, 1] + dims[1] * c3[:, 2])
        lid = jnp.where(real, jnp.minimum(lid, ncells - 1), ncells)
        return real, c3, dims, lid

    def sort_argsort(zz):
        _, _, _, lid = prelude(zz)
        return jnp.argsort(lid)

    def sort_packed(zz):
        # one-array sort of lid*2^15 | idx (exact: lid < 2^14, n < 2^15)
        _, _, _, lid = prelude(zz)
        key = jnp.sort(lid * 32768 + jnp.arange(n, dtype=jnp.int32))
        return key & 32767

    def upto_gather(zz):
        real, c3, dims, lid = prelude(zz)
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
        tblx = tblx.reshape(ncells + 1, cap, 5)
        offs = jnp.asarray(
            [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
             for dz in (-1, 0, 1)], jnp.int32)
        nc = c3[:, None, :] + offs[None, :, :]
        ok = jnp.all((nc >= 0) & (nc < dims[None, None, :]), axis=-1)
        nlid = nc[..., 0] + dims[0] * (nc[..., 1] + dims[1] * nc[..., 2])
        nlid = jnp.where(ok & real[:, None],
                         jnp.minimum(nlid, ncells - 1), ncells)
        cx = tblx[nlid].reshape(n, 27 * cap, 5)
        return cx

    def upto_score(zz):
        cx = upto_gather(zz)
        cand = cx[..., 4].astype(jnp.int32)
        d2 = jnp.sum((zz[:, None, :] - cx[..., :3]) ** 2, axis=-1)
        valid = ((cand < n)
                 & (cand != jnp.arange(n, dtype=jnp.int32)[:, None])
                 & (cx[..., 3] > 0) & (m > 0)[:, None]
                 & (d2 < cutoff * cutoff))
        return jnp.where(valid, -d2, -jnp.inf)

    def full(zz):
        score = upto_score(zz)
        vals, sel = jax.lax.top_k(score, k)
        return vals

    scan_time("  argsort", lambda p: z + 0.0 * sort_argsort(p)[0], z,
              iters=10)
    scan_time("  packed-key sort", lambda p: z + 0.0 * sort_packed(p)[0], z,
              iters=10)
    scan_time("  through gather", lambda p: z + 0.0 * upto_gather(p)[0, 0, 0],
              z, iters=10)
    scan_time("  through score", lambda p: z + 0.0 * upto_score(p)[0, 0], z,
              iters=10)
    scan_time("  full (+top_k)", lambda p: z + 0.0 * full(p)[0, 0], z,
              iters=10)


if __name__ == "__main__":
    main()
