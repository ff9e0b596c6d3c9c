"""Round-5b TPU battery: where does the 17,760-atom cold forward's
~117 ms actually go?

Three sections, one process, one chip:

1. Builder stage decomposition — prefix-timed stages mirroring
   build_neighbors_cell (slices layout): bin -> claim -> table ->
   27-cell gather -> score -> top_k.  Prefix diffs give per-stage cost.
2. Isolated near-path primitives at N=17,760: the (N, k) row gathers
   the message/pass rounds pay 10x per inference, the pjp row->lane
   relayout the far-field kernel pays 5x, and isolated top_k widths.
3. A traced cold forward (10 scan iters) dumped to /tmp/r5btrace for
   scripts/trace_parse.py — op-class device time.

Run:  python scripts/tpu_profile_r5b.py [trace]
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


def builder_stages(xyz, node_mask, cutoff, k, ncells_pad, cell_cap):
    """Stage functions mirroring build_neighbors_cell(slices) — measurement
    mirrors only; the shipped builder is the source of truth."""
    from epnn_tpu.ops.fused import _CELL_INV

    n = xyz.shape[0]
    real = node_mask > 0
    pos = jnp.arange(n, dtype=jnp.int32)
    tbl_len = (ncells_pad + 1) * cell_cap
    cc = cell_cap

    def s_bin(z):
        big = jnp.float32(3e38)
        origin = jnp.min(jnp.where(real[:, None], z, big), axis=0)
        c3 = jnp.floor((z - origin) * np.float32(_CELL_INV(cutoff))
                       ).astype(jnp.int32)
        c3 = jnp.clip(c3, 0, jnp.int32(2**30))
        dims = jnp.max(jnp.where(real[:, None], c3, 0), axis=0) + 1
        lid = c3[:, 0] + dims[0] * (c3[:, 1] + dims[1] * c3[:, 2])
        lid = jnp.where(real, jnp.minimum(lid, ncells_pad - 1), ncells_pad)
        return c3, dims, lid

    def s_claim(lid):
        tbl_ids = jnp.full((tbl_len,), n, jnp.int32)
        remaining = jnp.ones((n,), bool)
        for r in range(cell_cap):
            claim = jnp.full((ncells_pad + 1,), n, jnp.int32).at[
                jnp.where(remaining, lid, ncells_pad + 1)
            ].min(pos, mode="drop")
            won = (claim[lid] == pos) & remaining
            tbl_ids = tbl_ids.at[
                jnp.where(won, lid * cell_cap + r, tbl_len)
            ].set(pos, mode="drop")
            remaining = remaining & ~won
        return tbl_ids

    def s_claim_sort(lid):
        order = jnp.argsort(lid)
        s_lid = lid[order]
        head = jnp.concatenate([jnp.ones((1,), bool),
                                s_lid[1:] != s_lid[:-1]])
        first = jax.lax.cummax(jnp.where(head, pos, 0))
        rank = pos - first
        slot = jnp.where(rank < cell_cap, s_lid * cell_cap + rank, tbl_len)
        tbl_ids = jnp.full((tbl_len,), n, jnp.int32)
        return tbl_ids.at[slot].set(order.astype(jnp.int32), mode="drop")

    def s_table(z, tbl_ids):
        xyzmi = jnp.concatenate(
            [z, node_mask.astype(jnp.float32)[:, None],
             pos.astype(jnp.float32)[:, None]], axis=1)
        xyzmi_ext = jnp.concatenate(
            [xyzmi,
             jnp.asarray([[0.0, 0.0, 0.0, 0.0, float(n)]], jnp.float32)],
            axis=0)
        tblx = xyzmi_ext[jnp.minimum(tbl_ids, n)].reshape(
            ncells_pad + 1, cell_cap, 5)
        return jnp.transpose(tblx, (0, 2, 1)).reshape(
            ncells_pad + 1, 5 * cell_cap)

    def s_nlid(c3, dims):
        offs = jnp.asarray(
            [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
             for dz in (-1, 0, 1)], jnp.int32)
        nc = c3[:, None, :] + offs[None, :, :]
        ok = jnp.all((nc >= 0) & (nc < dims[None, None, :]), axis=-1)
        nlid = nc[..., 0] + dims[0] * (nc[..., 1] + dims[1] * nc[..., 2])
        return jnp.where(ok & real[:, None],
                         jnp.minimum(nlid, ncells_pad - 1), ncells_pad)

    def s_score(z, cxf):
        self_id = jnp.arange(n, dtype=jnp.int32)
        cut2 = cutoff * cutoff
        xs, ys, zs = (cxf[:, :, i * cc:(i + 1) * cc] for i in range(3))
        ms_, ids = cxf[:, :, 3 * cc:4 * cc], cxf[:, :, 4 * cc:5 * cc]
        d2_3 = ((z[:, 0:1, None] - xs) ** 2
                + (z[:, 1:2, None] - ys) ** 2
                + (z[:, 2:3, None] - zs) ** 2)
        cand3 = ids.astype(jnp.int32)
        valid3 = ((cand3 < n) & (cand3 != self_id[:, None, None])
                  & (ms_ > 0) & real[:, None, None] & (d2_3 < cut2))
        score = jnp.where(valid3, -d2_3, -jnp.inf).reshape(n, 27 * cc)
        return score, cand3.reshape(n, 27 * cc)

    return s_bin, s_claim, s_claim_sort, s_table, s_nlid, s_score


def main():
    print("device:", jax.devices()[0])
    do_trace = "trace" in sys.argv[1:]
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.ops.fused import (cell_grid_params, forward_blocked,
                                    max_neighbor_count)

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
        print(f"  k={k} ncells={ncells} cap={cap}")
        cutoff = float(cfg.cutoff)
        s_bin, s_claim, s_claim_sort, s_table, s_nlid, s_score = \
            builder_stages(z * 0 + z, m, cutoff, k, ncells, cap)
        # NOTE: stage closures capture the node mask; z rides the carry.

        # -- prefix battery: diffs between consecutive rows = stage cost --
        def p1(zz):
            c3, dims, lid = s_bin(zz)
            return zz + 0.0 * (lid.sum().astype(jnp.float32)
                               + dims.sum().astype(jnp.float32))

        def p2(zz):
            c3, dims, lid = s_bin(zz)
            return zz + 0.0 * s_claim(lid).sum().astype(jnp.float32)

        def p2s(zz):
            c3, dims, lid = s_bin(zz)
            return zz + 0.0 * s_claim_sort(lid).sum().astype(jnp.float32)

        def p3(zz):
            c3, dims, lid = s_bin(zz)
            return zz + 0.0 * s_table(zz, s_claim_sort(lid)).sum()

        def p4(zz):
            c3, dims, lid = s_bin(zz)
            tblf = s_table(zz, s_claim_sort(lid))
            return zz + 0.0 * tblf[s_nlid(c3, dims)].sum()

        def p5(zz):
            c3, dims, lid = s_bin(zz)
            tblf = s_table(zz, s_claim_sort(lid))
            score, cand = s_score(zz, tblf[s_nlid(c3, dims)])
            return zz + 0.0 * (jnp.where(jnp.isfinite(score), score,
                                         0.0).sum()
                               + cand.sum().astype(jnp.float32))

        def p6(zz):
            c3, dims, lid = s_bin(zz)
            tblf = s_table(zz, s_claim_sort(lid))
            score, cand = s_score(zz, tblf[s_nlid(c3, dims)])
            vals, sel = jax.lax.top_k(score, k)
            idx = jnp.take_along_axis(cand, sel, axis=1)
            return zz + 0.0 * (jnp.where(jnp.isfinite(vals), vals, 0.0).sum()
                               + idx.sum().astype(jnp.float32))

        for tag, fn in (("p1 bin", p1), ("p2 +claim", p2),
                        ("p2s bin+sortclaim", p2s), ("p3 +table", p3),
                        ("p4 +gather27", p4), ("p5 +score", p5),
                        ("p6 +topk (full)", p6)):
            scan_time(f"  {tag}", fn, z, iters=10)

        # -- isolated near-path primitives --
        rng = np.random.default_rng(1)
        idx_c = jax.device_put(rng.integers(0, natoms, (natoms, k))
                               .astype(np.int32))
        pj0 = jax.device_put(rng.normal(size=(natoms, 32))
                             .astype(np.float32))

        def g32(zz):  # (N, k) gather of 32-wide rows (message round shape)
            return zz + 0.0 * zz[idx_c].sum(axis=1)

        def g64(zz):  # 64-wide rows (pass-round fused concat gather)
            pp = jnp.concatenate([zz, zz + 1.0], axis=-1)
            return zz + 0.0 * pp[idx_c].sum(axis=1)[:, :32]

        def relayout(zz):  # pjp row->lane relayout (far-field input);
            # the sum(axis=0) keeps the (N/4, 128) layout live (reshape
            # pairs with nothing between would fold away)
            pjp = zz.reshape(natoms // 4, 128)
            return zz + 0.0 * jnp.sum(pjp, axis=0)[None, :32]

        def sum_ref(zz):  # reduce-only floor for the gather numbers
            return zz + 0.0 * jnp.broadcast_to(
                zz[:, None, :], (natoms, k, 32)).sum(axis=1)

        scan_time("  gather (N,k,32) msg-round", g32, pj0, iters=10)
        scan_time("  gather (N,k,64) pass-round", g64, pj0, iters=10)
        scan_time("  pjp relayout (N,32)->(N/4,128)", relayout, pj0,
                  iters=10)
        scan_time("  [floor] bcast+sum only", sum_ref, pj0, iters=10)

        # -- cold forward for context + optional trace --
        x = jax.device_put(np.asarray(bb.x[0]))
        q0 = jax.device_put(np.asarray(bb.q0[0]))
        c_fast = cfg.replace(matmul_precision="default")

        def fwd(zz):
            return zz + 0.0 * forward_blocked(
                fused, x[None], q0[None], zz[None], m[None], c_fast,
                block=256, neighbor_k=k, use_pallas=True,
                neighbor_grid=(ncells, cap, "slices")).sum()

        scan_time("  cold fwd [slices]", fwd, z, iters=10)

        if do_trace and natoms == 17760:
            tdir = "/tmp/r5btrace"
            run = jax.jit(lambda zz: jax.lax.scan(
                lambda c, _: (fwd(c), None), zz, None, length=10)[0])
            np.asarray(run(z)).sum()  # compile outside the trace
            with jax.profiler.trace(tdir):
                np.asarray(run(z)).sum()
            print(f"  trace -> {tdir} (10 iters; parse with "
                  f"scripts/trace_parse.py)")


if __name__ == "__main__":
    main()
