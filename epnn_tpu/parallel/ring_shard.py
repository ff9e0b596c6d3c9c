"""Ring-sharded forward: the pair grid distributed with ppermute circulation.

This is the ring-attention analog promised in SURVEY §2.8 for graphs whose
*per-atom state itself* is too large to replicate: each device owns an atom
block (its coordinates, projections, masks), and at every ring step computes
its rows' interactions against one circulating neighbor block, then passes
that block to the next device over ICI (``jax.lax.ppermute``).  Nothing is
ever all-gathered; peak per-device memory is O(N/D) atoms + one circulating
block.

Compared to :mod:`epnn_tpu.parallel.atom_shard` (which replicates the tiny
per-atom projections and shards only the pair *work*), this variant also
shards the per-atom state — the right shape for N ≫ 10⁶ atoms across a pod.

Charge conservation: for a pair (i, j), device(owner of i) computes
``0.5·(f_ij − f_ji)`` when j's block passes by, and device(owner of j)
computes the negation when i's block passes by — both from bitwise-identical
projections (the circulating data is the same array), so the global transfer
matrix stays exactly antisymmetric.

The diagonal is excluded by circulating each block's global atom offset: a
pair is "self" iff global row index == global col index.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from epnn_tpu.models.config import EPNNConfig
from epnn_tpu.ops.fused import (
    FusedParams,
    PairMLPWeights,
    _apply_mlp,
    _resolve_precision,
    block_neighbor_select,
    rbf_and_gate,
)
from epnn_tpu.parallel.sharding import ATOM_AXIS, DATA_AXIS


def _pair_terms(xyz_i, xyz_j, same, valid, cfg, dtype):
    """RBF features + gate for a (rows, cols) block; ``same`` marks diagonal
    (self) pairs, ``valid`` masks pairs with a padded endpoint (their edges
    are exactly zero, matching the zero-padded precomputed-e contract)."""
    d2 = jnp.sum((xyz_i[:, None, :] - xyz_j[None, :, :]) ** 2, axis=-1)
    cmask = jnp.where(same, 0.0, valid)
    return rbf_and_gate(d2, cmask, cfg, dtype)


def forward_ring_sharded(
    fused: FusedParams,
    x: jax.Array,          # (N, n_elems) — N divisible by the atoms axis
    q0: jax.Array,         # (N,)
    xyz: jax.Array,        # (N, 3)
    node_mask: jax.Array,  # (N,)
    cfg: EPNNConfig,
    mesh: Mesh,
) -> jax.Array:
    n = x.shape[0]
    n_dev = mesh.shape[ATOM_AXIS]
    if n % n_dev:
        raise ValueError(f"N={n} not divisible by atoms axis {n_dev}")
    run = _ring_dense_program(cfg, mesh, n, jnp.dtype(x.dtype).name)
    return run(fused, x, q0, xyz, node_mask,
               jnp.arange(n, dtype=jnp.int32))


@functools.lru_cache(maxsize=None)
def _ring_dense_program(cfg: EPNNConfig, mesh: Mesh, n: int, dtype: str):
    """Memoized jitted program for :func:`forward_ring_sharded` (the
    eager shard_map re-traced on every call otherwise)."""
    n_dev = mesh.shape[ATOM_AXIS]
    nd = n // n_dev
    prec = _resolve_precision(cfg)
    dt = jnp.dtype(dtype)

    rows = P(ATOM_AXIS)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rows, rows, rows, rows, rows),
        out_specs=rows,
        check_vma=False,
    )
    def fwd(fused, x_d, q0_d, xyz_d, mask_d, gidx_d):
        axis_size = jax.lax.axis_size(ATOM_AXIS)
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

        h_d = jnp.zeros((nd, cfg.h_dim), dt)
        q_d = q0_d
        nm = mask_d[:, None]

        def atom_inputs(h, q):
            return jnp.concatenate([x_d, h, q[:, None]], axis=-1)

        if cfg.mask_messages:
            # Σ_j node_mask_j over the whole graph (diag kept, like pairm)
            msg_count = mask_d * jax.lax.psum(mask_d.sum(), ATOM_AXIS)
        else:
            msg_count = jnp.full((nd,), float(n), dt)

        def message_round(carry, w: PairMLPWeights):
            h_d, q_d = carry
            a = atom_inputs(h_d, q_d)
            pi = jnp.dot(a, w.w1_i, precision=prec) + w.b1
            pj = jnp.dot(a, w.w1_j, precision=prec)

            def ring_step(carry2, _):
                acc, blk = carry2
                xyz_j, pj_j, mask_j, gidx_j = blk
                same = gidx_d[:, None] == gidx_j[None, :]
                valid = mask_d[:, None] * mask_j[None, :]
                rbf, _gate = _pair_terms(xyz_d, xyz_j, same, valid, cfg, dt)
                epart = jnp.dot(rbf, w.w1_e, precision=prec)
                hid = jax.nn.relu((pi[:, None, :] + pj_j[None, :, :]) + epart)
                for wm, bm in w.mids:
                    hid = jax.nn.relu(jnp.dot(hid, wm, precision=prec) + bm)
                jvec = mask_j if cfg.mask_messages else jnp.ones_like(mask_j)
                acc = acc + jnp.einsum("n,bnh->bh", jvec, hid, precision=prec)
                blk = jax.lax.ppermute(blk, ATOM_AXIS, perm)
                return (acc, blk), None

            acc0 = jnp.zeros((nd, w.w_out.shape[0]), dt)
            (hsum, _), _ = jax.lax.scan(
                ring_step, (acc0, (xyz_d, pj, mask_d, gidx_d)), None,
                length=axis_size,
            )
            messages = (jnp.dot(hsum, w.w_out, precision=prec)
                        + msg_count[:, None] * w.b_out)
            upd_in = jnp.concatenate([h_d, messages], axis=-1) * nm
            h_d = _apply_mlp(fused.update, upd_in, prec) * nm
            return (h_d, q_d), None

        (h_d, q_d), _ = jax.lax.scan(message_round, (h_d, q_d), fused.messages)

        def pass_round(q_d, w: PairMLPWeights):
            a = atom_inputs(h_d, q_d)
            pi = jnp.dot(a, w.w1_i, precision=prec) + w.b1
            pj = jnp.dot(a, w.w1_j, precision=prec)

            def ring_step(carry2, _):
                acc, blk = carry2
                xyz_j, pi_j, pj_j, mask_j, gidx_j = blk
                same = gidx_d[:, None] == gidx_j[None, :]
                valid = mask_d[:, None] * mask_j[None, :]
                rbf, gate = _pair_terms(xyz_d, xyz_j, same, valid, cfg, dt)
                epart = jnp.dot(rbf, w.w1_e, precision=prec)
                hid_n = jax.nn.relu((pi[:, None, :] + pj_j[None, :, :]) + epart)
                hid_t = jax.nn.relu((pi_j[None, :, :] + pj[:, None, :]) + epart)
                for wm, bm in w.mids:
                    hid_n = jax.nn.relu(jnp.dot(hid_n, wm, precision=prec) + bm)
                    hid_t = jax.nn.relu(jnp.dot(hid_t, wm, precision=prec) + bm)
                weight = gate * valid
                acc = acc + jnp.sum(
                    0.5 * weight[:, :, None] * (hid_n - hid_t), axis=1
                )
                blk = jax.lax.ppermute(blk, ATOM_AXIS, perm)
                return (acc, blk), None

            acc0 = jnp.zeros((nd, w.w_out.shape[0]), dt)
            (dsum, _), _ = jax.lax.scan(
                ring_step, (acc0, (xyz_d, pi, pj, mask_d, gidx_d)), None,
                length=axis_size,
            )
            dq = jnp.dot(dsum, w.w_out, precision=prec)[:, 0]
            return q_d + dq, None

        q_d, _ = jax.lax.scan(pass_round, q_d, fused.passes)
        return q_d * mask_d

    return jax.jit(fwd)


def forward_ring_sharded_nbr_batch(
    fused: FusedParams,
    x: jax.Array,          # (B, N, n_elems); B % data axis == 0
    q0: jax.Array,         # (B, N);          N % atoms axis == 0
    xyz: jax.Array,        # (B, N, 3)
    node_mask: jax.Array,  # (B, N)
    cfg: EPNNConfig,
    mesh: Mesh,
    k_blk: int,
    use_pallas: bool = False,
    remat: bool = False,
    uniform_q0: bool = False,
    neighbors: "Tuple[jax.Array, ...] | None" = None,
    far_cluster: int = 0,
    far_cluster_grad: bool = False,
) -> jax.Array:
    """Neighbor-split ring-sharded forward (SURVEY §7 stage 6: the ring
    variant OF the stage-5 kernel, not of the dense loop).

    ``far_cluster`` (static) — opt-in APPROXIMATE far-field tier, the ring
    twin of ``forward_blocked(far_cluster=...)``: the h≠0 far-field
    reduction is replaced by a count-weighted grid over C centroids of the
    global ``pj`` rows.  The rows never materialize globally — the k-means
    fits DISTRIBUTED (:func:`epnn_tpu.ops.cluster.weighted_kmeans_sharded`:
    seed keys all-gathered as O(N) scalars, Lloyd partial sums ``psum``-ed),
    and message-round ring steps then carry only the exact O(N·k_blk) near
    corrections.  Error bound and conservation argument are identical to
    the single-chip tier (``ops/cluster.py``); centroid trajectories match
    the single-chip fit to psum reduction-order noise.

    ``uniform_q0`` (static) — caller asserts the pad_molecules round-1
    collapse contract (:func:`epnn_tpu.data.dataset.uniform_q0_contract`);
    round 1's per-step O(N²/D²) block far-field then collapses to ONE
    count-weighted per-element grid reduce per device, built with O(E)
    collectives (``psum`` of element counts, ``pmax`` of the Z table and
    the shared q0 value) — the ring steps of round 1 carry only the near
    corrections.

    Like :func:`forward_ring_sharded`, nothing is replicated: each device
    owns an N/D atom block and per ring step sees ONE circulating block
    over ICI (``ppermute``).  Unlike it, per-step pair work is split the
    same way the single-chip path splits it (`ops/fused.py`
    ``_forward_single_nbr``):

    * far field (message rounds): the featureless dense reduction over the
      whole circulating block — optionally the packed Pallas kernel
      (rectangular: my N/D rows × the block's N/D columns),
    * near field: a geometry-only PRE-PASS ring loop stores, per step, the
      within-cutoff pairs of my rows against that block
      (``block_neighbor_select`` on bitwise-symmetric d², (D, N/D, k_blk)
      int/f32 arrays); rounds gather only those pairs and featurize them.
      Steps whose block holds no near pair of mine skip the featurized
      math entirely (``lax.cond`` — with spatially sorted atoms that is
      most steps).

    ``k_blk`` must bound the true per-row within-ONE-block neighbor count
    (≤ min(global k, N/D) always works) — same top_k superset contract as
    :func:`epnn_tpu.ops.fused.build_neighbors`.

    ``neighbors`` — optional precomputed GLOBAL tables (the
    ``build_neighbors_batch`` contract, same as ``forward_blocked`` /
    ``forward_atom_sharded_nbr_batch``): ``(idx, nbr_mask)`` or
    ``(idx, nbr_mask, d2)``, each (B, N, k) with global column indices.
    They shard over (data, atoms) like every other batch operand, so each
    device receives exactly its rows' slices.  The geometry pre-pass is
    then replaced by a CONVERSION pre-pass: per ring step, the entries of
    my rows' global table that live in the circulating block are compacted
    (stable argsort — in-table order preserved) into the same
    (D, N/D, k_blk) per-step selection the cold pre-pass produces.  With a
    2-tuple (Verlet-skin serving), pair d² is gathered from the CURRENT
    circulating coordinates in-graph — one dispatch per MD step, mirroring
    the atom-sharded skin path.  ``k_blk`` must bound the per-row
    PER-BLOCK entry count of the table (``min(k, N/D)`` always works —
    the Predictor passes that).  Pair sets are identical to the table's;
    summation order differs from the cold pre-pass, so outputs agree to
    fp noise, not bitwise (same bound as the atom-sharded reuse path).

    Conservation: both orderings of a near pair are evaluated from the
    SAME circulated arrays on both owners (d² is bitwise symmetric:
    (a−b)² ≡ (b−a)² in IEEE), so the global transfer matrix stays exactly
    antisymmetric and Σq is preserved at f32 summation grade.

    Per-device, per-round cost: O(N²/D) featureless + O(N·k_blk)
    featurized (the near term does not divide by D in the worst case —
    slot buffers are sized for all neighbors landing in one block; sort
    atoms spatially and the cond-skip recovers the division in practice).
    Per-device memory: O(N/D·(state) + D·N/D·k_blk) = O(N·k_blk) for the
    stored selection — no O(N) replicated state.
    """
    b, n = x.shape[:2]
    n_at = mesh.shape[ATOM_AXIS]
    n_dp = mesh.shape.get(DATA_AXIS, 1)
    if n % n_at:
        raise ValueError(f"N={n} not divisible by atoms axis {n_at}")
    if b % n_dp:
        raise ValueError(f"B={b} not divisible by data axis {n_dp}")
    nd = n // n_at
    if k_blk > nd:
        raise ValueError(f"k_blk={k_blk} exceeds the block width {nd}")
    if far_cluster < 0:
        raise ValueError("far_cluster must be >= 0 (0 = exact)")
    if neighbors is not None:
        k_tab = int(neighbors[0].shape[-1])
        if k_blk < min(k_tab, nd):
            # a row could have up to min(k_tab, nd) of its table entries
            # inside ONE block; anything smaller can silently drop pairs
            raise ValueError(
                f"k_blk={k_blk} cannot hold a global table of k={k_tab} "
                f"(need min(k, N/D) = {min(k_tab, nd)})")
    if cfg.compute_dtype == "bfloat16":
        # same dtype policy as forward_blocked / the atom-sharded twin:
        # bf16 message/update pipeline, f32 pass rounds (bitwise
        # antisymmetry), f32 charges/coordinates/result
        bf = jnp.bfloat16
        fused = FusedParams(
            messages=jax.tree_util.tree_map(lambda a: a.astype(bf),
                                            fused.messages),
            passes=fused.passes,
            update=jax.tree_util.tree_map(lambda a: a.astype(bf),
                                          fused.update),
        )
        out = forward_ring_sharded_nbr_batch(
            fused, x.astype(bf), q0, xyz, node_mask.astype(bf),
            cfg.replace(compute_dtype="float32", matmul_precision="default",
                        highest_precision=False),
            mesh, k_blk=k_blk, use_pallas=False, remat=remat,
            uniform_q0=uniform_q0, neighbors=neighbors,
            far_cluster=far_cluster, far_cluster_grad=far_cluster_grad,
        )
        return out.astype(jnp.float32) * node_mask

    # memoized jitted program (same rationale as atom_shard's
    # _nbr_batch_program: the eager shard_map re-traced on every call)
    run = _ring_nbr_program(
        cfg, mesh, k_blk, use_pallas, remat, uniform_q0, far_cluster, b, n,
        0 if neighbors is None else len(neighbors),
        int(os.environ.get("EPNN_FAR_CLUSTER_ITERS", "8")),
        far_cluster_grad)
    nbrs = tuple(neighbors) if neighbors is not None else ()
    return run(fused, x, q0, xyz, node_mask, *nbrs)


@functools.lru_cache(maxsize=None)
def _ring_nbr_program(cfg: EPNNConfig, mesh: Mesh, k_blk: int,
                      use_pallas: bool, remat: bool, uniform_q0: bool,
                      far_cluster: int, b: int, n: int, n_nbr: int,
                      far_iters: int, far_cluster_grad: bool = False):
    """Build + jit the :func:`forward_ring_sharded_nbr_batch` program for
    one static configuration — repeated serving calls reuse one compiled
    executable."""
    n_at = mesh.shape[ATOM_AXIS]
    n_dp = mesh.shape.get(DATA_AXIS, 1)
    nd = n // n_at
    prec = _resolve_precision(cfg)
    dense_name = getattr(cfg, "dense_matmul_precision", "")
    if dense_name == "bf16x3":
        prec_dense = "bf16x3"
    elif dense_name == "int8":
        prec_dense = None
    elif dense_name:
        prec_dense = {"default": None, "high": jax.lax.Precision.HIGH,
                      "highest": jax.lax.Precision.HIGHEST}[dense_name]
    else:
        prec_dense = prec
    pallas_ok = use_pallas and prec_dense != "bf16x3"
    mid_dtype = "int8" if dense_name == "int8" else "float32"
    prec_name = ("default" if dense_name == "int8" else dense_name) or \
        getattr(cfg, "matmul_precision", "") or (
        "highest" if cfg.highest_precision else "default")

    def fwd_rows(fused, x_d, q0_d, xyz_d, mask_d, nbr_rows=None):
        """One graph's local shard: my nd rows, ring over D blocks.

        ``nbr_rows`` — optional (idx, mask[, d2]) slices of a global
        (N, k) table for MY rows, each (nd, k) with GLOBAL column
        indices (see ``neighbors`` above)."""
        if pallas_ok:
            from epnn_tpu.ops.pallas_kernels import (dense_message_pad,
                                                     dense_message_rowsum)

            h1 = int(fused.messages.b1.shape[-1])
            bi, bjp = (128, 64) if nd >= 128 else (8, 8)
            r_pad = int(-(-nd // bi) * bi)
            lcm = dense_message_pad(bi, bjp, h1)
            c_pad = int(-(-nd // lcm) * lcm)
        D = jax.lax.axis_size(ATOM_AXIS)
        perm = [(i, (i + 1) % D) for i in range(D)]
        my_start = jax.lax.axis_index(ATOM_AXIS) * nd
        dt = x_d.dtype

        if nbr_rows is None:
            # ---- geometry-only pre-pass: near pairs of my rows vs each
            # circulating block
            def sel_step(blk, _):
                xyz_j, mask_j, start_j = blk
                idx, m, d2 = block_neighbor_select(
                    xyz_j, mask_j, my_start - start_j, xyz_d, mask_d,
                    cfg.cutoff, k_blk, with_d2=True)
                return jax.lax.ppermute(blk, ATOM_AXIS, perm), (idx, m, d2)

            _, (idx_s, m_s, d2_s) = jax.lax.scan(
                sel_step, (xyz_d, mask_d.astype(jnp.float32), my_start),
                None, length=D)
        else:
            # ---- conversion pre-pass: compact my rows' GLOBAL table into
            # per-circulating-block local selections (serving/MD reuse)
            g_idx = nbr_rows[0].astype(jnp.int32)        # (nd, k) global
            g_mask = nbr_rows[1] > 0
            k_tab = g_idx.shape[-1]
            col_pos = jnp.broadcast_to(
                jnp.arange(k_tab, dtype=jnp.int32)[None, :], g_idx.shape)

            def conv_step(blk, _):
                xyz_j, start_j = blk
                in_blk = g_mask & ((g_idx // nd) == (start_j // nd))
                # stable argsort: in-block entries first, table order kept
                order = jnp.argsort(
                    jnp.where(in_blk, col_pos, k_tab + 1), axis=1,
                )[:, :k_blk]
                m = jnp.take_along_axis(in_blk, order, 1)
                idx = jnp.where(
                    m, jnp.take_along_axis(g_idx, order, 1) - start_j, 0)
                if len(nbr_rows) == 3:
                    d2 = jnp.where(
                        m, jnp.take_along_axis(nbr_rows[2], order, 1), 0.0)
                else:
                    # 2-tuple (skin serving): pair d² from the CURRENT
                    # circulating coordinates, in-graph
                    d2 = jnp.sum(
                        (xyz_d[:, None, :] - xyz_j[idx]) ** 2, axis=-1)
                    d2 = jnp.where(m, d2, 0.0)
                blk = jax.lax.ppermute(blk, ATOM_AXIS, perm)
                return blk, (idx, m.astype(jnp.float32), d2)

            _, (idx_s, m_s, d2_s) = jax.lax.scan(
                conv_step, (xyz_d, my_start), None, length=D)
        m_s = m_s.astype(dt)                 # (D, nd, k_blk)

        if cfg.mask_messages:
            msg_count = mask_d * jax.lax.psum(jnp.sum(mask_d), ATOM_AXIS)
        else:
            msg_count = jnp.full((nd,), float(n), dt)

        h_d = jnp.zeros((nd, cfg.h_dim), dt)
        q_d = q0_d
        nm = mask_d[:, None]

        def atom_inputs(h, q):
            return jnp.concatenate([x_d, h, q[:, None].astype(dt)], axis=-1)

        def dense_nofeat(pi, pj_j, mask_j, w):
            """Far-field Σ over ONE circulating block's columns."""
            jvec = mask_j if cfg.mask_messages else jnp.ones_like(mask_j)
            if pallas_ok and len(w.mids) == 1:
                (w2, b2), = w.mids
                return dense_message_rowsum(
                    jnp.pad(pi, ((0, r_pad - nd), (0, 0))),
                    jnp.pad(pj_j, ((0, c_pad - nd), (0, 0))),
                    jnp.pad(jvec, (0, c_pad - nd)), w2, b2,
                    block_i=bi, block_jp=bjp, precision=prec_name,
                    mid_dtype=mid_dtype)[:nd]
            hid = jax.nn.relu(pi[:, None, :] + pj_j[None, :, :])
            for wm, bm in w.mids:
                hid = jax.nn.relu(jnp.dot(hid, wm, precision=prec_dense) + bm)
            return jnp.einsum("n,bnh->bh", jvec, hid, precision=prec_dense)

        def dense_round1_grid(pi, q_d, w: PairMLPWeights):
            """uniform_q0 round-1 collapse (mirrors ops/fused.py): nothing
            is replicated here, so the per-element grid is assembled with
            O(E) collectives — psum of count vectors, pmax of the Z table
            and of the shared valid-atom q0 value.  Counts/reduce in f32
            HIGHEST so integer counts never round."""
            oh_d = x_d[:, 1:]                                   # (nd, E)
            e_cnt = oh_d.shape[1]
            zvec = jax.lax.pmax(jnp.max(x_d[:, :1] * oh_d, axis=0),
                                ATOM_AXIS)
            # all valid atoms share one q0; blocks that are pure padding
            # contribute -inf to the max and drop out at the pmax
            qv = jax.lax.pmax(
                jnp.max(jnp.where(mask_d > 0, q_d, -jnp.inf)), ATOM_AXIS)
            qv = jnp.where(jnp.isfinite(qv), qv, 0.0)
            grid_in = jnp.concatenate([
                zvec[:, None],
                jnp.eye(e_cnt, dtype=dt),
                jnp.zeros((e_cnt, cfg.h_dim), dt),
                jnp.full((e_cnt, 1), qv.astype(dt)),
            ], axis=1)
            grid_in = jnp.concatenate(
                [grid_in, jnp.zeros((1, grid_in.shape[1]), dt)], axis=0)
            pj_grid = jnp.dot(grid_in, w.w1_j, precision=prec)
            jvec_d = mask_d if cfg.mask_messages else jnp.ones_like(mask_d)
            jvec32 = jvec_d.astype(jnp.float32)
            counts = jnp.einsum("n,ne->e", jvec32, oh_d.astype(jnp.float32),
                                precision=jax.lax.Precision.HIGHEST)
            counts = jnp.concatenate(
                [counts, (jnp.sum(jvec32) - jnp.sum(counts))[None]])
            counts = jax.lax.psum(counts, ATOM_AXIS)
            hid = jax.nn.relu(pi[:, None, :] + pj_grid[None, :, :])
            for wm, bm in w.mids:
                hid = jax.nn.relu(jnp.dot(hid, wm, precision=prec) + bm)
            return jnp.einsum(
                "e,reh->rh", counts, hid.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST).astype(dt)

        def cluster_far_grid(pi, pj, w: PairMLPWeights):
            """Clustered h≠0 far field (opt-in approximation): distributed
            weighted k-means over the row-sharded pj, then the same
            count-weighted grid reduction as the exact round-1 collapse —
            O(nd·C) local work instead of O(nd·N) ring circulation."""
            from epnn_tpu.ops.cluster import weighted_kmeans_sharded

            jvec_d = mask_d if cfg.mask_messages else jnp.ones_like(mask_d)
            cent, wts, _rad = weighted_kmeans_sharded(
                pj, jvec_d, far_cluster, ATOM_AXIS, iters=far_iters,
                differentiable=far_cluster_grad)
            if pallas_ok and len(w.mids) == 1:
                (w2, b2), = w.mids
                # centroid rows padded to the packed-row contract (zero
                # weight ⇒ padding contributes exactly nothing) — same
                # packing as the single-chip tier (ops/fused.py)
                packc = max(1, 128 // h1) if 128 % h1 == 0 else 1
                npr = -(-far_cluster // packc)
                npr_p = npr if npr <= 64 else int(-(-npr // 64) * 64)
                cpad = npr_p * packc
                cent_p = jnp.pad(cent, ((0, cpad - far_cluster), (0, 0)))
                wts_p = jnp.pad(wts, (0, cpad - far_cluster))
                return dense_message_rowsum(
                    jnp.pad(pi, ((0, r_pad - nd), (0, 0))),
                    cent_p.astype(pi.dtype), wts_p, w2, b2,
                    block_i=bi, block_jp=min(64, npr_p),
                    precision=prec_name, mid_dtype=mid_dtype)[:nd]
            hid = jax.nn.relu(pi[:, None, :] + cent.astype(dt)[None, :, :])
            for wm, bm in w.mids:
                hid = jax.nn.relu(jnp.dot(hid, wm, precision=prec) + bm)
            # f32 HIGHEST count weighting (integer counts must not round)
            return jnp.einsum(
                "c,nch->nh", wts, hid.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST).astype(dt)

        def _message_round(carry, w: PairMLPWeights, collapse: bool):
            h_d, q_d = carry
            a = atom_inputs(h_d, q_d)
            pi = jnp.dot(a, w.w1_i, precision=prec) + w.b1
            pj = jnp.dot(a, w.w1_j, precision=prec)
            dense_in_ring = not collapse and far_cluster <= 0

            def ring_step(c2, sel):
                acc, blk = c2
                idx, m, d2 = sel
                pj_j, mask_j = blk
                if dense_in_ring:
                    acc = acc + dense_nofeat(pi, pj_j, mask_j, w)

                def near(acc):
                    rbf, _ = rbf_and_gate(d2, m, cfg, dtype=dt)
                    pj_nbr = pj_j[idx]                    # local gather
                    epart = jnp.dot(rbf, w.w1_e, precision=prec)
                    base = pi[:, None, :] + pj_nbr
                    hf, hn = jax.nn.relu(base + epart), jax.nn.relu(base)
                    for wm, bm in w.mids:
                        hf = jax.nn.relu(jnp.dot(hf, wm, precision=prec) + bm)
                        hn = jax.nn.relu(jnp.dot(hn, wm, precision=prec) + bm)
                    return acc + jnp.sum((hf - hn) * m[:, :, None], axis=1)

                acc = jax.lax.cond(jnp.sum(m) > 0, near, lambda a_: a_, acc)
                return (acc, jax.lax.ppermute(blk, ATOM_AXIS, perm)), None

            if collapse:
                acc0 = dense_round1_grid(pi, q_d, w)
            elif far_cluster > 0:
                acc0 = cluster_far_grid(pi, pj, w)
            else:
                acc0 = jnp.zeros((nd, pi.shape[-1]), dt)
            (hsum, _), _ = jax.lax.scan(
                ring_step, (acc0, (pj, mask_d.astype(dt))),
                (idx_s, m_s, d2_s), length=D)
            messages = (jnp.dot(hsum, w.w_out, precision=prec)
                        + msg_count[:, None] * w.b_out)
            upd = jnp.concatenate([h_d, messages], axis=-1) * nm
            h_d = _apply_mlp(fused.update, upd, prec) * nm
            return (h_d, q_d), None

        def message_round(carry, w: PairMLPWeights):
            return _message_round(carry, w, False)

        if remat:
            message_round = jax.checkpoint(message_round)
        if uniform_q0:
            round1 = lambda c, w: _message_round(c, w, True)  # noqa: E731
            if remat:
                round1 = jax.checkpoint(round1)
            w_first = jax.tree_util.tree_map(lambda a: a[0], fused.messages)
            w_rest = jax.tree_util.tree_map(lambda a: a[1:], fused.messages)
            carry, _ = round1((h_d, q_d), w_first)
            (h_d, q_d), _ = jax.lax.scan(message_round, carry, w_rest)
        else:
            (h_d, q_d), _ = jax.lax.scan(message_round, (h_d, q_d),
                                         fused.messages)

        def pass_round(q_d, w: PairMLPWeights):
            a = atom_inputs(h_d, q_d).astype(w.w1_i.dtype)
            pi = jnp.dot(a, w.w1_i, precision=prec) + w.b1
            pj = jnp.dot(a, w.w1_j, precision=prec)

            def ring_step(c2, sel):
                acc, blk = c2
                idx, m, d2 = sel
                pi_j, pj_j = blk

                def near(acc):
                    rbf, gate = rbf_and_gate(d2, m, cfg,
                                             dtype=w.w1_e.dtype)
                    gate = gate * m
                    pp_nbr = jnp.concatenate([pi_j, pj_j], -1)[idx]
                    h1 = pi.shape[-1]
                    pi_nbr, pj_nbr = pp_nbr[..., :h1], pp_nbr[..., h1:]
                    epart = jnp.dot(rbf, w.w1_e, precision=prec)
                    hid_n = jax.nn.relu((pi[:, None, :] + pj_nbr) + epart)
                    hid_t = jax.nn.relu((pi_nbr + pj[:, None, :]) + epart)
                    for wm, bm in w.mids:
                        hid_n = jax.nn.relu(
                            jnp.dot(hid_n, wm, precision=prec) + bm)
                        hid_t = jax.nn.relu(
                            jnp.dot(hid_t, wm, precision=prec) + bm)
                    diff = (hid_n - hid_t).astype(jnp.float32)
                    g32 = gate.astype(jnp.float32)
                    return acc + jnp.sum(0.5 * g32[:, :, None] * diff, 1)

                acc = jax.lax.cond(jnp.sum(m) > 0, near, lambda a_: a_, acc)
                return (acc, jax.lax.ppermute(blk, ATOM_AXIS, perm)), None

            acc0 = jnp.zeros((nd, pi.shape[-1]), jnp.float32)
            (dsum, _), _ = jax.lax.scan(
                ring_step, (acc0, (pi, pj)), (idx_s, m_s, d2_s), length=D)
            dq = jnp.dot(dsum, w.w_out.astype(jnp.float32),
                         precision=prec)[:, 0]
            return q_d + dq, None

        if remat:
            pass_round = jax.checkpoint(pass_round)
        q_d, _ = jax.lax.scan(pass_round, q_d, fused.passes)
        return q_d * mask_d

    # every batch operand is fully (data, atoms)-sharded: the ring
    # replicates NOTHING (unlike atom_shard, where q0/mask stay whole)
    rows = P(DATA_AXIS, ATOM_AXIS)
    local_b = b // n_dp
    rep = P()
    nbr_specs = (rows,) * n_nbr

    @functools.partial(
        shard_map, mesh=mesh,
        # fused rides as an explicit replicated operand (jax.checkpoint
        # inside shard_map re-materializes closure captures with Auto-mesh
        # annotations — a mesh-type mismatch; same gotcha as atom_shard)
        in_specs=(rep, rows, rows, rows, rows) + nbr_specs,
        out_specs=rows,
        check_vma=False,
    )
    def run(fused, x_b, q0_b, xyz_b, mask_b, *nbr_b):
        nb = nbr_b if nbr_b else None
        if local_b == 1:
            return fwd_rows(
                fused, x_b[0], q0_b[0], xyz_b[0], mask_b[0],
                tuple(a[0] for a in nbr_b) if nb else None)[None]
        return jax.vmap(
            lambda a, b_, c, d, *nb_: fwd_rows(
                fused, a, b_, c, d, nb_ if nb_ else None)
        )(x_b, q0_b, xyz_b, mask_b, *nbr_b)

    return jax.jit(run)
