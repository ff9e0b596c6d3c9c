"""Atom-axis sharded forward: graphs spread across a device mesh.

This is the sequence-parallel analog for dense all-pairs GNNs (SURVEY §2.8):
the (N × N) pair grid is partitioned into row blocks, one per device on the
``atoms`` mesh axis.  Each device holds its atom rows' projections and
computes row-local message sums / antisymmetric transfer sums against *all*
atoms; the only cross-device data produced per round are the (N/D, h_dim)
updated hidden rows and (N/D,) charge deltas, which XLA all-gathers over ICI
(the per-atom state is KB-sized — negligible next to the O(N²/D) pair work
each device does locally).

The batched entry point :func:`forward_atom_sharded_batch` composes with a
``data`` mesh axis: the molecule batch shards over ``data`` while each
graph's pair grid shards over ``atoms`` — a true 2-D (data × atoms) layout
for training/serving many big graphs at once.  Inside each shard the
per-graph row computation is a plain ``vmap`` over the local batch.

Charge conservation survives the sharding exactly: both pair orderings of
every (i, j) are evaluated on the device that owns row i, from projections
that are bitwise-identical on the device that owns row j (replicated inputs,
same ops), so the global transfer matrix stays exactly antisymmetric.

Everything here is differentiable (shard_map + psum transpose), which is
what :func:`make_sharded_train_step` uses to train on graphs whose pair
grid exceeds one chip.  Validated on the virtual CPU mesh in
tests/test_sharding.py and exercised by __graft_entry__.dryrun_multichip.

Two forward variants ship:

* :func:`forward_atom_sharded_batch` — dense-featurized row blocks,
  O(N²/D) featurized pair work per device (the memory-capacity story).
* :func:`forward_atom_sharded_nbr_batch` — the neighbor-split twin:
  O(N·k/D) featurized + O(N²/D) no-feature far-field per device, so D
  devices genuinely divide the single-chip neighbor-split latency.  This
  is what ``Predictor(mesh=...)`` dispatches big graphs to.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from epnn_tpu.models.config import EPNNConfig
from epnn_tpu.ops.fused import (
    FusedParams,
    PairMLPWeights,
    _apply_mlp,
    _rbf_block,
    _resolve_precision,
    HIGHEST,
)
from epnn_tpu.parallel.sharding import ATOM_AXIS, DATA_AXIS


def _row_sums(w: PairMLPWeights, pi_rows, pj_rows, xyz_rows,
              valid_rows, pairm_rows, pi_full, pj_full, xyz_full, cfg,
              prec, want_transfer: bool):
    """Pair-grid row-block computation shared by message and pass rounds."""
    rbf, gate = _rbf_block(xyz_rows, xyz_full, valid_rows, cfg)
    epart = jnp.dot(rbf, w.w1_e, precision=prec)
    hid_n = jax.nn.relu((pi_rows[:, None, :] + pj_full[None, :, :]) + epart + w.b1)
    if not want_transfer:
        for wm, bm in w.mids:
            hid_n = jax.nn.relu(jnp.dot(hid_n, wm, precision=prec) + bm)
        m = jnp.dot(hid_n, w.w_out, precision=prec) + w.b_out
        if cfg.mask_messages:
            m = m * pairm_rows[:, :, None]
        return jnp.sum(m, axis=1)
    hid_t = jax.nn.relu((pi_full[None, :, :] + pj_rows[:, None, :]) + epart + w.b1)
    for wm, bm in w.mids:
        hid_n = jax.nn.relu(jnp.dot(hid_n, wm, precision=prec) + bm)
        hid_t = jax.nn.relu(jnp.dot(hid_t, wm, precision=prec) + bm)
    f_n = (jnp.dot(hid_n, w.w_out, precision=prec) + w.b_out)[..., 0]
    f_t = (jnp.dot(hid_t, w.w_out, precision=prec) + w.b_out)[..., 0]
    return jnp.sum(0.5 * (f_n - f_t) * valid_rows * gate, axis=1)


def forward_atom_sharded_batch(
    fused: FusedParams,
    x: jax.Array,          # (B, N, n_elems); B % data axis == 0
    q0: jax.Array,         # (B, N);          N % atoms axis == 0
    xyz: jax.Array,        # (B, N, 3)
    node_mask: jax.Array,  # (B, N)
    cfg: EPNNConfig,
    mesh: Mesh,
) -> jax.Array:
    """Batched forward on a 2-D (data × atoms) mesh: the batch shards over
    ``data``, each graph's pair-grid rows shard over ``atoms``."""
    b, n = x.shape[:2]
    n_at = mesh.shape[ATOM_AXIS]
    n_dp = mesh.shape.get(DATA_AXIS, 1)
    if n % n_at:
        raise ValueError(f"N={n} not divisible by atoms axis {n_at}")
    if b % n_dp:
        raise ValueError(f"B={b} not divisible by data axis {n_dp}")
    return _dense_batch_program(cfg, mesh)(fused, x, q0, xyz, node_mask)


@functools.lru_cache(maxsize=None)
def _dense_batch_program(cfg: EPNNConfig, mesh: Mesh):
    """Memoized jitted program for :func:`forward_atom_sharded_batch`
    (same rationale as :func:`_nbr_batch_program`: the eager shard_map
    re-traced on every call)."""
    prec = HIGHEST if cfg.highest_precision else None

    rows = P(DATA_AXIS, ATOM_AXIS)
    full = P(DATA_AXIS)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rows, rows, rows, rows, full, full, full),
        out_specs=rows,
        check_vma=False,
    )
    def message_rows(w, pi_rows, xyz_rows, valid_rows, pairm_rows,
                     pi_full, pj_full, xyz_full):
        f = functools.partial(_row_sums, w, cfg=cfg, prec=prec,
                              want_transfer=False, pj_rows=None)
        return jax.vmap(
            lambda pir, xr, vr, pr, pif, pjf, xf: f(
                pi_rows=pir, xyz_rows=xr, valid_rows=vr, pairm_rows=pr,
                pi_full=pif, pj_full=pjf, xyz_full=xf)
        )(pi_rows, xyz_rows, valid_rows, pairm_rows, pi_full, pj_full, xyz_full)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rows, rows, rows, rows, full, full, full),
        out_specs=rows,
        check_vma=False,
    )
    def pass_rows(w, pi_rows, pj_rows, xyz_rows, valid_rows,
                  pi_full, pj_full, xyz_full):
        f = functools.partial(_row_sums, w, cfg=cfg, prec=prec,
                              want_transfer=True, pairm_rows=None)
        return jax.vmap(
            lambda pir, pjr, xr, vr, pif, pjf, xf: f(
                pi_rows=pir, pj_rows=pjr, xyz_rows=xr, valid_rows=vr,
                pi_full=pif, pj_full=pjf, xyz_full=xf)
        )(pi_rows, pj_rows, xyz_rows, valid_rows, pi_full, pj_full, xyz_full)

    def run(fused, x, q0, xyz, node_mask):
        b, n = x.shape[:2]
        eye = jnp.eye(n, dtype=x.dtype)
        pairm = node_mask[:, :, None] * node_mask[:, None, :]  # diag kept
        # (the dense model's pair_mask — self-messages flow there too)
        valid = pairm * (1.0 - eye)                            # RBF diag 0
        h = jnp.zeros((b, n, cfg.h_dim), x.dtype)
        q = q0
        nm = node_mask[:, :, None]

        def atom_inputs(h, q):
            return jnp.concatenate([x, h, q[:, :, None]], axis=-1)

        def message_round(carry, w):
            h, q = carry
            a = atom_inputs(h, q)
            pi = jnp.dot(a, w.w1_i, precision=prec)
            pj = jnp.dot(a, w.w1_j, precision=prec)
            messages = message_rows(w, pi, xyz, valid, pairm, pi, pj, xyz)
            upd_in = jnp.concatenate([h, messages], axis=-1) * nm
            h = _apply_mlp(fused.update, upd_in, prec) * nm
            return (h, q), None

        (h, q), _ = jax.lax.scan(message_round, (h, q), fused.messages)

        def pass_round(q, w):
            a = atom_inputs(h, q)
            pi = jnp.dot(a, w.w1_i, precision=prec)
            pj = jnp.dot(a, w.w1_j, precision=prec)
            dq = pass_rows(w, pi, pj, xyz, valid, pi, pj, xyz)
            return q + dq, None

        q, _ = jax.lax.scan(pass_round, q, fused.passes)
        return q * node_mask

    return jax.jit(run)


def forward_atom_sharded_nbr_batch(
    fused: FusedParams,
    x: jax.Array,          # (B, N, n_elems); B % data axis == 0
    q0: jax.Array,         # (B, N);          N % atoms axis == 0
    xyz: jax.Array,        # (B, N, 3)
    node_mask: jax.Array,  # (B, N)
    cfg: EPNNConfig,
    mesh: Mesh,
    k: int,
    use_pallas: bool = False,
    remat: bool = False,
    uniform_q0: bool = False,
    neighbors: "Optional[tuple]" = None,
    far_cluster: int = 0,
    far_cluster_grad: bool = False,
    near_row_chunk: int = 0,
    near_window: int = 0,
) -> jax.Array:
    """Neighbor-split atom-sharded forward: the multi-chip twin of
    :func:`epnn_tpu.ops.fused._forward_single_nbr`.

    ``near_row_chunk`` (static) — huge-N memory/gather mode, the sharded
    twin of ``forward_blocked(near_row_chunk=...)``: each device runs its
    R = N/D rows' (R, k, ·) near-field activations in ``lax.map`` chunks
    of this many rows, recomputing RBF/gate per chunk, so only the (R, k)
    selection tables stay resident per device.  Chunk boundaries fall at
    multiples of the chunk WITHIN each device's row block, so a safe
    ``near_window`` is the max over per-device row slices of
    :func:`epnn_tpu.ops.fused.neighbor_window_width` at this
    ``row_chunk`` (what ``Predictor._near_window_sharded`` computes).

    ``near_window`` (static, requires ``near_row_chunk``) — windowed
    gathers (the r11 568k lever, per device): each chunk's j-side rows
    are gathered through a ``(near_window, width)`` dynamic-slice window
    of the GLOBAL (N, ·) projection table, keeping every gathered table
    under the v5e ~56 MB staging cliff.  Requires spatially sorted atoms
    (cell-key order); out-of-window pairs are mask-dropped
    deterministically, so an undersized window shows up as a
    conservation error, never as garbage.

    ``neighbors`` — optional precomputed ``(idx, nbr_mask, d2)`` batch
    tables, each (B, N, k) with global column indices (the
    :func:`epnn_tpu.ops.fused.build_neighbors_batch` /
    ``refresh_neighbor_d2`` contract, same as ``forward_blocked``'s
    ``neighbors=``): serving/MD loops skip the per-call in-forward
    selection; the tables shard over (data, atoms) so each device gets
    exactly its rows.  Same candidate sets as in-forward selection (top_k
    is per row); d² can differ in the last ulp across the two scoring
    shapes, so outputs agree to fp noise rather than bitwise.

    ``uniform_q0`` (static) — caller asserts the pad_molecules round-1
    collapse contract (:func:`epnn_tpu.data.dataset.uniform_q0_contract`);
    round 1's O(N²/D) far-field reduction then collapses to the
    count-weighted per-element grid exactly as on one chip (the grid and
    counts are built from the replicated x/jvec, so every device still
    sees bitwise-identical j-side values — the antisymmetry argument is
    unchanged).

    ``far_cluster`` (static) — opt-in APPROXIMATE serving tier, the
    multi-chip twin of ``forward_blocked(far_cluster=C)``: each h≠0
    message round's O(N²/D) far-field reduction is quantized to C
    weighted k-means centroids of the pj rows (``ops/cluster.py``).  The
    k-means runs REPLICATED on the all-gathered pj rows — it is
    deterministic, so every device computes bitwise-identical centroids —
    and each device then evaluates only its R grid rows: O(N·C) fit +
    O(R·C) evaluation per round.  Near corrections and all
    electron-passing rounds stay exact, so conservation is untouched;
    only h carries the approximation (the same error bound as the
    single-chip tier).  Measured 3.1× at 17,760 atoms single-chip with
    max|dq| exactly 0.0 for the trained reference checkpoints.

    The dense-featurized :func:`forward_atom_sharded_batch` does O(N²/D)
    featurized pair work per device — at spatially sparse sizes that LOSES
    to one chip running the neighbor split (149 ms single-chip vs a
    ~dense-path-shaped cost sharded by D).  This variant keeps the
    neighbor-split structure per shard: each device owns N/D pair-grid
    rows and does O(N·k/D) featurized work plus the O(N²/D) no-feature
    far-field reduction (optionally the packed Pallas kernel, which is
    rectangular-aware), so D devices genuinely divide the single-chip
    latency.

    Per-round cross-device traffic is one all-gather of the updated
    (N/D, h_dim) hidden rows / (N/D,) charges over ICI — KB-scale.
    Projections are recomputed replicated from the gathered state
    (O(N·F·H) — negligible), which keeps every pair's two orderings
    evaluated from bitwise-identical values on every device: the global
    transfer matrix stays exactly antisymmetric and conservation is
    unaffected by the sharding.

    ``k`` must honor the :func:`epnn_tpu.ops.fused.build_neighbors`
    contract (≥ the true max within-cutoff neighbor count).
    """
    b, n = x.shape[:2]
    n_at = mesh.shape[ATOM_AXIS]
    n_dp = mesh.shape.get(DATA_AXIS, 1)
    if n % n_at:
        raise ValueError(f"N={n} not divisible by atoms axis {n_at}")
    if b % n_dp:
        raise ValueError(f"B={b} not divisible by data axis {n_dp}")
    r = n // n_at
    if near_window and not near_row_chunk:
        raise ValueError("near_window requires near_row_chunk (windowed "
                         "gathers ride the chunked near path)")
    if cfg.compute_dtype == "bfloat16":
        # Same dtype policy as forward_blocked's bfloat16 branch
        # (ops/fused.py): message/update pipeline in bf16, electron-passing
        # weights STAY f32 (XLA:TPU bf16 fusion rounds the f_ij/f_ji graphs
        # differently, breaking bitwise antisymmetry — hardware-verified),
        # q0/coordinates/result f32.  Sharding is orthogonal: every device
        # computes projections from the same gathered state, so the
        # antisymmetry argument is unchanged by the bf16 cast.
        bf = jnp.bfloat16
        fused = FusedParams(
            messages=jax.tree_util.tree_map(lambda a: a.astype(bf),
                                            fused.messages),
            passes=fused.passes,
            update=jax.tree_util.tree_map(lambda a: a.astype(bf),
                                          fused.update),
        )
        out = forward_atom_sharded_nbr_batch(
            fused, x.astype(bf), q0, xyz, node_mask.astype(bf),
            cfg.replace(compute_dtype="float32", matmul_precision="default",
                        highest_precision=False),
            mesh, k=k, use_pallas=False, remat=remat, uniform_q0=uniform_q0,
            neighbors=neighbors, far_cluster=far_cluster,
            far_cluster_grad=far_cluster_grad,
            near_row_chunk=near_row_chunk, near_window=near_window,
        )
        return out.astype(jnp.float32) * node_mask

    # the compiled program depends only on statics — memoize it so
    # repeated serving calls (and repeated Predictor instances) reuse ONE
    # jitted executable instead of re-tracing the shard_map every call
    run = _nbr_batch_program(
        cfg, mesh, k, use_pallas, remat, uniform_q0, far_cluster, b, n,
        0 if neighbors is None else len(neighbors),
        int(os.environ.get("EPNN_FAR_CLUSTER_ITERS", "8")),
        far_cluster_grad, near_row_chunk, near_window)
    args = (fused, x, q0, xyz, node_mask)
    if neighbors is not None:
        args = args + tuple(neighbors)
    return run(*args)


@functools.lru_cache(maxsize=None)
def _nbr_batch_program(cfg: EPNNConfig, mesh: Mesh, k: int,
                       use_pallas: bool, remat: bool, uniform_q0: bool,
                       far_cluster: int, b: int, n: int, n_nbr: int,
                       far_iters: int, far_cluster_grad: bool = False,
                       near_row_chunk: int = 0, near_window: int = 0):
    """Build + jit the :func:`forward_atom_sharded_nbr_batch` program for
    one static configuration (cfg/mesh/shapes/flags are all hashable).
    Without this memo every call re-traced the shard_map and recompiled —
    ~15 s per serving call on the CPU test mesh."""
    n_at = mesh.shape[ATOM_AXIS]
    n_dp = mesh.shape.get(DATA_AXIS, 1)
    r = n // n_at
    prec = _resolve_precision(cfg)
    dense_name = getattr(cfg, "dense_matmul_precision", "")
    if dense_name == "bf16x3":
        prec_dense = "bf16x3"
    elif dense_name == "int8":
        prec_dense = None  # int8 lives in the kernel; fallback = default
    elif dense_name:
        prec_dense = {"default": None, "high": jax.lax.Precision.HIGH,
                      "highest": jax.lax.Precision.HIGHEST}[dense_name]
    else:
        prec_dense = prec
    # the packed Pallas kernel is a plain-f32 dot — the bf16x3 split-float
    # tier runs through the XLA fallback (same dispatch as forward_blocked)
    pallas_ok = use_pallas and prec_dense != "bf16x3"
    mid_dtype = "int8" if dense_name == "int8" else "float32"
    prec_name = ("default" if dense_name == "int8" else dense_name) or \
        getattr(cfg, "matmul_precision", "") or (
        "highest" if cfg.highest_precision else "default")

    def fwd_rows(fused, x_f, q0_f, xyz_f, mask_f, nbr_rows=None):
        """One graph on one device: my R pair-grid rows vs all N atoms.

        ``nbr_rows`` — optional precomputed (idx, nbr_mask, d2) slices for
        MY rows, each (R, k) with GLOBAL column indices (the caller shards
        a full (N, k) table over the atoms axis — serving/MD reuse,
        mirroring forward_blocked's ``neighbors=``); same candidate sets
        as the in-forward selection (top_k is per row), d² to the ulp."""
        r0 = jax.lax.axis_index(ATOM_AXIS) * r
        xyz_rows = jax.lax.dynamic_slice_in_dim(xyz_f, r0, r, 0)
        mask_rows = jax.lax.dynamic_slice_in_dim(mask_f, r0, r, 0)

        # neighbor selection for my rows — the SHARED selection helper
        # (build_neighbors uses the same one), offset by the shard's row
        # origin.  The (R, N) distance slice is the blockwise-memory shape
        # (R = N/D), so no extra blocking is needed here; the returned d²
        # (free from the top_k scores) skips the coordinate gather and the
        # distance recomputation in featurization.
        from epnn_tpu.ops.fused import block_neighbor_select, rbf_and_gate

        if nbr_rows is None:
            idx, nbr_mask, d2_nbr = block_neighbor_select(
                xyz_f, mask_f, r0, xyz_rows, mask_rows, cfg.cutoff, k,
                with_d2=True)
        elif len(nbr_rows) == 3:
            idx, nbr_mask, d2_nbr = nbr_rows
        else:
            # 2-tuple (idx, mask): Verlet-skin serving — gather d² from
            # the CURRENT coordinates in-graph (no host d² round-trip)
            idx, nbr_mask = nbr_rows
            d2_nbr = jnp.sum(
                (xyz_rows[:, None, :] - xyz_f[idx]) ** 2, axis=-1)
        nbr_mask = nbr_mask.astype(x_f.dtype)
        if near_row_chunk:
            # huge-N chunked near path (the sharded twin of
            # ops/fused.py's near_row_chunk): only the (R, k) selection
            # tables stay resident; RBF/gate and the gathered MLP chains
            # run per chunk inside the rounds.  Chunk operands built once.
            rck = -(-r // near_row_chunk) * near_row_chunk
            _nch = rck // near_row_chunk

            def _crs(a, fill=0):
                ap = jnp.pad(
                    a, [(0, rck - r)] + [(0, 0)] * (a.ndim - 1),
                    constant_values=fill)
                return ap.reshape(_nch, near_row_chunk, *a.shape[1:])

            idx_ck = _crs(idx)
            mask_ck = _crs(nbr_mask)
            aux_ck = _crs(d2_nbr)  # d² plane exists in every branch above
            rbf_nbr = gate_nbr = None

            # windowed-gather metadata: per-chunk window start = min VALID
            # neighbor index (global), clipped so the static-width slice
            # of the global (N, ·) tables stays in bounds
            nwin = near_window if 0 < near_window < n else 0
            if nwin:
                idx_valid = jnp.where(mask_ck > 0, idx_ck, jnp.int32(n - 1))
                win_starts = jnp.clip(
                    jnp.min(idx_valid.reshape(_nch, -1), axis=1),
                    0, n - nwin).astype(jnp.int32)
            else:
                win_starts = jnp.zeros((_nch,), jnp.int32)

            def _wgather(tbl, idx_c, mask_c, start_c):
                """tbl[idx_c] through a (nwin, width) dynamic-slice window
                of the GLOBAL table — bitwise-identical values at the
                sub-cliff gather rate; out-of-window rows mask-dropped."""
                if not nwin:
                    return tbl[idx_c], mask_c
                win = jax.lax.dynamic_slice(
                    tbl, (start_c, jnp.int32(0)), (nwin, tbl.shape[1]))
                rel = idx_c - start_c
                ok = (rel >= 0) & (rel < nwin)
                rel = jnp.clip(rel, 0, nwin - 1)
                return win[rel], mask_c * ok.astype(mask_c.dtype)
        else:
            rbf_nbr, gate_nbr = rbf_and_gate(d2_nbr, nbr_mask, cfg,
                                             dtype=x_f.dtype)
            gate_nbr = gate_nbr * nbr_mask

        if cfg.mask_messages:
            msg_count = mask_rows * jnp.sum(mask_f)
            jvec = mask_f
        else:
            msg_count = jnp.full((r,), float(n), x_f.dtype)
            jvec = jnp.ones((n,), x_f.dtype)

        if pallas_ok:
            from epnn_tpu.ops.pallas_kernels import (
                dense_message_pad, dense_message_rowsum)

            h1 = int(fused.messages.b1.shape[-1])
            bi, bjp = (128, 64) if r >= 128 else (8, 8)
            r_pad = int(-(-r // bi) * bi)
            lcm = dense_message_pad(bi, bjp, h1)
            n_pad = int(-(-n // lcm) * lcm)
            col_vec = jnp.pad(jvec, (0, n_pad - n))

        def dense_nofeat(pi_rows, pj_f, w):
            """Far-field Σ_j over ALL atoms of the no-feature pair MLP."""
            if pallas_ok and len(w.mids) == 1:
                (w2, b2), = w.mids
                return dense_message_rowsum(
                    jnp.pad(pi_rows, ((0, r_pad - r), (0, 0))),
                    jnp.pad(pj_f, ((0, n_pad - n), (0, 0))),
                    col_vec, w2, b2, block_i=bi, block_jp=bjp,
                    precision=prec_name, mid_dtype=mid_dtype)[:r]

            blk = min(256, r)
            rp = int(-(-r // blk) * blk)
            blocks = jnp.pad(pi_rows, ((0, rp - r), (0, 0))).reshape(
                rp // blk, blk, -1)

            def dscan(c2, pi_i):
                hid = jax.nn.relu(pi_i[:, None, :] + pj_f[None, :, :])
                if prec_dense == "bf16x3":
                    from epnn_tpu.ops.fused import _split_dot

                    for wm, bm in w.mids:
                        hid = jax.nn.relu(_split_dot(hid, wm) + bm)
                    return c2, _split_dot(jvec, hid,
                                          dims=(((0,), (1,)), ((), ())))
                for wm, bm in w.mids:
                    hid = jax.nn.relu(
                        jnp.dot(hid, wm, precision=prec_dense) + bm)
                return c2, jnp.einsum("n,bnh->bh", jvec, hid,
                                      precision=prec_dense)

            _, out = jax.lax.scan(dscan, None, blocks)
            return out.reshape(rp, -1)[:r]

        def dense_clustered(pi_rows, pj_f, w: PairMLPWeights):
            """Clustered far-field tier (see the function docstring): fit
            replicated on the gathered pj rows, evaluate my R rows only.
            The count weighting runs f32 HIGHEST exactly like the round-1
            grid (cluster weights are sums of mask values — integers that
            default-precision dots would round through bf16)."""
            from epnn_tpu.ops.cluster import weighted_kmeans

            cent, wts, _ = weighted_kmeans(pj_f, jvec, far_cluster,
                                           iters=far_iters,
                                           differentiable=far_cluster_grad)
            if pallas_ok and len(w.mids) == 1:
                (w2, b2), = w.mids
                # packed-row contract of dense_message_rowsum (same padding
                # as the single-chip clustered branch in ops/fused.py)
                packc = max(1, 128 // h1) if 128 % h1 == 0 else 1
                npr = -(-far_cluster // packc)
                npr_p = npr if npr <= 64 else int(-(-npr // 64) * 64)
                cpad = npr_p * packc
                cent_p = jnp.pad(cent, ((0, cpad - far_cluster), (0, 0)))
                wts_p = jnp.pad(wts, (0, cpad - far_cluster))
                return dense_message_rowsum(
                    jnp.pad(pi_rows, ((0, r_pad - r), (0, 0))),
                    cent_p.astype(pi_rows.dtype), wts_p, w2, b2,
                    block_i=bi, block_jp=min(64, npr_p),
                    precision=prec_name, mid_dtype=mid_dtype)[:r]
            hid = jax.nn.relu(pi_rows[:, None, :]
                              + cent.astype(x_f.dtype)[None, :, :])
            for wm, bm in w.mids:
                hid = jax.nn.relu(jnp.dot(hid, wm, precision=prec) + bm)
            return jnp.einsum(
                "c,rch->rh", wts, hid.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST).astype(x_f.dtype)

        h_f = jnp.zeros((n, cfg.h_dim), x_f.dtype)
        q_f = q0_f

        def atom_inputs(h, q):
            return jnp.concatenate([x_f, h, q[:, None].astype(x_f.dtype)],
                                   axis=-1)

        def dense_round1_grid(pi_rows, q_f, w: PairMLPWeights):
            """uniform_q0 round-1 collapse (mirrors ops/fused.py): the
            j-side input rows are per-element constants, so the O(N²/D)
            far-field sum becomes a count-weighted (E+1)-row grid reduce.
            Counts/reduce in f32 HIGHEST so integer counts never round."""
            oh = x_f[:, 1:]                                     # (N, E)
            e_cnt = oh.shape[1]
            zvec = jnp.max(x_f[:, :1] * oh, axis=0)             # (E,)
            grid_in = jnp.concatenate([
                zvec[:, None],
                jnp.eye(e_cnt, dtype=x_f.dtype),
                jnp.zeros((e_cnt, cfg.h_dim), x_f.dtype),
                jnp.full((e_cnt, 1), q_f[0].astype(x_f.dtype)),
            ], axis=1)
            grid_in = jnp.concatenate(
                [grid_in, jnp.zeros((1, grid_in.shape[1]), x_f.dtype)],
                axis=0)
            pj_grid = jnp.dot(grid_in, w.w1_j, precision=prec)
            jvec32 = jvec.astype(jnp.float32)
            counts = jnp.einsum("n,ne->e", jvec32, oh.astype(jnp.float32),
                                precision=jax.lax.Precision.HIGHEST)
            counts = jnp.concatenate(
                [counts, (jnp.sum(jvec32) - jnp.sum(counts))[None]])
            hid = jax.nn.relu(pi_rows[:, None, :] + pj_grid[None, :, :])
            for wm, bm in w.mids:
                hid = jax.nn.relu(jnp.dot(hid, wm, precision=prec) + bm)
            return jnp.einsum(
                "e,reh->rh", counts, hid.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST).astype(x_f.dtype)

        def _message_round(carry, w: PairMLPWeights, collapse: bool):
            h_f, q_f = carry
            a = atom_inputs(h_f, q_f)
            pi_f = jnp.dot(a, w.w1_i, precision=prec) + w.b1
            pj_f = jnp.dot(a, w.w1_j, precision=prec)
            pi_rows = jax.lax.dynamic_slice_in_dim(pi_f, r0, r, 0)

            if collapse:
                dense_sum = dense_round1_grid(pi_rows, q_f, w)
            elif far_cluster > 0:
                dense_sum = dense_clustered(pi_rows, pj_f, w)
            else:
                dense_sum = dense_nofeat(pi_rows, pj_f, w)
            if near_row_chunk:
                def _near_chunk(ops_c):
                    pi_c, idx_c, mask_c, aux_c, start_c = ops_c
                    rbf_c, _ = rbf_and_gate(aux_c, mask_c, cfg,
                                            dtype=x_f.dtype)
                    pj_nbr, mask_c = _wgather(pj_f, idx_c, mask_c, start_c)
                    epart = jnp.dot(rbf_c, w.w1_e, precision=prec)
                    base = pi_c[:, None, :] + pj_nbr
                    hid_full = jax.nn.relu(base + epart)
                    hid_nofeat = jax.nn.relu(base)
                    for wm, bm in w.mids:
                        hid_full = jax.nn.relu(
                            jnp.dot(hid_full, wm, precision=prec) + bm)
                        hid_nofeat = jax.nn.relu(
                            jnp.dot(hid_nofeat, wm, precision=prec) + bm)
                    return jnp.sum(
                        (hid_full - hid_nofeat) * mask_c[:, :, None], axis=1)

                # under remat, checkpoint the chunk BODY (lax.map's scan
                # linearization otherwise keeps every chunk's residuals
                # alive at once — see ops/fused.py's note)
                _near_body = jax.checkpoint(_near_chunk) if remat \
                    else _near_chunk
                near = jax.lax.map(
                    _near_body,
                    (_crs(pi_rows), idx_ck, mask_ck, aux_ck, win_starts)
                ).reshape(rck, -1)[:r]
            else:
                pj_nbr = pj_f[idx]
                epart = jnp.dot(rbf_nbr, w.w1_e, precision=prec)
                base = pi_rows[:, None, :] + pj_nbr
                hid_full = jax.nn.relu(base + epart)
                hid_nofeat = jax.nn.relu(base)
                for wm, bm in w.mids:
                    hid_full = jax.nn.relu(
                        jnp.dot(hid_full, wm, precision=prec) + bm)
                    hid_nofeat = jax.nn.relu(
                        jnp.dot(hid_nofeat, wm, precision=prec) + bm)
                near = jnp.sum(
                    (hid_full - hid_nofeat) * nbr_mask[:, :, None], axis=1)
            messages = (jnp.dot(dense_sum + near, w.w_out, precision=prec)
                        + msg_count[:, None] * w.b_out)
            h_rows = jax.lax.dynamic_slice_in_dim(h_f, r0, r, 0)
            upd = jnp.concatenate([h_rows, messages], -1) * mask_rows[:, None]
            h_rows = _apply_mlp(fused.update, upd, prec) * mask_rows[:, None]
            h_f = jax.lax.all_gather(h_rows, ATOM_AXIS, tiled=True)
            return (h_f, q_f), None

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
            carry, _ = round1((h_f, q_f), w_first)
            (h_f, q_f), _ = jax.lax.scan(message_round, carry, w_rest)
        else:
            (h_f, q_f), _ = jax.lax.scan(message_round, (h_f, q_f),
                                         fused.messages)

        def pass_round(q_f, w: PairMLPWeights):
            a = atom_inputs(h_f, q_f).astype(w.w1_i.dtype)
            pi_f = jnp.dot(a, w.w1_i, precision=prec) + w.b1
            pj_f = jnp.dot(a, w.w1_j, precision=prec)
            pi_rows = jax.lax.dynamic_slice_in_dim(pi_f, r0, r, 0)
            pj_rows = jax.lax.dynamic_slice_in_dim(pj_f, r0, r, 0)
            h1 = pi_f.shape[-1]
            if near_row_chunk:
                pp = jnp.concatenate([pi_f, pj_f], -1)

                def _pass_chunk(ops_c):
                    pi_c, pj_c, idx_c, mask_c, aux_c, start_c = ops_c
                    rbf_c, gate_c = rbf_and_gate(aux_c, mask_c, cfg,
                                                 dtype=x_f.dtype)
                    pp_c, mask_c = _wgather(pp, idx_c, mask_c, start_c)
                    gate_c = gate_c * mask_c
                    pi_nbr, pj_nbr = pp_c[..., :h1], pp_c[..., h1:]
                    epart = jnp.dot(rbf_c.astype(w.w1_e.dtype), w.w1_e,
                                    precision=prec)
                    hid_n = jax.nn.relu((pi_c[:, None, :] + pj_nbr) + epart)
                    hid_t = jax.nn.relu((pi_nbr + pj_c[:, None, :]) + epart)
                    for wm, bm in w.mids:
                        hid_n = jax.nn.relu(
                            jnp.dot(hid_n, wm, precision=prec) + bm)
                        hid_t = jax.nn.relu(
                            jnp.dot(hid_t, wm, precision=prec) + bm)
                    # both orderings read the same full-width pp rows, so
                    # pairwise antisymmetry stays bitwise under chunking
                    diff = (hid_n - hid_t).astype(jnp.float32)
                    gate32 = gate_c.astype(jnp.float32)
                    return jnp.sum(0.5 * gate32[:, :, None] * diff, axis=1)

                _pass_body = jax.checkpoint(_pass_chunk) if remat \
                    else _pass_chunk
                dsum = jax.lax.map(
                    _pass_body,
                    (_crs(pi_rows), _crs(pj_rows), idx_ck, mask_ck,
                     aux_ck, win_starts)
                ).reshape(rck, -1)[:r]
            else:
                pp_nbr = jnp.concatenate([pi_f, pj_f], -1)[idx]  # one gather
                pi_nbr, pj_nbr = pp_nbr[..., :h1], pp_nbr[..., h1:]
                epart = jnp.dot(rbf_nbr.astype(w.w1_e.dtype), w.w1_e,
                                precision=prec)
                hid_n = jax.nn.relu((pi_rows[:, None, :] + pj_nbr) + epart)
                hid_t = jax.nn.relu((pi_nbr + pj_rows[:, None, :]) + epart)
                for wm, bm in w.mids:
                    hid_n = jax.nn.relu(
                        jnp.dot(hid_n, wm, precision=prec) + bm)
                    hid_t = jax.nn.relu(
                        jnp.dot(hid_t, wm, precision=prec) + bm)
                diff = (hid_n - hid_t).astype(jnp.float32)
                dsum = jnp.sum(
                    0.5 * gate_nbr.astype(jnp.float32)[:, :, None] * diff, 1)
            dq = jnp.dot(dsum, w.w_out.astype(jnp.float32),
                         precision=prec)[:, 0]
            q_rows = jax.lax.dynamic_slice_in_dim(q_f, r0, r, 0) + dq
            return jax.lax.all_gather(q_rows, ATOM_AXIS, tiled=True), None

        if remat:
            pass_round = jax.checkpoint(pass_round)
        q_f, _ = jax.lax.scan(pass_round, q_f, fused.passes)
        q_rows = jax.lax.dynamic_slice_in_dim(q_f, r0, r, 0)
        return q_rows * mask_rows

    rows = P(DATA_AXIS, ATOM_AXIS)
    full = P(DATA_AXIS)

    local_b = b // n_dp
    rep = P()

    # precomputed (B, N, k) neighbor tables shard over (data, atoms): each
    # device receives exactly its rows' slices (global column indices);
    # a 2-tuple (idx, mask) additionally makes fwd_rows gather d² from
    # the current coordinates in-graph (Verlet-skin serving)
    nbr_specs = (rows,) * n_nbr

    @functools.partial(
        shard_map, mesh=mesh,
        # fused rides as an explicit replicated operand: a closure capture
        # would carry Auto-mesh sharding annotations that jax.checkpoint
        # re-materializes inside the Manual (shard_map) context — a
        # mesh-type mismatch error under the remat'd backward
        in_specs=(rep, full, full, full, full) + nbr_specs, out_specs=rows,
        check_vma=False,
    )
    def run(fused, x_b, q0_b, xyz_b, mask_b, *nbr_b):
        nb = nbr_b if nbr_b else None
        if local_b == 1:
            # vmapped top_k is the documented ~9× TPU pathology — skip the
            # batch dim entirely for the common one-graph-per-data-shard case
            return fwd_rows(
                fused, x_b[0], q0_b[0], xyz_b[0], mask_b[0],
                None if nb is None else tuple(a[0] for a in nb))[None]
        if nb is None:
            return jax.vmap(
                lambda a, b_, c, d: fwd_rows(fused, a, b_, c, d)
            )(x_b, q0_b, xyz_b, mask_b)
        return jax.vmap(
            lambda a, b_, c, d, *nbr: fwd_rows(fused, a, b_, c, d, nbr)
        )(x_b, q0_b, xyz_b, mask_b, *nb)

    return jax.jit(run)


def forward_atom_sharded(
    fused: FusedParams,
    x: jax.Array,          # (N, n_elems) — single graph, N divisible by mesh
    q0: jax.Array,         # (N,)
    xyz: jax.Array,        # (N, 3)
    node_mask: jax.Array,  # (N,)
    cfg: EPNNConfig,
    mesh: Mesh,
) -> jax.Array:
    """Single-graph forward with the atom axis sharded over ``mesh`` (the
    mesh's ``data`` axis, if present, must have size 1)."""
    return forward_atom_sharded_batch(
        fused, x[None], q0[None], xyz[None], node_mask[None], cfg, mesh
    )[0]


def make_sharded_train_step(cfg: EPNNConfig, opt, mesh: Mesh,
                            loss_name: str = "masked_mse",
                            neighbor_k: Optional[int] = None,
                            use_pallas: bool = False,
                            shard_mode: str = "atom",
                            uniform_q0: bool = False,
                            far_cluster: int = 0,
                            far_cluster_grad: bool = False,
                            remat: bool = True,
                            near_row_chunk: int = 0,
                            near_window: int = 0):
    """A jitted training step whose forward/backward runs atom-sharded:
    trains on graphs whose pair grid does not fit one device.  Params stay
    replicated (≤75K, SURVEY §2.5); gradients psum over the mesh via the
    shard_map transpose.  Returns ``step(state, x, q0, xyz, mask, y, w) ->
    (state, loss, pred, mae_sums)`` — the same contract as
    ``epnn_tpu.train.train_step``, which is what lets ``train(mesh=...)``
    dispatch big buckets here.

    ``neighbor_k`` switches the forward/backward to the neighbor-split
    sharded variant (O(N·k/D) featurized per device, remat'd rounds) —
    what big-graph buckets should use; ``None`` keeps the dense-featurized
    form (small pads, no k contract needed).

    ``shard_mode='ring'`` (requires ``neighbor_k``) trains through the
    neighbor-split RING forward instead (nothing replicated, blocks
    circulate via ppermute; ``epnn_tpu.parallel.ring_shard``) — for graphs
    whose per-atom state itself exceeds one chip; gradients flow through
    the ppermute scans (their transpose is the reverse ring).

    ``far_cluster`` (requires ``neighbor_k``) — opt-in APPROXIMATE
    clustered far-field tier for the training step (the sharded twin of
    ``TrainConfig.far_cluster``): forward error carries the usual
    Lipschitz×radius bound.  ``far_cluster_grad=True`` makes the final
    centroids differentiable under the stop-gradient assignment — the
    step optimizes the true gradient of the clustered forward
    (``ops/cluster.py``); False (default here, matching
    ``train_step_fused``; ``TrainConfig.far_cluster_grad`` defaults True
    and drives both) drops the far-field ∂/∂pj path entirely (fit fully
    stop-gradient — the far field frozen per step).  Big-graph
    fine-tuning accelerator; eval twins stay exact.

    ``remat`` — rematerialize rounds in the backward (True keeps the
    historical behavior; ``TrainConfig.remat`` defaults False after the
    r9 measurement: no-remat is faster at every size tried because the
    far-field kernel's custom VJP already recomputes in-tile).

    ``near_row_chunk`` / ``near_window`` (atom mode, requires
    ``neighbor_k``) — huge-N training on the mesh: each device's near
    activations run in chunk-body-checkpointed ``lax.map`` chunks (peak
    backward residual = one chunk per device) with optionally windowed
    global-table gathers; the sharded twin of
    ``TrainConfig.near_row_chunk`` / ``near_window``.  Chunking requires
    ``remat=True`` (without it lax.map's scan linearization keeps every
    chunk's residuals alive — the footprint the chunking exists to
    avoid).
    """
    from epnn_tpu.ops import fuse_params
    from epnn_tpu.train import metrics as M
    from epnn_tpu.train.loop import TrainState
    import optax

    if shard_mode == "ring" and neighbor_k is None:
        raise ValueError("shard_mode='ring' requires neighbor_k")
    if far_cluster and neighbor_k is None:
        raise ValueError("far_cluster requires neighbor_k")
    if near_row_chunk and neighbor_k is None:
        raise ValueError("near_row_chunk requires neighbor_k")
    if near_row_chunk and shard_mode == "ring":
        raise ValueError("near_row_chunk applies to the atom-sharded "
                         "neighbor-split step only (ring circulates "
                         "blocks already)")
    if near_row_chunk and not remat:
        raise ValueError("near_row_chunk training requires remat=True "
                         "(the chunk body is checkpointed so the backward "
                         "recomputes chunk-by-chunk)")
    if near_window and not near_row_chunk:
        raise ValueError("near_window requires near_row_chunk")

    def loss_fn(params, x, q0, xyz, node_mask, y, weight, neighbors=None):
        fused = fuse_params(params, cfg)
        if shard_mode == "ring":
            from epnn_tpu.parallel.ring_shard import (
                forward_ring_sharded_nbr_batch)

            pred = forward_ring_sharded_nbr_batch(
                fused, x, q0, xyz, node_mask, cfg, mesh, k_blk=neighbor_k,
                use_pallas=use_pallas, remat=remat, uniform_q0=uniform_q0,
                neighbors=neighbors,
                far_cluster=far_cluster, far_cluster_grad=far_cluster_grad)
        elif neighbor_k is not None:
            pred = forward_atom_sharded_nbr_batch(
                fused, x, q0, xyz, node_mask, cfg, mesh, k=neighbor_k,
                use_pallas=use_pallas, remat=remat, uniform_q0=uniform_q0,
                neighbors=neighbors,
                far_cluster=far_cluster, far_cluster_grad=far_cluster_grad,
                near_row_chunk=near_row_chunk, near_window=near_window)
        else:
            if neighbors is not None:
                raise ValueError("precomputed neighbors require neighbor_k")
            pred = forward_atom_sharded_batch(fused, x, q0, xyz, node_mask,
                                              cfg, mesh)
        return M.LOSSES[loss_name](pred, y, node_mask, weight), pred

    @jax.jit
    def step(state, x, q0, xyz, node_mask, y, weight, neighbors=None):
        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x, q0, xyz, node_mask, y, weight, neighbors
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        mets = M.mae_sums(pred, y, node_mask, weight)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss, pred, mets

    return step


def make_sharded_eval_step(cfg: EPNNConfig, mesh: Mesh,
                           loss_name: str = "masked_mse",
                           neighbor_k: Optional[int] = None,
                           use_pallas: bool = False,
                           shard_mode: str = "atom",
                           uniform_q0: bool = False,
                           near_row_chunk: int = 0,
                           near_window: int = 0):
    """Atom-sharded eval twin of :func:`make_sharded_train_step` (the
    chunk/window levers need no remat here — no backward)."""
    from epnn_tpu.ops import fuse_params
    from epnn_tpu.train import metrics as M

    if shard_mode == "ring" and neighbor_k is None:
        raise ValueError("shard_mode='ring' requires neighbor_k")
    if near_row_chunk and neighbor_k is None:
        raise ValueError("near_row_chunk requires neighbor_k")
    if near_window and not near_row_chunk:
        raise ValueError("near_window requires near_row_chunk")

    @jax.jit
    def step(params, x, q0, xyz, node_mask, y, weight, neighbors=None):
        fused = fuse_params(params, cfg)
        if shard_mode == "ring":
            from epnn_tpu.parallel.ring_shard import (
                forward_ring_sharded_nbr_batch)

            pred = forward_ring_sharded_nbr_batch(
                fused, x, q0, xyz, node_mask, cfg, mesh, k_blk=neighbor_k,
                use_pallas=use_pallas, uniform_q0=uniform_q0,
                neighbors=neighbors)
        elif neighbor_k is not None:
            pred = forward_atom_sharded_nbr_batch(
                fused, x, q0, xyz, node_mask, cfg, mesh, k=neighbor_k,
                use_pallas=use_pallas, uniform_q0=uniform_q0,
                neighbors=neighbors,
                near_row_chunk=near_row_chunk, near_window=near_window)
        else:
            if neighbors is not None:
                raise ValueError("precomputed neighbors require neighbor_k")
            pred = forward_atom_sharded_batch(fused, x, q0, xyz, node_mask,
                                              cfg, mesh)
        loss = M.LOSSES[loss_name](pred, y, node_mask, weight)
        return loss, pred, M.mae_sums(pred, y, node_mask, weight)

    return step
