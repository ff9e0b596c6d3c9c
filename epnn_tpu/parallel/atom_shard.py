"""Atom-axis sharded forward: one graph spread across a device mesh.

This is the sequence-parallel analog for dense all-pairs GNNs (SURVEY §2.8):
the (N × N) pair grid is partitioned into row blocks, one per device on the
``atoms`` mesh axis.  Each device holds its atom rows' projections and
computes row-local message sums / antisymmetric transfer sums against *all*
atoms; the only cross-device data produced per round are the (N/D, h_dim)
updated hidden rows and (N/D,) charge deltas, which XLA all-gathers over ICI
(the per-atom state is KB-sized — negligible next to the O(N²/D) pair work
each device does locally).

Charge conservation survives the sharding exactly: both pair orderings of
every (i, j) are evaluated on the device that owns row i, from projections
that are bitwise-identical on the device that owns row j (replicated inputs,
same ops), so the global transfer matrix stays exactly antisymmetric.

Used for graphs whose pair work exceeds one chip (N ≫ 10⁴) and validated on
the virtual CPU mesh in tests/test_sharding.py.
"""

from __future__ import annotations

import functools
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
    HIGHEST,
)
from epnn_tpu.parallel.sharding import ATOM_AXIS


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


def forward_atom_sharded(
    fused: FusedParams,
    x: jax.Array,          # (N, n_elems) — single graph, N divisible by mesh
    q0: jax.Array,         # (N,)
    xyz: jax.Array,        # (N, 3)
    node_mask: jax.Array,  # (N,)
    cfg: EPNNConfig,
    mesh: Mesh,
) -> jax.Array:
    """Single-graph forward with the atom axis sharded over ``mesh``."""
    n = x.shape[0]
    n_dev = mesh.shape[ATOM_AXIS]
    if n % n_dev:
        raise ValueError(f"N={n} not divisible by atom axis {n_dev}")
    prec = HIGHEST if cfg.highest_precision else None

    eye = jnp.eye(n, dtype=x.dtype)
    pairm = node_mask[:, None] * node_mask[None, :]
    valid = pairm * (1.0 - eye)

    rep = P()
    rows = P(ATOM_AXIS)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rows, rows, rows, rows, rep, rep, rep),
        out_specs=rows,
        check_vma=False,
    )
    def message_rows(w, pi_rows, xyz_rows, valid_rows, pairm_rows,
                     pi_full, pj_full, xyz_full):
        return _row_sums(w, pi_rows, None, xyz_rows, valid_rows,
                         pairm_rows, pi_full, pj_full, xyz_full, cfg, prec,
                         want_transfer=False)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rows, rows, rows, rows, rep, rep, rep),
        out_specs=rows,
        check_vma=False,
    )
    def pass_rows(w, pi_rows, pj_rows, xyz_rows, valid_rows,
                  pi_full, pj_full, xyz_full):
        return _row_sums(w, pi_rows, pj_rows, xyz_rows, valid_rows,
                         None, pi_full, pj_full, xyz_full, cfg, prec,
                         want_transfer=True)

    h = jnp.zeros((n, cfg.h_dim), x.dtype)
    q = q0
    nm = node_mask[:, None]

    def atom_inputs(h, q):
        return jnp.concatenate([x, h, q[:, None]], axis=-1)

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
