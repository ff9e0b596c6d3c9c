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
    rbf_and_gate,
)
from epnn_tpu.parallel.sharding import ATOM_AXIS


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
    nd = n // n_dev
    prec = _resolve_precision(cfg)
    dt = x.dtype

    rows = P(ATOM_AXIS)
    rep = P()

    gidx = jnp.arange(n, dtype=jnp.int32)

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

    return fwd(fused, x, q0, xyz, node_mask, gidx)
