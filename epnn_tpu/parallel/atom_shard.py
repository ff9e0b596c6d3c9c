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
    prec = HIGHEST if cfg.highest_precision else None

    eye = jnp.eye(n, dtype=x.dtype)
    pairm = node_mask[:, :, None] * node_mask[:, None, :]  # diag kept (the
    # dense model's pair_mask — self-messages flow there too)
    valid = pairm * (1.0 - eye)                            # RBF diag zero

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
                            loss_name: str = "masked_mse"):
    """A jitted training step whose forward/backward runs atom-sharded:
    trains on graphs whose pair grid does not fit one device.  Params stay
    replicated (≤75K, SURVEY §2.5); gradients psum over the mesh via the
    shard_map transpose.  Returns ``step(state, x, q0, xyz, mask, y, w) ->
    (state, loss, pred, mae_sums)`` — the same contract as
    ``epnn_tpu.train.train_step``, which is what lets ``train(mesh=...)``
    dispatch big buckets here.
    """
    from epnn_tpu.ops import fuse_params
    from epnn_tpu.train import metrics as M
    from epnn_tpu.train.loop import TrainState
    import optax

    def loss_fn(params, x, q0, xyz, node_mask, y, weight):
        fused = fuse_params(params, cfg)
        pred = forward_atom_sharded_batch(fused, x, q0, xyz, node_mask,
                                          cfg, mesh)
        return M.LOSSES[loss_name](pred, y, node_mask, weight), pred

    @jax.jit
    def step(state, x, q0, xyz, node_mask, y, weight):
        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x, q0, xyz, node_mask, y, weight
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        mets = M.mae_sums(pred, y, node_mask, weight)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss, pred, mets

    return step


def make_sharded_eval_step(cfg: EPNNConfig, mesh: Mesh,
                           loss_name: str = "masked_mse"):
    """Atom-sharded eval twin of :func:`make_sharded_train_step`."""
    from epnn_tpu.ops import fuse_params
    from epnn_tpu.train import metrics as M

    @jax.jit
    def step(params, x, q0, xyz, node_mask, y, weight):
        fused = fuse_params(params, cfg)
        pred = forward_atom_sharded_batch(fused, x, q0, xyz, node_mask,
                                          cfg, mesh)
        loss = M.LOSSES[loss_name](pred, y, node_mask, weight)
        return loss, pred, M.mae_sums(pred, y, node_mask, weight)

    return step
