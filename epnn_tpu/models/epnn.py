"""Electron-Passing Neural Network, TPU-native.

Architecture (capability-parity with the reference, SURVEY §2.1):

* ``T`` rounds of dense all-pairs message passing with *untied* per-round
  message MLPs and one *shared* update MLP (reference ``GNN_layer``,
  ``charge_gn.py:47-75``);
* ``T`` rounds of antisymmetric pairwise electron passing (reference
  ``EPN_layer``, ``charge_gn.py:77-119``): the round-t pass MLP is evaluated
  on both pair orderings and the transfer matrix is
  ``0.5 * (f_ij - f_ji) * pair_mask * gate`` — exactly antisymmetric, so the
  total predicted charge equals the net molecular charge by construction.

Design departures from the reference (deliberate, TPU-first):

* Inputs are **per-atom** arrays + a node mask.  The reference stores per-atom
  features tiled over an natom² plane and un-tiles them with a masked mean
  inside the model (``charge_gn.py:376-391``); that layout is an artifact of
  its loader and is handled by a compat shim, not by the model.
* Everything is a pure function of a params pytree under ``jax.jit``; rounds
  are a Python loop over *untied* parameters (T is static, so XLA unrolls and
  fuses; there is no data-dependent control flow).
* GNN messages are pairwise-masked by default (``mask_messages=True``).  The
  reference leaks padded-pair messages into real atoms (SURVEY §8 Q10);
  ``mask_messages=False`` reproduces that for golden parity.
* A decomposed "split-first-layer" path (``epnn_tpu.ops``) computes the same
  math without materializing the (N², 2F+E) pair tensor; the Flax module here
  is the readable reference implementation and the training path.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from epnn_tpu.models.config import EPNNConfig
from epnn_tpu.models.mlp import MLP


def _dtype(cfg: EPNNConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _precision(cfg: EPNNConfig):
    return jax.lax.Precision.HIGHEST if cfg.highest_precision else None


def pair_gate(e: jax.Array, tol: float) -> jax.Array:
    """The reference's is-near gate (``charge_gn.py:90-94``): a pair passes
    charge iff any RBF channel exceeds ``tol`` — i.e. it is within the
    cutoff radius (and not a padded/diagonal pair, where e == 0)."""
    clipped = jnp.clip(e, tol, 1e5)
    largest = jnp.max(clipped, axis=-1)
    return (largest != tol).astype(e.dtype)


class EPNN(nn.Module):
    """The full model: node embedding rounds + electron passing rounds.

    Call signature (all batched, N = padded atoms):
      x:         (B, N, n_elems) per-atom [Z, onehot] features
      q0:        (B, N) initial per-atom charges (Q / natoms on real atoms)
      e:         (B, N, N, e_dim) RBF edge features (0 for padded pairs)
      node_mask: (B, N) 1.0 on real atoms
      soft_env:  optional (B, N, N) cosine envelope for pass_weighting =
                 'soft_envelope'
      h0:        optional (B, N, h_dim) initial hidden state (default zeros)

    Returns per-atom charges (B, N); padded entries are exactly 0 when
    ``mask_messages=True`` and the inputs respect the padding contract.
    """

    config: EPNNConfig

    def setup(self):
        cfg = self.config
        kw: dict[str, Any] = dict(dtype=_dtype(cfg), precision=_precision(cfg))
        self.message_mlps = [
            MLP(cfg.mlp_hidden, cfg.msg_dim, name=f"message_{t}", **kw)
            for t in range(cfg.T)
        ]
        self.update_mlp = MLP(cfg.mlp_hidden, cfg.h_dim, name="update", **kw)
        self.pass_mlps = [
            MLP(cfg.mlp_hidden, 1, name=f"pass_{t}", **kw) for t in range(cfg.T)
        ]

    def __call__(
        self,
        x: jax.Array,
        q0: jax.Array,
        e: jax.Array,
        node_mask: jax.Array,
        soft_env: Optional[jax.Array] = None,
        h0: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        dt = _dtype(cfg)
        x = x.astype(dt)
        e = e.astype(dt)
        node_mask = node_mask.astype(dt)
        q = q0.astype(dt)

        b, n = x.shape[0], x.shape[1]
        h = jnp.zeros((b, n, cfg.h_dim), dt) if h0 is None else h0.astype(dt)
        pair_mask = node_mask[:, :, None] * node_mask[:, None, :]

        # --- message passing rounds (untied message MLPs, shared update) ---
        nm = node_mask[..., None]
        for t in range(cfg.T):
            pair = self._pair_features(x, h, q, e)          # (B,N,N,2F+E)
            msgs = self.message_mlps[t](pair)               # (B,N,N,msg)
            if cfg.mask_messages:
                msgs = msgs * pair_mask[..., None]
            agg = jnp.sum(msgs, axis=2)                     # Σ_j → (B,N,msg)
            upd_in = jnp.concatenate([h, agg], axis=-1) * nm
            h = self.update_mlp(upd_in) * nm

        # --- electron passing rounds (antisymmetric, charge-conserving) ---
        if cfg.pass_weighting == "soft_envelope":
            if soft_env is None:
                raise ValueError("pass_weighting='soft_envelope' needs soft_env")
            gate = soft_env.astype(dt)
        else:
            gate = pair_gate(e, cfg.is_near_tol)
        weight = gate * pair_mask

        for t in range(cfg.T):
            a = jnp.concatenate([x, h, q[..., None]], axis=-1)   # (B,N,F')
            a_i = jnp.broadcast_to(a[:, :, None, :], (b, n, n, a.shape[-1]))
            a_j = jnp.broadcast_to(a[:, None, :, :], (b, n, n, a.shape[-1]))
            f_ij = self.pass_mlps[t](jnp.concatenate([a_i, a_j, e], -1))[..., 0]
            f_ji = self.pass_mlps[t](jnp.concatenate([a_j, a_i, e], -1))[..., 0]
            transfer = 0.5 * (f_ij - f_ji) * weight
            q = q + jnp.sum(transfer, axis=2)

        return q

    def _pair_features(self, x, h, q, e) -> jax.Array:
        a = jnp.concatenate([x, h, q[..., None]], axis=-1)
        b, n, f = a.shape
        a_i = jnp.broadcast_to(a[:, :, None, :], (b, n, n, f))
        a_j = jnp.broadcast_to(a[:, None, :, :], (b, n, n, f))
        return jnp.concatenate([a_i, a_j, e], axis=-1)


def init_params(cfg: EPNNConfig, rng: jax.Array, n: int = 8):
    """Initialize a params pytree with dummy shapes."""
    model = EPNN(cfg)
    x = jnp.zeros((1, n, cfg.n_elems), jnp.float32)
    q0 = jnp.zeros((1, n), jnp.float32)
    e = jnp.zeros((1, n, n, cfg.e_dim), jnp.float32)
    mask = jnp.ones((1, n), jnp.float32)
    kwargs = {}
    if cfg.pass_weighting == "soft_envelope":
        kwargs["soft_env"] = jnp.zeros((1, n, n), jnp.float32)
    return model.init(rng, x, q0, e, mask, **kwargs)


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
