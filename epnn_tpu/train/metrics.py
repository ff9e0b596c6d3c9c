"""Loss functions and masked metrics.

The reference's loss/metrics include padded atoms (``charge_gn.py:397``,
SURVEY §8 Q7), understating MAE by the padding ratio (0.00768 e padded vs
0.01513 e masked on the shipped val artifacts).  Masked variants are the
primary numbers here; padded variants are kept for apples-to-apples
comparison with the reference's printouts.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mse(pred: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray,
               sample_weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean over real atoms of squared error, averaged over molecules."""
    se = (pred - y) ** 2 * mask
    per_mol = se.sum(-1) / jnp.maximum(mask.sum(-1), 1.0)
    if sample_weight is not None:
        return (per_mol * sample_weight).sum() / jnp.maximum(sample_weight.sum(), 1.0)
    return per_mol.mean()


def padded_mse(pred: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray,
               sample_weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reference-equivalent loss: mean over the padded width."""
    per_mol = ((pred - y) ** 2).mean(-1)
    if sample_weight is not None:
        return (per_mol * sample_weight).sum() / jnp.maximum(sample_weight.sum(), 1.0)
    return per_mol.mean()


def mae_sums(pred: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray,
             sample_weight: jnp.ndarray | None = None):
    """Returns (masked |err| sum, masked count, padded |err| sum, padded count)
    so metrics can be accumulated exactly across minibatches/buckets."""
    err = jnp.abs(pred - y)
    if sample_weight is None:
        sample_weight = jnp.ones(pred.shape[0], pred.dtype)
    w = sample_weight[:, None]
    return (
        (err * mask * w).sum(),
        (mask * w).sum(),
        (err * w).sum(),
        (jnp.ones_like(err) * w).sum(),
    )


LOSSES = {"masked_mse": masked_mse, "padded_mse": padded_mse}
