"""Pallas (Mosaic) TPU kernels for the hot dense pair loop.

After the neighbor split (epnn_tpu.ops.fused), the one remaining O(N²) hot
op is the featureless message reduction of each GNN round:

    out_i = Σ_j mask_ij · relu(relu(pi_i + pj_j) @ W2 + b2)

(``pi`` carries the first-layer bias folded in by the caller — the kernel
adds nothing to the first layer, which keeps its contract independent of
the caller's bias convention.)

This kernel tiles the (N × N) pair grid onto a (row-block × col-block) grid,
builds the first-layer activations for one tile directly in VMEM from the
per-atom projections (the (N², H) tensor never exists in HBM), runs the mid
matmul on the MXU, and accumulates the j-partial sums into a VMEM-resident
output block (revisited across the j grid dimension, which Mosaic iterates
fastest).  HBM traffic is O(N·H) per row block instead of O(N²·H).

The kernel runs in interpret mode off-TPU so the CPU test suite exercises it
(tests/test_pallas.py); `use_pallas=True` on forward_blocked switches the
dense message loop to this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _msg_kernel(pi_ref, pj_ref, nmi_ref, nmj_ref, w2_ref, b2_ref,
                out_ref, *, masked: bool, prec):
    j = pl.program_id(1)
    pi = pi_ref[:]            # (BI, H)
    pj = pj_ref[:]            # (BJ, H)
    bi, h = pi.shape
    bj = pj.shape[0]
    hid1 = jax.nn.relu(pi[:, None, :] + pj[None, :, :])
    hid1 = hid1.reshape(bi * bj, h)
    hid2 = jax.nn.relu(
        jnp.dot(hid1, w2_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        + b2_ref[:]
    )
    if masked:
        pair = (nmi_ref[:][:, 0:1, None] * nmj_ref[:][None, :, :])  # (BI,BJ,1)
        hid2 = hid2.reshape(bi, bj, h) * pair
        partial = jnp.sum(hid2, axis=1)
    else:
        partial = jnp.sum(hid2.reshape(bi, bj, h), axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial


@functools.partial(
    jax.jit, static_argnames=("block_i", "block_j", "masked", "precision",
                              "interpret")
)
def dense_message_rowsum(
    pi: jax.Array,           # (N, H) row projections, first-layer bias folded in
    pj: jax.Array,           # (N, H) col projections
    node_mask: jax.Array,    # (N,)
    w2: jax.Array,           # (H, H)
    b2: jax.Array,           # (H,)
    block_i: int = 128,
    block_j: int = 256,
    masked: bool = True,
    precision: str = "default",
    interpret: bool | None = None,
) -> jax.Array:
    """Σ_j mask_ij · relu(relu(pi_i + pj_j) @ W2 + b2) as (N, H).

    ``pi`` must already include the first-layer bias (fold it in once per
    atom — the kernel adds no bias to the first layer).  N must be padded to
    lcm(block_i, block_j) by the caller (padded rows have node_mask 0; in
    unmasked/compat mode the caller arranges the padded width to equal the
    reference's, so including them is the point).
    """
    n, h = pi.shape
    assert n % block_i == 0 and n % block_j == 0, (n, block_i, block_j)
    if interpret is None:
        interpret = not _on_tpu()
    # Mosaic rejects Precision.HIGH; HIGHEST is the fp32-accurate tier there
    prec = {
        "default": None,
        "high": jax.lax.Precision.HIGHEST,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]

    nm2 = node_mask[:, None]
    grid = (n // block_i, n // block_j)
    kernel = functools.partial(_msg_kernel, masked=masked, prec=prec)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_i, h), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, h), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.float32),
        interpret=interpret,
    )(pi, pj, nm2, nm2, w2, b2[None, :])


def dense_message_rowsum_reference(pi, pj, node_mask, w2, b2, masked=True):
    """NumPy-oracle for the kernel (used by tests).  Note: intentionally
    independent of any bias convention — ``pi`` carries the folded b1."""
    hid1 = np.maximum(pi[:, None, :] + pj[None, :, :], 0.0)
    hid2 = np.maximum(hid1 @ w2 + b2, 0.0)
    if masked:
        pair = node_mask[:, None] * node_mask[None, :]
        hid2 = hid2 * pair[:, :, None]
    return hid2.sum(axis=1)
