"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

from epnn_tpu.ops.pallas_kernels import (
    dense_message_rowsum,
    dense_message_rowsum_reference,
)


@pytest.mark.parametrize("masked", [True, False])
def test_matches_oracle(rng, masked):
    n, h = 256, 32
    pi = rng.normal(size=(n, h)).astype(np.float32)
    pj = rng.normal(size=(n, h)).astype(np.float32)
    nm = np.ones(n, np.float32)
    nm[200:] = 0.0
    w2 = rng.normal(size=(h, h)).astype(np.float32) * 0.2
    b2 = rng.normal(size=(h,)).astype(np.float32)
    out = np.asarray(
        dense_message_rowsum(pi, pj, nm, w2, b2,
                             block_i=64, block_j=128, masked=masked)
    )
    oracle = dense_message_rowsum_reference(pi, pj, nm, w2, b2, masked)
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_kernel_has_no_first_layer_bias(rng):
    """The kernel's contract: pi carries any first-layer bias; the kernel
    must not add one.  Guard computed from first principles (not via the
    shared oracle, which the round-1 double-add bug also infected)."""
    n, h = 8, 8
    pi = rng.normal(size=(n, h)).astype(np.float32)
    pj = rng.normal(size=(n, h)).astype(np.float32)
    nm = np.ones(n, np.float32)
    w2 = np.eye(h, dtype=np.float32)
    b2 = np.zeros(h, np.float32)
    out = np.asarray(dense_message_rowsum(pi, pj, nm, w2, b2,
                                          block_i=8, block_j=8))
    expect = np.maximum(pi[:, None, :] + pj[None, :, :], 0.0).sum(1)
    np.testing.assert_allclose(out, expect, rtol=1e-6, atol=1e-5)


def test_block_invariance(rng):
    n, h = 256, 32
    pi = rng.normal(size=(n, h)).astype(np.float32)
    pj = rng.normal(size=(n, h)).astype(np.float32)
    nm = np.ones(n, np.float32)
    w2 = np.eye(h, dtype=np.float32)
    b2 = np.zeros(h, np.float32)
    outs = [
        np.asarray(dense_message_rowsum(pi, pj, nm, w2, b2,
                                        block_i=bi, block_j=bj))
        for bi, bj in ((64, 64), (128, 256), (256, 256))
    ]
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], atol=1e-4)
