"""Drop-in compatibility shims for reference-code call sites.

A user migrating from the reference can keep their pipeline code: this
module reproduces the reference's working loader signature and its tiled
output layout (``gen_padded_init_state``, charge_gn.py:292-366) on top of
the framework's data layer, byte-compatible up to fp noise:

* per-atom features/hidden/charges tiled across a full (natom × natom) plane
  (row j holds a copy of the per-atom array),
* edges zero-padded to the directory's largest system,
* mask = ones over the (molec_size × molec_size) block,
* Q from line-2 token 0, labels zero-filled with a warning when missing.

The framework itself never uses this layout (models take per-atom arrays);
it exists so reference-shaped code and tests can run unchanged.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from epnn_tpu.data.xyz import load_directory
from epnn_tpu.elements import ElementTable, TRAIN_TABLE
from epnn_tpu.featurize import rbf_edges_np


def gen_padded_init_state(
    path: str,
    h_dim: int,
    e_dim: int,
    table: ElementTable = TRAIN_TABLE,
) -> Tuple[np.ndarray, ...]:
    """Reference-layout loader: returns (x, h, q, e, Q, y, mask, names).

    Shapes (nmol, N, N, ·) with N = largest system in the directory —
    exactly the reference's tiled contract (x/h/q tiled across rows, e
    dense, mask a block of ones).
    """
    mols = load_directory(path, sort=False)
    if not mols:
        raise ValueError(f"no .xyz files under {path}")
    n = max(m.natoms for m in mols)
    nmol = len(mols)
    f = table.n_features

    x = np.zeros((nmol, n, n, f), np.float64)
    h = np.zeros((nmol, n, n, h_dim), np.float64)
    q = np.zeros((nmol, n, n, 1), np.float64)
    e = np.zeros((nmol, n, n, e_dim), np.float64)
    y = np.zeros((nmol, n, 1), np.float64)
    mask = np.zeros((nmol, n, n), np.float64)
    big_q = np.zeros((nmol,), np.float32)
    names = []

    for i, m in enumerate(mols):
        ni = m.natoms
        names.append(m.name)
        big_q[i] = m.total_charge
        if m.labels is not None:
            y[i, :ni, 0] = m.labels
        else:
            print("No labels provided, y set to 0")
        feats = table.featurize_symbols(m.symbols)
        x[i, :ni, :ni] = feats[None, :, :]
        avg_q = np.float32(m.total_charge) / ni
        q[i, :ni, :ni, 0] = avg_q
        e[i, :ni, :ni], _ = rbf_edges_np(m.xyz, e_dim=e_dim)
        mask[i, :ni, :ni] = 1.0

    return x, h, q, e, big_q, y, mask, np.array(names)
