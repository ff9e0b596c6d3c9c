"""Batched, padded, TPU-friendly dataset representation.

Design departure from the reference: the reference stores per-atom features
tiled across a full natom×natom plane and un-tiles them inside the model by a
masked mean (``charge_gn.py:335-338, 382-384``) — a storage artifact we do not
carry over.  Here a batch is a set of *per-atom* arrays plus a node mask;
edges are built on device from coordinates (:func:`epnn_tpu.featurize.rbf_edges`)
or, for golden-parity runs, precomputed with the NumPy oracle.

Padding policy: molecules are padded to a bucket size (default: multiples of
8, the fp32 sublane) so XLA compiles a small, fixed set of shapes instead of
one program per molecule size (SURVEY §7 hard-part 4).  For exact parity with
the reference's numbers, ``pad_to`` can pin the padded width (the reference's
GNN message sum is padding-width-dependent, SURVEY §8 Q10 — mixed-set parity
requires width 41).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from epnn_tpu.elements import ElementTable
from epnn_tpu.data.xyz import Molecule


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@dataclasses.dataclass(eq=False)  # identity semantics (hashable/weakref-able)
class MolBatch:
    """A padded batch of molecules. All arrays are NumPy; jit consumes them.

    Shapes (B = batch, N = padded atom count, F = element-feature width):
      x:         (B, N, F) float32 — [Z, onehot] per atom, zero rows for padding
      xyz:       (B, N, 3) float32 — coordinates, zero for padding
      q0:        (B, N)    float32 — initial charges Q/natom on real atoms
      total_q:   (B,)      float32 — net molecular charge Q
      y:         (B, N)    float32 — per-atom labels (zero when absent)
      node_mask: (B, N)    float32 — 1 on real atoms
      natoms:    (B,)      int32
    """

    x: np.ndarray
    xyz: np.ndarray
    q0: np.ndarray
    total_q: np.ndarray
    y: np.ndarray
    node_mask: np.ndarray
    natoms: np.ndarray
    names: List[str]
    has_labels: np.ndarray  # (B,) bool

    @property
    def batch_size(self) -> int:
        return self.x.shape[0]

    @property
    def padded_atoms(self) -> int:
        return self.x.shape[1]

    def pair_mask(self) -> np.ndarray:
        return self.node_mask[:, :, None] * self.node_mask[:, None, :]

    def select(self, idx: Sequence[int]) -> "MolBatch":
        idx = np.asarray(idx)
        return MolBatch(
            x=self.x[idx], xyz=self.xyz[idx], q0=self.q0[idx],
            total_q=self.total_q[idx], y=self.y[idx],
            node_mask=self.node_mask[idx], natoms=self.natoms[idx],
            names=[self.names[i] for i in idx],
            has_labels=self.has_labels[idx],
        )


def pad_molecules(
    mols: Sequence[Molecule],
    table: ElementTable,
    pad_to: Optional[int] = None,
    bucket_multiple: int = 8,
) -> MolBatch:
    """Pad a list of molecules into one dense batch."""
    if not mols:
        raise ValueError("empty molecule list")
    max_n = max(m.natoms for m in mols)
    if pad_to is None:
        pad_to = round_up(max_n, bucket_multiple)
    if pad_to < max_n:
        raise ValueError(f"pad_to={pad_to} < largest molecule {max_n}")

    b = len(mols)
    f = table.n_features
    x = np.zeros((b, pad_to, f), dtype=np.float32)
    xyz = np.zeros((b, pad_to, 3), dtype=np.float32)
    q0 = np.zeros((b, pad_to), dtype=np.float32)
    total_q = np.zeros((b,), dtype=np.float32)
    y = np.zeros((b, pad_to), dtype=np.float32)
    node_mask = np.zeros((b, pad_to), dtype=np.float32)
    natoms = np.zeros((b,), dtype=np.int32)
    has_labels = np.zeros((b,), dtype=bool)

    for i, m in enumerate(mols):
        n = m.natoms
        x[i, :n] = table.featurize_symbols(m.symbols)
        xyz[i, :n] = m.xyz
        q0[i, :n] = np.float32(m.total_charge) / np.float32(n)
        total_q[i] = m.total_charge
        if m.labels is not None:
            y[i, :n] = m.labels
            has_labels[i] = True
        node_mask[i, :n] = 1.0
        natoms[i] = n

    return MolBatch(
        x=x, xyz=xyz, q0=q0, total_q=total_q, y=y,
        node_mask=node_mask, natoms=natoms,
        names=[m.name for m in mols], has_labels=has_labels,
    )


def bucket_molecules(
    mols: Sequence[Molecule],
    table: ElementTable,
    bucket_multiple: int = 8,
    max_batch_atoms2: int = 2**22,
) -> Dict[int, MolBatch]:
    """Group molecules into size buckets (padded width → batch).

    ``max_batch_atoms2`` caps B·N² per bucket batch so giant systems land in
    small batches; callers further minibatch within a bucket.
    """
    by_bucket: Dict[int, List[Molecule]] = {}
    for m in mols:
        key = round_up(max(m.natoms, 1), bucket_multiple)
        by_bucket.setdefault(key, []).append(m)
    return {k: pad_molecules(v, table, pad_to=k) for k, v in sorted(by_bucket.items())}


def minibatches(
    batch: MolBatch,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    drop_remainder: bool = False,
    with_indices: bool = False,
):
    """Yield shuffled fixed-size minibatches; the tail is padded by repeating
    its first entries (with a zeroed loss weight via ``has_labels``-style
    masking handled by the trainer).  ``with_indices`` additionally yields
    the bucket-row indices backing each minibatch — what lets the trainer
    slice per-bucket precomputed side tables (neighbor lists) consistently
    with the shuffle."""
    n = batch.batch_size
    order = np.arange(n)
    if rng is not None:
        rng.shuffle(order)
    for start in range(0, n, batch_size):
        idx = order[start:start + batch_size]
        pad_count = 0
        if len(idx) < batch_size:
            if drop_remainder:
                return
            pad_count = batch_size - len(idx)
            # np.resize tiles, so buckets smaller than batch_size still fill
            # a full fixed-shape batch (a short batch would recompile under
            # jit and break divisibility under a data-parallel mesh)
            idx = np.concatenate([idx, np.resize(order, pad_count)])
        if with_indices:
            yield batch.select(idx), batch_size - pad_count, idx
        else:
            yield batch.select(idx), batch_size - pad_count


def train_val_split(
    n: int, test_size: float = 0.2, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """Index split matching sklearn's ``train_test_split(random_state=seed)``
    as used by the reference trainer (``charge_gn.py:431``)."""
    from sklearn.model_selection import train_test_split

    idx = np.arange(n)
    tr, va = train_test_split(idx, test_size=test_size, random_state=seed)
    return tr, va


def uniform_q0_contract(x: np.ndarray, q0: np.ndarray,
                        node_mask: np.ndarray) -> bool:
    """Host-side check of the round-1 far-field collapse contract
    (:func:`epnn_tpu.ops.fused.forward_blocked` ``uniform_q0``): per graph,
    valid atoms first, one q0 value on all valid atoms (the
    :func:`pad_molecules` convention ``q0 = Q/n``), zeros on padding; x rows
    exactly ``[Z, onehot]`` with one Z per element slot across the batch.
    O(B·N·E) NumPy — negligible next to a forward.  Arrays are the batched
    ``MolBatch`` fields ``(B, N, F) / (B, N) / (B, N)``."""
    x = np.asarray(x)
    q0 = np.asarray(q0)
    mask = np.asarray(node_mask)
    if not (np.all(np.diff(mask, axis=1) <= 0)           # valid-first
            and np.all((q0 == q0[:, :1]) | (mask == 0))  # uniform valid
            and np.all(q0 * (1 - mask) == 0)):           # zero padding
        return False
    oh = x[..., 1:]
    if not (np.all((oh == 0) | (oh == 1))
            and np.array_equal(oh.sum(axis=-1), mask)):
        return False
    # one Z per element slot (a single table across the batch)
    z = x[..., 0]
    zmax = np.max(z[..., None] * oh, axis=(0, 1))
    zmin = np.min(np.where(oh > 0, z[..., None], np.inf), axis=(0, 1))
    return bool(np.all((zmin == np.inf) | (zmax == zmin)))
