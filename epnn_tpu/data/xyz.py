"""``.xyz`` geometry parsing.

File-format contract (established by the reference loader,
``charge_gn.py:309-330`` and verified against every shipped dataset,
SURVEY §2.6):

* line 1: atom count — **ignored**; the atom count is inferred from the
  remaining lines (the reference does the same, which is what lets it read
  files whose header count is stale).
* line 2: first whitespace token parsed as the float net molecular charge Q.
* lines 3+: ``<element> <x> <y> <z> [extra tokens ignored]``.

A molecule may have a sibling ``<name>.npy`` (per-atom charge labels) and
``<name>splits.npy`` (scalar int: first atom index of monomer B in a dimer).
Splits are functionally inert in the reference (SURVEY §8 Q1) — we carry them
as metadata only.

A C++ fast path for bulk directory parsing lives in ``native/``; this module
transparently uses it when the compiled library is available (see
:mod:`epnn_tpu.data.native`).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class Molecule:
    """One parsed system (monomer, dimer, or whole protein)."""

    name: str
    symbols: List[str]
    xyz: np.ndarray            # (natom, 3) float32
    total_charge: float        # Q, from line-2 token 0
    labels: Optional[np.ndarray] = None   # (natom,) float32 per-atom charges
    split: Optional[int] = None           # dimer monomer-B start index

    @property
    def natoms(self) -> int:
        return len(self.symbols)


class XYZParseError(ValueError):
    pass


def parse_xyz_text(text: str, name: str = "") -> Molecule:
    lines = text.splitlines()
    if len(lines) < 3:
        raise XYZParseError(f"{name or '<string>'}: need >=3 lines, got {len(lines)}")
    head = lines[1].split()
    if not head:
        raise XYZParseError(f"{name or '<string>'}: blank charge line")
    try:
        q_total = float(head[0])
    except ValueError as exc:
        raise XYZParseError(
            f"{name or '<string>'}: line-2 token {head[0]!r} is not a float net "
            "charge (raw QM9 files need conversion first — see epnn_tpu.data.qm9)"
        ) from exc

    symbols: List[str] = []
    coords: List[Sequence[float]] = []
    for ln in lines[2:]:
        toks = ln.split()
        if not toks:
            continue
        if len(toks) < 4:
            raise XYZParseError(f"{name or '<string>'}: malformed atom line {ln!r}")
        symbols.append(toks[0])
        coords.append((float(toks[1]), float(toks[2]), float(toks[3])))
    if not symbols:
        raise XYZParseError(f"{name or '<string>'}: no atom lines")
    return Molecule(
        name=name,
        symbols=symbols,
        xyz=np.asarray(coords, dtype=np.float32),
        total_charge=q_total,
    )


def parse_xyz_file(path: str) -> Molecule:
    name = os.path.basename(path)
    if name.endswith(".xyz"):
        name = name[:-4]
    with open(path, "r") as f:
        mol = parse_xyz_text(f.read(), name=name)
    return mol


def load_molecule(xyz_path: str, require_labels: bool = False) -> Molecule:
    """Parse a .xyz plus its optional sibling label / splits files."""
    mol = parse_xyz_file(xyz_path)
    stem = xyz_path[:-4] if xyz_path.endswith(".xyz") else xyz_path
    label_path = stem + ".npy"
    if os.path.exists(label_path):
        labels = np.asarray(np.load(label_path), dtype=np.float32).reshape(-1)
        if labels.shape[0] != mol.natoms:
            raise XYZParseError(
                f"{xyz_path}: {mol.natoms} atoms but {labels.shape[0]} labels"
            )
        mol.labels = labels
    elif require_labels:
        raise FileNotFoundError(label_path)
    splits_path = stem + "splits.npy"
    if os.path.exists(splits_path):
        split = np.load(splits_path)
        if split.shape == ():
            mol.split = int(split)
        # multi-split files never occur in shipped data (SURVEY §2.6); a
        # non-scalar splits file is ignored rather than crashing like the
        # reference's unfinished branch (charge_gn.py:134-145).
    return mol


def load_directory(
    path: str,
    require_labels: bool = False,
    sort: bool = True,
    use_native: bool = True,
) -> List[Molecule]:
    """Parse every ``*.xyz`` in a directory (non-recursive).

    Unlike the reference (``os.listdir`` order, nondeterministic across
    filesystems), entries are sorted by default for reproducibility; pass
    ``sort=False`` to keep directory order.
    """
    names = [f for f in os.listdir(path) if f.endswith(".xyz")]
    if sort:
        names.sort()
    if use_native:
        from epnn_tpu.data import native

        if native.available():
            return native.load_directory(path, names, require_labels=require_labels)
    mols = []
    for fname in names:
        mols.append(load_molecule(os.path.join(path, fname), require_labels))
    return mols
