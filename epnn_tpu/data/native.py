"""ctypes binding to the C++ bulk ``.xyz`` parser (``native/xyz_parser.cc``).

The reference parses geometries with a pure-Python per-line loop
(``charge_gn.py:309-338``); for the 4k-molecule mixed set and the 2,220-atom
protein that is startup-dominated, so we ship a small C++ shared library that
parses whole files into flat arrays.  Everything degrades gracefully to the
Python parser when the library has not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LOAD_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATHS = [
    os.path.join(_REPO_ROOT, "native", "libepnn_native.so"),
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "libepnn_native.so"),
]


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_TRIED
    if _LOAD_TRIED:
        return _LIB
    _LOAD_TRIED = True
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            lib.epnn_parse_xyz.restype = ctypes.c_int
            lib.epnn_parse_xyz.argtypes = [
                ctypes.c_char_p,                    # path
                ctypes.POINTER(ctypes.c_int),       # natoms out
                ctypes.POINTER(ctypes.c_double),    # Q out
                ctypes.POINTER(ctypes.c_float),     # xyz out (cap*3)
                ctypes.c_char_p,                    # symbols out (cap*4)
                ctypes.c_int,                       # capacity (atoms)
            ]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


_MAX_ATOMS = 65536

# scratch buffers reused across calls (allocating 1 MB per molecule dominates
# bulk parsing of thousands of small files otherwise)
_SCRATCH_COORDS: Optional[np.ndarray] = None
_SCRATCH_SYMS: Optional[np.ndarray] = None


def _scratch():
    global _SCRATCH_COORDS, _SCRATCH_SYMS
    if _SCRATCH_COORDS is None:
        _SCRATCH_COORDS = np.empty((_MAX_ATOMS, 3), dtype=np.float32)
        _SCRATCH_SYMS = np.zeros(_MAX_ATOMS * 4, dtype=np.uint8)
    return _SCRATCH_COORDS, _SCRATCH_SYMS


def parse_xyz_file(path: str):
    """Parse one .xyz via the native library. Returns a Molecule or None."""
    from epnn_tpu.data.xyz import Molecule

    lib = _load()
    if lib is None:
        return None
    coords, syms = _scratch()
    natoms = ctypes.c_int(0)
    q = ctypes.c_double(0.0)
    rc = lib.epnn_parse_xyz(
        path.encode(),
        ctypes.byref(natoms),
        ctypes.byref(q),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        syms.ctypes.data_as(ctypes.c_char_p),
        _MAX_ATOMS,
    )
    if rc != 0:
        return None
    n = natoms.value
    raw = syms[: n * 4].tobytes()
    symbols = [raw[i * 4:(i + 1) * 4].rstrip(b"\x00").decode() for i in range(n)]
    name = os.path.basename(path)
    if name.endswith(".xyz"):
        name = name[:-4]
    return Molecule(
        name=name,
        symbols=symbols,
        xyz=coords[:n].copy(),
        total_charge=q.value,
    )


def load_directory(path: str, names: List[str], require_labels: bool = False):
    """Bulk-parse a directory with the native parser; labels/splits via numpy."""
    from epnn_tpu.data import xyz as pyxyz

    mols = []
    for fname in names:
        full = os.path.join(path, fname)
        mol = parse_xyz_file(full)
        if mol is None:  # fall back per-file on native failure
            mol = pyxyz.parse_xyz_file(full)
        stem = full[:-4]
        label_path = stem + ".npy"
        if os.path.exists(label_path):
            labels = np.asarray(np.load(label_path), dtype=np.float32).reshape(-1)
            if labels.shape[0] != mol.natoms:
                raise pyxyz.XYZParseError(
                    f"{full}: {mol.natoms} atoms but {labels.shape[0]} labels"
                )
            mol.labels = labels
        elif require_labels:
            raise FileNotFoundError(label_path)
        splits_path = stem + "splits.npy"
        if os.path.exists(splits_path):
            split = np.load(splits_path)
            if split.shape == ():
                mol.split = int(split)
        mols.append(mol)
    return mols
