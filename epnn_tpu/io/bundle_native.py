"""ctypes binding to the C++ TensorBundle reader (``native/bundle_reader.cc``).

Native counterpart of :mod:`epnn_tpu.io.bundle_reader` (which stays the
reference implementation and fallback): parses a TF object-based checkpoint
without TensorFlow or any Python-side byte walking.  Build with
``make -C native``; everything degrades gracefully to the Python reader
when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

from epnn_tpu.io.bundle_reader import _DTYPES, _DT_STRING, BundleError

_LIB: Optional[ctypes.CDLL] = None
_LOAD_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATHS = [
    os.path.join(_REPO_ROOT, "native", "libepnn_native.so"),
]


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_TRIED
    if _LOAD_TRIED:
        return _LIB
    _LOAD_TRIED = True
    for p in _LIB_PATHS:
        if not os.path.exists(p):
            continue
        try:
            lib = ctypes.CDLL(p)
            lib.epnn_bundle_open
        except (OSError, AttributeError):
            continue  # missing or built before the bundle reader existed
        lib.epnn_bundle_open.restype = ctypes.c_void_p
        lib.epnn_bundle_open.argtypes = [ctypes.c_char_p]
        lib.epnn_bundle_count.restype = ctypes.c_int
        lib.epnn_bundle_count.argtypes = [ctypes.c_void_p]
        lib.epnn_bundle_name.restype = ctypes.c_char_p
        lib.epnn_bundle_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.epnn_bundle_dtype.restype = ctypes.c_int
        lib.epnn_bundle_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.epnn_bundle_rank.restype = ctypes.c_int
        lib.epnn_bundle_rank.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.epnn_bundle_shape.restype = ctypes.POINTER(ctypes.c_longlong)
        lib.epnn_bundle_shape.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.epnn_bundle_data.restype = ctypes.c_void_p
        lib.epnn_bundle_data.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.epnn_bundle_nbytes.restype = ctypes.c_longlong
        lib.epnn_bundle_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.epnn_bundle_close.restype = None
        lib.epnn_bundle_close.argtypes = [ctypes.c_void_p]
        lib.epnn_bundle_error.restype = ctypes.c_char_p
        lib.epnn_bundle_error.argtypes = []
        _LIB = lib
        break
    return _LIB


def available() -> bool:
    return _load() is not None


def read_bundle_native(prefix: str) -> Dict[str, np.ndarray]:
    """Read every numeric tensor of a TF checkpoint via the C++ parser."""
    lib = _load()
    if lib is None:
        raise BundleError("native bundle reader not built (make -C native)")
    handle = lib.epnn_bundle_open(prefix.encode())
    if not handle:
        raise BundleError(
            f"{prefix}: {lib.epnn_bundle_error().decode(errors='replace')}"
        )
    try:
        out: Dict[str, np.ndarray] = {}
        for i in range(lib.epnn_bundle_count(handle)):
            tf_dtype = lib.epnn_bundle_dtype(handle, i)
            if tf_dtype == _DT_STRING:
                continue  # object-graph metadata
            dtype = _DTYPES.get(tf_dtype)
            if dtype is None:
                continue
            name = lib.epnn_bundle_name(handle, i).decode()
            rank = lib.epnn_bundle_rank(handle, i)
            shape = tuple(lib.epnn_bundle_shape(handle, i)[k] for k in range(rank))
            nbytes = lib.epnn_bundle_nbytes(handle, i)
            buf = ctypes.string_at(lib.epnn_bundle_data(handle, i), nbytes)
            out[name] = np.frombuffer(buf, dtype=dtype).reshape(shape)
        return out
    finally:
        lib.epnn_bundle_close(handle)
