"""Native (C++) data-path bindings via ctypes.

The reference implements its whole data path in C++ (parameters_loader.cpp,
forcing remap in main.cpp); here the hot host-side pieces are C++ too —
single-pass CSV column parsing and the grid->systems forcing gather — loaded
through ctypes (no pybind11 in this image).  Every entry point has a numpy
fallback, so the framework works without the compiled library; callers
(tiger_tpu.params, tiger_tpu.forcing) catch ImportError and fall back.

Build: ``make -C tiger_tpu/native`` (attempted automatically once on first
import).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtiger_native.so")
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
            )
        except Exception as e:  # no toolchain — callers fall back to numpy
            raise ImportError(f"native library unavailable: {e}")
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        # Incompatible/corrupt .so must surface as the ImportError the module
        # contract promises (callers fall back to numpy on ImportError only).
        raise ImportError(f"native library unloadable: {e}")
    try:
        lib.tt_remap_gather  # noqa: B018 — probe a recent symbol up front
    except AttributeError:
        raise ImportError(
            f"stale native library (missing symbols): rebuild with "
            f"`make -C {_DIR} clean all`"
        )
    lib.tt_csv_count_rows.restype = ctypes.c_long
    lib.tt_csv_count_rows.argtypes = [ctypes.c_char_p]
    lib.tt_csv_parse.restype = ctypes.c_long
    lib.tt_csv_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_long,
    ]
    lib.tt_remap_gather.restype = None
    lib.tt_remap_gather.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


def load_csv_columns(path: str, columns: Sequence[str]) -> Dict[str, np.ndarray]:
    """Parse the named columns of a header-indexed CSV into float64 arrays."""
    lib = _load()
    n_rows = lib.tt_csv_count_rows(path.encode())
    if n_rows < 0:
        raise IOError(f"Cannot read {path}")
    cols = list(columns)
    arrs = [np.empty(n_rows, np.float64) for _ in cols]
    c_names = (ctypes.c_char_p * len(cols))(*[c.encode() for c in cols])
    c_out = (ctypes.POINTER(ctypes.c_double) * len(cols))(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for a in arrs]
    )
    parsed = lib.tt_csv_parse(path.encode(), c_names, len(cols), c_out, n_rows)
    if parsed == -2:
        raise ValueError(f"Missing one of columns {cols} in {path}")
    if parsed == -4:
        raise ValueError(
            f"Non-numeric or empty field in a requested column of {path} "
            "(reference std::stod would throw; refusing to load as 0.0)"
        )
    if parsed < 0:
        raise IOError(f"Failed parsing {path} (code {parsed})")
    return {c: a[:parsed] for c, a in zip(cols, arrs)}


def remap_gather(grid: np.ndarray, flat_index: np.ndarray) -> np.ndarray:
    """out[t, s] = grid.reshape(T, -1)[t, flat_index[s]] (native gather)."""
    lib = _load()
    n_t = grid.shape[0]
    flat = np.ascontiguousarray(grid.reshape(n_t, -1), np.float32)
    idx = np.ascontiguousarray(flat_index, np.int64)
    if len(idx) and (idx.min() < 0 or idx.max() >= flat.shape[1]):
        # The C gather is unchecked (raw slice[idx[s]]): an out-of-range
        # index would read past the buffer — match the numpy path's error.
        raise IndexError(
            f"flat_index outside [0, {flat.shape[1]}) for the given grid"
        )
    out = np.empty((n_t, len(idx)), np.float32)
    lib.tt_remap_gather(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_t,
        flat.shape[1],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
