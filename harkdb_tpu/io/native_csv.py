"""ctypes bridge to the native parallel CSV loader.

Builds ``csv_loader.cpp`` on first use (g++ -O3, cached next to the source);
falls back silently (returns None) when the toolchain or build is unavailable
so ingest degrades to pandas (``columnar/ingest.py``). Matches pandas
dtype inference for numeric CSVs: a column whose values are all integral
becomes the engine int dtype, otherwise the float dtype.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "csv_loader.cpp")
_SO = os.path.join(_HERE, "native", "csv_loader.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _load_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                     "-fPIC", "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.hark_csv_dims.restype = ctypes.c_int
            lib.hark_csv_dims.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_char_p, ctypes.c_int64,
            ]
            lib.hark_csv_parse.restype = ctypes.c_int
            lib.hark_csv_parse.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
    return _lib


def native_read_csv(
    path: str, config
) -> Optional[Tuple[Dict[str, np.ndarray], List[str]]]:
    """Parse a numeric CSV natively. Returns None (caller falls back to
    pandas) on any unsupported shape — non-numeric cells parse as garbage, so
    this is only used for the engine's homogeneous numeric tables."""
    lib = _load_lib()
    if lib is None:
        return None
    # Numeric-content sniff: the native parser has no error recovery for text
    # cells, so check a prefix of the data region first.
    try:
        with open(path, "rb") as f:
            head = f.read(1 << 16)
        nl = head.find(b"\n")
        if nl < 0:
            return None
        sample = head[nl + 1:]
        allowed = set(b"0123456789+-.eE, \t\r\n")
        if sample and any(b not in allowed for b in sample):
            return None
    except OSError:
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    header = ctypes.create_string_buffer(1 << 20)
    rc = lib.hark_csv_dims(path.encode(), ctypes.byref(rows),
                           ctypes.byref(cols), header, len(header))
    if rc != 0:
        return None
    r, c = rows.value, cols.value
    names = [h.strip() for h in header.value.decode("utf-8").split(",")]
    if len(names) != c or r < 0:
        return None
    # Header must look like column names, data must be numeric — sniff one
    # data line; bail to pandas otherwise.
    buf = np.empty((c, r), dtype=np.float64)
    rc = lib.hark_csv_parse(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        r, c,
    )
    if rc != 0:
        return None
    out: Dict[str, np.ndarray] = {}
    for i, name in enumerate(names):
        col = buf[i]
        if np.all(col == np.floor(col)):
            out[name] = col.astype(config.int_dtype)
        else:
            out[name] = col.astype(config.float_dtype)
    return out, names
