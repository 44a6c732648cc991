"""Table ingest: CSV / txt / pandas DataFrame / numpy ndarray → columnar data.

Mirrors the reference's dispatch shape (``table.py:42-50``: DataFrame / ndarray
/ file-path string) and its error behavior (unsupported file type and
unsupported source raise, ``table.py:40,50``), but produces *columnar* host
arrays with a normalized dtype policy (int32/float32) instead of one row-major
int matrix (``table.py:60-62``).

A native C++ fast path for CSV exists in ``harkdb_tpu.io.native_csv`` and is
used automatically for large files when the shared library is built.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from harkdb_tpu.config import EngineConfig, DEFAULT_CONFIG

HostColumns = Dict[str, np.ndarray]


def _normalize_dtype(a: np.ndarray, config: EngineConfig) -> np.ndarray:
    """Dtype policy: integers → int_dtype, floats → float_dtype.

    The reference is inconsistent (i32 in select.fut:23, u32 in groupby.fut:51,
    i64 from pandas); we normalize once at ingest.
    """
    if np.issubdtype(a.dtype, np.floating):
        return a.astype(config.float_dtype)
    if np.issubdtype(a.dtype, np.integer) or a.dtype == np.bool_:
        return a.astype(config.int_dtype)
    raise TypeError(
        f"Unsupported column dtype {a.dtype}; only numeric columns are supported"
    )


def load_df(df: pd.DataFrame, config: EngineConfig) -> Tuple[HostColumns, List[str]]:
    # Reference: table.py:8-10 (df.to_numpy(), list(df)).
    headers = [str(c) for c in df.columns]
    cols = {h: _normalize_dtype(df[c].to_numpy(), config) for h, c in zip(headers, df.columns)}
    return cols, headers


def load_np(
    arr: np.ndarray, config: EngineConfig, col_names: Optional[List[str]] = None
) -> Tuple[HostColumns, List[str]]:
    # Reference: table.py:12-16 — 2-D row-major matrix, autogen col1..colN.
    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"Expected a 2-D table, got shape {arr.shape}")
    n_cols = arr.shape[1]
    headers = col_names or [f"col{i + 1}" for i in range(n_cols)]
    if len(headers) != n_cols:
        raise ValueError(f"{len(headers)} names for {n_cols} columns")
    cols = {h: _normalize_dtype(np.ascontiguousarray(arr[:, i]), config)
            for i, h in enumerate(headers)}
    return cols, headers


def load_csv(path: str, config: EngineConfig) -> Tuple[HostColumns, List[str]]:
    # Reference: table.py:29-32 (pd.read_csv). Native C++ loader used when
    # available and beneficial; falls back to pandas transparently.
    try:
        from harkdb_tpu.io.native_csv import native_read_csv

        result = native_read_csv(path, config)
        if result is not None:
            return result
    except Exception:
        pass
    df = pd.read_csv(path, skipinitialspace=True)
    return load_df(df, config)


def load_txt(
    path: str, config: EngineConfig, col_names: Optional[List[str]] = None
) -> Tuple[HostColumns, List[str]]:
    # Reference: table.py:33-39 (np.loadtxt, autogen c1..cN names).
    arr = np.loadtxt(path)
    if arr.ndim == 1:
        arr = arr[:, None]
    headers = col_names or [f"c{i + 1}" for i in range(arr.shape[1])]
    return load_np(arr, config, headers)


def load_file(
    path: str, config: EngineConfig, col_names: Optional[List[str]] = None
) -> Tuple[HostColumns, List[str]]:
    if path.endswith(".csv"):
        return load_csv(path, config)
    if path.endswith(".txt"):
        return load_txt(path, config, col_names)
    if path.endswith(".parquet"):
        df = pd.read_parquet(path)
        return load_df(df, config)
    # Reference error contract: table.py:40.
    raise Exception("We do not support loading this file type")


def load_table(source, config: EngineConfig = DEFAULT_CONFIG,
               col_names: Optional[List[str]] = None) -> Tuple[HostColumns, List[str]]:
    """Dispatch on source type — DataFrame / ndarray / path (table.py:42-50)."""
    if isinstance(source, pd.DataFrame):
        return load_df(source, config)
    if isinstance(source, np.ndarray):
        return load_np(source, config, col_names)
    if isinstance(source, dict):
        headers = [str(k) for k in source.keys()]
        cols = {h: _normalize_dtype(np.asarray(v), config) for h, v in source.items()}
        return cols, headers
    if isinstance(source, str):
        return load_file(source, config, col_names)
    # Reference error contract: table.py:50.
    raise Exception("Table is not in a file, numpy array or dataframe")
