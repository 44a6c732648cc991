"""GROUP BY aggregation (reference semantics: ``groupby.fut:51-62``).

Output contract matched to the reference (SURVEY §3.4): one row per distinct
key, **ascending key order**, column 0 = key, remaining columns = aggregates in
select-list order. (The reference's radix sort compares u32 bit patterns; we
order signed-ascending, identical for the non-negative keys the reference's
homogeneous-int tables use, and strictly more sensible for negatives.)

Algorithm (XLA path): stable sort rows by key (pads last) → boundary flags →
one fused segmented-reduce per aggregate — O(n log n) depth but fully
vectorized; the reference instead runs 32 sequential single-bit radix passes
(``groupby.fut:22``). A VMEM hash-aggregate Pallas kernel covers the
low-cardinality fast path (see ``harkdb_tpu.kernels.hashagg``).

Aggregate set: the reference's {prod, sum, max, min} opcodes (``parse.py:81``)
plus count/avg as planner-level extensions.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from harkdb_tpu.columnar.batch import ColumnBatch
from harkdb_tpu.ops.sort import sort_permutation
from harkdb_tpu.prims.segmented import segmented_reduce

Array = jax.Array


def _neutral(op_name: str, dtype) -> jax.Array:
    if op_name == "sum" or op_name == "count":
        return jnp.array(0, dtype)
    if op_name == "prod":
        return jnp.array(1, dtype)
    info = jnp.finfo(dtype) if jnp.issubdtype(dtype, jnp.floating) else jnp.iinfo(dtype)
    if op_name == "max":
        return jnp.array(info.min, dtype)
    if op_name == "min":
        return jnp.array(info.max, dtype)
    raise ValueError(f"Unknown aggregate {op_name!r}")


AGG_FUNCS: Dict[str, Callable] = {
    "sum": jnp.add,
    "prod": jnp.multiply,
    "max": jnp.maximum,
    "min": jnp.minimum,
    "count": jnp.add,
}


def groupby_aggregate(
    keys: Union[Array, Sequence[Array]],
    agg_cols: Sequence[Tuple[Array, str]],
    n_valid: Array,
) -> Tuple[List[Array], List[Array], Array]:
    """Aggregate ``agg_cols`` (value, op-name) per distinct key tuple.

    ``keys`` is one array or a list (multi-key lexicographic grouping — the
    reference supports a single key only, ``parse.py:66-69``). Returns
    ``(keys_out, agg_outs, n_groups)`` — all padded to the input capacity;
    rows at index >= n_groups are padding.
    """
    if not isinstance(keys, (list, tuple)):
        keys = [keys]
    perm, sorted_keys = sort_permutation(list(keys), n_valid)

    n = keys[0].shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < n_valid
    # Segment starts: first live row, or any key change between adjacent rows.
    changed = jnp.zeros((n,), jnp.bool_)
    for skey in sorted_keys:
        prev = jnp.concatenate([skey[:1], skey[:-1]])
        changed = changed | (skey != prev)
    flags = valid & ((idx == 0) | changed)

    outs: List[Array] = []
    n_groups = jnp.int32(0)
    for col, op_name in agg_cols:
        op = AGG_FUNCS[op_name]
        if op_name == "count":
            vals = jnp.ones((n,), jnp.int32)
        else:
            vals = col[perm]
        ne = _neutral(op_name, vals.dtype)
        out, n_groups = segmented_reduce(op, ne, flags, vals, n_valid=n_valid)
        outs.append(out)

    # Each group's key = segmented min of the (constant-within-segment) sorted
    # key. (For keys the sort transformed — pads to dtype max — min of the live
    # values is exact; sorted_keys has pads already replaced.)
    keys_out = []
    for skey in sorted_keys:
        k_out, n_groups = segmented_reduce(
            jnp.minimum, _neutral("min", skey.dtype), flags, skey, n_valid=n_valid
        )
        keys_out.append(k_out)
    return keys_out, outs, n_groups


def groupby_batch(
    batch: ColumnBatch,
    key_names: Union[str, Sequence[str]],
    aggs: Sequence[Tuple[str, str, str]],
) -> ColumnBatch:
    """GROUP BY over a batch. ``aggs`` = (source column, op, output name).

    Output columns: keys first (under their own names), then aggregates in
    order — the reference's layout (``groupby.fut:45-48``: output col 0 is the
    key). The planner handles key-position/duplicate-select subtleties.
    """
    if isinstance(key_names, str):
        key_names = [key_names]
    key_arrays = [batch.column(k) for k in key_names]
    agg_inputs = [(batch.column(src), op) for src, op, _ in aggs]
    keys_out, agg_outs, n_groups = groupby_aggregate(
        key_arrays, agg_inputs, batch.n_valid
    )
    cols = dict(zip(key_names, keys_out))
    for (_, _, out_name), arr in zip(aggs, agg_outs):
        cols[out_name] = arr
    return ColumnBatch(cols, n_groups)
