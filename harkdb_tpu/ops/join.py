"""Inner equi-join (reference semantics: ``join.fut:52-75``, never exported).

Reference ordering contract (SURVEY §3.5): output sorted ascending by key;
within a key, left rows in original order, each paired with every matching
right row in original order; output columns = [left cols | right cols]
(``join.fut:74-75``). Keys present on one side only emit nothing (inner join).

TPU-first algorithm — no per-key sequential loop (the reference's biggest
algorithmic weakness, ``join.fut:67-68``):

  1. stable-sort both sides by key (pads → dtype max, trailing);
  2. ``searchsorted`` of left keys into the sorted right keys gives each left
     row its contiguous right match range [lo, hi) — O((n+m) log m), fully
     vectorized;
  3. counts = hi - lo; total = sum(counts) (the exact output size, used by the
     planner to pick a bucketed static capacity);
  4. ``expand`` (replicated/segmented iota) materializes the pair indices.

Static shapes: the pair-materialization step takes ``out_capacity`` decided by
the planner from the count phase (count-then-materialize, SURVEY §7 hard
part 1).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from harkdb_tpu.columnar.batch import ColumnBatch
from harkdb_tpu.ops.sort import sort_permutation
from harkdb_tpu.prims.segmented import replicated_iota, segmented_iota

Array = jax.Array


def _match_ranges(
    l_key: Array, n_l: Array, r_key: Array, n_r: Array
) -> Tuple[Array, Array, Array, Array, Array]:
    """Per-left-row right-side match ranges on the sorted views.

    Returns (l_perm, r_perm, lo, counts, total).
    """
    l_perm, (l_sorted,) = sort_permutation([l_key], n_l)
    r_perm, (r_sorted,) = sort_permutation([r_key], n_r)

    lo = jnp.searchsorted(r_sorted, l_sorted, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(r_sorted, l_sorted, side="right").astype(jnp.int32)
    # Padding rows on the right carry dtype-max keys: a *real* dtype-max left
    # key would see them in its [lo, hi) range — clamp to the live region.
    lo = jnp.minimum(lo, n_r)
    hi = jnp.minimum(hi, n_r)

    n = l_key.shape[0]
    l_valid = jnp.arange(n, dtype=jnp.int32) < n_l
    counts = jnp.where(l_valid, hi - lo, 0)
    total = jnp.sum(counts).astype(jnp.int32)
    return l_perm, r_perm, lo, counts, total


def join_match_count(
    l_key: Array, n_l: Array, r_key: Array, n_r: Array, kind: str = "inner"
) -> Array:
    """Exact number of output rows (device scalar) — the planner's count phase.

    LEFT JOIN emits one row for every unmatched left row, so its count is
    ``sum(max(matches, 1))`` over live left rows.
    """
    _, _, _, counts, total = _match_ranges(l_key, n_l, r_key, n_r)
    if kind == "left":
        n = l_key.shape[0]
        l_valid = jnp.arange(n, dtype=jnp.int32) < n_l
        return jnp.sum(jnp.where(l_valid, jnp.maximum(counts, 1), 0)).astype(
            jnp.int32
        )
    return total


def join_indices(
    l_key: Array,
    n_l: Array,
    r_key: Array,
    n_r: Array,
    out_capacity: int,
    kind: str = "inner",
) -> Tuple[Array, Array, Array, Array]:
    """Materialize pair indices ``(l_idx, r_idx, matched, total)`` padded to
    capacity.

    ``l_idx``/``r_idx`` index the *original* (unsorted) rows of each side.
    ``matched`` is False on LEFT-JOIN rows with no right match (their right
    columns are filled with 0 — the engine has no NULLs, like the reference's
    homogeneous numeric tables). Entries past ``total`` point at row 0
    (harmless gather targets). If ``total > out_capacity`` the result is
    truncated — the planner prevents this by sizing capacity from
    :func:`join_match_count`.
    """
    l_perm, r_perm, lo, counts, total = _match_ranges(l_key, n_l, r_key, n_r)
    n = l_key.shape[0]

    if kind == "left":
        l_valid = jnp.arange(n, dtype=jnp.int32) < n_l
        emit = jnp.where(l_valid, jnp.maximum(counts, 1), 0)
        total = jnp.sum(emit).astype(jnp.int32)
    elif kind == "inner":
        emit = counts
    else:
        raise ValueError(f"Unsupported join kind {kind!r}")

    # seg_ids: which sorted-left row produced each output pair.
    seg_ids, _ = replicated_iota(emit, out_capacity)
    out_idx = jnp.arange(out_capacity, dtype=jnp.int32)
    live = out_idx < total
    safe_seg = jnp.where(live, jnp.minimum(seg_ids, emit.shape[0] - 1), 0)

    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), seg_ids[1:] != seg_ids[:-1]]
    )
    local = segmented_iota(starts)

    matched = live & (local < counts[safe_seg])
    l_idx = jnp.where(live, l_perm[safe_seg], 0)
    r_pos = jnp.where(matched, lo[safe_seg] + local, 0)
    r_idx = r_perm[jnp.minimum(r_pos, r_perm.shape[0] - 1)]
    r_idx = jnp.where(matched, r_idx, 0)
    return l_idx, r_idx, matched, total


def inner_join_indices(
    l_key: Array, n_l: Array, r_key: Array, n_r: Array, out_capacity: int
) -> Tuple[Array, Array, Array]:
    """Inner-join pair indices ``(l_idx, r_idx, total)`` (see join_indices)."""
    l_idx, r_idx, _, total = join_indices(
        l_key, n_l, r_key, n_r, out_capacity, "inner"
    )
    return l_idx, r_idx, total


def join_batches(
    left: ColumnBatch,
    right: ColumnBatch,
    l_key_name: str,
    r_key_name: str,
    out_capacity: int,
    l_out: Dict[str, str] | None = None,
    r_out: Dict[str, str] | None = None,
    kind: str = "inner",
) -> ColumnBatch:
    """Equi-join of two batches (inner or left).

    ``l_out``/``r_out`` map source column → output name (projection + rename,
    defaulting to all columns under their own names). Output column order is
    [left cols | right cols] per the reference (``join.fut:74-75``). LEFT
    JOIN fills right columns of unmatched rows with 0 (no NULLs in the
    engine's numeric model).
    """
    l_out = l_out if l_out is not None else {n: n for n in left.names}
    r_out = r_out if r_out is not None else {n: n for n in right.names}
    l_idx, r_idx, matched, total = join_indices(
        left.column(l_key_name), left.n_valid,
        right.column(r_key_name), right.n_valid,
        out_capacity, kind,
    )
    cols = {}
    for src, dst in l_out.items():
        cols[dst] = left.column(src)[l_idx]
    for src, dst in r_out.items():
        gathered = right.column(src)[r_idx]
        if kind == "left":
            gathered = jnp.where(matched, gathered, 0)
        cols[dst] = gathered
    return ColumnBatch(cols, total)
