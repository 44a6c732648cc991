"""Equi-join (reference semantics: ``join.fut:52-75``, never exported there).

Reference ordering contract (SURVEY §3.5): output sorted ascending by key;
within a key, left rows in original order, each paired with every matching
right row in original order; output columns = [left cols | right cols]
(``join.fut:74-75``). Keys present on one side only emit nothing (inner join);
LEFT JOIN keeps unmatched left rows with zero-filled right columns.

TPU-first algorithm, shaped by v5e microbenchmarks: ``searchsorted`` is
catastrophic on TPU (binary search = a chain of dependent gathers; 3 s for a
16M probe into 1M keys, vs ~40 ms for a payload-carrying sort). So instead of
sort+binary-search, both sides are concatenated and sorted ONCE by
(key, side) with side ordering rights before lefts within each key run — the
reference's tag-and-sort idea (``join.fut:55-58``) vectorized:

  * rights-per-run seen at a left row   = segmented count of rights (cumsum
    difference), which for rights-first ordering equals that key's full right
    count — the match count;
  * global rights before the run        = cumsum(rights) - in-run count — the
    match start offset ``lo`` in sorted-right coordinates;
  * pair materialization                = replicated/segmented iota expansion
    (``expand``), exactly as before.

No sequential per-key loop (the reference's biggest algorithmic weakness,
``join.fut:67-68``) and no binary search. Static shapes: materialization takes
``out_capacity`` decided by the planner from the count phase
(count-then-materialize, SURVEY §7 hard part 1).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from harkdb_tpu.columnar.batch import ColumnBatch
from harkdb_tpu.ops.sort import _pad_to_max
from harkdb_tpu.prims.segmented import replicated_iota, segmented_iota

Array = jax.Array


def _match_ranges(
    l_key: Array, n_l: Array, r_key: Array, n_r: Array
) -> Tuple[Array, Array, Array, Array, Array]:
    """Per-left-row right-side match ranges, all via one concat sort.

    Returns ``(l_perm, r_perm, lo, counts, total)``:
      * ``l_perm[i]``  — original left row at sorted-left position i;
      * ``r_perm[j]``  — original right row at sorted-right position j;
      * ``lo[i]``      — first matching sorted-right position for sorted-left
        row i; ``counts[i]`` matches follow contiguously;
      * ``total``      — total number of inner-join pairs.
    """
    nl, nr = l_key.shape[0], r_key.shape[0]
    n = nl + nr
    # Pads → dtype max so they cluster at the back; side key orders rights
    # (0) before lefts (1) within a key run, and pads of both sides last.
    lk = _pad_to_max(l_key, n_l)
    rk = _pad_to_max(r_key, n_r)
    l_idx = jnp.arange(nl, dtype=jnp.int32)
    r_idx = jnp.arange(nr, dtype=jnp.int32)
    l_pad = (l_idx >= n_l).astype(jnp.int32)
    r_pad = (r_idx >= n_r).astype(jnp.int32)

    keys = jnp.concatenate([lk, rk])
    # side: 0 = live right, 1 = live left, 2 = padding (either side).
    side = jnp.concatenate([1 + l_pad, r_pad * 2])
    orig = jnp.concatenate([l_idx, r_idx])

    skey, sside, sorig = jax.lax.sort(
        [keys, side, orig], num_keys=2, is_stable=True
    )

    pos = jnp.arange(n, dtype=jnp.int32)
    is_right = (sside == 0).astype(jnp.int32)
    is_left = sside == 1

    # Key-run starts; within-run inclusive right count via cumsum difference.
    prev = jnp.concatenate([skey[:1], skey[:-1]])
    run_start = (pos == 0) | (skey != prev)
    r_cum = jnp.cumsum(is_right)                       # inclusive rights so far
    # Base = rights before this run = r_excl at my run's start. r_excl is
    # non-decreasing, so a running max over values marked at run starts
    # forward-fills it — no scatter, no gather (each ~145 ms at 16M rows).
    r_excl = r_cum - is_right
    base = jax.lax.cummax(jnp.where(run_start, r_excl, 0))
    rights_in_run_so_far = r_cum - base                # incl. me if right

    # For a LEFT row, every right of its run precedes it → its match count is
    # rights_in_run_so_far and its lo is base.
    counts_sorted = jnp.where(is_left, rights_in_run_so_far, 0)
    lo_sorted = base

    # Split back into sorted-left / sorted-right coordinate arrays with ONE
    # payload-carrying sort each (cheap) instead of per-array gathers.
    not_left = jnp.logical_not(is_left).astype(jnp.int32)
    ol, cl, ll = jax.lax.sort(
        [not_left, sorig, counts_sorted, lo_sorted], num_keys=1,
        is_stable=True,
    )[1:]
    l_perm, counts, lo = ol[:nl], cl[:nl], ll[:nl]

    not_right = (1 - is_right).astype(jnp.int32)
    r_perm = jax.lax.sort(
        [not_right, sorig], num_keys=1, is_stable=True
    )[1][:nr]

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

    # One stacked gather for the three per-left-row values (gather cost on
    # TPU is dominated by the index count, not the row payload width).
    # ``safe_seg`` is monotone non-decreasing — tell XLA.
    packed = jnp.stack([l_perm, counts, lo], axis=1).at[safe_seg].get(
        indices_are_sorted=True
    )
    seg_l_perm, seg_counts, seg_lo = packed[:, 0], packed[:, 1], packed[:, 2]

    matched = live & (local < seg_counts)
    l_out = jnp.where(live, seg_l_perm, 0)
    r_pos = jnp.where(matched, seg_lo + local, 0)
    r_out = r_perm[jnp.minimum(r_pos, r_perm.shape[0] - 1)]
    r_out = jnp.where(matched, r_out, 0)
    return l_out, r_out, matched, total


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
    # Materialize outputs with ONE stacked gather per (side, dtype) — gather
    # cost is dominated by the index count, so k same-dtype columns ride one
    # gather instead of k.
    cols = {}

    def _gather_side(batch_side, out_map, idx_arr, zero_unmatched):
        by_dtype: Dict[str, list] = {}
        for src, dst in out_map.items():
            arr = batch_side.column(src)
            by_dtype.setdefault(str(arr.dtype), []).append((arr, dst))
        for members in by_dtype.values():
            if len(members) == 1:
                arr, dst = members[0]
                g = arr[idx_arr]
                if zero_unmatched:
                    g = jnp.where(matched, g, 0)
                cols[dst] = g
                continue
            stacked = jnp.stack([a for a, _ in members], axis=1)[idx_arr]
            for j, (_a, dst) in enumerate(members):
                g = stacked[:, j]
                if zero_unmatched:
                    g = jnp.where(matched, g, 0)
                cols[dst] = g

    _gather_side(left, l_out, l_idx, False)
    _gather_side(right, r_out, r_idx, kind == "left")
    # Restore the contract's column order ([left cols | right cols]) — the
    # dtype grouping above fills `cols` out of order.
    ordered = [*l_out.values(), *r_out.values()]
    return ColumnBatch({dst: cols[dst] for dst in ordered}, total)