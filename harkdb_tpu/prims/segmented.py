"""Flag-array segmented operations — the flat-data-parallel substrate.

Same contracts as the reference's vendored diku-dk/segmented 0.3.1 library
(``futhark/lib/github.com/diku-dk/segmented/segmented.fut``):

  * ``segmented_scan``  — inclusive per-segment scan        (segmented.fut:7-13)
  * ``segmented_reduce``— one value per segment             (segmented.fut:20-37)
  * ``replicated_iota`` — [2,3,1] → [0,0,1,1,1,2]           (segmented.fut:44-50)
  * ``segmented_iota``  — per-segment restart iota          (segmented.fut:58-60)
  * ``expand``          — irregular nested flattening       (segmented.fut:70-74)

Implementation is TPU-idiomatic, not a translation: segmented scan is a single
``jax.lax.associative_scan`` over (flag, value) pairs — O(log n) depth, fully
vectorized on the VPU — instead of Futhark's generic scan instantiation. All
functions follow the engine's static-shape convention: padded arrays + valid
counts (variable-size outputs return (padded_values, n_out)).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def segmented_scan(op: Callable, ne, flags: Array, values: Array) -> Array:
    """Inclusive segmented scan. ``flags[i]`` True starts a new segment at i.

    Oblivious to validity: the caller pre-masks padding to ``ne`` if needed.
    Uses the standard segmented-scan monoid lift over (flag, value) pairs.
    """
    flags = flags.astype(jnp.bool_)

    def combine(a, b):
        af, av = a
        bf, bv = b
        return jnp.logical_or(af, bf), jnp.where(bf, bv, op(av, bv))

    _, out = jax.lax.associative_scan(combine, (flags, values))
    return out


def segmented_reduce(
    op: Callable, ne, flags: Array, values: Array, n_valid: Array | None = None
) -> Tuple[Array, Array]:
    """Per-segment reduction.

    Returns ``(out, n_segments)``: ``out`` keeps the input capacity, with
    ``out[s]`` = reduction of segment ``s`` for ``s < n_segments`` and ``ne``
    beyond. Convention (as in segmented.fut:20-37): element 0 always opens
    segment 0, flagged or not. Padding rows (index >= n_valid) are ignored.
    """
    n = values.shape[0]
    if n_valid is None:
        n_valid = jnp.int32(n)
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < n_valid

    f = flags.astype(jnp.int32).at[0].set(1)
    f = jnp.where(valid, f, 0)
    values = jnp.where(valid, values, ne)

    scanned = segmented_scan(op, ne, f > 0, values)

    seg_ids = jnp.cumsum(f) - 1                      # 0-based segment id
    n_segments = jnp.where(
        n_valid > 0, seg_ids[jnp.maximum(n_valid - 1, 0)] + 1, 0
    ).astype(jnp.int32)

    # After an inclusive scan the *last* element of each segment holds the full
    # reduction. A live row is a segment end iff the next row starts a new
    # segment (padding has f=0, so the last live row is caught explicitly).
    next_f = jnp.concatenate([f[1:], jnp.zeros((1,), jnp.int32)])
    is_end = valid & ((next_f > 0) | (idx == n_valid - 1))

    target = jnp.where(is_end, seg_ids, n)           # n → out-of-bounds → dropped
    out = jnp.full((n,), ne, dtype=scanned.dtype).at[target].set(scanned, mode="drop")
    return out, n_segments


def replicated_iota(
    reps: Array, out_capacity: int, n_valid: Array | None = None
) -> Tuple[Array, Array]:
    """[2,3,1] → [0,0,1,1,1,2]  (segmented.fut:44-50).

    ``reps`` is padded; ``n_valid`` counts live entries. Returns
    ``(ids, total)``; ids beyond ``total`` are padded with ``len(reps)``
    (a harmless gather target for pre-padded sources). Zero-length segments
    are skipped correctly (their ids never appear).
    """
    n = reps.shape[0]
    if n_valid is None:
        n_valid = jnp.int32(n)
    valid = jnp.arange(n, dtype=jnp.int32) < n_valid
    reps = jnp.where(valid, reps, 0).astype(jnp.int32)
    offsets = jnp.cumsum(reps) - reps                # exclusive scan
    total = jnp.sum(reps).astype(jnp.int32)

    # Scatter (segment_id + 1) with MAX at each non-empty segment's start
    # offset, then a running max-scan minus 1 fills the gaps. Empty segments
    # collide on the same offset; max keeps the right (largest) id.
    seg_idx = jnp.arange(n, dtype=jnp.int32)
    target = jnp.where(valid & (reps > 0), offsets, out_capacity)
    markers = (
        jnp.zeros((out_capacity,), dtype=jnp.int32)
        .at[target]
        .max(seg_idx + 1, mode="drop")
    )
    ids = jax.lax.associative_scan(jnp.maximum, markers) - 1
    ids = jnp.maximum(ids, 0)
    out_valid = jnp.arange(out_capacity, dtype=jnp.int32) < total
    ids = jnp.where(out_valid, ids, n)
    return ids, total


def segmented_iota(flags: Array) -> Array:
    """Per-segment restarting iota: [F,F,T,F] → [0,1,0,1] (segmented.fut:58-60)."""
    ones = jnp.ones(flags.shape, dtype=jnp.int32)
    return segmented_scan(jnp.add, 0, flags, ones) - 1


def expand(
    sizes: Array,
    get: Callable[[Array, Array], Array],
    out_capacity: int,
    n_valid: Array | None = None,
) -> Tuple[Array, Array]:
    """Irregular flattening (segmented.fut:70-74).

    ``sizes[i]`` elements are produced for source row i; ``get(src_ids, locals)``
    is applied vectorized over the flat output (src index + position within its
    segment). Returns ``(out, total)`` padded to ``out_capacity``. Padding rows
    of the output call ``get`` with src index ``len(sizes)`` — callers using
    gathers should pad their source arrays by one slot or rely on clip/drop.
    """
    seg_ids, total = replicated_iota(sizes, out_capacity, n_valid)
    out_idx = jnp.arange(out_capacity, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), seg_ids[1:] != seg_ids[:-1]]
    )
    local = segmented_iota(starts)
    local = jnp.where(out_idx < total, local, 0)
    safe_ids = jnp.minimum(seg_ids, sizes.shape[0] - 1)
    out = get(safe_ids, local)
    return out, total
