"""Streaming segment expansion (replicated_iota + monotone fills) — the
log-shift dilation kernel, the compaction kernel's mirror.

Join materialization needs, for every output slot p, the source segment
``seg[p] = max{i : offsets[i] <= p}`` plus several per-segment values
(segment start, first matching right row, match end). The reference builds
this with ``expand`` (``segmented.fut:70-74``); the XLA formulation is a
scatter of segment markers + ``cummax`` fill + a stacked gather — measured
at **160 ms** (scatter) + **~105 ms per gathered column** (gather cost
scales with BYTES, not indices: 354 ms for 3 columns vs 144 ms for 1 —
tools/join_profile.py) for 16M rows on v5e. This kernel computes the seg ids
AND any number of per-segment fills whose values are NON-DECREASING in the
source index (the fill is a max-scan — monotonicity makes max = nearest) at
streaming speed, leaving only genuinely non-monotone values (original row
ids, payload) to one thin gather.

Structure (mirrors ``kernels/compact.py``):

1. **Independent output superblocks.** Each grid step owns 16384 output
   slots. The sources intersecting a block are a CONTIGUOUS run of segment
   indices (offsets are strictly increasing once empty segments are
   pre-compacted — the caller does that with the compaction kernel), whose
   first index ``src_start[k]`` is precomputed host-side by a
   1-query-per-block ``searchsorted`` (1K queries — binary search is only
   catastrophic at row scale). Each step DMAs its own source windows from
   HBM at a dynamic sublane offset; no carry, fully parallel grid.

2. **Log-shift dilation.** Marker ``i`` must land at slot
   ``offsets[i] - block_start`` — a monotone RIGHT-shift routing (shift
   amounts are non-decreasing because offsets grow by >= 1 per non-empty
   segment). Power-of-two shift rounds processed **MSB -> LSB** keep
   intermediate positions injective: after the high-bit rounds, displacement
   ``(delta & high_mask)`` is monotone in the source index (prefix masks
   preserve <=), so no two live markers ever collide mid-flight — the exact
   time-reversal of the compaction kernel's LSB -> MSB argument. Movers
   zero their origin slot, so no ghosts.

3. **Max-scan fill.** A Hillis–Steele max forward-fills each slot with the
   nearest marker at or before it; slots before the first in-block marker
   take the block's baseline — the value of source ``src_start[k]`` itself
   (read from rolled slot 0 before exclusion). Correct for every plane
   because plane values are non-decreasing in the source index.

Cost per 16384-slot block: one (129, 128) DMA per plane + ~(22 + 29 x P)
rounds of vector selects/rolls — HBM traffic ~(P + 1) x 4 B/slot, the
streaming minimum.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from harkdb_tpu.kernels.compact import (
    LANES, _flat_iota, _shift_back_zero, _shift_front,
)

Array = jax.Array

BLOCK_ROWS = 128                 # output rows of 128 lanes per superblock
BLOCK = BLOCK_ROWS * LANES       # 16384 output slots per superblock
RT = BLOCK_ROWS + 1              # source-window rows (128-alignment margin)
TILE = RT * LANES
_NBITS = 14                      # 2**14 = BLOCK: covers every in-block shift
_I32_MAX = 2147483647


def _make_expand_kernel(n_extra: int):
    """Kernel over (scalar src_start, offsets, extra planes...) emitting
    seg ids + one fill per plane (offsets fill included as plane 0 output)."""

    def kernel(src_start_ref, offs_ref, *rest):
        extra_refs = rest[:n_extra]
        out_refs = rest[n_extra:n_extra + 2 + n_extra]   # seg, off, extras
        scratch = rest[n_extra + 2 + n_extra]            # (1+n_extra, RT, L)
        sems = rest[n_extra + 3 + n_extra]

        sb = pl.program_id(0)
        start = src_start_ref[sb]
        row_off = jax.lax.div(start, LANES)
        j0 = jax.lax.rem(start, LANES)
        kb = sb * BLOCK

        copies = []
        for i, ref in enumerate((offs_ref,) + tuple(extra_refs)):
            cp = pltpu.make_async_copy(
                ref.at[pl.ds(row_off, RT), :], scratch.at[i], sems.at[i]
            )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        # Align windows so flat slot s holds source[start + s]: a dynamic
        # front-roll by j0 < 128 via conditional static shifts; slots wrapped
        # from the tile front are poisoned (offsets → sentinel, so they are
        # excluded from the marker set; value planes follow the same mask).
        planes = [scratch[i] for i in range(1 + n_extra)]
        for bit in range(7):
            k = 1 << bit
            cond = ((j0 >> bit) & 1) > 0
            planes = [
                jnp.where(cond, _shift_front(p, k), p) for p in planes
            ]
        q = _flat_iota((RT, LANES))
        o = jnp.where(q < TILE - j0, planes[0], _I32_MAX)

        # Baselines: source src_start[k] itself (slot 0 after the roll) —
        # the segment containing the block's first slot. One per output:
        # seg id, its offset, then each extra plane's value.
        baselines = [start] + [p[0, 0] for p in planes]

        include = (o > kb) & (o < kb + BLOCK)
        delta = jnp.where(include, (o - kb) - q, 0)
        # Marker values: seg id, segment start, extras — all +1 so that 0
        # means "no marker" (values are >= 0 by contract).
        vals = [jnp.where(include, start + q + 1, 0),
                jnp.where(include, o + 1, 0)]
        for p in planes[1:]:
            vals.append(jnp.where(include, p + 1, 0))

        # Log-shift dilation, MSB -> LSB (injectivity: module docstring).
        # Pull semantics: slot s takes the element at s - 2^b iff that
        # element's delta has bit b; movers zero their origin (no ghosts).
        for b in reversed(range(_NBITS)):
            k = 1 << b
            src_delta = _shift_back_zero(delta, k)
            move_in = ((src_delta >> b) & 1) > 0
            self_out = ((delta >> b) & 1) > 0
            vals = [
                jnp.where(
                    move_in, _shift_back_zero(v, k),
                    jnp.where(self_out, 0, v),
                )
                for v in vals
            ]
            delta = jnp.where(
                move_in, src_delta, jnp.where(self_out, 0, delta)
            )

        # Forward fill: nearest marker at or before each slot (max scan —
        # exact because marker values are non-decreasing in source index).
        for b in range(_NBITS):
            k = 1 << b
            vals = [jnp.maximum(v, _shift_back_zero(v, k)) for v in vals]

        for out_ref, v, base in zip(out_refs, vals, baselines):
            out_ref[:] = jnp.maximum(v[:BLOCK_ROWS], base + 1) - 1

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "n_extra", "interpret")
)
def _run_expand(src_start, offs2d, extras2d, n_blocks, n_extra, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 + n_extra),
        out_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, LANES), lambda sb, *_: (sb, 0),
                memory_space=pltpu.VMEM,
            )
        ] * (2 + n_extra),
        scratch_shapes=[
            pltpu.VMEM((1 + n_extra, RT, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((1 + n_extra,)),
        ],
    )
    return pl.pallas_call(
        _make_expand_kernel(n_extra),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, LANES), jnp.int32)
        ] * (2 + n_extra),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=120 * n_blocks * TILE * (1 + n_extra),
            bytes_accessed=n_blocks * TILE * 4 * (3 + 2 * n_extra),
            transcendentals=0,
        ),
    )(src_start, offs2d, *extras2d)


def _to_plane(flat: Array, cap: int, sentinel: int) -> Array:
    """Pad a (cap,) int32 array to whole 128-lane rows + RT margin rows so a
    per-block window DMA never runs off the end."""
    rows = -(-cap // LANES)
    pad = rows * LANES - cap + RT * LANES
    return jnp.concatenate(
        [flat, jnp.full((pad,), sentinel, jnp.int32)]
    ).reshape(-1, LANES)


def expand_fills(
    offsets: Array,
    n_src: Array,
    out_capacity: int,
    extra_values: Sequence[Array] = (),
    interpret: bool = False,
) -> Tuple[Array, Array, List[Array]]:
    """Segment expansion with monotone per-segment fills.

    ``offsets``: (cap,) int32 exclusive starts of ``n_src`` NON-EMPTY
    segments — strictly increasing over live entries (pre-compact empty
    segments with the compaction kernel first); entries at index >= n_src
    are ignored. ``extra_values``: per-segment int32 arrays, each
    NON-NEGATIVE and NON-DECREASING over live entries (the max-fill
    contract).

    Returns ``(seg_ids, offsets_fill, extra_fills)`` over ``out_capacity``
    slots: ``seg_ids[p] = max{i < n_src : offsets[i] <= p}`` (0 if none),
    ``offsets_fill[p] = offsets[seg_ids[p]]``, and likewise per extra plane.
    Slots past the last segment's end keep the last segment's values —
    callers mask with their own live predicate.
    """
    cap = offsets.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    off_eff = jnp.where(idx < n_src, offsets, _I32_MAX)

    out_pad = -out_capacity % BLOCK
    n_blocks = (out_capacity + out_pad) // BLOCK
    block_starts = jnp.arange(n_blocks, dtype=jnp.int32) * BLOCK
    src_start = jnp.maximum(
        jnp.searchsorted(off_eff, block_starts, side="right").astype(
            jnp.int32
        ) - 1,
        0,
    )

    offs2d = _to_plane(off_eff, cap, _I32_MAX)
    extras2d = tuple(_to_plane(v, cap, 0) for v in extra_values)

    outs = _run_expand(
        src_start, offs2d, extras2d, n_blocks, len(extras2d), interpret
    )
    flat = [o.reshape(-1)[:out_capacity] for o in outs]
    return flat[0], flat[1], flat[2:]


def expand_ids(
    offsets: Array,
    n_src: Array,
    out_capacity: int,
    interpret: bool = False,
) -> Array:
    """seg_ids only — see :func:`expand_fills`."""
    seg, _off, _ = expand_fills(
        offsets, n_src, out_capacity, (), interpret
    )
    return seg
