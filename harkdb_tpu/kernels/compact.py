"""Streaming WHERE compaction at HBM speed — the log-shift Pallas kernel.

This implements, at TPU speed, the filter the reference left commented out
(``select.fut:18``: ``-- let rows_to_keep = filter f db``). Production
fallback is one payload-carrying sort (~62 ms for 16M rows on v5e); a true
streaming pass should cost ~1-2 ms. Two ideas make that possible on TPU,
where XLA's scatter runs at ~9 ns/element and Mosaic restricts dynamic HBM
addressing:

1. **Log-shift routing instead of scatter.** Packing kept rows to the front
   is a *monotone* routing: row i's displacement d(i) = i - dest(i) is
   non-decreasing over kept rows. Such routes decompose exactly into
   log2(N) rounds of power-of-two shifts with per-slot selects ("pull"
   semantics: slot s takes the element at s + 2^b iff that element's
   displacement has bit b set). Proof sketch: after round b every kept
   element e sits at slot q0(e) - (d(e) mod 2^(b+1)), which is injective
   over kept elements because d is monotone with slack (d(j) - d(i) <=
   j - i - 1 for kept i < j); stale copies ("ghosts") land only at slots
   past the kept count. Verified by brute force over randomized
   mask/carry cases (tests/test_kernels.py) in addition to the interpret
   suite. Every shift is a STATIC lane/sublane roll — pure VPU work, exact
   for any 4-byte dtype, no MXU, no 16-bit planes.

2. **A 128-row carry makes every HBM write 128-aligned by construction.**
   Output columns are shaped (rows, 128); a superblock whose kept rows
   start at global offset ``base`` writes the full rows
   [base//128, base//128 + R) — a dynamic offset on the SUBLANE axis only,
   always covering whole 128-lane rows. The first ``base % 128`` elements
   of the write are the previous superblock's tail, carried across grid
   steps in VMEM scratch (TPU grids run sequentially on the core, so
   scratch persists). The carry row itself is extracted with conditional
   static rolls (one per bit of the shift), so the kernel contains no
   dynamic VMEM addressing at all.

Cost per superblock of 16384 rows (C columns): ~15 scan rounds + 15 x (C+1)
route rounds of vector selects/rolls over (129, 128) tiles, plus one
(C, 129, 128) DMA out — HBM traffic is 4 bytes/row/column each way, the
streaming minimum.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128
BLOCK_ROWS = 128                 # input rows of 128 lanes per superblock
BLOCK = BLOCK_ROWS * LANES       # 16384 elements per superblock
RT = BLOCK_ROWS + 1              # tile rows: one carry row + input rows
TILE = RT * LANES                # 16512 slots
_NBITS = 15                      # 2**15 > TILE: covers every displacement


def _shift_front(x: Array, k: int) -> Array:
    """Flat row-major shift toward the front: out[s] = x[s + k].

    x has shape (..., R, 128); flat index s = row*128 + lane. Tail values
    (s + k out of range) are wraparound garbage — callers mask them.
    k must be a positive multiple of 128, or < 128.
    """
    if k % LANES == 0:
        return jnp.roll(x, -(k // LANES), axis=-2)
    assert k < LANES
    a = jnp.roll(x, -k, axis=-1)            # a[.., l] = x[.., (l+k)%128]
    b = jnp.roll(a, -1, axis=-2)            # next row's wrapped lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane < LANES - k, a, b)


def _shift_back_zero(x: Array, k: int) -> Array:
    """Flat shift toward the back with zero fill: out[s] = x[s-k], 0 if s<k."""
    q = _flat_iota(x.shape)
    if k % LANES == 0:
        y = jnp.roll(x, k // LANES, axis=-2)
    else:
        assert k < LANES
        a = jnp.roll(x, k, axis=-1)
        b = jnp.roll(a, 1, axis=-2)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        y = jnp.where(lane >= k, a, b)
    return jnp.where(q >= k, y, 0)


def _flat_iota(shape) -> Array:
    row = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return row * LANES + lane


def _make_kernel(n_cols: int):
    def kernel(offsets_ref, mask_ref, *rest):
        col_refs = rest[:n_cols]
        out_refs = rest[n_cols:2 * n_cols]
        tiles, carry, sems = rest[2 * n_cols:]

        sb = pl.program_id(0)
        base = offsets_ref[sb]
        c_sb = offsets_ref[sb + 1] - base
        r = jax.lax.rem(base, LANES)
        row_off = jax.lax.div(base, LANES)

        @pl.when(sb == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)

        # Tile assembly: row 0 = carry (slots [0, r) real), rows 1.. = input.
        zrow = jnp.zeros((1, LANES), jnp.int32)
        mask_t = jnp.concatenate([zrow, mask_ref[:]], axis=0)     # (RT, 128)
        kept = mask_t > 0
        q = _flat_iota((RT, LANES))

        # Rank among kept (exclusive) via Hillis-Steele scan in flat order.
        pos = mask_t
        for b in range(_NBITS):
            pos = pos + _shift_back_zero(pos, 1 << b)
        pos_excl = pos - mask_t

        delta = jnp.where(kept, q - (r + pos_excl), 0)

        vals: List[Array] = []
        for c in range(n_cols):
            vals.append(jnp.concatenate(
                [carry[c].reshape(1, LANES), col_refs[c][:]], axis=0
            ))

        # Log-shift routing, LSB -> MSB.
        for b in range(_NBITS):
            k = 1 << b
            dsrc = _shift_front(delta, k)
            move = ((dsrc >> b) & 1) > 0
            move = move & (q + k < TILE)       # suppress wraparound sources
            vals = [jnp.where(move, _shift_front(v, k), v) for v in vals]
            delta = jnp.where(move, dsrc, delta)

        for c in range(n_cols):
            tiles[c] = vals[c]

        # One aligned DMA per column: whole 128-lane rows at a dynamic
        # sublane offset (slots past r + c_sb are overwritten by the next
        # superblock, or are tail padding past the final count).
        copies = []
        for c in range(n_cols):
            cp = pltpu.make_async_copy(
                tiles.at[c],
                out_refs[c].at[pl.ds(row_off, RT), :],
                sems.at[c],
            )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        # Carry for the next superblock: tile row (r + c_sb) // 128, i.e. the
        # partially-filled row containing global slot base + c_sb. Extracted
        # with conditional static rolls (s_rows <= 128 < RT, so cumulative
        # wraparound over RT rows never reaches row 0).
        s_rows = jax.lax.div(r + c_sb, LANES)
        for bit in range(8):
            kk = 1 << bit

            @pl.when(((s_rows >> bit) & 1) == 1)
            def _(kk=kk):
                tiles[:] = jnp.roll(tiles[:], -kk, axis=1)

        carry[:] = tiles[:, 0, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("n_cols", "interpret"))
def _run(offsets, mask2d, cols2d, n_cols, interpret):
    n_sb = mask2d.shape[0] // BLOCK_ROWS
    out_rows = mask2d.shape[0] + RT
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sb,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda sb, *_: (sb, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda sb, *_: (sb, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_cols)
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_cols,
        scratch_shapes=[
            pltpu.VMEM((n_cols, RT, LANES), jnp.int32),
            pltpu.VMEM((n_cols, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((n_cols,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(n_cols),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32)
        ] * n_cols,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=40 * mask2d.size * (n_cols + 2),
            bytes_accessed=mask2d.size * 4 * (2 * n_cols + 1),
            transcendentals=0,
        ),
    )(offsets, mask2d, *cols2d)


def flat_compact(
    cols: Dict[str, Array],
    mask: Array,
    n_valid: Array,
    interpret: bool = False,
) -> Tuple[Dict[str, Array], Array]:
    """Pack rows where ``mask`` holds to the front, preserving order.

    Returns ``(cols_out, count)``: outputs keep the input capacity; rows at
    index >= count are unspecified (engine padding convention). Columns must
    be 4-byte dtypes (int32/uint32/float32 — floats travel bitcast).
    """
    n0 = mask.shape[0]
    idx = jnp.arange(n0, dtype=jnp.int32)
    mask = mask & (idx < n_valid)
    pad = -n0 % BLOCK
    m32 = mask.astype(jnp.int32)
    if pad:
        m32 = jnp.concatenate([m32, jnp.zeros((pad,), jnp.int32)])
    counts = m32.reshape(-1, BLOCK).sum(axis=1)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    count = offsets[-1]

    names = list(cols.keys())
    ins: List[Array] = []
    for name in names:
        col = cols[name]
        bits = (col if col.dtype == jnp.int32
                else jax.lax.bitcast_convert_type(col, jnp.int32))
        if pad:
            bits = jnp.concatenate([bits, jnp.zeros((pad,), jnp.int32)])
        ins.append(bits.reshape(-1, LANES))

    outs = _run(offsets, m32.reshape(-1, LANES), ins, len(names), interpret)

    out_cols: Dict[str, Array] = {}
    for name, out2d in zip(names, outs):
        flat = out2d.reshape(-1)[:n0]
        dt = cols[name].dtype
        if dt != jnp.int32:
            flat = jax.lax.bitcast_convert_type(flat, dt)
        out_cols[name] = flat
    return out_cols, count


def flat_compact_supported(cols: Dict[str, Array]) -> bool:
    return all(
        c.dtype in (jnp.int32, jnp.uint32, jnp.float32)
        for c in cols.values()
    )
