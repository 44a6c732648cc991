"""Streaming inclusive segmented scan — carry-chained Pallas kernel.

The group-by's non-telescoping aggregates (max / min / prod / float sum)
need an inclusive per-segment scan over the sorted rows. The XLA
formulation (``prims.segmented.doubling_segmented_scan``) is Hillis–Steele
over the FULL array: ceil(log2 n) = 24 rounds at 16M rows, each a
whole-array read+select+write — ~4 GB of HBM traffic for one column. This
kernel streams the array ONCE: each 16384-row tile runs the same
log-doubling rounds entirely in VMEM (nearly free next to HBM) and chains a
(segment id, running value) carry through the sequential grid — 12 B/row of
HBM traffic, the streaming minimum.

Contract (same as doubling_segmented_scan): ``sid`` assigns each row a
segment id, rows of a segment contiguous and ids non-decreasing (the caller
sorted by key); each value column scans independently under the shared
``sid``. Values must be 4-byte (int32/float32). Rows carry garbage past the
caller's live region exactly like every engine kernel — callers only read
live segment ends. Integer results are bit-identical to the doubling scan;
float32 sums combine in a different (deterministic) tree order, so they can
differ in the last ulp — inherent to any fixed-but-different association.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from harkdb_tpu.kernels.compact import LANES, _flat_iota

Array = jax.Array

BLOCK_ROWS = 128                 # (128, 128) tile = 16384 rows per grid step
BLOCK = BLOCK_ROWS * LANES
_NBITS = 14                      # 2**14 = BLOCK

_OPS = {
    "add": lambda a, b: a + b,
    "max": jnp.maximum,
    "min": jnp.minimum,
    "mul": lambda a, b: a * b,
}


def _shift_back_fill(x: Array, k: int, fill) -> Array:
    """Flat row-major shift toward the back: out[s] = x[s-k], ``fill`` for
    s < k (op-neutral fill — unlike compact.py's zero-fill variant)."""
    q = _flat_iota(x.shape)
    if k % LANES == 0:
        y = jnp.roll(x, k // LANES, axis=-2)
    else:
        assert k < LANES
        a = jnp.roll(x, k, axis=-1)
        b = jnp.roll(a, 1, axis=-2)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        y = jnp.where(lane >= k, a, b)
    return jnp.where(q >= k, y, jnp.asarray(fill, x.dtype))


def _make_segscan_kernel(op_name: str, n_cols: int, neutral):
    op = _OPS[op_name]

    def kernel(sid_ref, *rest):
        # Carries live in SMEM: Mosaic rejects scalar stores to VMEM
        # ("Cannot store scalars to VMEM"), and (segment id, running value)
        # are genuine scalars chained across the sequential grid.
        col_refs = rest[:n_cols]
        out_refs = rest[n_cols:2 * n_cols]
        carry_sid, carry_val = rest[2 * n_cols:]

        sb = pl.program_id(0)

        @pl.when(sb == 0)
        def _():
            carry_sid[0] = -1
            for c in range(n_cols):
                carry_val[c] = jnp.asarray(neutral, carry_val.dtype)

        sid = sid_ref[:]
        # In-tile inclusive segmented scan: log-doubling entirely in VMEM.
        # Shifted-in slots read the op's neutral, so partial windows at the
        # tile front combine harmlessly.
        outs = [ref[:] for ref in col_refs]
        for b in range(_NBITS):
            k = 1 << b
            prev_sid = _shift_back_fill(sid, k, -2)
            same = prev_sid == sid
            outs = [
                jnp.where(same, op(v, _shift_back_fill(v, k, neutral)), v)
                for v in outs
            ]

        # Fold the running carry into this tile's leading segment (rows with
        # sid == carry_sid form a prefix — ids are non-decreasing). The folded
        # value already includes the carry, so the new carry is simply the
        # folded last element.
        csid = carry_sid[0]
        lead = sid == csid
        # Scalar extraction of the tile's flat-last element as a masked sum
        # (exactly one nonzero term — exact for ints and floats; Mosaic has no
        # vector→scalar extract).
        row = jax.lax.broadcasted_iota(jnp.int32, sid.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, sid.shape, 1)
        is_last = (row == BLOCK_ROWS - 1) & (lane == LANES - 1)
        for c in range(n_cols):
            cv = carry_val[c]
            folded = jnp.where(lead, op(outs[c], cv), outs[c])
            out_refs[c][:] = folded
            carry_val[c] = jnp.sum(
                jnp.where(is_last, folded, jnp.zeros_like(folded))
            )
        carry_sid[0] = jnp.sum(jnp.where(is_last, sid, jnp.zeros_like(sid)))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("op_name", "n_cols", "neutral", "interpret")
)
def _run_segscan(sid2d, cols2d, op_name, n_cols, neutral, interpret):
    n_sb = sid2d.shape[0] // BLOCK_ROWS
    dtype = cols2d[0].dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_sb,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda sb: (sb, 0),
                         memory_space=pltpu.VMEM)
        ] * (1 + n_cols),
        out_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda sb: (sb, 0),
                         memory_space=pltpu.VMEM)
        ] * n_cols,
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((n_cols,), dtype),
        ],
    )
    return pl.pallas_call(
        _make_segscan_kernel(op_name, n_cols, neutral),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(sid2d.shape, dtype)
        ] * n_cols,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=60 * sid2d.size * n_cols,
            bytes_accessed=sid2d.size * 4 * (1 + 2 * n_cols),
            transcendentals=0,
        ),
    )(sid2d, *cols2d)


def segscan_supported(op_name: str, dtype) -> bool:
    return op_name in _OPS and jnp.dtype(dtype).itemsize == 4


def flat_segscan(
    op_name: str,
    sid: Array,
    cols: Sequence[Array],
    neutral,
    interpret: bool = False,
) -> List[Array]:
    """Inclusive segmented scan of each column under shared contiguous,
    non-decreasing segment ids. Pads inputs to a tile multiple internally
    (padding rows extend the last segment — their outputs are dropped)."""
    cols = list(cols)
    n = sid.shape[0]
    pad = -n % BLOCK
    if pad:
        sid = jnp.concatenate([sid, jnp.full((pad,), -3, sid.dtype)])
    sid2d = sid.astype(jnp.int32).reshape(-1, LANES)
    cols2d = []
    for c in cols:
        if pad:
            c = jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
        cols2d.append(c.reshape(-1, LANES))
    outs = _run_segscan(
        sid2d, tuple(cols2d), op_name, len(cols), neutral, interpret
    )
    return [o.reshape(-1)[:n] for o in outs]
