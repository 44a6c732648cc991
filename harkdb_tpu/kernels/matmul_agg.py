"""MXU group-by: one-hot matmul aggregation (Pallas kernel).

The sort-based group-by (``ops/groupby.py``) is general but pays one sort +
one scatter-reduction pass. When the key range is small — the common case for
dimension/category keys — a TPU-native alternative puts the FLOPs where the
hardware wants them: the 128x128 MXU systolic array.

    sums[k, c] = Σ_i [key_i == k] * value_i_c        (a matmul!)

The kernel streams row blocks HBM→VMEM, builds the (BN, K) one-hot tile
*in VMEM only* (never materialized to HBM — this is exactly what Pallas buys
over plain XLA here), and accumulates ``onehot.T @ values`` into a (K, C)
VMEM accumulator. Predicate masks fuse for free (multiply the one-hot rows).

Exact int32 sums despite a floating MXU: each int32 value is decomposed into
four balanced base-256 digits p_0..p_3 ∈ [-128, 127] (v = Σ p_j · 256^j).
Per 2048-row block the digit matmul's f32 result is exact (|Σ digits| ≤
2048·128 = 2^18 « 2^24); each block partial is cast to int32 inside the
kernel and accumulated in an int32 VMEM tile with natural mod-2^32
wraparound — bit-identical to the int32 sums the sort path produces.

Applicability gate: all aggregates ∈ {sum, count, avg} and key span ≤
``MAX_KEY_SPAN``. count rides as an extra all-ones digit column. max/min/prod
stay on the sort path.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK_ROWS = 2048
KEY_TILE = 1024
MAX_KEY_SPAN = 8192
N_DIGITS = 4


def matmul_agg_applicable(ops: Sequence[str], key_span: int) -> bool:
    return key_span <= MAX_KEY_SPAN and all(
        op in ("sum", "count") for op in ops
    )


def _balanced_digits(v: Array) -> List[Array]:
    """int32 → 4 balanced base-256 digits in [-128, 127], exact."""
    digits = []
    r = v
    for _ in range(N_DIGITS):
        d = ((r + 128) & 255) - 128
        digits.append(d)
        r = (r - d) >> 8
    return digits


def _agg_kernel(keys_ref, digits_ref, valid_ref, out_ref):
    """One (row-block i, key-tile j) grid step.

    keys_ref   : (BN,)  int32   — keys rebased to [0, span)
    digits_ref : (BN, C) f32    — balanced digit columns (+ count column)
    valid_ref  : (BN,)  f32     — 1.0 for live rows passing the mask
    out_ref    : (KT, C) int32  — accumulator tile for key range
                                   [j*KT, (j+1)*KT); int32 so cross-block
                                   accumulation is exact (mod 2^32)
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    keys = keys_ref[:]
    kt = out_ref.shape[0]
    local = keys - j * kt
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (keys.shape[0], kt), 1)
    onehot = (local[:, None] == key_ids).astype(jnp.float32)
    onehot = onehot * valid_ref[:][:, None]
    partial = jax.lax.dot_general(
        onehot, digits_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] += partial.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("span", "n_cols", "interpret")
)
def _run_kernel(keys0: Array, digit_mat: Array, valid_f: Array,
                span: int, n_cols: int, interpret: bool) -> Array:
    n = keys0.shape[0]
    grid = (n // BLOCK_ROWS, span // KEY_TILE)
    return pl.pallas_call(
        _agg_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, n_cols), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KEY_TILE, n_cols), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((span, n_cols), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * span * n_cols,
            bytes_accessed=n * (4 + 4 * n_cols + 4) + span * n_cols * 4,
            transcendentals=0,
        ),
    )(keys0, digit_mat, valid_f)


def onehot_groupby_sums(
    key: Array,
    value_cols: Sequence[Array],
    n_valid: Array,
    key_min: Array,
    span: int,
    mask: Optional[Array] = None,
    interpret: bool = False,
) -> Tuple[Array, List[Array], Array]:
    """Dense-key group-by sums on the MXU.

    Returns ``(counts, sums, keys_axis)`` where ``counts[k]`` /
    ``sums[c][k]`` aggregate rows with ``key == key_min + k`` (k < span) and
    ``keys_axis[k] = key_min + k``. Rows beyond ``n_valid`` or failing
    ``mask`` are excluded. Exact int32 (mod 2^32) semantics.
    """
    n = key.shape[0]
    # Pad rows to a BLOCK_ROWS multiple; span to a KEY_TILE multiple.
    n_pad = -n % BLOCK_ROWS
    span_p = -(-span // KEY_TILE) * KEY_TILE
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < n_valid
    if mask is not None:
        valid = valid & mask

    keys0 = jnp.where(valid, key - key_min, span_p)  # out-of-range → no tile
    digit_planes: List[Array] = []
    for col in value_cols:
        digit_planes.extend(
            d.astype(jnp.float32) for d in _balanced_digits(col)
        )
    digit_planes.append(jnp.ones((n,), jnp.float32))  # count column
    digit_mat = jnp.stack(digit_planes, axis=1)
    valid_f = valid.astype(jnp.float32)

    if n_pad:
        keys0 = jnp.concatenate(
            [keys0, jnp.full((n_pad,), span_p, jnp.int32)]
        )
        digit_mat = jnp.concatenate(
            [digit_mat, jnp.zeros((n_pad, digit_mat.shape[1]), jnp.float32)]
        )
        valid_f = jnp.concatenate([valid_f, jnp.zeros((n_pad,), jnp.float32)])

    out = _run_kernel(
        keys0, digit_mat, valid_f, span_p, digit_mat.shape[1], interpret
    )                                                  # (span_p, C)

    counts = out[:span, -1]
    sums: List[Array] = []
    for ci in range(len(value_cols)):
        acc = jnp.zeros((span,), jnp.int32)
        for d in range(N_DIGITS):
            acc = acc + (out[:span, ci * N_DIGITS + d] << (8 * d))
        sums.append(acc)
    keys_axis = key_min + jnp.arange(span, dtype=key.dtype)
    return counts, sums, keys_axis