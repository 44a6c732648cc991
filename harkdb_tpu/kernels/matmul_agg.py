"""MXU group-by: one-hot matmul aggregation (Pallas kernel).

The sort-based group-by (``ops/groupby.py``) is general but pays one sort +
one scatter-reduction pass. When the key range is small — the common case for
dimension/category keys — a TPU-native alternative puts the FLOPs where the
hardware wants them: the 128x128 MXU systolic array.

    sums[k, c] = Σ_i [key_i == k] * value_i_c        (a matmul!)

The measured cost driver is not FLOPs but the materialized one-hot tile's
VMEM traffic (~n x span elements), so the kernel factors the one-hot
TWO-LEVEL:

    onehot(key) = onehot_hi(key >> 5) ⊗ onehot_lo(key & 31)

Per row block it builds the tiny (BN, 32) lo one-hot, forms
``W[i, c*32 + l] = lo1h[i, l] * digit[i, c]`` (BN x 32C — still tiny), and
runs ONE matmul ``hi1h.T @ W`` into an (span/32, 32C) accumulator. The big
tile is now (BN, span/32) — 32x less VMEM traffic than the naive
(BN, span) one-hot, which is what lets the gate reach 16K-key spans
(measured at 16M rows, sum+count: naive f32 one-hot 55/165/314 ms at spans
1K/4K/8K; two-level bf16 ~50/50/59/70 ms at 1K/4K/8K/16K vs the sort
path's 91 ms — see BASELINE.md). Predicate masks
cost nothing: masked rows carry an out-of-range key, so their hi one-hot
row is all-zero.

Exact int32 sums despite a floating MXU: each int32 value is decomposed into
four balanced base-256 digits p_0..p_3 ∈ [-128, 127] (v = Σ p_j · 256^j) —
exactly representable in bf16, as are the 0/1 one-hots, and the MXU
accumulates products in f32 where per-block sums stay ≤ 2048·128 = 2^18 «
2^24. Each block partial is cast to int32 inside the kernel and accumulated
in an int32 VMEM tile with natural mod-2^32 wraparound — bit-identical to
the int32 sums the sort path produces.

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
KEY_TILE = 1024        # span padding granule (keeps span/LO a tile multiple)
LO = 32                # low-radix width of the two-level one-hot factoring
LOG2_LO = LO.bit_length() - 1   # hi/lo split shift; LO must be a power of 2
MAX_KEY_SPAN = 16384   # measured crossover vs the sort path (BASELINE.md)
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


def _agg_kernel(keys_ref, digits_ref, out_ref, w_scratch):
    """One row-block grid step of the two-level one-hot aggregation.

    keys_ref   : (BN,)  int32   — keys rebased to [0, span); excluded rows
                                   (padding/validity/WHERE) carry an
                                   out-of-range key, so their hi one-hot row
                                   is all-zero (no separate mask stream).
    digits_ref : (BN, C) bf16   — balanced digit columns (+ count column);
                                   digits ∈ [-128, 127] are exact in bf16.
    out_ref    : (H, LO*C) int32 — accumulator, H = span/LO; entry
                                   [h, c*LO + l] aggregates key h*LO + l
                                   (un-interleaved by the XLA wrapper);
                                   int32 keeps cross-block accumulation
                                   exact (mod 2^32).
    w_scratch  : (BN, LO*C) bf16 — W[i, c*LO + l] = lo1h[i, l] * digit[i, c]

    The only big intermediate is the (BN, H) hi one-hot — 32x smaller than
    a naive (BN, span) one-hot. MXU f32 accumulation is exact: products are
    0/±digit and per-block sums stay ≤ BN*128 = 2^18 « 2^24.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    keys = keys_ref[:]
    bn = keys.shape[0]
    h_dim = out_ref.shape[0]
    n_cols = digits_ref.shape[1]

    lo = keys & (LO - 1)
    hi = keys >> LOG2_LO
    lo_ids = jax.lax.broadcasted_iota(jnp.int32, (bn, LO), 1)
    lo1h = (lo[:, None] == lo_ids).astype(jnp.bfloat16)
    for c in range(n_cols):
        w_scratch[:, c * LO:(c + 1) * LO] = (
            lo1h * digits_ref[:, c][:, None]
        )
    hi_ids = jax.lax.broadcasted_iota(jnp.int32, (bn, h_dim), 1)
    hi1h = (hi[:, None] == hi_ids).astype(jnp.bfloat16)
    partial = jax.lax.dot_general(
        hi1h, w_scratch[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] += partial.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("span", "n_cols", "interpret")
)
def _run_kernel(keys0: Array, digit_mat: Array,
                span: int, n_cols: int, interpret: bool) -> Array:
    n = keys0.shape[0]
    h_dim = span // LO
    grid = (n // BLOCK_ROWS,)
    out = pl.pallas_call(
        _agg_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, n_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h_dim, LO * n_cols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_dim, LO * n_cols), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_ROWS, LO * n_cols), jnp.bfloat16),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * span * n_cols,
            bytes_accessed=n * (4 + 2 * n_cols) + h_dim * LO * n_cols * 4,
            transcendentals=0,
        ),
    )(keys0, digit_mat)
    # Un-interleave [h, c*LO + l] → [h*LO + l, c] = (span, C).
    return (
        out.reshape(h_dim, n_cols, LO)
        .transpose(0, 2, 1)
        .reshape(span, n_cols)
    )


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
            d.astype(jnp.bfloat16) for d in _balanced_digits(col)
        )
    digit_planes.append(jnp.ones((n,), jnp.bfloat16))  # count column
    digit_mat = jnp.stack(digit_planes, axis=1)

    if n_pad:
        keys0 = jnp.concatenate(
            [keys0, jnp.full((n_pad,), span_p, jnp.int32)]
        )
        digit_mat = jnp.concatenate(
            [digit_mat, jnp.zeros((n_pad, digit_mat.shape[1]), jnp.bfloat16)]
        )

    out = _run_kernel(
        keys0, digit_mat, span_p, digit_mat.shape[1], interpret
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