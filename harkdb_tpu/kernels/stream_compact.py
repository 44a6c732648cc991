"""Streaming compaction (WHERE filter) at HBM speed — Pallas + MXU.

Measured reality on v5e: XLA's comparison sort moves ~log²(n) × data of HBM
traffic (62 ms to filter 16M rows via sort-carry) and XLA's scatter/gather
run at ~10 ns/element — both far off the ~0.4 ms a streaming filter should
cost. This kernel gets compaction to streaming speed with two TPU-native
tricks:

  1. **Block-local compaction as a permutation matmul.** For each 512-row
     block, the keep-rows-packed-first permutation is a one-hot matrix P
     (P[j, i] = 1 iff row i is the j-th kept row), and packing is ``P @ X`` —
     512x512x C FLOPs on the MXU instead of per-row data movement.
     Exactness: int32/float32 payloads are split into two 16-bit planes
     (values < 2^16 are exact in f32; floats ride bitcast via their int32
     bits), recombined after the kernel.

  2. **Sequential-grid packed writes.** TPU Pallas grids execute
     sequentially on the core, so block b can DMA its packed rows from VMEM
     straight to the output's HBM at dynamic row offset ``offsets[b]``
     (exclusive prefix sum of block keep-counts, computed in XLA and
     scalar-prefetched). Rows past a block's count are overwritten by the
     next block; the final tail is engine padding by convention.

The output buffer carries ``BLOCK`` extra rows of scratch tail so the last
block's full-width DMA stays in bounds.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK = 512


def _kernel(offsets_ref, mask_ref, planes_ref, out_ref, scratch, sem):
    b = pl.program_id(0)
    mask = mask_ref[:].astype(jnp.float32)           # (BLOCK,)
    # In-block inclusive prefix sum as a lower-triangular matmul (Mosaic has
    # no cumsum primitive; the MXU does this in one pass, exact for counts
    # ≤ BLOCK « 2^24 in f32).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    tril = (col_ids <= row_ids).astype(jnp.float32)
    pos_incl = jax.lax.dot_general(
        tril, mask[:, None],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, 0]
    pos = pos_incl.astype(jnp.int32) - 1             # target row per kept row
    src_pos = pos[None, :]                           # (1, BLOCK)
    perm = ((row_ids == src_pos) & (mask[None, :] > 0)).astype(jnp.float32)
    scratch[:] = jax.lax.dot_general(
        perm, planes_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    copy = pltpu.make_async_copy(
        scratch, out_ref.at[pl.ds(offsets_ref[b], BLOCK), :], sem
    )
    copy.start()
    copy.wait()


@functools.partial(jax.jit, static_argnames=("n_planes", "interpret"))
def _run(mask_i32, planes, offsets, n_planes, interpret):
    n = mask_i32.shape[0]
    grid = (n // BLOCK,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda b, *_: (b,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, n_planes), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, n_planes), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n + BLOCK, n_planes), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * BLOCK * n_planes,
            bytes_accessed=2 * n * n_planes * 4,
            transcendentals=0,
        ),
    )(offsets, mask_i32, planes)


def stream_compact(
    cols: Dict[str, Array],
    mask: Array,
    n_valid: Array,
    interpret: bool = False,
) -> Tuple[Dict[str, Array], Array]:
    """Pack rows where ``mask`` holds to the front, preserving order.

    Returns ``(cols_out, count)``; output arrays keep the input capacity
    (plus hidden scratch tail handled internally). Works for int32 and
    float32 columns (floats travel bitcast through the integer planes).
    """
    n0 = mask.shape[0]
    pad = -n0 % BLOCK
    if pad:
        cols = {
            name: jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
            for name, c in cols.items()
        }
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
    n = n0 + pad
    idx = jnp.arange(n, dtype=jnp.int32)
    mask = mask & (idx < n_valid)
    count = jnp.sum(mask).astype(jnp.int32)

    names = list(cols.keys())
    planes: List[Array] = []
    is_float: List[bool] = []
    for name in names:
        col = cols[name]
        fl = jnp.issubdtype(col.dtype, jnp.floating)
        is_float.append(bool(fl))
        bits = jax.lax.bitcast_convert_type(col, jnp.int32) if fl else col
        u = bits.astype(jnp.uint32)
        planes.append((u & 0xFFFF).astype(jnp.float32))          # lo 16
        planes.append((u >> 16).astype(jnp.float32))             # hi 16
    plane_mat = jnp.stack(planes, axis=1)                         # (n, 2k)

    mask_i32 = mask.astype(jnp.int32)
    block_counts = mask_i32.reshape(-1, BLOCK).sum(axis=1)
    offsets = (jnp.cumsum(block_counts) - block_counts).astype(jnp.int32)

    out = _run(mask_i32, plane_mat, offsets, plane_mat.shape[1], interpret)

    out_cols: Dict[str, Array] = {}
    live = idx[:n0] < count
    for i, name in enumerate(names):
        lo = out[:n0, 2 * i].astype(jnp.uint32)
        hi = out[:n0, 2 * i + 1].astype(jnp.uint32)
        bits = (lo | (hi << 16)).astype(jnp.uint32)
        col = jax.lax.bitcast_convert_type(bits, jnp.int32)
        if is_float[i]:
            col = jax.lax.bitcast_convert_type(bits, jnp.float32)
        out_cols[name] = jnp.where(live, col, 0)
    return out_cols, count


def stream_compact_supported(cols: Dict[str, Array]) -> bool:
    return all(
        c.dtype in (jnp.int32, jnp.float32) for c in cols.values()
    )
