"""Skew-aware salted repartitioning for distributed joins.

Hash partitioning sends every row of key K to shard ``hash(K) % D`` — one hot
probe key overloads a single shard (the classic shuffle-skew failure; the
north star demands "skew detection and salted repartitioning"). Scheme:

  1. **Detect** (local, cheap): each shard counts its probe-side keys (one
     payload-carrying sort + segment count — the engine's group-by machinery)
     and nominates up to ``HOT_K`` keys whose local count exceeds
     ``skew_threshold x (local rows / D)``; an ``all_gather`` replicates the
     union H (static size D x HOT_K, with validity flags — empty when no
     skew).
  2. **Salt the probe side**: rows with hot keys route round-robin
     ``(row position + shard id) % D`` instead of by hash — spreading the hot
     key over all D shards.
  3. **Replicate the build side**: rows with hot keys are expanded D-fold
     (copy j → shard j), so every salted probe shard holds the full build set
     for that key. Non-hot rows route by hash as usual.

Correctness: both sides compute membership against the SAME replicated H, a
probe row lives on exactly one shard, and build copies are only joined where
probe rows exist — no duplicate or missing pairs (differential tests vs the
single-chip path, including the hot-key case, in tests/test_skew.py).

Group-by needs none of this: local pre-aggregation collapses a hot key to at
most one partial row per shard before its shuffle (dist_ops.dist_groupby).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from harkdb_tpu.prims.segmented import replicated_iota, segmented_iota
from harkdb_tpu.parallel.shuffle import hash_to_bucket

Array = jax.Array

HOT_K = 16          # max hot keys nominated per shard


def detect_hot_keys(
    key: Array, n_valid: Array, n_shards: int, threshold_frac: float,
    axis_name: str,
) -> Tuple[Array, Array]:
    """Local heavy-hitter detection + all_gather.

    Returns ``(H, HV)`` replicated across shards: hot key candidates of shape
    (D * HOT_K,) and their validity mask. A key is nominated when its local
    count exceeds ``threshold_frac * live_rows / n_shards`` (it would
    meaningfully unbalance its destination bucket). The threshold is on the
    LIVE row count ``n_valid``, not the padded capacity — after an upstream
    filter leaves a shard mostly padding, a capacity-based threshold would
    be inflated and real hot keys would escape salting.
    """
    n = key.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < n_valid
    # Sort keys (pads last via dtype max), count runs.
    hi = jnp.array(jnp.iinfo(key.dtype).max, key.dtype)
    eff = jnp.where(valid, key, hi)
    skey = jax.lax.sort([eff], num_keys=1, is_stable=False)[0]
    prev = jnp.concatenate([skey[:1], skey[:-1]])
    flags = (valid & ((idx == 0) | (skey != prev))).astype(jnp.int32)
    seg_ids = jnp.cumsum(flags) - 1
    target = jnp.where(valid, seg_ids, n)
    counts = jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), target, num_segments=n,
        indices_are_sorted=True,
    )
    seg_keys = jax.ops.segment_min(
        skey, target, num_segments=n, indices_are_sorted=True
    )
    thresh = jnp.maximum(
        (threshold_frac * jnp.asarray(n_valid, jnp.float32) / n_shards)
        .astype(jnp.int32),
        jnp.int32(2),
    )
    # Top-HOT_K by count: sort (count desc, key) and take the head.
    neg_counts = -counts
    sc, sk = jax.lax.sort([neg_counts, seg_keys], num_keys=1,
                          is_stable=True)
    hot = sk[:HOT_K]
    hot_valid = (-sc[:HOT_K]) > thresh
    H = jax.lax.all_gather(hot, axis_name, axis=0, tiled=True)
    HV = jax.lax.all_gather(hot_valid, axis_name, axis=0, tiled=True)
    return H, HV


def is_member(key: Array, H: Array, HV: Array) -> Array:
    """Vectorized membership: key[i] ∈ {H[j] : HV[j]}."""
    eq = key[:, None] == H[None, :]
    return jnp.any(eq & HV[None, :], axis=1)


def salted_probe_dest(
    key: Array, hot: Array, n_shards: int, shard_id: Array
) -> Array:
    """Probe routing: hot keys round-robin over all shards, rest by hash."""
    n = key.shape[0]
    spread = (jnp.arange(n, dtype=jnp.int32) + shard_id) % n_shards
    return jnp.where(hot, spread, hash_to_bucket(key, n_shards))


def replicate_hot_build(
    cols: Dict[str, Array],
    key_name: str,
    n_valid: Array,
    hot: Array,
    n_shards: int,
    out_capacity: int,
) -> Tuple[Dict[str, Array], Array, Array, Array]:
    """Expand build-side rows: hot rows D-fold (copy j routed to shard j),
    others once (routed by hash).

    Returns ``(exp_cols, exp_n, dest, overflow)`` with arrays of
    ``out_capacity`` rows.
    """
    n = next(iter(cols.values())).shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < n_valid
    sizes = jnp.where(valid, jnp.where(hot, n_shards, 1), 0)
    total = jnp.sum(sizes).astype(jnp.int32)
    overflow = (total > out_capacity).astype(jnp.int32)

    seg_ids, _ = replicated_iota(sizes, out_capacity)
    out_idx = jnp.arange(out_capacity, dtype=jnp.int32)
    live = out_idx < total
    src = jnp.where(live, jnp.minimum(seg_ids, n - 1), 0)
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), seg_ids[1:] != seg_ids[:-1]]
    )
    copy_idx = segmented_iota(starts)

    exp_cols = {}
    for name, col in cols.items():
        exp_cols[name] = jnp.where(live, col[src], 0)
    key_exp = exp_cols[key_name]
    hot_exp = jnp.where(live, hot[src], False)
    dest = jnp.where(
        hot_exp, copy_idx % n_shards, hash_to_bucket(key_exp, n_shards)
    )
    dest = jnp.where(live, dest, n_shards)
    return exp_cols, total, dest, overflow