"""Benchmark harness — run on the real TPU chip.

Measures per-operator throughput (rows/s/chip) on synthetic numeric tables for
the operator set in BASELINE.json: predicate filter (WHERE), hash aggregate
(GROUP BY), inner join, and sort (ORDER BY), plus the full scan→filter→
group→sort mix. Prints ONE JSON line to stdout:

    {"metric": "query_mix_rows_per_s", "value": N, "unit": "rows/s",
     "vs_baseline": R}

The reference publishes no numbers (BASELINE.md: "published: {}"), so
``vs_baseline`` is reported against the north-star target of 70% of the
HBM-bandwidth roofline for the mix (>1.0 means the target is beaten).
Per-operator detail goes to stderr.

Env knobs: HARKDB_BENCH_ROWS (default 2**26), HARKDB_BENCH_HBM_GBPS
(default 800, the assumed per-chip HBM bandwidth for the roofline).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, warmup=2, iters=5):
    import jax

    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, out


def main():
    import jax
    import jax.numpy as jnp

    from harkdb_tpu.columnar.batch import ColumnBatch
    from harkdb_tpu.ops.groupby import groupby_batch
    from harkdb_tpu.ops.join import inner_join_indices
    from harkdb_tpu.ops.sort import sort_batch
    from harkdb_tpu.prims.compaction import compact_batch

    n = int(os.environ.get("HARKDB_BENCH_ROWS", 1 << 26))
    hbm_gbps = float(os.environ.get("HARKDB_BENCH_HBM_GBPS", 800.0))
    n_keys = 1 << 20
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}, "
        f"rows={n:,}")

    key = jax.random.randint(jax.random.key(0), (n,), 0, n_keys, jnp.int32)
    val = jax.random.randint(jax.random.key(1), (n,), -1000, 1000, jnp.int32)
    jax.block_until_ready((key, val))
    nv = jnp.int32(n)

    results = {}

    # -- filter: WHERE v > 0 (≈50% selectivity) -------------------------------
    @jax.jit
    def run_filter(k, v, nv):
        b = ColumnBatch({"k": k, "v": v}, nv)
        return compact_batch(b, v > 0)

    dt, out = timeit(run_filter, key, val, nv)
    results["filter"] = n / dt
    log(f"filter:  {n / dt / 1e9:.3f} Grows/s  ({dt*1e3:.1f} ms)")

    # -- groupby: sum/max/count over 1M keys ----------------------------------
    @jax.jit
    def run_groupby(k, v, nv):
        b = ColumnBatch({"k": k, "v": v}, nv)
        return groupby_batch(
            b, "k", [("v", "sum", "s"), ("v", "max", "m"), ("v", "count", "c")]
        )

    dt, _ = timeit(run_groupby, key, val, nv, iters=3)
    results["groupby"] = n / dt
    log(f"groupby: {n / dt / 1e9:.3f} Grows/s  ({dt*1e3:.1f} ms)")

    # -- sort: ORDER BY k -----------------------------------------------------
    @jax.jit
    def run_sort(k, v, nv):
        b = ColumnBatch({"k": k, "v": v}, nv)
        return sort_batch(b, ["k"])

    dt, _ = timeit(run_sort, key, val, nv, iters=3)
    results["sort"] = n / dt
    log(f"sort:    {n / dt / 1e9:.3f} Grows/s  ({dt*1e3:.1f} ms)")

    # -- join: probe n rows against 1M-row build side -------------------------
    m = n_keys
    rkey = jax.random.permutation(jax.random.key(2), m).astype(jnp.int32)
    jax.block_until_ready(rkey)

    @jax.jit
    def run_join(lk, rk, nl, nm):
        return inner_join_indices(lk, nl, rk, nm, out_capacity=lk.shape[0])

    dt, _ = timeit(run_join, key, rkey, nv, jnp.int32(m), iters=3)
    results["join"] = n / dt
    log(f"join:    {n / dt / 1e9:.3f} Grows/s  ({dt*1e3:.1f} ms)")

    # -- full mix: filter → groupby → sort ------------------------------------
    @jax.jit
    def run_mix(k, v, nv):
        b = ColumnBatch({"k": k, "v": v}, nv)
        f = compact_batch(b, v > 0)
        g = groupby_batch(
            f, "k", [("v", "sum", "s"), ("v", "max", "m"), ("v", "count", "c")]
        )
        return sort_batch(g, ["s"], descending=[True])

    dt, _ = timeit(run_mix, key, val, nv, iters=3)
    mix_rows_per_s = n / dt
    results["mix"] = mix_rows_per_s
    log(f"mix:     {mix_rows_per_s / 1e9:.3f} Grows/s  ({dt*1e3:.1f} ms)")

    # Roofline target for the mix: every row is read+written across the three
    # stages ~6 times at 8 B/row (2 int32 cols) ≈ 48 B of HBM traffic/row.
    bytes_per_row = 48.0
    target = 0.70 * hbm_gbps * 1e9 / bytes_per_row
    vs_baseline = mix_rows_per_s / target

    print(json.dumps({
        "metric": "query_mix_rows_per_s",
        "value": round(mix_rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
