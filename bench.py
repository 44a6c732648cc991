"""Benchmark harness — run on the real TPU chip.

Measures per-operator throughput (rows/s/chip) on synthetic numeric tables for
the operator set in BASELINE.json: predicate filter (WHERE), aggregate
(GROUP BY), inner join, and sort (ORDER BY), plus the full scan→filter→
group→sort mix. Prints ONE JSON line to stdout:

    {"metric": "query_mix_rows_per_s", "value": N, "unit": "rows/s",
     "vs_baseline": R}

Timing methodology (important on this platform): ``jax.block_until_ready``
does NOT actually synchronize on the axon/tunnel TPU backend — it returns in
~0.2 ms for multi-hundred-ms computations. Every benchmarked jit therefore
returns a small scalar checksum of its outputs, each iteration perturbs the
input (defeating any caching), and the measured wall time has the separately
measured dispatch round-trip (RTT) subtracted.

The reference publishes no numbers (BASELINE.md: "published: {}"), so
``vs_baseline`` is reported against the north-star target of 70% of the
HBM-bandwidth roofline for the mix (>1.0 means the target is beaten).
Per-operator detail goes to stderr.

Env knobs: HARKDB_BENCH_ROWS (default 2**24 — remote compiles on this
platform are slow and the deadline must hold), HARKDB_BENCH_HBM_GBPS
(default 800 — TPU v5e class).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

# Graceful global deadline: a SIGKILL mid-TPU-op leaves the remote chip lease
# wedged for up to an hour on this platform, so on timeout we raise instead,
# emit whatever was measured, and let the PJRT client disconnect cleanly.
DEADLINE_S = int(os.environ.get("HARKDB_BENCH_DEADLINE_S", 480))


class BenchTimeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise BenchTimeout()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _checksum(batch):
    """Tiny scalar that depends on every output column (forces execution)."""
    import jax.numpy as jnp

    acc = jnp.int32(0)
    for col in batch.columns.values():
        acc = acc + jnp.sum(col[:: max(1, col.shape[0] // 4096)]).astype(
            jnp.int32
        )
    return acc + batch.n_valid


def main():
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(DEADLINE_S)
    try:
        _main()
    except BaseException as e:          # noqa: BLE001 — always emit a line
        if not isinstance(e, BenchTimeout):
            import traceback

            traceback.print_exc(file=sys.stderr)
        log("bench ended early — emitting partial result")
        mix = _PARTIAL.get("mix") or _PARTIAL.get("filter") or 0.0
        print(json.dumps({
            "metric": "query_mix_rows_per_s",
            "value": round(mix),
            "unit": "rows/s",
            "vs_baseline": 0.0,
        }))
    finally:
        signal.alarm(0)
        time.sleep(2)                   # let in-flight RPCs drain (tunnel
                                        # leases wedge on abrupt exits)


_PARTIAL = {}


def _main():
    import jax
    import jax.numpy as jnp

    from harkdb_tpu.columnar.batch import ColumnBatch
    from harkdb_tpu.ops.groupby import groupby_batch
    from harkdb_tpu.ops.join import inner_join_indices
    from harkdb_tpu.ops.sort import sort_batch
    from harkdb_tpu.prims.compaction import compact_batch

    n = int(os.environ.get("HARKDB_BENCH_ROWS", 1 << 24))
    hbm_gbps = float(os.environ.get("HARKDB_BENCH_HBM_GBPS", 800.0))
    n_keys = 1 << 20
    iters = int(os.environ.get("HARKDB_BENCH_ITERS", 2))
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}, "
        f"rows={n:,}")

    key = jax.random.randint(jax.random.key(0), (n,), 0, n_keys, jnp.int32)
    val = jax.random.randint(jax.random.key(1), (n,), -1000, 1000, jnp.int32)
    _ = int(jnp.sum(key) + jnp.sum(val))          # materialize (real sync)
    log("inputs materialized")
    nv = jnp.int32(n)

    # Dispatch RTT baseline: tiny jit + scalar readback.
    tiny = jnp.arange(8, dtype=jnp.int32)

    @jax.jit
    def f_rtt(t, i):
        return jnp.sum(t) + i

    _ = int(f_rtt(tiny, 0))
    t0 = time.perf_counter()
    for i in range(1, 6):
        _ = int(f_rtt(tiny, i))
    rtt = (time.perf_counter() - t0) / 5
    log(f"dispatch RTT: {rtt*1e3:.1f} ms (subtracted from all timings)")

    def sync_time(fn, *args):
        """fn(i, *args) -> scalar checksum; returns seconds per iter - RTT."""
        _ = int(fn(0, *args))                      # warmup/compile
        t0 = time.perf_counter()
        for i in range(1, iters + 1):
            _ = int(fn(i, *args))
        dt = (time.perf_counter() - t0) / iters - rtt
        return max(dt, 1e-9)

    results = {}

    def report(name, dt):
        results[name] = n / dt
        _PARTIAL[name] = n / dt
        log(f"{name:8s} {n / dt / 1e9:.3f} Grows/s  ({dt*1e3:.1f} ms)")

    # -- filter: WHERE v > 0 (≈50% selectivity) -------------------------------
    @jax.jit
    def run_filter(i, k, v, nv):
        b = ColumnBatch({"k": k, "v": v + i}, nv)
        return _checksum(compact_batch(b, b.column("v") > 0))

    report("filter", sync_time(run_filter, key, val, nv))

    # -- groupby: sum/max/count over 1M keys ----------------------------------
    @jax.jit
    def run_groupby(i, k, v, nv):
        b = ColumnBatch({"k": k + i - i, "v": v + i}, nv)
        return _checksum(groupby_batch(
            b, "k", [("v", "sum", "s"), ("v", "max", "m"), ("v", "count", "c")]
        ))

    report("groupby", sync_time(run_groupby, key, val, nv))

    # -- sort: ORDER BY k -----------------------------------------------------
    @jax.jit
    def run_sort(i, k, v, nv):
        b = ColumnBatch({"k": k + i, "v": v}, nv)
        return _checksum(sort_batch(b, ["k"]))

    report("sort", sync_time(run_sort, key, val, nv))

    # -- join: probe n rows against 1M-row build side -------------------------
    m = n_keys
    rkey = jax.random.permutation(jax.random.key(2), m).astype(jnp.int32)
    _ = int(jnp.sum(rkey))

    @jax.jit
    def run_join(i, lk, rk, nl, nm):
        l_idx, r_idx, total = inner_join_indices(
            lk + i - i, nl, rk, nm, out_capacity=lk.shape[0]
        )
        stride = max(1, l_idx.shape[0] // 4096)
        return (jnp.sum(l_idx[::stride]) + jnp.sum(r_idx[::stride])
                + total).astype(jnp.int32)

    report("join", sync_time(run_join, key, rkey, nv, jnp.int32(m)))

    # -- full mix: filter → groupby → sort ------------------------------------
    # Mirrors the planner's fused pipeline: the WHERE mask rides the
    # group-by's own sort (no separate compaction pass).
    @jax.jit
    def run_mix(i, k, v, nv):
        b = ColumnBatch({"k": k, "v": v + i}, nv)
        g = groupby_batch(
            b, "k",
            [("v", "sum", "s"), ("v", "max", "m"), ("v", "count", "c")],
            mask=b.column("v") > 0,
        )
        return _checksum(sort_batch(g, ["s"], descending=[True]))

    dt = sync_time(run_mix, key, val, nv)
    report("mix", dt)
    mix_rows_per_s = n / dt

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
