"""Join cost-center profiling on the real TPU chip (round-3 item: close the
join's 1.6x gap to its sort-composition floor).

Times each candidate primitive of the join pipeline in isolation — concat
sort variants (operand packing), sorted/random gathers, sorted scatter +
cummax expansion, the ranges pass — using bench.py's methodology: scalar
readback syncs (block_until_ready is a no-op on this backend), perturbed
inputs, RTT subtraction, in-process alarm deadlines (never SIGKILL a TPU
client mid-op).

Writes one JSON dict to stdout. Not part of the benchmark contract — a
session tool whose numbers feed BASELINE.md's join audit.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

DEADLINE_S = float(os.environ.get("JP_DEADLINE_S", 900))
STAGE_S = float(os.environ.get("JP_STAGE_S", 120))
CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)


class Timeout(Exception):
    pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


RESULTS = {}
T0 = time.monotonic()


def main():
    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(Timeout()))
    signal.setitimer(signal.ITIMER_REAL, DEADLINE_S)
    try:
        run()
    except BaseException as e:  # noqa: BLE001
        if not isinstance(e, Timeout):
            import traceback

            traceback.print_exc(file=sys.stderr)
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        print(json.dumps(RESULTS))
        sys.stdout.flush()
        time.sleep(2)


def run():
    import jax

    if os.environ.get("JP_CPU"):
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    n = int(os.environ.get("JP_ROWS", 1 << 24))
    nr = 1 << 20
    m = n + nr                      # concat-sort length
    rng = np.random.default_rng(0)
    lk = jax.device_put(rng.integers(0, nr, n).astype(np.int32))
    rk = jax.device_put(rng.permutation(nr).astype(np.int32))
    p1 = jax.device_put(rng.integers(0, 1 << 20, m).astype(np.int32))
    p2 = jax.device_put(rng.integers(0, 1 << 20, m).astype(np.int32))
    p3 = jax.device_put(rng.integers(0, 1 << 20, m).astype(np.int32))
    p4 = jax.device_put(rng.integers(0, 1 << 20, m).astype(np.int32))
    sizes_np = rng.integers(0, 3, n).astype(np.int32)  # E[emit]=1 → ~n out
    sizes = jax.device_put(sizes_np)
    sorted_idx = jax.device_put(
        np.sort(rng.integers(0, n, n)).astype(np.int32)
    )
    rand_idx = jax.device_put(rng.integers(0, n, n).astype(np.int32))
    vals = jax.device_put(rng.integers(0, 1 << 20, n).astype(np.int32))
    dev = jax.devices()[0]
    log(f"device {dev.platform}, n={n:,}, staged {time.monotonic()-T0:.1f}s")

    def cs(x):
        return jnp.sum(x[:: max(1, x.shape[0] // 4096)]).astype(jnp.int32)

    # --- stage bodies (i perturbs inputs) ------------------------------------
    @jax.jit
    def f_rtt(i):
        return i + 1

    @jax.jit
    def sort3_i32(i, lk, rk):
        keys = jnp.concatenate([lk + i, rk])
        side = jnp.concatenate([
            jnp.ones((n,), jnp.int32), jnp.zeros((nr,), jnp.int32)
        ])
        orig = jnp.concatenate([
            jnp.arange(n, dtype=jnp.int32), jnp.arange(nr, dtype=jnp.int32)
        ])
        out = jax.lax.sort([keys, side, orig], num_keys=2, is_stable=True)
        return cs(out[0]) + cs(out[2])

    @jax.jit
    def sort2_packed(i, lk, rk):
        keys = jnp.concatenate([lk + i, rk]).astype(jnp.int64)
        side = jnp.concatenate([
            jnp.ones((n,), jnp.int64), jnp.zeros((nr,), jnp.int64)
        ])
        k64 = (keys << 2) | side
        orig = jnp.concatenate([
            jnp.arange(n, dtype=jnp.int32), jnp.arange(nr, dtype=jnp.int32)
        ])
        out = jax.lax.sort([k64, orig], num_keys=1, is_stable=True)
        return cs(out[0].astype(jnp.int32)) + cs(out[1])

    @jax.jit
    def sort3_payload4_i32(i, lk, rk, p1, p2, p3, p4):
        keys = jnp.concatenate([lk + i, rk])
        side = jnp.concatenate([
            jnp.ones((n,), jnp.int32), jnp.zeros((nr,), jnp.int32)
        ])
        orig = jnp.concatenate([
            jnp.arange(n, dtype=jnp.int32), jnp.arange(nr, dtype=jnp.int32)
        ])
        out = jax.lax.sort(
            [keys, side, orig, p1, p2, p3, p4], num_keys=2, is_stable=True
        )
        return cs(out[3]) + cs(out[6])

    @jax.jit
    def sort3_payload2_i64(i, lk, rk, p1, p2, p3, p4):
        keys = jnp.concatenate([lk + i, rk])
        side = jnp.concatenate([
            jnp.ones((n,), jnp.int32), jnp.zeros((nr,), jnp.int32)
        ])
        orig = jnp.concatenate([
            jnp.arange(n, dtype=jnp.int32), jnp.arange(nr, dtype=jnp.int32)
        ])
        q1 = (p1.astype(jnp.int64) << 32) | p2.astype(jnp.uint32).astype(jnp.int64)
        q2 = (p3.astype(jnp.int64) << 32) | p4.astype(jnp.uint32).astype(jnp.int64)
        out = jax.lax.sort(
            [keys, side, orig, q1, q2], num_keys=2, is_stable=True
        )
        return cs((out[3] >> 32).astype(jnp.int32)) + cs(
            out[4].astype(jnp.int32))

    @jax.jit
    def scatter_sorted(i, sizes):
        reps = sizes + (i - i)
        offsets = jnp.cumsum(reps) - reps
        total = jnp.sum(reps)
        target = jnp.minimum(offsets, n)
        seg_idx = jnp.arange(n, dtype=jnp.int32)
        markers = (
            jnp.zeros((n,), jnp.int32)
            .at[jnp.where(seg_idx < n, target, n)]
            .max(seg_idx + 1, mode="drop", indices_are_sorted=True)
        )
        ids = jax.lax.cummax(markers) - 1
        return cs(ids) + total + i

    @jax.jit
    def scatter_packed64(i, sizes, vals):
        reps = sizes + (i - i)
        offsets = jnp.cumsum(reps) - reps
        target = jnp.minimum(offsets, n)
        seg_idx = jnp.arange(n, dtype=jnp.int32)
        packed = ((seg_idx.astype(jnp.int64) + 1) << 32) | (
            (vals + i).astype(jnp.uint32).astype(jnp.int64)
        )
        buf = (
            jnp.zeros((n,), jnp.int64)
            .at[target]
            .max(packed, mode="drop", indices_are_sorted=True)
        )
        filled = jax.lax.cummax(buf)
        ids = (filled >> 32).astype(jnp.int32) - 1
        v = (filled & 0xFFFFFFFF).astype(jnp.int32)
        return cs(ids) + cs(v)

    @jax.jit
    def gather_sorted_3col(i, vals, sorted_idx):
        g = jnp.stack([vals + i, vals, vals], axis=1).at[sorted_idx].get(
            indices_are_sorted=True
        )
        return cs(g[:, 0]) + cs(g[:, 2])

    @jax.jit
    def gather_sorted_1col(i, vals, sorted_idx):
        g = (vals + i).at[sorted_idx].get(indices_are_sorted=True)
        return cs(g)

    @jax.jit
    def gather_random_1col(i, vals, rand_idx):
        g = (vals + i).at[rand_idx].get()
        return cs(g)

    @jax.jit
    def cummax32(i, vals):
        return cs(jax.lax.cummax(vals + i))

    @jax.jit
    def cummax64(i, vals):
        return cs(jax.lax.cummax((vals + i).astype(jnp.int64))
                  .astype(jnp.int32))

    @jax.jit
    def expand_kernel(i, sizes, vals):
        from harkdb_tpu.kernels.expand import expand_fills

        reps = jnp.maximum(sizes + (i - i), 1)       # non-empty contract
        offsets = jnp.cumsum(reps) - reps
        mono = jnp.minimum(offsets, vals.shape[0])   # a monotone value plane
        seg, off_f, (m_f,) = expand_fills(
            offsets, jnp.int32(n), n, (mono,),
            interpret=jax.default_backend() != "tpu",
        )
        return cs(seg) + cs(off_f) + cs(m_f)

    @jax.jit
    def ranges_only(i, lk, rk):
        from harkdb_tpu.ops.join import compute_join_ranges

        r = compute_join_ranges(
            lk + i - i, jnp.int32(n), rk, jnp.int32(nr)
        )
        return cs(r.counts) + cs(r.lo) + cs(r.l_orig) + r.total

    @jax.jit
    def full_join(i, lk, rk):
        from harkdb_tpu.ops.join import inner_join_indices

        l_idx, r_idx, total = inner_join_indices(
            lk + i - i, jnp.int32(n), rk, jnp.int32(nr), out_capacity=n
        )
        return cs(l_idx) + cs(r_idx) + total

    rtt = [0.0]

    def stage(name, fn, *args):
        left = DEADLINE_S - (time.monotonic() - T0)
        if left < 10:
            log(f"skip {name}: deadline")
            return
        signal.setitimer(signal.ITIMER_REAL, min(STAGE_S, left))
        try:
            t0 = time.monotonic()
            _ = int(fn(0, *args))
            log(f"[{name}] compile {time.monotonic()-t0:.1f}s")
            t0 = time.perf_counter()
            iters = 3
            for i in range(1, iters + 1):
                _ = int(fn(i, *args))
            dt = (time.perf_counter() - t0) / iters - rtt[0]
            RESULTS[name] = round(dt * 1e3, 2)
            log(f"[{name}] {dt*1e3:.1f} ms")
        except Timeout:
            log(f"[{name}] TIMED OUT")
        finally:
            signal.setitimer(signal.ITIMER_REAL, 0)

    _ = int(f_rtt(0))
    t0 = time.perf_counter()
    for i in range(1, 6):
        _ = int(f_rtt(i))
    rtt[0] = (time.perf_counter() - t0) / 5
    RESULTS["rtt_ms"] = round(rtt[0] * 1e3, 2)
    log(f"RTT {rtt[0]*1e3:.1f} ms")

    all_stages = [
        ("sort3_i32", sort3_i32, (lk, rk)),
        ("sort2_packed_i64", sort2_packed, (lk, rk)),
        ("sort3_payload4_i32", sort3_payload4_i32, (lk, rk, p1, p2, p3, p4)),
        ("sort3_payload2_i64", sort3_payload2_i64, (lk, rk, p1, p2, p3, p4)),
        ("scatter_sorted_cummax", scatter_sorted, (sizes,)),
        ("scatter_packed64_cummax", scatter_packed64, (sizes, vals)),
        ("gather_sorted_3col", gather_sorted_3col, (vals, sorted_idx)),
        ("gather_sorted_1col", gather_sorted_1col, (vals, sorted_idx)),
        ("gather_random_1col", gather_random_1col, (vals, rand_idx)),
        ("cummax32", cummax32, (vals,)),
        ("cummax64", cummax64, (vals,)),
        ("expand_kernel", expand_kernel, (sizes, vals)),
        ("ranges_only", ranges_only, (lk, rk)),
        ("full_join_current", full_join, (lk, rk)),
    ]
    only = os.environ.get("JP_STAGES")
    wanted = set(only.split(",")) if only else None
    for name, fn, args in all_stages:
        if wanted is None or name in wanted:
            stage(name, fn, *args)


if __name__ == "__main__":
    main()
