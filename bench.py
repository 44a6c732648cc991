"""Benchmark harness — run on the real TPU chip.

Measures per-operator throughput (rows/s/chip) on synthetic numeric tables for
the operator set in BASELINE.json: predicate filter (WHERE), aggregate
(GROUP BY), inner join, and sort (ORDER BY), plus the full scan→filter→
group→sort mix (both hand-rolled and driven through the real ``Context.sql``
planner path). Prints ONE JSON line to stdout:

    {"metric": "query_mix_rows_per_s", "value": N, "unit": "rows/s",
     "vs_baseline": R, "ops": {...}, "rtt_ms": ...}

``value`` is the measured mix; ``ops`` carries every per-operator rate
machine-readably (a single timed-out stage can no longer erase the others).

``vs_baseline``: the reference publishes no numbers (BASELINE.md:
"published: {}"), and BASELINE.md's roofline audit re-derived the honest
target for sort-composed relational operators on TPU as the
**sort-composition floor** (grouping = 1 payload sort + O(log) scan passes +
compaction; the HBM roofline is unreachable without a vector scatter).
``vs_baseline`` is measured-mix / floor-mix at the same row count
(1.0 = running AT the floor; the old 70%-of-HBM ratio is also emitted as
``vs_hbm_roofline`` for continuity with BENCH_r01/r02).

Timing methodology (important on this platform): ``jax.block_until_ready``
does NOT actually synchronize on the axon/tunnel TPU backend — it returns in
~0.2 ms for multi-hundred-ms computations. Every benchmarked jit therefore
returns a small scalar checksum of its outputs, each iteration perturbs the
input (defeating any caching), and the measured wall time has the separately
measured dispatch round-trip (RTT) subtracted.

Survivability (this platform's remote-compile service takes 15 s – minutes
for a jit shape it has never seen, but caches HLO across runs — priming a
shape in one session makes later runs' warmups take seconds):

  * the group phase is ONE jitted function shared by the groupby stage and
    the mix (the WHERE threshold is a traced argument, so both hit the same
    executable) — the mix adds a single small tail compile;
  * stages run in value order (mix and the Context.sql pipeline right after
    their prerequisite compiles), each under its own ``signal.setitimer``
    budget; a stage that blows its budget is skipped, later stages still run;
  * every completed stage's rows/s lands in the partial dict IMMEDIATELY and
    is emitted in the final JSON even if a later stage dies;
  * a PERSISTENT compilation cache at ``.jax_cache/`` (repo-local,
    gitignored) additionally makes in-session recompiles free;
  * inputs are generated host-side with numpy (zero compiles before the
    first measured stage).

Env knobs: HARKDB_BENCH_ROWS (default 2**24), HARKDB_BENCH_HBM_GBPS
(default 800 — TPU v5e class), HARKDB_BENCH_DEADLINE_S (global, default 460),
HARKDB_BENCH_STAGE_S (per stage, default 170), HARKDB_BENCH_ITERS (default 3
— each stage reports the MEDIAN of its individually timed iterations, so a
single slow draw of the platform's ±8% sort jitter cannot drag a stage
below the floor).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

# Graceful deadlines: a SIGKILL mid-TPU-op leaves the remote chip lease
# wedged for up to an hour on this platform, so all timeouts are in-process
# alarms that raise, emit whatever was measured, and let the PJRT client
# disconnect cleanly.
# Defaults sized for a COLD remote-compile service: its HLO cache has been
# observed to forget shapes between runs (round-5 sessions paid ~50-95 s
# of warmup per stage twice in a row), and a 460 s deadline then truncates
# the window/join stages. 800 s covers every stage compiling cold once.
DEADLINE_S = float(os.environ.get("HARKDB_BENCH_DEADLINE_S", 800))
STAGE_S = float(os.environ.get("HARKDB_BENCH_STAGE_S", 200))
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")


class BenchTimeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise BenchTimeout()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_PARTIAL = {}        # stage name → rows/s (join: output pairs/s, marked)
_TIMES_MS = {}       # stage name → measured ms per op
# name → (raw seconds per iteration, n_syncs, inner): RTT correction is
# applied at EMIT time, so an rtt stage that only succeeds late (the first
# dispatch can hang on a flaky chip grant) still corrects every stage.
_RAW = {}
_RTT_FALLBACK = 0.026      # cross-session median dispatch RTT
_T0 = time.monotonic()
_HBM_GBPS = float(os.environ.get("HARKDB_BENCH_HBM_GBPS", 800.0))
# Old north-star ratio (kept as a secondary field): 70% of the HBM roofline
# assuming ~48 B of traffic per row across the mix's stages.
_HBM_TARGET = 0.70 * _HBM_GBPS * 1e9 / 48.0

# Sort-composition floor for the mix (BASELINE.md roofline audit): the
# group-by's payload-carrying 3-operand sort is the irreducible term
# (~4.5 ns/row measured on v5e), plus the Pallas filter kernel (~3 ms at 16M
# rows — VPU-bound) and the bucketed ORDER BY tail over the ~1M groups
# (~5 ms). Linear in n for the sort term; the two kernel terms scale with
# their own sizes but are pinned at the 16M-row values they were derived at.
_SORT3_S_PER_ROW = 4.5e-9
_FLOOR_FIXED_S = 8e-3


def _floor_mix_s(n: int) -> float:
    return n * _SORT3_S_PER_ROW + _FLOOR_FIXED_S


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


def _emit(n_rows: int):
    """The one JSON line: the measured ENGINE mix — the Context.sql-driven
    number (the real planner path: pushdown + capacity shrink + two-phase
    group + tail), falling back to the hand-rolled pipeline (which since
    round 5 is the SLOWER of the two: the planner's post-pushdown capacity
    shrink halves the group sort at 50% selectivity, and the hand-rolled
    mirror is kept as a kernel-level tracker), else the slowest rows/s
    operator as a conservative proxy (join excluded: its rate is output
    PAIRS/s against a different probe size)."""
    # Final RTT correction from raw timings (uses the measured RTT whenever
    # the rtt stage succeeded — even if only on its end-of-run retry).
    rtt = _PARTIAL.get("rtt", _RTT_FALLBACK)
    for name, (raw, n_syncs, inner) in _RAW.items():
        # Over-subtraction guard: a late rtt-retry can measure a slower
        # dispatch than the stages actually paid (observed: 38.9 ms retry
        # vs ~26 ms in-run → a 4-sync stage corrected to ≤ 0 and emitted
        # an absurd rows/s). Never let the correction consume more than
        # 85% of the raw time.
        dt = max((raw - n_syncs * rtt) / inner, 0.15 * raw / inner, 1e-9)
        _PARTIAL[name] = n_rows / dt
        _TIMES_MS[name] = dt * 1e3
    mix = _PARTIAL.get("sql", _PARTIAL.get("mix"))
    proxy = mix is None
    if proxy:
        # join measures output PAIRS/s on a different probe size; window is
        # an extension operator with its own (multi-sort) floor — neither
        # belongs in the conservative mix proxy.
        ops = [v for k, v in _PARTIAL.items()
               if k not in ("rtt", "join", "window")]
        mix = min(ops) if ops else 0.0
    floor_rate = n_rows / _floor_mix_s(n_rows)
    out = {
        "metric": "query_mix_rows_per_s",
        "value": round(mix),
        "unit": "rows/s",
        # ≥1.0 = at/below the sort-composition floor (BASELINE.md audit).
        "vs_baseline": round(mix / floor_rate, 4),
        "baseline": "sort-composition floor (BASELINE.md roofline audit); "
                    "reference publishes no numbers",
        "vs_hbm_roofline": round(mix / _HBM_TARGET, 4),
        "ops": {k: round(v) for k, v in _PARTIAL.items() if k != "rtt"},
        "op_ms": {k: round(v, 2) for k, v in _TIMES_MS.items()},
        "rtt_ms": round(_PARTIAL.get("rtt", 0.0) * 1e3, 2),
        "rows": n_rows,
    }
    if proxy:
        out["proxy"] = True
    print(json.dumps(out))
    sys.stdout.flush()


_N_ROWS = int(os.environ.get("HARKDB_BENCH_ROWS", 1 << 24))


def main():
    signal.signal(signal.SIGALRM, _alarm)
    # Global guard from the very first instruction: jax.devices() / the
    # input device_puts can hang on a wedged chip grant long before the
    # first stage arms its own timer. The per-stage setitimer calls replace
    # this one; each stage clamps its budget to the remaining global time.
    signal.setitimer(signal.ITIMER_REAL, DEADLINE_S)
    try:
        _main()
    except BaseException as e:          # noqa: BLE001 — always emit a line
        if not isinstance(e, BenchTimeout):
            import traceback

            traceback.print_exc(file=sys.stderr)
        log("bench ended early — emitting partial result")
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        _emit(_N_ROWS)
        time.sleep(2)                   # let in-flight RPCs drain (tunnel
                                        # leases wedge on abrupt exits)


def _main():
    import jax

    if os.environ.get("HARKDB_BENCH_CPU"):      # smoke-test mode
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: compiles on this platform go through a
    # slow remote service; caching executables locally makes warm runs cheap.
    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from harkdb_tpu.columnar.batch import ColumnBatch
    from harkdb_tpu.ops.groupby import groupby_batch
    from harkdb_tpu.ops.join import inner_join_indices
    from harkdb_tpu.ops.sort import sort_batch
    from harkdb_tpu.prims.compaction import compact_batch

    n = _N_ROWS
    n_keys = 1 << 20
    iters = int(os.environ.get("HARKDB_BENCH_ITERS", 3))
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}, "
        f"rows={n:,}, deadline={DEADLINE_S:.0f}s, stage={STAGE_S:.0f}s")

    # Host-side input generation: zero device compiles before stage 1.
    rng = np.random.default_rng(0)
    key_np = rng.integers(0, n_keys, n).astype(np.int32)
    val_np = rng.integers(-1000, 1000, n).astype(np.int32)
    key = jax.device_put(key_np)
    val = jax.device_put(val_np)
    rkey = jax.device_put(rng.permutation(n_keys).astype(np.int32))
    nv = jnp.int32(n)
    nm = jnp.int32(n_keys)
    log(f"inputs staged at {time.monotonic() - _T0:.1f}s")

    def _checksum(batch):
        acc = jnp.int32(0)
        for col in batch.columns.values():
            acc = acc + jnp.sum(
                col[:: max(1, col.shape[0] // 4096)]
            ).astype(jnp.int32)
        return acc + batch.n_valid

    # ---- stage definitions --------------------------------------------------

    @jax.jit
    def f_rtt(t, i):
        return jnp.sum(t) + i

    tiny = jax.device_put(np.arange(8, dtype=np.int32))

    @jax.jit
    def run_sort(i, k, v, nv):
        b = ColumnBatch({"k": k + i, "v": v}, nv)
        return _checksum(sort_batch(b, ["k"]))

    # The streaming filter runs in ~3 ms — below dispatch-RTT jitter — so it
    # repeats 8x inside one jit (perturbed inputs) and divides.
    FILTER_REPS = 8

    @jax.jit
    def run_filter(i, k, v, nv):
        def body(j, acc):
            b = ColumnBatch({"k": k, "v": v + i + j}, nv)
            out = compact_batch(b, b.column("v") > 0)
            return acc + _checksum(out)
        return jax.lax.fori_loop(0, FILTER_REPS, body, jnp.int32(0))

    # ONE group-phase executable shared by the groupby stage and the mix:
    # the WHERE threshold rides as a traced argument, so `lo = -2000`
    # (always true for v ∈ [-1000, 1000)) measures plain GROUP BY while
    # `lo = 0` is the mix's 50%-selectivity predicate — same compiled shape,
    # zero extra compiles for the mix's group phase. This mirrors the
    # planner's own design: the WHERE mask fuses into the group-by's sort.
    @jax.jit
    def run_group_phase(i, k, v, nv, lo):
        b = ColumnBatch({"k": k, "v": v + i}, nv)
        g = groupby_batch(
            b, "k",
            [("v", "sum", "s"), ("v", "max", "m"), ("v", "count", "c")],
            mask=b.column("v") > lo,
        )
        return g, _checksum(g)

    def run_groupby(i, k, v, nv):
        _g, cs = run_group_phase(i, k, v, nv, jnp.int32(-2000))
        return cs

    # Dense-key groupby on the MXU one-hot matmul kernel (the planner's
    # fast path for small int key spans — kernels/matmul_agg.py).
    @jax.jit
    def run_groupby_dense(i, k, v, nv):
        from harkdb_tpu.kernels.matmul_agg import onehot_groupby_sums

        dk = (k + i - i) & 4095
        counts, sums, _axis = onehot_groupby_sums(
            dk, [v + i], nv, jnp.int32(0), 4096,
            interpret=jax.default_backend() != "tpu",
        )
        return (jnp.sum(counts[::4]) + jnp.sum(sums[0][::4])).astype(
            jnp.int32
        )

    @jax.jit
    def run_join(i, lk, rk, nl, nm):
        l_idx, r_idx, total = inner_join_indices(
            lk + i - i, nl, rk, nm, out_capacity=lk.shape[0]
        )
        stride = max(1, l_idx.shape[0] // 4096)
        return (jnp.sum(l_idx[::stride]) + jnp.sum(r_idx[::stride])
                + total).astype(jnp.int32)

    # Full mix: filter → groupby → sort, mirroring the planner's actual
    # THREE-phase pipeline (round 5): the WHERE compacts via the streaming
    # Pallas kernel, the live count syncs to the host and the group-by runs
    # at a power-of-two capacity bucketed to the SURVIVORS (a
    # 50%-selectivity predicate halves the group sort — the sort is
    # capacity-bound), then n_groups syncs and the ORDER BY tail runs at a
    # capacity bucketed to the group count — exactly planner.execute's
    # pushdown-shrink + two-phase split.
    import functools

    @jax.jit
    def mix_filter(i, k, v, nv):
        # predicate ≡ v > i (on the perturbed column): selectivity stays
        # strictly UNDER 50% for every iteration, so the live count always
        # buckets to n/2 — `> 0` on v+i drifts just past n/2 as i grows
        # and flips the group phase into the full-capacity bucket
        b = ColumnBatch({"k": k, "v": v + i}, nv)
        return compact_batch(b, b.column("v") > 2 * i)

    @functools.lru_cache(maxsize=8)
    def mix_group_for(cap1):
        @jax.jit
        def group(fb):
            cols = {nme: c[:cap1] for nme, c in fb.columns.items()}
            b = ColumnBatch(cols, fb.n_valid)
            return groupby_batch(
                b, "k",
                [("v", "sum", "s"), ("v", "max", "m"), ("v", "count", "c")],
            )
        return group

    @functools.lru_cache(maxsize=8)
    def mix_tail_for(cap2):
        @jax.jit
        def tail(g):
            cols = {nme: c[:cap2] for nme, c in g.columns.items()}
            b = ColumnBatch(cols, g.n_valid)
            return _checksum(sort_batch(b, ["s"], descending=[True]))
        return tail

    def run_mix(i, k, v, nv):
        fb = mix_filter(i, k, v, nv)
        n_live = int(fb.n_valid)               # engine-real host sync 1
        cap1 = min(1 << max(10, (n_live - 1).bit_length()), n)
        g = mix_group_for(cap1)(fb)
        n_groups = int(g.n_valid)              # engine-real host sync 2
        cap2 = min(1 << max(10, (n_groups - 1).bit_length()), cap1)
        return mix_tail_for(cap2)(g)

    # The same pipeline through the REAL engine: Context.sql on a resident
    # table — parse/plan cache, filter pushdown, two-phase execution, MXU
    # probe. A planner regression now shows up in the benchmark.
    sql_state = {}

    def _sql_setup():
        from harkdb_tpu import Context

        ctx = Context()
        ctx.create_table("t", {"k": key_np, "v": val_np})
        sql_state["ctx"] = ctx
        sql_state["q"] = (
            "select k, sum(v) as s, max(v) as m, count(*) as c "
            "from t where v > 0 group by k order by s desc"
        )

        @jax.jit
        def cs(b):
            return _checksum(b)

        sql_state["cs"] = cs

    def _sql_setup_if_needed():
        if "ctx" not in sql_state:
            _sql_setup()

    def run_sql(i, *_args):
        ctx, q = sql_state["ctx"], sql_state["q"]
        batch, _names = ctx.sql_batch(q)
        return sql_state["cs"](batch)

    def stage_sql_warm():
        """Round-4 item 7: the Context.sql path compiles shapes the
        hand-rolled stages never prime (phase-B split, probe, metrics) —
        57.9 s of warm-up in BENCH_r03 nearly ate the sql stage's budget.
        Warming in a DEDICATED stage keeps a cold-service compile from
        costing the measurement stage anything; on a warm cache this is a
        couple of seconds."""
        _sql_setup_if_needed()
        t0 = time.monotonic()
        _ = int(run_sql(0))
        log(f"sql pipeline warmed in {time.monotonic() - t0:.1f}s")

    # Window functions through Context.sql: two shapes (a partitioned
    # running sum + a global row_number) over the same resident table,
    # with a trailing ORDER BY that exactly matches the second shape's
    # sort — the round-5 sort-order tracking then runs W = 2 payload
    # sorts total (the second shape's sort IS the final order; restore
    # and ORDER BY sorts both skipped), vs W+1 = 3 for the round-4 fused
    # chain without the ORDER BY and 2W = 4 in round 3. BASELINE.md
    # tracks this number (337 ms r3, 298 ms r4).
    def _win_setup():
        _sql_setup_if_needed()
        sql_state["qw"] = (
            "select k, sum(v) over (partition by k order by v) as rs, "
            "row_number() over (order by v desc, k) as rn from t "
            "order by v desc, k"
        )

    def run_window(i, *_args):
        ctx = sql_state["ctx"]
        batch, _names = ctx.sql_batch(sql_state["qw"])
        return sql_state["cs"](batch)

    def stage_window_warm():
        _win_setup()
        t0 = time.monotonic()
        _ = int(run_window(0))
        log(f"window pipeline warmed in {time.monotonic() - t0:.1f}s")

    rtt_holder = [0.0]

    def sync_time(fn, *args, n_syncs=1, inner=1):
        """fn(i, *args) -> scalar checksum; returns RAW seconds per
        iteration — the MEDIAN of ``iters`` individually timed iterations
        (round-5 item 10: the platform's ±8% sort jitter straddled the
        floor when a single mean-of-2 run landed on a slow draw; the
        median of 3 makes consecutive driver runs reproducible). RTT
        correction happens at emit time — see _RAW."""
        t_c0 = time.monotonic()
        _ = int(fn(0, *args))                      # warmup/compile
        log(f"  warmup+compile {time.monotonic() - t_c0:.1f}s")
        ts = []
        for i in range(1, iters + 1):
            t0 = time.perf_counter()
            _ = int(fn(i, *args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    # If the chip grant is slow (a previous client's lease can take minutes
    # to release on this tunneled platform), the rtt stage's FIRST dispatch
    # may hang past its budget; it gets a short budget up front and a retry
    # at the end of the run (the grant has long settled by then).
    rtt_holder[0] = _RTT_FALLBACK

    def stage_rtt():
        t_g = time.monotonic()
        _ = int(f_rtt(tiny, 0))        # first dispatch absorbs the grant wait
        wait = time.monotonic() - t_g
        if wait > 5:
            log(f"chip grant took {wait:.0f}s")
        ts = []
        for i in range(1, 6):
            t0 = time.perf_counter()
            _ = int(f_rtt(tiny, i))
            ts.append(time.perf_counter() - t0)
        # MIN of the probes: RTT is a latency floor — a slow draw (remote
        # service hiccup) must not inflate every stage's correction.
        rtt = min(ts)
        rtt_holder[0] = rtt
        _PARTIAL["rtt"] = rtt
        log(f"dispatch RTT: {rtt*1e3:.1f} ms (subtracted from all timings)")

    def op_stage(name, fn, *args, n_syncs=1, inner=1, setup=None):
        def run():
            if setup is not None:
                setup()
            raw = sync_time(fn, *args, n_syncs=n_syncs, inner=inner)
            _RAW[name] = (raw, n_syncs, inner)
            dt = max((raw - n_syncs * rtt_holder[0]) / inner, 1e-9)
            log(f"{name:8s} {n / dt / 1e9:.3f} Grows/s  ({dt*1e3:.1f} ms, "
                f"provisional rtt {rtt_holder[0]*1e3:.1f} ms)")
        return run

    # Stage order = value order: the mix (the headline) and the Context.sql
    # pipeline run as soon as their prerequisite compile (the shared group
    # phase) exists; the expensive-to-compile, lower-priority join runs last.
    stages = [
        # (name, runner, budget override): rtt gets a SHORT budget — its
        # first dispatch absorbs the chip grant, which on a flaky session
        # can hang arbitrarily long; losing 60 s beats losing 170 s, and the
        # end-of-run retry recovers the measurement either way.
        ("rtt", stage_rtt, 60),
        ("filter", op_stage("filter", run_filter, key, val, nv,
                            inner=FILTER_REPS)),
        ("groupby", op_stage("groupby", run_groupby, key, val, nv)),
        ("mix", op_stage("mix", run_mix, key, val, nv, n_syncs=3)),
        # sql warms in its own stage (see stage_sql_warm), then the timed
        # stage runs fully warm. Four host syncs per call: the planner's
        # post-pushdown shrink readback (n_live), its n_groups readback,
        # metrics' rows_out readback (engine observability, part of the
        # real path), and the checksum.
        ("sqlwarm", stage_sql_warm),
        ("sql", op_stage("sql", run_sql, key, val, nv, n_syncs=4,
                         setup=_sql_setup_if_needed)),
        ("sort", op_stage("sort", run_sort, key, val, nv)),
        ("winwarm", stage_window_warm),
        ("window", op_stage("window", run_window, key, val, nv, n_syncs=2,
                            setup=_win_setup)),
        ("groupby_dense",
         op_stage("groupby_dense", run_groupby_dense, key, val, nv)),
        ("join", op_stage("join", run_join, key, rkey, nv, nm)),
    ]

    def run_stage(name, run, budget_cap=None):
        left = _remaining()
        if left <= 5:
            log(f"global deadline reached before stage {name}; stopping")
            return False
        budget = min(STAGE_S if budget_cap is None else budget_cap, left)
        log(f"[stage {name}] budget {budget:.0f}s "
            f"(elapsed {time.monotonic() - _T0:.1f}s)")
        signal.setitimer(signal.ITIMER_REAL, budget)
        try:
            run()
        except BenchTimeout:
            log(f"[stage {name}] timed out after {budget:.0f}s — skipped")
        except Exception as e:               # noqa: BLE001 — one stage's
            # failure (e.g. a kernel that stops lowering on this backend)
            # must not erase the other stages' measurements.
            import traceback

            traceback.print_exc(file=sys.stderr)
            log(f"[stage {name}] failed: {type(e).__name__}: {e} — skipped")
        finally:
            signal.setitimer(signal.ITIMER_REAL, 0)
        return True

    for entry in stages:
        name, run = entry[0], entry[1]
        budget_cap = entry[2] if len(entry) > 2 else None
        if not run_stage(name, run, budget_cap):
            break

    # The rtt stage's first dispatch can hang on a cold/flaky chip grant;
    # by now the grant has long settled, so a retry is ~6 tiny dispatches.
    # _emit applies the correction from raw timings either way.
    if "rtt" not in _PARTIAL:
        run_stage("rtt-retry", stage_rtt, 30)


if __name__ == "__main__":
    main()
