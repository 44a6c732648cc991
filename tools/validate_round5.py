"""On-chip validation of the round-5 query surface against a CPU oracle.

Two-phase (one backend per process on this platform):

    python tools/validate_round5.py cpu    # forced-CPU oracle → /tmp pkl
    # wait 60-90 s if a TPU process just exited (chip-grant discipline)
    python tools/validate_round5.py tpu    # real chip, compares

Covers the round-5 additions end to end on real hardware: general ROWS
frames (FOLLOWING bounds), NTILE/PERCENT_RANK/NTH_VALUE, FULL OUTER with
NULL ordering, INTERSECT, the variance family, and a CTE + correlated
aggregate + IN-subquery combination. Round-5 session result: all six
families bit/tolerance-identical to CPU (see BASELINE.md).

Chip discipline: in-process alarm deadlines only (never SIGKILL a TPU
process — the remote lease wedges the chip for ~30-60 min).
"""

import os
import pickle
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np

EXPECTED = "/tmp/harkdb_r5_expected.pkl"

QUERIES = [
    ("frames", "select k, v, sum(v) over (partition by k order by v, rid "
               "rows between 1 preceding and 2 following) as s, "
               "min(v) over (partition by k order by v, rid "
               "rows between 2 preceding and 1 following) as mn "
               "from t order by k, v, rid limit 500"),
    ("ranking", "select k, ntile(4) over (partition by k order by v, rid) "
                "nt, percent_rank() over (partition by k order by v) pr, "
                "nth_value(v, 3) over (partition by k order by v, rid) n3 "
                "from t order by k, v, rid limit 500"),
    ("fullouter", "select t.k, t.v, d.m from t full outer join d "
                  "on t.k = d.j order by t.k nulls last, t.v nulls last, "
                  "d.m nulls last limit 500"),
    ("setops", "select v % 100 as x from t intersect "
               "select m % 100 as x from d2 order by x"),
    ("variance", "select k, stddev(v) sd, var_pop(v) vp from t "
                 "group by k order by k"),
    ("cte_corr", "with hot as (select k from t group by k "
                 "having count(*) > 40) "
                 "select t.k, count(*) n from t "
                 "where t.k in (select k from hot) "
                 "and t.v > (select avg(t2.v) from t t2 where t2.k = t.k) "
                 "group by t.k order by t.k"),
    ("median", "select k, median(v) md, quantile(v, 0.25) q1, "
               "stddev(v) sd from t group by k order by k"),
    ("topk", "select k, v from t order by v desc limit 25"),
    ("setop_body", "select d.x, count(*) n from "
                   "(select v % 97 as x from t intersect "
                   "select m % 97 as x from d2) d "
                   "group by d.x order by d.x limit 50"),
]


def build_ctx():
    import pandas as pd

    from harkdb_tpu import Context

    rng = np.random.default_rng(123)
    n = 100_000
    t = pd.DataFrame({
        "k": rng.integers(0, 50, n).astype(np.int32),
        "v": rng.integers(0, 10_000, n).astype(np.int32),
        "rid": np.arange(n, dtype=np.int32),
    })
    d = pd.DataFrame({
        "j": rng.integers(30, 80, 60).astype(np.int32),
        "m": rng.integers(0, 1000, 60).astype(np.int32),
    })
    d2 = pd.DataFrame({
        "m": rng.integers(0, 5000, 20_000).astype(np.int32)
    })
    c = Context()
    c.create_table("t", t)
    c.create_table("d", d)
    c.create_table("d2", d2)
    return c


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if mode == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        c = build_ctx()
        out = {}
        for name, q in QUERIES:
            df = c.sql_df(q)
            out[name] = {
                col: df[col].to_numpy(np.float64) for col in df.columns
            }
        with open(EXPECTED, "wb") as f:
            pickle.dump(out, f)
        print("cpu oracle saved")
        return

    def alarm(*_):
        raise TimeoutError("stage deadline")

    signal.signal(signal.SIGALRM, alarm)
    signal.setitimer(signal.ITIMER_REAL, 1800)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    with open(EXPECTED, "rb") as f:
        expected = pickle.load(f)
    c = build_ctx()
    ok = True
    for name, q in QUERIES:
        t0 = time.monotonic()
        try:
            signal.setitimer(signal.ITIMER_REAL, 600)
            df = c.sql_df(q)
        except TimeoutError:
            print(f"{name}: TIMEOUT", flush=True)
            ok = False
            continue
        finally:
            signal.setitimer(signal.ITIMER_REAL, 1800)
        stat = "ok"
        for col, want in expected[name].items():
            got = df[col].to_numpy(np.float64)
            if got.shape != want.shape or not np.allclose(
                got, want, rtol=1e-4, atol=1e-4, equal_nan=True
            ):
                stat = f"MISMATCH in {col}"
                ok = False
                break
        print(f"{name}: {stat} ({time.monotonic() - t0:.1f}s)", flush=True)
    print("ALL OK" if ok else "FAILURES", flush=True)
    time.sleep(2)


if __name__ == "__main__":
    main()
