"""Window functions (engine extension; no reference analog).

Implementation under test (``plan/planner.py:_compute_windows``): one stable
payload sort per distinct (PARTITION BY, ORDER BY) shape; boundaries from
adjacent-key changes; row_number/rank/dense_rank via position arithmetic
(cummax-filled starts); running aggregates via the groupby's segmented-scan
machinery; the SQL default RANGE frame (peers included) via a reversed
take-first segmented scan; one sort back by row id. Differential vs pandas.
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context
from harkdb_tpu.plan.planner import PlanError


@pytest.fixture
def wctx(rng):
    df = pd.DataFrame({
        "dept": rng.choice(["eng", "ops", "hr", "sales"], 200),
        "pay": rng.integers(50, 150, 200).astype(np.int32),
        "yr": rng.integers(2018, 2023, 200).astype(np.int32),
        "f": rng.standard_normal(200).astype(np.float32),
    })
    c = Context()
    c.create_table("emp", df)
    return c, df


class TestRankingFuncs:
    def test_row_number_is_partition_permutation(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, pay, row_number() over "
            "(partition by dept order by pay desc) as rn from emp"
        )
        for _d, g in got.groupby("dept"):
            assert sorted(g["rn"]) == list(range(1, len(g) + 1))
            # rn order must agree with pay desc
            s = g.sort_values("rn")
            assert (np.diff(s["pay"]) <= 0).all()

    def test_rank_min_semantics(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, pay, rank() over "
            "(partition by dept order by pay) as rk from emp "
            "order by dept, pay"
        )
        w = df.sort_values(["dept", "pay"], kind="stable")
        exp = w.groupby("dept")["pay"].rank(method="min").astype(int)
        assert got["rk"].tolist() == exp.tolist()

    def test_dense_rank(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select yr, dense_rank() over (order by yr) as dr from emp "
            "order by yr"
        )
        w = df.sort_values("yr")
        exp = w["yr"].rank(method="dense").astype(int)
        assert got["dr"].tolist() == exp.tolist()

    def test_rank_without_order_is_all_ones(self, wctx):
        c, _df = wctx
        got = c.sql_df(
            "select rank() over (partition by dept) as rk from emp"
        )
        assert (got["rk"] == 1).all()


class TestRunningAggregates:
    def test_running_sum_range_frame_peers(self, wctx):
        # SQL default frame with ORDER BY is RANGE ...CURRENT ROW: tie rows
        # (peers) all carry the value at the LAST peer.
        c, df = wctx
        got = c.sql_df(
            "select dept, pay, sum(pay) over "
            "(partition by dept order by pay) as rs from emp "
            "order by dept, pay"
        )
        w = df.sort_values(["dept", "pay"], kind="stable")
        w["rs"] = w.groupby("dept")["pay"].cumsum()
        w["rs"] = w.groupby(["dept", "pay"])["rs"].transform("max")
        assert got["rs"].tolist() == w["rs"].tolist()

    def test_running_count_and_min_max(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, pay, count(*) over "
            "(partition by dept order by pay) as cnt, "
            "min(pay) over (partition by dept order by pay) as mn, "
            "max(pay) over (partition by dept order by pay) as mx "
            "from emp order by dept, pay"
        )
        w = df.sort_values(["dept", "pay"], kind="stable")
        w["cnt"] = w.groupby("dept")["pay"].rank(method="max").astype(int)
        w["mn"] = w.groupby("dept")["pay"].transform("min")  # running min of
        # sorted-asc pay = partition min at every row? No: running min of an
        # ascending sequence is the first element.
        w["mn"] = w.groupby("dept")["pay"].transform("first")
        w["mx"] = w["pay"]                      # running max of ascending
        w["mx"] = w.groupby(["dept", "pay"])["mx"].transform("max")
        assert got["cnt"].tolist() == w["cnt"].tolist()
        assert got["mn"].tolist() == w["mn"].tolist()
        assert got["mx"].tolist() == w["mx"].tolist()

    def test_whole_partition_aggregates(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, sum(pay) over (partition by dept) as tot, "
            "avg(pay) over (partition by dept) as ap, "
            "count(*) over (partition by dept) as n from emp"
        )
        w = df.copy()
        w["tot"] = w.groupby("dept")["pay"].transform("sum")
        w["ap"] = w.groupby("dept")["pay"].transform("mean")
        w["n"] = w.groupby("dept")["pay"].transform("size")
        assert got["tot"].tolist() == w["tot"].tolist()
        assert got["n"].tolist() == w["n"].tolist()
        np.testing.assert_allclose(got["ap"], w["ap"], rtol=1e-5)

    def test_float_running_sum(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select yr, f, sum(f) over (partition by yr order by f) as rs "
            "from emp order by yr, f"
        )
        w = df.sort_values(["yr", "f"], kind="stable")
        exp = w.groupby("yr")["f"].cumsum()
        np.testing.assert_allclose(got["rs"], exp, rtol=1e-4, atol=1e-4)

    def test_empty_over_is_global(self, wctx):
        c, df = wctx
        got = c.sql_df("select sum(pay) over () as tot from emp")
        assert (got["tot"] == df.pay.sum()).all()

    def test_desc_order_running(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, pay, sum(pay) over "
            "(partition by dept order by pay desc) as rs from emp "
            "order by dept, pay desc"
        )
        w = df.sort_values(["dept", "pay"], ascending=[True, False],
                           kind="stable")
        w["rs"] = w.groupby("dept")["pay"].cumsum()
        w["rs"] = w.groupby(["dept", "pay"])["rs"].transform("max")
        assert got["rs"].tolist() == w["rs"].tolist()


class TestWindowInteractions:
    def test_windows_see_only_where_survivors(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, count(*) over (partition by dept) as n from emp "
            "where pay > 100"
        )
        w = df[df.pay > 100].copy()
        w["n"] = w.groupby("dept")["pay"].transform("size")
        assert got["n"].tolist() == w["n"].tolist()

    def test_order_by_window_alias(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, pay, row_number() over "
            "(partition by dept order by pay desc) as rn from emp "
            "order by dept, rn limit 8"
        )
        assert len(got) == 8
        for _d, g in got.groupby("dept"):
            assert g["rn"].tolist() == sorted(g["rn"].tolist())

    def test_window_output_in_expression(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select pay, pay - avg(pay) over (partition by dept) as dev "
            "from emp"
        )
        w = df.copy()
        w["dev"] = w.pay - w.groupby("dept")["pay"].transform("mean")
        # engine computes in float32; pandas in float64
        np.testing.assert_allclose(got["dev"], w["dev"], rtol=1e-4,
                                   atol=1e-4)

    def test_two_window_shapes_one_query(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select row_number() over (order by pay) as a, "
            "sum(pay) over (partition by dept) as b from emp"
        )
        assert sorted(got["a"]) == list(range(1, len(df) + 1))
        w = df.groupby("dept")["pay"].transform("sum")
        assert got["b"].tolist() == w.tolist()

    def test_string_partition_and_min_decode(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select yr, min(dept) over (partition by yr) as md from emp "
            "order by yr"
        )
        w = df.copy()
        w["md"] = w.groupby("yr")["dept"].transform("min")
        w = w.sort_values("yr", kind="stable")
        assert got["md"].tolist() == w["md"].tolist()

    def test_with_join(self, rng):
        c = Context()
        left = pd.DataFrame({
            "k": rng.integers(0, 4, 60).astype(np.int32),
            "v": rng.integers(0, 100, 60).astype(np.int32),
        })
        dims = pd.DataFrame({"j": np.arange(4, dtype=np.int32),
                             "w": np.array([10, 20, 30, 40], np.int32)})
        c.create_table("l", left)
        c.create_table("d", dims)
        got = c.sql_df(
            "select l.k, l.v, sum(d.w) over (partition by l.k) as sw "
            "from l join d on l.k = d.j"
        )
        m = left.merge(dims, left_on="k", right_on="j")
        m = m.sort_values(["k"], kind="stable")          # join emits key order
        w = m.groupby("k")["w"].transform("sum")
        assert got["sw"].tolist() == w.tolist()


class TestWindowErrors:
    def test_window_in_where_rejected(self, wctx):
        c, _df = wctx
        with pytest.raises(PlanError):
            c.sql_df(
                "select pay from emp "
                "where row_number() over (order by pay) < 5"
            )

    def test_window_over_implicit_group_rejected(self, wctx):
        # a single implicit group (ungrouped aggregate) has no meaningful
        # window; GROUP BY queries support windows since round 4
        c, _df = wctx
        with pytest.raises(PlanError):
            c.sql_df(
                "select sum(pay), row_number() over (order by sum(pay)) "
                "from emp"
            )

    def test_sum_over_string_rejected(self, wctx):
        c, _df = wctx
        with pytest.raises(PlanError):
            c.sql_df("select sum(dept) over () from emp")

    def test_distinct_in_window_rejected(self, wctx):
        from harkdb_tpu.sql.parser import SqlError

        c, _df = wctx
        with pytest.raises(SqlError):
            c.sql_df("select count(distinct pay) over () from emp")

    def test_window_only_funcs_require_over(self, wctx):
        from harkdb_tpu.sql.parser import SqlError

        c, _df = wctx
        with pytest.raises(SqlError):
            c.sql_df("select row_number() from emp")


class TestWindowsDistributed:
    """Distributed windows (dist_ops.dist_window): one hash-shuffle per
    PARTITION BY shape puts each partition wholly on one shard; global-rid
    tie-breaking makes row_number bit-identical to the single-chip path."""

    QUERIES = [
        "select dept, pay, rank() over "
        "(partition by dept order by pay desc) as rk from emp "
        "order by dept, pay",
        # two different partition shapes chain as sequential shuffles
        "select dept, sum(pay) over (partition by dept) as tot, "
        "row_number() over (partition by yr order by pay) as rn from emp",
        # empty PARTITION BY degenerates to one shard, still correct
        "select pay, sum(pay) over () as tot from emp where pay > 80",
        "select dept, pay, sum(pay) over "
        "(partition by dept order by pay) as rs from emp "
        "order by rs desc limit 10",
        # lead with a nonzero default exercises the partition-tail guard
        # (advisor r3) through the distributed shuffle too
        "select dept, pay, lead(pay, 1, -999) over "
        "(partition by dept order by pay) as nx from emp "
        "order by dept, pay",
        # GLOBAL windows (round-4 item 3): per-shard scans + carry exchange
        # (parallel/global_window.py), not the shard-0 funnel
        "select pay, row_number() over (order by pay desc, yr) as rn, "
        "rank() over (order by pay desc) as rk, "
        "dense_rank() over (order by pay desc) as dr from emp "
        "order by rn",
        "select pay, sum(pay) over (order by pay, yr) as rs, "
        "count(pay) over (order by pay, yr) as rc, "
        "min(pay) over (order by pay desc) as mn from emp "
        "order by pay, yr",
        "select pay, first_value(pay) over (order by pay desc) as fv, "
        "last_value(pay) over (order by pay) as lv from emp "
        "order by pay, yr limit 20",
        # global window with no ORDER BY after a WHERE: totals broadcast
        "select pay, sum(pay) over () as t, count(pay) over () as c, "
        "max(pay) over () as mx from emp where pay > 70 order by pay, yr",
        # lag/lead over () run on the carry path via an edge-row halo
        # exchange (parallel/global_window.py)
        "select pay, lag(pay, 1, -3) over (order by pay, yr) as lg "
        "from emp order by pay, yr",
        "select pay, lead(pay, 3, -9) over (order by pay desc, yr) as ld, "
        "lag(yr, 2) over (order by pay desc, yr) as lg2 "
        "from emp order by pay desc, yr",
    ]

    @pytest.mark.parametrize("qi", range(len(QUERIES)))
    def test_matches_single_chip(self, rng, qi):
        from harkdb_tpu.parallel import make_engine_mesh

        df = pd.DataFrame({
            "dept": rng.choice(["eng", "ops", "hr", "sales"], 300),
            "pay": rng.integers(50, 150, 300).astype(np.int32),
            "yr": rng.integers(2018, 2023, 300).astype(np.int32),
        })
        cs = Context()
        cs.create_table("emp", df)
        cm = Context(mesh=make_engine_mesh(8))
        cm.create_table("emp", df)
        q = self.QUERIES[qi]
        pd.testing.assert_frame_equal(
            cs.sql_df(q), cm.sql_df(q), check_dtype=False
        )


class TestFrameSpecs:
    """Explicit ROWS BETWEEN ... frames (round-4 item 9) vs pandas
    rolling/expanding. ROWS frames are positional — peers excluded —
    unlike the default RANGE frame."""

    def test_bounded_sum_avg_count_vs_rolling(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, pay, "
            "sum(pay) over (partition by dept order by pay, yr "
            "rows between 2 preceding and current row) as s, "
            "avg(pay) over (partition by dept order by pay, yr "
            "rows between 2 preceding and current row) as a, "
            "count(pay) over (partition by dept order by pay, yr "
            "rows between 2 preceding and current row) as n "
            "from emp order by dept, pay, yr"
        )
        w = df.sort_values(["dept", "pay", "yr"], kind="stable")
        g = w.groupby("dept")["pay"]
        assert got["s"].tolist() == g.rolling(3, min_periods=1).sum() \
            .reset_index(drop=True).astype(int).tolist()
        np.testing.assert_allclose(
            got["a"],
            g.rolling(3, min_periods=1).mean().reset_index(drop=True),
            rtol=1e-6,
        )
        assert got["n"].tolist() == g.rolling(3, min_periods=1).count() \
            .reset_index(drop=True).astype(int).tolist()

    def test_bounded_min_max_vs_rolling(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, pay, "
            "min(pay) over (partition by dept order by yr, pay "
            "rows between 4 preceding and current row) as mn, "
            "max(f) over (partition by dept order by yr, pay "
            "rows between 4 preceding and current row) as mx "
            "from emp order by dept, yr, pay"
        )
        w = df.sort_values(["dept", "yr", "pay"], kind="stable")
        g = w.groupby("dept")
        assert got["mn"].tolist() == g["pay"].rolling(5, min_periods=1) \
            .min().reset_index(drop=True).astype(int).tolist()
        np.testing.assert_allclose(
            got["mx"],
            g["f"].rolling(5, min_periods=1).max().reset_index(drop=True),
            rtol=1e-6,
        )

    def test_unbounded_rows_excludes_peers(self):
        # ROWS UNBOUNDED..CURRENT differs from the default RANGE frame on
        # ties: the running sum advances per ROW, not per peer group.
        c = Context()
        c.create_table("t", pd.DataFrame(
            {"v": np.array([5, 5, 5], np.int32)}
        ))
        rows = c.sql_df(
            "select sum(v) over (order by v rows between unbounded "
            "preceding and current row) as s from t"
        )
        rng_ = c.sql_df("select sum(v) over (order by v) as s from t")
        assert rows["s"].tolist() == [5, 10, 15]
        assert rng_["s"].tolist() == [15, 15, 15]

    def test_frame_distributed_parity(self, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        df = pd.DataFrame({
            "dept": rng.choice(["a", "b", "c"], 300),
            "pay": rng.integers(0, 200, 300).astype(np.int32),
        })
        cs = Context()
        cm = Context(mesh=make_engine_mesh(8))
        for c in (cs, cm):
            c.create_table("emp", df)
        for q in [
            "select dept, pay, sum(pay) over (partition by dept "
            "order by pay rows between 3 preceding and current row) as s "
            "from emp order by dept, pay",
            # global bounded frame → shard-0 fallback route
            "select pay, max(pay) over (order by pay "
            "rows between 2 preceding and current row) as m "
            "from emp order by pay",
        ]:
            pd.testing.assert_frame_equal(
                cs.sql_df(q), cm.sql_df(q), check_dtype=False
            )

    def test_frame_on_ranking_func_rejected(self, wctx):
        c, _df = wctx
        from harkdb_tpu.sql.parser import SqlError

        with pytest.raises(SqlError):
            c.sql_df(
                "select row_number() over (order by pay rows between "
                "2 preceding and current row) from emp"
            )

    def test_range_bounded_rejected(self, wctx):
        c, _df = wctx
        from harkdb_tpu.sql.parser import SqlError

        with pytest.raises(SqlError):
            c.sql_df(
                "select sum(pay) over (order by pay range between "
                "2 preceding and current row) as s from emp"
            )


class TestWindowsOverGroupedOutput:
    """Round-4: windows evaluate over the GROUPED output (standard SQL
    order: WHERE → GROUP BY → HAVING → window → ORDER BY), with window
    arguments referencing aggregates."""

    def test_rank_by_aggregate(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, yr, sum(pay) as tot, "
            "rank() over (order by sum(pay) desc) as rk, "
            "sum(sum(pay)) over (partition by dept) as dept_tot "
            "from emp group by dept, yr order by rk, dept, yr"
        )
        g = df.groupby(["dept", "yr"], as_index=False).agg(tot=("pay", "sum"))
        g["rk"] = g.tot.rank(method="min", ascending=False).astype(int)
        g["dept_tot"] = g.groupby("dept").tot.transform("sum")
        g = g.sort_values(["rk", "dept", "yr"])
        assert got["tot"].tolist() == g["tot"].tolist()
        assert got["rk"].tolist() == g["rk"].tolist()
        assert got["dept_tot"].tolist() == g["dept_tot"].tolist()

    def test_having_applies_before_window(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, yr, count(*) as n, "
            "row_number() over (order by count(*) desc, dept, yr) as rn "
            "from emp group by dept, yr having count(*) > 8 order by rn"
        )
        h = df.groupby(["dept", "yr"], as_index=False).size() \
            .rename(columns={"size": "n"})
        h = h[h.n > 8].sort_values(["n", "dept", "yr"],
                                   ascending=[False, True, True])
        assert got["n"].tolist() == h["n"].tolist()
        assert got["rn"].tolist() == list(range(1, len(h) + 1))

    def test_window_over_avg_output(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, avg(pay) as a, "
            "rank() over (order by avg(pay) desc) as rk "
            "from emp group by dept order by rk, dept"
        )
        g = df.groupby("dept", as_index=False).agg(a=("pay", "mean"))
        g["rk"] = g.a.rank(method="min", ascending=False).astype(int)
        g = g.sort_values(["rk", "dept"])
        np.testing.assert_allclose(got["a"], g["a"], rtol=1e-6)
        assert got["rk"].tolist() == g["rk"].tolist()

    def test_distributed_parity(self, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        df = pd.DataFrame({
            "dept": rng.choice(["a", "b", "c", "d"], 600),
            "reg": rng.choice(["x", "y", "z"], 600),
            "pay": rng.integers(1, 100, 600).astype(np.int32),
        })
        cs = Context()
        cm = Context(mesh=make_engine_mesh(8))
        for c in (cs, cm):
            c.create_table("emp", df)
        for q in [
            "select dept, reg, sum(pay) as tot, "
            "rank() over (order by sum(pay) desc) as rk "
            "from emp group by dept, reg order by rk, dept, reg",
            "select dept, reg, count(*) as n, row_number() over "
            "(partition by dept order by count(*) desc, reg) as rn "
            "from emp group by dept, reg having count(*) > 20 "
            "order by dept, rn",
        ]:
            pd.testing.assert_frame_equal(
                cs.sql_df(q), cm.sql_df(q), check_dtype=False
            )


class TestGlobalWindowSharded:
    def test_no_shard_funnel(self, rng):
        """Round-4 item 3: an empty-PARTITION BY running sum keeps every
        device at ~1/D of the rows (the old path routed everything to
        shard 0) and matches the numpy oracle exactly (int sums)."""
        from harkdb_tpu.config import EngineConfig
        from harkdb_tpu.parallel import make_engine_mesh, shard_batch
        from harkdb_tpu.parallel.global_window import dist_global_window
        from harkdb_tpu.sql.ast_nodes import Col

        cfg = EngineConfig()
        mesh = make_engine_mesh(8)
        D = 8
        n = 1 << 14
        v = rng.integers(-100, 100, n).astype(np.int32)
        sb = shard_batch(
            {"t.v": v, "#rid.t": np.arange(n, dtype=np.int32)}, n, mesh, cfg
        )
        spec = ("#win0", "sum", Col("t.v"), (), (Col("t.v"),), (False,), ())
        out = dist_global_window(sb, [spec], mesh, cfg)
        assert out.local_capacity <= (n // D) * 4, out.local_capacity
        C = out.local_capacity
        counts = np.asarray(out.shard_counts)
        sv = np.asarray(out.columns["t.v"]).reshape(D, C)
        wv = np.asarray(out.columns["#win0"]).reshape(D, C)
        svc = np.concatenate([sv[i, :counts[i]] for i in range(D)])
        wvc = np.concatenate([wv[i, :counts[i]] for i in range(D)])
        vs = np.sort(v)
        np.testing.assert_array_equal(svc, vs)
        # SQL default frame includes peers: each tie run carries the run's
        # last running-sum value
        cs = np.cumsum(vs.astype(np.int64)).astype(np.int32)
        exp = pd.DataFrame({"v": vs, "cs": cs}).groupby("v")["cs"] \
            .transform("last").to_numpy()
        np.testing.assert_array_equal(wvc, exp)


class TestPositionalWindowFuncs:
    """lag/lead (ROWS-based, optional offset + default) and
    first_value/last_value (SQL default frame: last peer)."""

    def test_lag_lead_vs_pandas(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, yr, pay, "
            "lag(pay) over (partition by dept order by yr, pay) as prev, "
            "lead(pay, 2) over (partition by dept order by yr, pay) as nxt "
            "from emp order by dept, yr, pay"
        )
        w = df.sort_values(["dept", "yr", "pay"], kind="stable")
        w["prev"] = w.groupby("dept")["pay"].shift(1).fillna(0).astype(int)
        w["nxt"] = w.groupby("dept")["pay"].shift(-2).fillna(0).astype(int)
        assert got["prev"].tolist() == w["prev"].tolist()
        assert got["nxt"].tolist() == w["nxt"].tolist()

    def test_lag_explicit_default(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select lag(pay, 1, -1) over (order by pay, yr) as p from emp "
            "order by pay, yr limit 1"
        )
        assert got["p"].tolist() == [-1]

    def test_lead_nonzero_default_at_partition_tail(self, wctx):
        # Advisor r3 (high): padding rows inherit the last live partition's
        # sid_p, so lead() on each partition's LAST row matched a padding
        # neighbor and returned its (unspecified) value instead of the
        # default. The nonzero default makes the bug visible.
        c, df = wctx
        got = c.sql_df(
            "select dept, yr, pay, "
            "lead(pay, 1, -999) over (partition by dept order by yr, pay) "
            "as nxt from emp order by dept, yr, pay"
        )
        w = df.sort_values(["dept", "yr", "pay"], kind="stable")
        exp = w.groupby("dept")["pay"].shift(-1).fillna(-999).astype(int)
        assert got["nxt"].tolist() == exp.tolist()

    def test_lead_nonzero_default_after_where(self, wctx):
        # WHERE forces a pre-window compaction whose tail rows are
        # unspecified on the Pallas path — the default must still win on
        # the last live row.
        c, df = wctx
        got = c.sql_df(
            "select pay, lead(pay, 2, -5) over (order by pay, yr) as nxt "
            "from emp where pay > 90 order by pay, yr"
        )
        w = df[df["pay"] > 90].sort_values(["pay", "yr"], kind="stable")
        exp = w["pay"].shift(-2).fillna(-5).astype(int)
        assert got["nxt"].tolist() == exp.tolist()

    def test_lag_offset_exceeds_partition(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select lag(pay, 100000) over (partition by dept) as p from emp"
        )
        assert (got["p"] == 0).all()

    def test_first_last_value(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select dept, pay, "
            "first_value(pay) over (partition by dept order by pay) as fv "
            "from emp order by dept, pay"
        )
        w = df.sort_values(["dept", "pay"], kind="stable")
        assert got["fv"].tolist() == (
            w.groupby("dept")["pay"].transform("min").tolist()
        )

    def test_string_lag_preserves_dictionary(self, wctx):
        c, df = wctx
        got = c.sql_df(
            "select lag(dept) over (order by pay, yr, f) as pd from emp "
            "order by pay, yr, f"
        )
        w = df.sort_values(["pay", "yr", "f"], kind="stable")
        exp = w["dept"].shift(1)
        exp.iloc[0] = sorted(df.dept.unique())[0]   # code-0 fill
        assert got["pd"].tolist() == exp.tolist()

    def test_lag_negative_offset_rejected(self, wctx):
        c, _df = wctx
        # parser-level minus folds into the literal; planner validates
        with pytest.raises(PlanError):
            c.sql_df("select lag(pay, -1) over (order by pay) from emp")

    def test_string_default_rejected(self, wctx):
        c, _df = wctx
        with pytest.raises(PlanError):
            c.sql_df("select lag(dept, 1, 5) over (order by pay) from emp")

    def test_distributed_parity(self, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        df = pd.DataFrame({
            "k": rng.choice(["a", "b", "c"], 200),
            "t": np.arange(200, dtype=np.int32),
            "v": rng.integers(0, 100, 200).astype(np.int32),
        })
        q = ("select k, t, lag(v) over (partition by k order by t) as p, "
             "first_value(v) over (partition by k order by t) as fv "
             "from s order by k, t")
        cs = Context()
        cs.create_table("s", df)
        cm = Context(mesh=make_engine_mesh(8))
        cm.create_table("s", df)
        pd.testing.assert_frame_equal(
            cs.sql_df(q), cm.sql_df(q), check_dtype=False
        )


class TestSortOrderTracking:
    """Round-5 item 5: when the final ORDER BY exactly matches a window
    shape's (PARTITION BY, ORDER BY) sort, that shape runs last and both
    the restore sort and the tail ORDER BY sort are skipped."""

    @pytest.fixture
    def wctx(self, rng):
        df = pd.DataFrame({
            "k": rng.integers(0, 25, 400).astype(np.int32),
            "v": rng.integers(0, 40, 400).astype(np.int32),
        })
        c = Context()
        c.create_table("t", df)
        return c, df

    def test_engages_and_matches_classic_path(self, wctx):
        c, _df = wctx
        base = ("select k, v, sum(v) over (partition by k order by v) as rs,"
                " row_number() over (partition by v order by k desc) as rn "
                "from t ")
        q_skip = base + "order by k, v"
        q_classic = base + "order by k, v, rn"   # extra key → no match
        assert c._plan(q_skip).window_skip_shape is not None
        assert c._plan(q_classic).window_skip_shape is None
        a = c.sql_df(q_skip).sort_values(
            ["k", "v", "rn"]).reset_index(drop=True)
        b = c.sql_df(q_classic).sort_values(
            ["k", "v", "rn"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        # and the skip path's own order is the requested one
        got = c.sql_df(q_skip)
        assert got[["k", "v"]].apply(tuple, axis=1).is_monotonic_increasing

    def test_desc_direction_must_match(self, wctx):
        c, _df = wctx
        q = ("select k, v, sum(v) over (partition by k order by v desc) "
             "as rs from t order by k, v desc")
        assert c._plan(q).window_skip_shape is not None
        got = c.sql_df(q)
        ks = got["k"].to_numpy()
        assert (np.diff(ks) >= 0).all()
        for k in np.unique(ks):
            vs = got.loc[got["k"] == k, "v"].to_numpy()
            assert (np.diff(vs) <= 0).all()

    def test_nullable_key_disables_skip(self, wctx):
        c, df = wctx
        c.create_table("d", pd.DataFrame({
            "j": np.array([0, 1], np.int32),
            "m": np.array([7, 9], np.int32),
        }))
        q = ("select t.k, d.m, sum(t.v) over (partition by d.m order by t.k)"
             " as rs from t left join d on t.k = d.j order by d.m, t.k")
        # d.m is nullable → NULL placement differs from the plain sort
        assert c._plan(q).window_skip_shape is None

    def test_limit_offset_after_presort(self, wctx):
        c, _df = wctx
        base = ("select k, v, sum(v) over (partition by k order by v) as rs "
                "from t order by k, v")
        full = c.sql_df(base)
        head = c.sql_df(base + " limit 7 offset 3")
        pd.testing.assert_frame_equal(
            head, full.iloc[3:10].reset_index(drop=True)
        )


class TestFramesFollowing:
    """Round-5: general ROWS frames (FOLLOWING bounds, shifted frames)
    and the ranking/positional additions NTILE / PERCENT_RANK /
    CUME_DIST / NTH_VALUE — brute-force oracle per partition."""

    @pytest.fixture
    def fctx(self, rng):
        df = pd.DataFrame({
            "k": rng.integers(0, 6, 120).astype(np.int32),
            "v": rng.integers(0, 100, 120).astype(np.int32),
        })
        c = Context()
        c.create_table("t", df)
        return c, df

    @staticmethod
    def _roll(vals, lo, hi, fn):
        out = []
        for i in range(len(vals)):
            a = 0 if lo is None else max(i + lo, 0)
            b = len(vals) - 1 if hi is None else min(i + hi,
                                                     len(vals) - 1)
            w = vals[a:b + 1] if b >= a >= 0 else []
            out.append(fn(w) if w else None)
        return out

    def _check(self, c, df, frame_sql, lo, hi, func, pyfn):
        q = (f"select k, v, {func}(v) over (partition by k "
             f"order by v, k rows between {frame_sql}) as o "
             f"from t order by k, v")
        got = c.sql_df(q)
        s = df.sort_values(["k", "v"], kind="stable")
        exp = []
        for _k, grp in s.groupby("k"):
            exp += self._roll(grp["v"].tolist(), lo, hi, pyfn)
        ge = [None if pd.isna(x) else float(x) for x in got["o"]]
        ee = [None if x is None else float(x) for x in exp]
        assert ge == ee, q

    def test_following_sum_count_min_max(self, fctx):
        c, df = fctx
        self._check(c, df, "1 preceding and 2 following", -1, 2, "sum",
                    sum)
        self._check(c, df, "1 preceding and 2 following", -1, 2, "count",
                    len)
        self._check(c, df, "2 preceding and 1 following", -2, 1, "min",
                    min)
        self._check(c, df, "current row and 3 following", 0, 3, "max",
                    max)
        self._check(c, df, "current row and unbounded following", 0, None,
                    "max", max)
        self._check(c, df, "unbounded preceding and 2 following", None, 2,
                    "sum", sum)
        self._check(c, df, "unbounded preceding and unbounded following",
                    None, None, "sum", sum)
        self._check(c, df, "3 preceding and unbounded following", -3,
                    None, "min", min)

    def test_shifted_frames_null_when_empty(self, fctx):
        c, df = fctx
        self._check(c, df, "2 following and 4 following", 2, 4, "sum",
                    sum)
        self._check(c, df, "4 preceding and 2 preceding", -4, -2, "sum",
                    sum)

    def test_avg_following(self, fctx):
        c, df = fctx
        q = ("select k, v, avg(v) over (partition by k order by v, k "
             "rows between 1 preceding and 1 following) as a "
             "from t order by k, v")
        got = c.sql_df(q)
        s = df.sort_values(["k", "v"], kind="stable")
        exp = []
        for _k, grp in s.groupby("k"):
            exp += self._roll(grp["v"].tolist(), -1, 1,
                              lambda w: sum(w) / len(w))
        np.testing.assert_allclose(got["a"].to_numpy(), exp, rtol=1e-6)

    def test_ntile_percent_rank_cume_dist(self, fctx):
        c, df = fctx
        q = ("select k, v, ntile(4) over (partition by k order by v, k) "
             "as nt, percent_rank() over (partition by k order by v) as "
             "pr, cume_dist() over (partition by k order by v) as cd "
             "from t order by k, v")
        got = c.sql_df(q)
        s = df.sort_values(["k", "v"], kind="stable")
        for k, grp in s.groupby("k"):
            sub = got[got["k"] == k]
            L = len(grp)
            q_, r = divmod(L, 4)
            big = r * (q_ + 1)
            nt = [(i // (q_ + 1) + 1) if i < big
                  else r + (i - big) // max(q_, 1) + 1 for i in range(L)]
            assert sub["nt"].tolist() == nt
            ranks = grp["v"].rank(method="min").tolist()
            pr = [(rk - 1) / (L - 1) if L > 1 else 0.0 for rk in ranks]
            np.testing.assert_allclose(sub["pr"].to_numpy(), pr,
                                       rtol=1e-6)
            cmax = grp["v"].rank(method="max").tolist()
            np.testing.assert_allclose(
                sub["cd"].to_numpy(), [x / L for x in cmax], rtol=1e-6
            )

    def test_nth_value(self, fctx):
        c, df = fctx
        q = ("select k, v, nth_value(v, 3) over (partition by k "
             "order by v, k) as n3 from t order by k, v")
        got = c.sql_df(q)
        s = df.sort_values(["k", "v"], kind="stable")
        exp = []
        for _k, grp in s.groupby("k"):
            vals = grp["v"].tolist()
            # default frame reaches the last PEER; v,k order is unique
            # per row here, so the frame is [0, i]
            exp += [float(vals[2]) if i >= 2 else None
                    for i in range(len(vals))]
        ge = [None if pd.isna(x) else float(x) for x in got["n3"]]
        assert ge == exp

    def test_prod_bounded_rejected(self, fctx):
        c, _df = fctx
        from harkdb_tpu.plan.planner import PlanError

        with pytest.raises(PlanError, match="PROD"):
            c.sql("select prod(v) over (order by v rows between 2 "
                  "preceding and current row) from t")

    def test_minmax_one_sided_rejected(self, fctx):
        c, _df = fctx
        from harkdb_tpu.plan.planner import PlanError

        with pytest.raises(PlanError, match="MIN/MAX"):
            c.sql("select min(v) over (order by v rows between 2 "
                  "following and 4 following) from t")

    def test_distributed_parity(self, fctx):
        from harkdb_tpu.parallel import make_engine_mesh

        c, df = fctx
        cm = Context(mesh=make_engine_mesh(8))
        cm.create_table("t", df)
        for q in [
            "select k, v, sum(v) over (partition by k order by v, k rows "
            "between 1 preceding and 2 following) as s from t "
            "order by k, v",
            "select k, v, ntile(3) over (partition by k order by v, k) "
            "as nt, nth_value(v, 2) over (partition by k order by v, k) "
            "as n2 from t order by k, v",
            "select k, v, sum(v) over (partition by k order by v, k rows "
            "between 2 following and 4 following) as s2 from t "
            "order by k, v",
        ]:
            pd.testing.assert_frame_equal(c.sql_df(q), cm.sql_df(q))
