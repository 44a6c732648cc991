"""Round-5 SQL-surface extensions: CTEs, correlated aggregate
decorrelation, string scalar functions, GROUP BY expressions.

  * ``WITH name AS (...)`` desugars at parse time into the derived-table
    path (``sql/ast_nodes.substitute_ctes``); every reference to one CTE
    shares a single materialization (``plan/derived.py``).
  * ``WHERE x <op> (SELECT agg(..) FROM r WHERE r.k = t.k)`` rewrites to a
    LEFT JOIN against the grouped derived table (``plan/decorrelate.py``);
    empty correlation sets give NULL (COUNT: 0) — exact SQL via 3VL.
  * UPPER/LOWER/TRIM/SUBSTR/LENGTH run as plan-time dictionary transforms
    (``plan/strings.py`` → CodeMap): one host-side pass over the
    dictionary, one small-LUT gather on device.
  * GROUP BY accepts full expressions (hidden ``#gexprN`` computed
    columns riding the group-by sort).
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context
from harkdb_tpu.plan.errors import PlanError


@pytest.fixture
def tctx():
    c = Context()
    c.create_table("t", pd.DataFrame({
        "k": np.array([1, 1, 2, 2, 3], np.int32),
        "v": np.array([10, 20, 30, 40, 50], np.int32),
    }))
    c.create_table("r", pd.DataFrame({
        "k": np.array([1, 1, 2], np.int32),
        "w": np.array([5, 15, 100], np.int32),
    }))
    return c


class TestCTE:
    def test_basic(self, tctx):
        df = tctx.sql_df(
            "with agg as (select k, sum(v) as s from t group by k) "
            "select t.k, t.v, agg.s from t join agg on t.k = agg.k "
            "order by t.k, t.v"
        )
        want = {1: 30, 2: 70, 3: 50}
        assert df["s"].tolist() == [want[k] for k in df["k"]]

    def test_chained_ctes(self, tctx):
        df = tctx.sql_df(
            "with agg as (select k, sum(v) as s from t group by k), "
            "big as (select k, s from agg where s > 40) "
            "select k, s from big order by k"
        )
        assert df["k"].tolist() == [2, 3]
        assert df["s"].tolist() == [70, 50]

    def test_shared_materialization(self, tctx):
        q = ("with a as (select k, sum(v) as s from t group by k) "
             "select x.k, x.s, y.s as s2 from a x join a y on x.k = y.k "
             "order by x.k")
        df = tctx.sql_df(q)
        assert df["s"].tolist() == df["s2"].tolist() == [30, 70, 50]
        plan = tctx._plan(q)
        assert len({id(v) for v in plan._derived.values()}) == 1

    def test_cte_in_subquery(self, tctx):
        df = tctx.sql_df(
            "with big as (select k from t where v >= 40) "
            "select k, v from t where k in (select k from big) "
            "order by k, v"
        )
        assert df["k"].tolist() == [2, 2, 3]

    def test_cte_in_union(self, tctx):
        df = tctx.sql_df(
            "with a as (select k from t where k = 1) "
            "select k from a union all select k from a order by k"
        )
        assert df["k"].tolist() == [1, 1, 1, 1]

    def test_duplicate_name_rejected(self, tctx):
        from harkdb_tpu.sql.parser import SqlError

        with pytest.raises(SqlError, match="Duplicate CTE"):
            tctx.sql("with a as (select k from t), a as (select v from t) "
                     "select * from a")


class TestDecorrelate:
    def test_where_avg(self, tctx):
        df = tctx.sql_df(
            "select t.k, t.v from t "
            "where t.v > (select avg(r.w) from r where r.k = t.k) "
            "order by t.k, t.v"
        )
        # k=1 avg=10 → v=20; k=2 avg=100 → none; k=3 empty → NULL → reject
        assert list(zip(df["k"], df["v"])) == [(1, 20)]

    def test_select_count_empty_is_zero(self, tctx):
        df = tctx.sql_df(
            "select t.k, (select count(*) from r where r.k = t.k) as n "
            "from t order by t.k, t.v"
        )
        assert df["n"].tolist() == [2, 2, 1, 1, 0]

    def test_select_max_empty_is_null(self, tctx):
        df = tctx.sql_df(
            "select t.k, (select max(r.w) from r where r.k = t.k) as mx "
            "from t order by t.k, t.v"
        )
        assert df["mx"].isna().tolist() == [False] * 4 + [True]

    def test_extra_inner_filter(self, tctx):
        df = tctx.sql_df(
            "select distinct t.k, (select sum(r.w) from r "
            "where r.k = t.k and r.w < 50) as s from t order by t.k"
        )
        # k=1: 5+15=20; k=2: w=100 filtered → empty → NULL; k=3: NULL
        assert df["s"].tolist()[:1] == [20]
        assert df["s"].isna().tolist() == [False, True, True]

    def test_differential(self, rng):
        t = pd.DataFrame({
            "k": rng.integers(0, 20, 200).astype(np.int32),
            "v": rng.integers(0, 100, 200).astype(np.int32),
        })
        r = pd.DataFrame({
            "k": rng.integers(0, 12, 80).astype(np.int32),
            "w": rng.integers(0, 100, 80).astype(np.int32),
        })
        c = Context()
        c.create_table("t", t)
        c.create_table("r", r)
        got = c.sql_df(
            "select t.k, t.v from t "
            "where t.v > (select avg(r.w) from r where r.k = t.k) "
            "order by t.k, t.v"
        )
        avg = r.groupby("k")["w"].mean()
        m = t.assign(a=t["k"].map(avg))
        want = m[m["v"] > m["a"]].sort_values(["k", "v"])
        assert got["k"].tolist() == want["k"].tolist()
        assert got["v"].tolist() == want["v"].tolist()

    def test_unsupported_still_named(self, tctx):
        with pytest.raises(PlanError, match="correlated"):
            tctx.sql(
                "select t.k from t "
                "where t.v > (select r.w from r where r.k < t.k)"
            )


@pytest.fixture
def sctx():
    c = Context()
    c.create_table("p", pd.DataFrame({
        "name": ["Alice", "bob", "CAROL", "dave", "alice", "Ann"],
        "v": np.arange(6, dtype=np.int32),
    }))
    return c


class TestStringFuncs:
    def test_select_decode(self, sctx):
        df = sctx.sql_df(
            "select name, upper(name) as u, lower(name) as l, "
            "length(name) as n, substr(name, 1, 2) as s2 from p "
            "order by v"
        )
        names = ["Alice", "bob", "CAROL", "dave", "alice", "Ann"]
        assert df["u"].tolist() == [s.upper() for s in names]
        assert df["l"].tolist() == [s.lower() for s in names]
        assert df["n"].tolist() == [len(s) for s in names]
        assert df["s2"].tolist() == [s[:2] for s in names]

    def test_where(self, sctx):
        df = sctx.sql_df(
            "select name from p where upper(name) = 'ALICE' order by v"
        )
        assert df["name"].tolist() == ["Alice", "alice"]
        df = sctx.sql_df("select name from p where length(name) = 3")
        assert sorted(df["name"]) == ["Ann", "bob"]
        df = sctx.sql_df(
            "select name from p where lower(name) like 'a%' order by v"
        )
        assert df["name"].tolist() == ["Alice", "alice", "Ann"]

    def test_chained(self, sctx):
        df = sctx.sql_df(
            "select upper(substr(name, 2, 2)) as m from p order by v"
        )
        assert df["m"].tolist() == ["LI", "OB", "AR", "AV", "LI", "NN"]

    def test_group_by_string_func(self, sctx):
        df = sctx.sql_df(
            "select upper(name) as u, count(*) as n, sum(v) as s from p "
            "group by upper(name) order by u"
        )
        assert df["u"].tolist() == ["ALICE", "ANN", "BOB", "CAROL", "DAVE"]
        assert df["n"].tolist() == [2, 1, 1, 1, 1]
        assert df["s"].tolist() == [4, 5, 1, 2, 3]

    def test_min_max_over_func(self, sctx):
        df = sctx.sql_df(
            "select min(lower(name)) as mn, max(upper(name)) as mx from p"
        )
        assert df["mn"].tolist() == ["alice"]
        assert df["mx"].tolist() == ["DAVE"]

    def test_order_by_func(self, sctx):
        df = sctx.sql_df("select name from p order by lower(name), v")
        assert df["name"].tolist() == [
            "Alice", "alice", "Ann", "bob", "CAROL", "dave"
        ]

    def test_numeric_arg_rejected(self, sctx):
        with pytest.raises(PlanError, match="string"):
            sctx.sql("select upper(v) from p")
        with pytest.raises(PlanError, match="string"):
            sctx.sql("select length(v) from p")

    def test_substr_validation(self, sctx):
        from harkdb_tpu.sql.parser import SqlError

        with pytest.raises(SqlError, match="1-based"):
            sctx.sql("select substr(name, 0, 2) from p")


class TestGroupByExpr:
    def test_modulo_buckets(self, tctx):
        df = tctx.sql_df(
            "select v % 20 as b, count(*) as n, sum(v) as s from t "
            "group by v % 20 order by b"
        )
        assert df["b"].tolist() == [0, 10]
        assert df["n"].tolist() == [2, 3]
        assert df["s"].tolist() == [60, 90]

    def test_case_key(self, tctx):
        df = tctx.sql_df(
            "select case when v < 25 then 0 else 1 end as b, "
            "count(*) as n from t group by "
            "case when v < 25 then 0 else 1 end order by b"
        )
        assert df["n"].tolist() == [2, 3]

    def test_having_and_order_on_expr(self, tctx):
        df = tctx.sql_df(
            "select v % 20 as b, sum(v) as s from t group by v % 20 "
            "having sum(v) > 70 order by v % 20"
        )
        assert df["b"].tolist() == [10]

    def test_mixed_col_and_expr_keys(self, tctx):
        df = tctx.sql_df(
            "select k, v % 20 as b, count(*) as n from t "
            "group by k, v % 20 order by k, b"
        )
        assert df["n"].sum() == 5

    def test_nullable_expr_key(self, tctx):
        # group by an expression over a nullable column: NULL is its own
        # group (the expression's flags ride as secondary exec keys)
        df = tctx.sql_df(
            "select r.w % 10 as b, count(*) as n from t "
            "left join r on t.k = r.k group by r.w % 10 "
            "order by b nulls last"
        )
        # rows: k=1,v=10 ×(5,15); k=1,v=20 ×(5,15); k=2 ×100 ×2; k=3 NULL
        assert df["b"].isna().tolist()[-1] is True or \
            df["b"].isna().any()
        assert int(df["n"].sum()) == 7

    def test_distributed_parity(self, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        t = pd.DataFrame({
            "k": rng.integers(0, 50, 400).astype(np.int32),
            "v": rng.integers(0, 1000, 400).astype(np.int32),
        })
        cs = Context()
        cm = Context(mesh=make_engine_mesh(8))
        cs.create_table("t", t)
        cm.create_table("t", t)
        for q in [
            "select v % 7 as b, count(*) as n, sum(v) as s from t "
            "group by v % 7 order by b",
            "select k / 10 as d, max(v) as mx from t group by k / 10 "
            "order by d",
        ]:
            pd.testing.assert_frame_equal(cs.sql_df(q), cm.sql_df(q))


class TestSetOps:
    """INTERSECT / EXCEPT (distinct; SQLite-style left-associative equal
    precedence) with NULLs comparing EQUAL — round-5 extension over the
    UNION machinery."""

    @pytest.fixture
    def soctx(self):
        c = Context()
        c.create_table("a", pd.DataFrame({
            "x": np.array([1, 2, 2, 3, 4], np.int32)}))
        c.create_table("b", pd.DataFrame({
            "y": np.array([2, 3, 3, 5], np.int32)}))
        return c

    def test_intersect(self, soctx):
        df = soctx.sql_df("select x from a intersect select y from b "
                          "order by x")
        assert df["x"].tolist() == [2, 3]

    def test_except(self, soctx):
        df = soctx.sql_df("select x from a except select y from b "
                          "order by x")
        assert df["x"].tolist() == [1, 4]
        df = soctx.sql_df("select y from b except select x from a")
        assert df["y"].tolist() == [5]

    def test_chained_left_assoc(self, soctx):
        df = soctx.sql_df(
            "select x from a union select y from b "
            "except select x from a where x > 3 order by x"
        )
        assert df["x"].tolist() == [1, 2, 3, 5]

    def test_nulls_compare_equal(self, soctx):
        soctx.create_table("f", pd.DataFrame({
            "k": np.array([1, 2], np.int32)}))
        soctx.create_table("d", pd.DataFrame({
            "j": np.array([1], np.int32),
            "m": np.array([7], np.int32)}))
        df = soctx.sql_df(
            "select d.m from f left join d on f.k = d.j "
            "intersect select d.m from f left join d on f.k = d.j "
            "order by m"
        )
        assert len(df) == 2 and int(df["m"].isna().sum()) == 1
        df2 = soctx.sql_df(
            "select d.m from f left join d on f.k = d.j "
            "except select d.m + 1 - 1 from f left join d on f.k = d.j"
        )
        # both arms contain {7, NULL}; NULLs equal → empty difference
        assert len(df2) == 0

    def test_all_rejected(self, soctx):
        from harkdb_tpu.sql.parser import SqlError

        with pytest.raises(SqlError, match="INTERSECT ALL"):
            soctx.sql("select x from a intersect all select y from b")

    def test_distributed_arms_gather_tail(self, soctx, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        t = pd.DataFrame({"x": rng.integers(0, 40, 300).astype(np.int32)})
        u = pd.DataFrame({"y": rng.integers(20, 60, 200).astype(np.int32)})
        cs = Context()
        cm = Context(mesh=make_engine_mesh(8))
        for c in (cs, cm):
            c.create_table("t", t)
            c.create_table("u", u)
        for q in [
            "select x from t intersect select y from u order by x",
            "select x from t except select y from u order by x desc",
        ]:
            pd.testing.assert_frame_equal(cs.sql_df(q), cm.sql_df(q))


class TestSimpleCase:
    def test_desugars_to_equality(self, tctx):
        df = tctx.sql_df(
            "select k, case k when 1 then 10 when 2 then 20 else -1 end "
            "as c from t group by k order by k"
        )
        assert df["c"].tolist() == [10, 20, -1]

    def test_operand_expression(self, tctx):
        df = tctx.sql_df(
            "select v, case v % 20 when 0 then 1 else 0 end as c "
            "from t order by v"
        )
        assert df["c"].tolist() == [0, 1, 0, 1, 0]


class TestVarianceFamily:
    """STDDEV/VARIANCE (sample) and STDDEV_POP/VAR_POP: float sum +
    sum-of-squares + count with a post-compute; sample variants NULL
    below 2 rows, population below 1 (plan/aggregates.py)."""

    @pytest.fixture
    def vctx(self, rng):
        df = pd.DataFrame({
            "k": rng.integers(0, 6, 200).astype(np.int32),
            "v": rng.integers(0, 100, 200).astype(np.int32),
        })
        c = Context()
        c.create_table("t", df)
        return c, df

    def test_vs_pandas(self, vctx):
        c, df = vctx
        got = c.sql_df(
            "select k, stddev(v) as sd, variance(v) as va, "
            "stddev_pop(v) as sp, var_pop(v) as vp from t "
            "group by k order by k"
        )
        g = df.groupby("k")["v"]
        np.testing.assert_allclose(got["sd"], g.std(ddof=1), rtol=2e-3)
        np.testing.assert_allclose(got["va"], g.var(ddof=1), rtol=2e-3)
        np.testing.assert_allclose(got["sp"], g.std(ddof=0), rtol=2e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(got["vp"], g.var(ddof=0), rtol=2e-3,
                                   atol=1e-4)

    def test_single_row_group_sample_null(self):
        c = Context()
        c.create_table("u", pd.DataFrame({"k": [1], "v": [7]}))
        one = c.sql_df(
            "select k, stddev(v) as sd, var_pop(v) as vp from u group by k"
        )
        assert one["sd"].isna().tolist() == [True]
        assert one["vp"].tolist() == [0.0]

    def test_nullable_arg_skips(self):
        c = Context()
        c.create_table("f", pd.DataFrame({"k": np.int32([1, 2, 3])}))
        c.create_table("d", pd.DataFrame({
            "j": np.int32([1, 1, 2]), "m": np.int32([10, 20, 5])}))
        got = c.sql_df(
            "select f.k, stddev(d.m) as sd from f "
            "left join d on f.k = d.j group by f.k order by f.k"
        )
        # k=2 has ONE match (sample needs 2), k=3 none
        assert got["sd"].isna().tolist() == [False, True, True]
        np.testing.assert_allclose(got["sd"][0], np.std([10, 20], ddof=1),
                                   rtol=1e-5)

    def test_having_and_order(self, vctx):
        c, df = vctx
        got = c.sql_df(
            "select k, variance(v) as va from t group by k "
            "having variance(v) > 0 order by va desc"
        )
        assert got["va"].is_monotonic_decreasing

    def test_window_form_rejected(self, vctx):
        from harkdb_tpu.sql.parser import SqlError

        c, _df = vctx
        with pytest.raises(SqlError, match="window"):
            c.sql("select stddev(v) over (order by v) from t")

    def test_distributed_parity(self, vctx):
        from harkdb_tpu.parallel import make_engine_mesh

        c, df = vctx
        cm = Context(mesh=make_engine_mesh(8))
        cm.create_table("t", df)
        q = ("select k, stddev(v) as sd, var_pop(v) as vp from t "
             "group by k having stddev(v) > 0 order by k")
        pd.testing.assert_frame_equal(c.sql_df(q), cm.sql_df(q))


class TestNullInSubquerySets:
    """SQL semantics for NULLs in IN-subquery value sets: IN drops them,
    NOT IN with any NULL in the set matches nothing, a NULL scalar
    subquery raises a clear error (round 5)."""

    @pytest.fixture
    def nctx2(self):
        c = Context()
        c.create_table("f", pd.DataFrame({
            "k": np.int32([1, 2, 3]), "v": np.int32([10, 20, 30])}))
        c.create_table("d", pd.DataFrame({
            "j": np.int32([1, 2]), "m": np.int32([10, 99])}))
        return c

    def test_in_drops_nulls(self, nctx2):
        sub = "(select d.m from f left join d on f.k = d.j)"
        got = nctx2.sql_df(f"select v from f where v in {sub}")
        assert got["v"].tolist() == [10]

    def test_not_in_with_null_matches_nothing(self, nctx2):
        sub = "(select d.m from f left join d on f.k = d.j)"
        got = nctx2.sql_df(f"select v from f where v not in {sub}")
        assert len(got) == 0
        # without the NULL row the same NOT IN works normally
        sub2 = ("(select d.m from f join d on f.k = d.j)")
        got2 = nctx2.sql_df(f"select v from f where v not in {sub2}")
        assert got2["v"].tolist() == [20, 30]

    def test_null_scalar_raises(self, nctx2):
        with pytest.raises(PlanError, match="NULL"):
            nctx2.sql(
                "select v from f where v > (select d.m from f f2 "
                "left join d on f2.k = d.j where f2.k = 3)"
            )


class TestMedianQuantile:
    """MEDIAN(x) / QUANTILE(x, q) — PERCENTILE_CONT linear interpolation
    via an aux sort with the value as a trailing key: the two straddling
    positions contribute weighted values to a per-group segmented sum
    (ops/groupby.py). Distributed: raw-row shuffle (quantiles cannot
    re-aggregate from partials)."""

    @pytest.fixture
    def qctx(self, rng):
        df = pd.DataFrame({
            "k": rng.integers(0, 8, 300).astype(np.int32),
            "v": rng.integers(0, 1000, 300).astype(np.int32),
        })
        c = Context()
        c.create_table("t", df)
        return c, df

    def test_vs_pandas(self, qctx):
        c, df = qctx
        got = c.sql_df(
            "select k, median(v) as md, quantile(v, 0.25) as q1, "
            "quantile(v, 0.9) as q9 from t group by k order by k"
        )
        g = df.groupby("k")["v"]
        np.testing.assert_allclose(got["md"], g.median(), rtol=1e-5)
        np.testing.assert_allclose(got["q1"], g.quantile(0.25), rtol=1e-5)
        np.testing.assert_allclose(got["q9"], g.quantile(0.9), rtol=1e-5)

    def test_extremes_and_ungrouped(self, qctx):
        c, df = qctx
        got = c.sql_df(
            "select quantile(v, 0) as lo, quantile(v, 1) as hi, "
            "median(v) as md from t"
        )
        assert got["lo"].tolist() == [float(df.v.min())]
        assert got["hi"].tolist() == [float(df.v.max())]
        np.testing.assert_allclose(got["md"], [df.v.median()], rtol=1e-6)

    def test_nullable_skips(self):
        c = Context()
        c.create_table("f", pd.DataFrame({"k": np.int32([1, 2, 3])}))
        c.create_table("d", pd.DataFrame({
            "j": np.int32([1, 1, 1, 2]),
            "m": np.int32([10, 20, 30, 7])}))
        got = c.sql_df(
            "select f.k, median(d.m) as md from f "
            "left join d on f.k = d.j group by f.k order by f.k"
        )
        np.testing.assert_array_equal(
            got["md"].to_numpy(), [20.0, 7.0, np.nan]
        )

    def test_validation(self, qctx):
        from harkdb_tpu.sql.parser import SqlError

        c, _df = qctx
        with pytest.raises(SqlError, match="fraction"):
            c.sql("select quantile(v, 2) from t")
        with pytest.raises(SqlError, match="window"):
            c.sql("select median(v) over (order by v) from t")

    def test_distributed_parity(self, qctx):
        from harkdb_tpu.parallel import make_engine_mesh

        c, df = qctx
        cm = Context(mesh=make_engine_mesh(8))
        cm.create_table("t", df)
        q = ("select k, median(v) as md, quantile(v, 0.75) as q3, "
             "sum(v) as s from t group by k order by k")
        pd.testing.assert_frame_equal(c.sql_df(q), cm.sql_df(q))


class TestOnResidualsAndIlike:
    def test_inner_on_residual(self, rng):
        a = pd.DataFrame({
            "u": rng.integers(0, 10, 200).astype(np.int32),
            "x": rng.integers(0, 50, 200).astype(np.int32)})
        b = pd.DataFrame({
            "p": rng.integers(0, 10, 100).astype(np.int32),
            "y": rng.integers(0, 50, 100).astype(np.int32)})
        c = Context()
        c.create_table("a", a)
        c.create_table("b", b)
        got = c.sql_df(
            "select a.u, a.x, b.y from a join b "
            "on a.u = b.p and a.x < b.y and b.y - a.x != 7 "
            "order by a.u, a.x, b.y"
        )
        m = a.merge(b, left_on="u", right_on="p")
        m = m[(m.x < m.y) & (m.y - m.x != 7)].sort_values(["u", "x", "y"])
        assert got["x"].tolist() == m["x"].tolist()
        assert got["y"].tolist() == m["y"].tolist()

    def test_outer_residual_rejected(self, tctx):
        with pytest.raises(PlanError, match="INNER"):
            tctx.sql("select * from t left join r on t.k = r.k "
                     "and t.v < r.w")

    def test_ilike(self):
        c = Context()
        c.create_table("p", pd.DataFrame({
            "name": ["Alice", "ALINE", "bob", "alf"]}))
        got = c.sql_df("select name from p where name ilike 'al%'")
        assert got["name"].tolist() == ["Alice", "ALINE", "alf"]
        got = c.sql_df("select name from p where name not ilike '%F'")
        assert got["name"].tolist() == ["Alice", "ALINE", "bob"]


class TestViews:
    """Views = persistent CTEs (Context.create_view / drop_view):
    substituted at parse time via the CTE machinery, planned as derived
    tables with one materialization per query."""

    @pytest.fixture
    def wctx(self, tctx):
        tctx.create_view("agg", "select k, sum(v) as s from t group by k")
        tctx.create_view("big", "select k, s from agg where s > 25")
        return tctx

    def test_basic_and_chained(self, wctx):
        df = wctx.sql_df("select * from big order by k")
        assert df["k"].tolist() == [1, 2, 3]
        assert df["s"].tolist() == [30, 70, 50]

    def test_join_against_view(self, wctx):
        df = wctx.sql_df(
            "select t.k, agg.s from t join agg on t.k = agg.k "
            "order by t.k, t.v"
        )
        assert df["s"].tolist() == [30, 30, 70, 70, 50]

    def test_cte_shadows_view(self, wctx):
        df = wctx.sql_df(
            "with agg as (select k from t where k = 3) select * from agg"
        )
        assert df.columns.tolist() == ["k"] and df["k"].tolist() == [3]

    def test_drop_and_errors(self, wctx):
        wctx.drop_view("big")
        with pytest.raises(PlanError, match="not in tables"):
            wctx.sql("select * from big")
        with pytest.raises(ValueError, match="already a table"):
            wctx.create_view("t", "select k from t")
        # view bodies syntax-check at creation
        from harkdb_tpu.sql.parser import SqlError

        with pytest.raises(SqlError):
            wctx.create_view("bad", "select from where")

    def test_plan_cache_invalidation(self, wctx):
        q = "select count(*) as n from agg"
        assert wctx.sql_df(q)["n"].tolist() == [3]
        wctx.drop_view("agg")
        wctx.create_view("agg",
                         "select k from t where k = 1 group by k")
        assert wctx.sql_df(q)["n"].tolist() == [1]


class TestTopKLimit:
    """ORDER BY <single key> LIMIT k (k + offset ≤ 1024) takes a
    `lax.top_k` selection instead of the full payload sort — bit-identical
    to the stable sort (top_k breaks ties by lowest index)."""

    @pytest.fixture
    def kctx(self, rng):
        df = pd.DataFrame({
            "k": rng.integers(0, 500, 5000).astype(np.int32),
            "v": rng.integers(-500, 500, 5000).astype(np.int32),
            "f": rng.normal(0, 10, 5000).astype(np.float32),
        })
        c = Context()
        c.create_table("t", df)
        return c, df

    def test_matches_stable_sort(self, kctx):
        c, df = kctx
        for q, col, asc in [
            ("select k, v from t order by v limit 7", "v", True),
            ("select k, v from t order by v desc limit 7", "v", False),
            ("select k, f from t order by f limit 6", "f", True),
        ]:
            got = c.sql_df(q)
            w = df.sort_values(col, ascending=asc, kind="stable").head(
                len(got))
            assert got[col].tolist() == w[col].tolist(), q
            assert got["k"].tolist() == w["k"].tolist(), q

    def test_offset_and_where(self, kctx):
        c, df = kctx
        got = c.sql_df(
            "select k, v from t where v > 0 order by v desc "
            "limit 5 offset 2"
        )
        w = df[df.v > 0].sort_values("v", ascending=False,
                                     kind="stable").iloc[2:7]
        assert got["v"].tolist() == w["v"].tolist()
        assert got["k"].tolist() == w["k"].tolist()

    def test_same_as_sort_path(self, kctx):
        c, _df = kctx
        a = c.sql_df("select k, v from t order by v limit 800")
        b = c.sql_df("select k, v from t order by v limit 2000").head(
            800).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_nullable_key(self):
        c = Context()
        c.create_table("f", pd.DataFrame({"k": np.int32([1, 2, 3, 4])}))
        c.create_table("d", pd.DataFrame({
            "j": np.int32([1, 2]), "m": np.int32([9, 5])}))
        got = c.sql_df(
            "select f.k, d.m from f left join d on f.k = d.j "
            "order by d.m limit 3"
        )
        assert got["k"].tolist() == [2, 1, 3]       # NULLS LAST default
        assert got["m"].isna().tolist() == [False, False, True]
        got2 = c.sql_df(
            "select f.k, d.m from f left join d on f.k = d.j "
            "order by d.m desc nulls last limit 3"
        )
        assert got2["k"].tolist() == [1, 2, 3]

    def test_distributed_parity(self, kctx):
        from harkdb_tpu.parallel import make_engine_mesh

        c, df = kctx
        cm = Context(mesh=make_engine_mesh(8))
        cm.create_table("t", df)
        for q in [
            "select k, v from t order by v limit 9",
            "select k, sum(v) as s from t group by k "
            "order by s desc limit 5",
        ]:
            pd.testing.assert_frame_equal(c.sql_df(q), cm.sql_df(q))


class TestSetOpBodies:
    """Set operations compose anywhere a SELECT does (round 5): views,
    CTEs, derived tables and IN-subqueries may have UNION/INTERSECT/
    EXCEPT bodies (planned as UnionPlans behind a DerivedSource)."""

    @pytest.fixture
    def bctx(self):
        c = Context()
        c.create_table("a", pd.DataFrame({"x": np.int32([1, 2, 2, 3])}))
        c.create_table("b", pd.DataFrame({"y": np.int32([2, 3, 5])}))
        return c

    def test_derived_union(self, bctx):
        df = bctx.sql_df(
            "select d.x, count(*) as n from "
            "(select x from a union select y from b) d "
            "group by d.x order by d.x"
        )
        assert df["x"].tolist() == [1, 2, 3, 5]
        assert df["n"].tolist() == [1, 1, 1, 1]

    def test_cte_intersect(self, bctx):
        df = bctx.sql_df(
            "with u as (select x from a intersect select y from b) "
            "select * from u order by x"
        )
        assert df["x"].tolist() == [2, 3]

    def test_view_union_all(self, bctx):
        bctx.create_view("uni", "select x from a union all "
                                "select y from b")
        assert bctx.sql_df("select count(*) as n from uni")[
            "n"].tolist() == [7]

    def test_in_subquery_except(self, bctx):
        df = bctx.sql_df(
            "select x from a where x in "
            "(select x from a except select y from b)"
        )
        assert df["x"].tolist() == [1]

    def test_distributed_parity(self, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        a = pd.DataFrame({"x": rng.integers(0, 50, 400).astype(np.int32)})
        b = pd.DataFrame({"y": rng.integers(25, 75, 300).astype(np.int32)})
        cs = Context()
        cm = Context(mesh=make_engine_mesh(8))
        for c in (cs, cm):
            c.create_table("a", a)
            c.create_table("b", b)
        q = ("select d.x, count(*) as n from "
             "(select x from a union all select y from b) d "
             "group by d.x order by d.x")
        pd.testing.assert_frame_equal(cs.sql_df(q), cm.sql_df(q))
