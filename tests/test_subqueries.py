"""Scalar subqueries and IN (SELECT ...) — engine extensions (the reference
grammar is single-SELECT, ``parse.py:27-33``).

Semantics (``plan/planner.py``): subqueries are self-contained
(non-correlated), plan eagerly (errors at plan time), evaluate once at first
execution, and substitute as literals — valid because tables are immutable
while a plan is cached (Context invalidates on create/drop_table). String
results decode and re-lower against the outer column's dictionary.
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context
from harkdb_tpu.plan.planner import PlanError


@pytest.fixture
def qctx(rng):
    c = Context()
    df = pd.DataFrame({
        "k": rng.integers(0, 6, 300).astype(np.int32),
        "v": rng.integers(-50, 50, 300).astype(np.int32),
    })
    c.create_table("t", df)
    c.create_table("hot", pd.DataFrame({"key": np.array([1, 3, 4], np.int32)}))
    return c, df


class TestScalarSubquery:
    def test_in_where(self, qctx):
        c, df = qctx
        got = c.sql_df("select k, v from t where v > (select avg(v) from t)")
        want = df[df.v > df.v.mean()]
        assert len(got) == len(want)
        assert set(got["v"]) == set(want.v)

    def test_in_select_list_arithmetic(self, qctx):
        c, df = qctx
        got = c.sql_df("select v - (select min(v) from t) as adj from t")
        np.testing.assert_array_equal(got["adj"], df.v - df.v.min())

    def test_in_having(self, qctx):
        c, df = qctx
        got = c.sql_df(
            "select k, sum(v) as s from t group by k "
            "having sum(v) > (select avg(v) from t) order by k"
        )
        wg = df.groupby("k")["v"].sum()
        assert got["k"].tolist() == wg[wg > df.v.mean()].index.tolist()

    def test_string_scalar(self, rng):
        c = Context()
        sdf = pd.DataFrame({
            "city": rng.choice(["oslo", "bergen", "alta"], 100),
            "v": rng.integers(0, 100, 100).astype(np.int32),
        })
        c.create_table("s", sdf)
        c.create_table("names", pd.DataFrame({"n": ["bergen", "alta"]}))
        got = c.sql_df("select v from s where city = (select max(n) from names)")
        assert len(got) == (sdf.city == "bergen").sum()

    def test_rerun_uses_cached_plan(self, qctx):
        c, df = qctx
        q = "select count(*) as n from t where v > (select avg(v) from t)"
        a = int(c.sql_df(q)["n"][0])
        b = int(c.sql_df(q)["n"][0])            # plan-cache hit, same result
        assert a == b
        assert c.last_metrics.cached_plan

    def test_table_change_invalidates(self, qctx):
        c, df = qctx
        q = "select count(*) as n from t where k in (select key from hot)"
        before = int(c.sql_df(q)["n"][0])
        c.create_table("hot", pd.DataFrame({"key": np.array([0], np.int32)}))
        after = int(c.sql_df(q)["n"][0])
        assert before == (df.k.isin([1, 3, 4])).sum()
        assert after == (df.k == 0).sum()


class TestInSubquery:
    def test_in(self, qctx):
        c, df = qctx
        got = c.sql_df("select k, v from t where k in (select key from hot)")
        want = df[df.k.isin([1, 3, 4])]
        assert len(got) == len(want)

    def test_not_in(self, qctx):
        c, df = qctx
        got = c.sql_df("select k from t where k not in (select key from hot)")
        assert len(got) == (~df.k.isin([1, 3, 4])).sum()

    def test_empty_set_is_false(self, qctx):
        c, df = qctx
        got = c.sql_df(
            "select k from t where k in (select key from hot where key > 99)"
        )
        assert len(got) == 0
        got = c.sql_df(
            "select k from t "
            "where k not in (select key from hot where key > 99)"
        )
        assert len(got) == len(df)

    def test_string_in(self, rng):
        c = Context()
        sdf = pd.DataFrame({
            "city": rng.choice(["oslo", "bergen", "alta", "narvik"], 200),
            "v": rng.integers(0, 100, 200).astype(np.int32),
        })
        c.create_table("s", sdf)
        c.create_table("coast", pd.DataFrame({"n": ["bergen", "narvik", "x"]}))
        got = c.sql_df("select city from s where city in (select n from coast)")
        assert len(got) == sdf.city.isin(["bergen", "narvik"]).sum()

    def test_in_subquery_with_filter_and_group(self, qctx):
        c, df = qctx
        got = c.sql_df(
            "select k, count(*) as n from t "
            "where k in (select key from hot where key < 4) "
            "group by k order by k"
        )
        want = df[df.k.isin([1, 3])].groupby("k").size()
        assert got["k"].tolist() == list(want.index)
        assert got["n"].tolist() == list(want.values)


class TestSubqueryErrors:
    def test_multi_column_rejected(self, qctx):
        c, _df = qctx
        with pytest.raises(PlanError):
            c.sql_df("select k from t where v > (select k, v from t)")

    def test_multi_row_scalar_rejected(self, qctx):
        c, _df = qctx
        with pytest.raises(PlanError):
            c.sql_df("select k from t where v > (select v from t)")

    def test_unknown_inner_table(self, qctx):
        c, _df = qctx
        with pytest.raises(Exception, match="is not in tables"):
            c.sql_df("select k from t where v > (select x from nope)")

    def test_correlated_named_clearly_qualified(self, qctx):
        # A correlated reference used to surface as "t is not in tables"
        # (the sub-plan resolving against its own bindings) — misleading.
        c, _df = qctx
        with pytest.raises(PlanError, match="correlated subqueries"):
            c.sql_df(
                "select k from t where v > "
                "(select key from hot where hot.key = t.k)"
            )

    def test_correlated_named_clearly_bare(self, qctx):
        # Bare outer-column reference: "v" resolves in the outer scope but
        # not in the subquery's — also a correlated reference.
        c, _df = qctx
        with pytest.raises(PlanError, match="correlated subqueries"):
            c.sql_df(
                "select k from t where v > (select key from hot "
                "where key = v)"
            )

    def test_string_numeric_mismatch(self, rng):
        c = Context()
        c.create_table("s", pd.DataFrame({"city": ["a", "b"], "v": [1, 2]}))
        with pytest.raises(PlanError):
            c.sql_df("select v from s where v = (select max(city) from s)")


class TestSubqueryDistributed:
    def test_matches_single(self, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        df = pd.DataFrame({
            "k": rng.integers(0, 6, 300).astype(np.int32),
            "v": rng.integers(-50, 50, 300).astype(np.int32),
        })
        hot = pd.DataFrame({"key": np.array([1, 3], np.int32)})
        q = ("select k, sum(v) as s from t "
             "where k in (select key from hot) "
             "and v > (select min(v) from t) group by k order by k")
        cs = Context()
        cs.create_table("t", df)
        cs.create_table("hot", hot)
        cm = Context(mesh=make_engine_mesh(8))
        cm.create_table("t", df)
        cm.create_table("hot", hot)
        pd.testing.assert_frame_equal(
            cm.sql_df(q), cs.sql_df(q), check_dtype=False
        )


class TestSubqueryOrderLimit:
    def test_scalar_via_order_limit(self, qctx):
        c, df = qctx
        got = c.sql_df(
            "select v - (select v from t order by v limit 1) as d from t"
        )
        np.testing.assert_array_equal(got["d"], df.v - df.v.min())

    def test_in_top_k(self, qctx):
        c, df = qctx
        got = c.sql_df(
            "select k from t "
            "where k in (select key from hot order by key desc limit 2)"
        )
        assert len(got) == df.k.isin([3, 4]).sum()

    def test_offset_in_subquery(self, qctx):
        c, df = qctx
        got = c.sql_df(
            "select count(*) as n from t where k = "
            "(select key from hot order by key limit 1 offset 1)"
        )
        # second-smallest hot key = 3
        assert int(got["n"][0]) == int((df.k == 3).sum())


class TestSubqueryReviewRegressions:
    """Round-3 review findings: recursion depth, window-spec subqueries,
    deferred string-literal comparisons."""

    def test_large_in_subquery_no_recursion_error(self, rng):
        # ~1000 distinct values must not blow the recursion limit — the
        # OR-chain is built as a balanced tree.
        c = Context()
        n = 1000
        c.create_table("t", {"k": np.arange(n, dtype=np.int32),
                             "v": np.ones(n, dtype=np.int32)})
        got = c.sql_df("select count(*) as n from t "
                       "where k in (select k from t)")
        assert int(got["n"][0]) == n

    def test_subquery_inside_window_arg(self, qctx):
        c, df = qctx
        got = c.sql_df(
            "select k, sum(v - (select min(v) from t)) over "
            "(partition by k) as s from t"
        )
        base = df.v - df.v.min()
        w = df.assign(b=base).groupby("k")["b"].transform("sum")
        assert got["s"].tolist() == w.tolist()

    def test_subquery_inside_window_order(self, qctx):
        c, df = qctx
        got = c.sql_df(
            "select row_number() over "
            "(order by v + (select min(v) from t)) as rn from t"
        )
        assert sorted(got["rn"]) == list(range(1, len(df) + 1))

    def test_window_output_in_in_subquery(self, qctx):
        c, df = qctx
        got = c.sql_df(
            "select k, rank() over (order by v) in (select key from hot) "
            "as b from t"
        )
        assert len(got) == len(df)
        assert set(got["b"]) <= {0, 1, True, False}

    def test_string_literal_vs_string_subquery(self, rng):
        c = Context()
        c.create_table("t", {"name": ["ann", "bea"], "v": [1, 2]})
        got = c.sql_df(
            "select count(*) as n from t where 'bea' = (select max(name) from t)"
        )
        assert int(got["n"][0]) == 2
        got = c.sql_df(
            "select count(*) as n from t where 'zzz' = (select max(name) from t)"
        )
        assert len(got) == 0 or int(got["n"][0]) == 0
