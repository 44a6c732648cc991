"""SQL end-to-end tests: parser, planner errors (reference parity), queries.

Parity queries replayed from the reference (SURVEY §4): ``test.py:6-7`` and
``README.md:38``, with exact row-level expected outputs derived from the
reference's observable semantics (§3.3 projection row order; §3.4 groupby
ascending-key order).
"""

import os

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context, FutharkContext
from harkdb_tpu.sql.parser import parse_sql, SqlError
from harkdb_tpu.sql.ast_nodes import Agg, BinOp, Col, Lit, Star

DATA_CSV = os.path.join(os.path.dirname(__file__), "data", "data.csv")


@pytest.fixture
def fc():
    c = Context()
    c.create_table("game_1", DATA_CSV)
    return c


@pytest.fixture
def ctx_rand(rng):
    c = Context()
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 10, n).astype(np.int32),
        "v": rng.integers(-100, 100, n).astype(np.int32),
        "w": rng.integers(1, 50, n).astype(np.int32),
    })
    c.create_table("t", df)
    return c, df


class TestParser:
    def test_projection(self):
        s = parse_sql("select col1, col3 from game_1")
        assert s.table.name == "game_1"
        assert [i.expr for i in s.items] == [Col("col1"), Col("col3")]

    def test_star(self):
        s = parse_sql("SELECT * FROM t")
        assert isinstance(s.items[0].expr, Star)

    def test_groupby_agg(self):
        s = parse_sql("select col1, max(col3) from t group by col1")
        assert s.group_by == (Col("col1"),)
        assert s.items[1].expr == Agg("max", Col("col3"))

    def test_where_expr(self):
        s = parse_sql("select a from t where a + 1 > 2 * b and not a = 3")
        assert isinstance(s.where, BinOp) and s.where.op == "and"

    def test_order_limit(self):
        s = parse_sql("select a from t order by a desc, b limit 10")
        assert s.order_by[0].descending is True
        assert s.order_by[1].descending is False
        assert s.limit == 10

    def test_sort_by_synonym(self):
        s = parse_sql("select a from t sort by a")
        assert len(s.order_by) == 1

    def test_join(self):
        s = parse_sql("select * from a join b on a.x = b.y")
        j = s.joins[0]
        assert j.table.name == "b"
        assert j.conds == ((Col("x", table="a"), Col("y", table="b")),)

    def test_join_multi_cond(self):
        s = parse_sql(
            "select * from a join b on a.x = b.y and a.z = b.w"
        )
        assert s.joins[0].conds == (
            (Col("x", table="a"), Col("y", table="b")),
            (Col("z", table="a"), Col("w", table="b")),
        )

    def test_join_kinds(self):
        assert parse_sql(
            "select * from a right outer join b on a.x = b.y"
        ).joins[0].kind == "right"
        assert parse_sql(
            "select * from a full outer join b on a.x = b.y"
        ).joins[0].kind == "full"
        s = parse_sql("select * from a cross join b")
        assert s.joins[0].kind == "cross" and s.joins[0].conds == ()

    def test_alias(self):
        s = parse_sql("select a as z from t1 t")
        assert s.items[0].alias == "z"
        assert s.table.alias == "t"

    def test_count_star(self):
        s = parse_sql("select count(*) from t")
        assert s.items[0].expr == Agg("count", Star())

    def test_having(self):
        s = parse_sql("select k, sum(v) from t group by k having sum(v) > 5")
        assert s.having == BinOp(">", Agg("sum", Col("v")), Lit(5))

    def test_syntax_errors(self):
        for bad in [
            "selec a from t",
            "select a from",
            "select from t",
            "select a from t where",
            "select a from t limit x",
            "select sum(*) from t",
            "select a from t garbage trailing ,",
        ]:
            with pytest.raises(SqlError):
                parse_sql(bad)


class TestReferenceParity:
    """The reference's own query set with exact expected rows."""

    def test_projection_readme(self, fc):
        # README.md:38 — select col1, col3 from game_1
        out = fc.sql("select col1, col3 from game_1")
        np.testing.assert_array_equal(
            out, [[6, 6], [0, 0], [0, 0], [0, 0], [0, 0], [6, 6], [1, 3]]
        )

    def test_groupby_testpy(self, fc):
        # test.py:7 — select col1, max(col3) from game_1 group by col1
        out = fc.sql("select col1, max(col3) from game_1 group by col1")
        np.testing.assert_array_equal(out, [[0, 0], [1, 3], [6, 6]])

    def test_duplicate_columns(self, fc):
        # §3.3: duplicate column selection allowed, order preserved
        out = fc.sql("select col3, col3, col1 from game_1 limit 1")
        np.testing.assert_array_equal(out, [[6, 6, 6]])

    def test_unknown_table_message(self, fc):
        with pytest.raises(Exception, match="nope is not in tables"):
            fc.sql("select col1 from nope")

    def test_unknown_column_message(self, fc):
        with pytest.raises(
            Exception, match="colX is not in the schema of table game_1"
        ):
            fc.sql("select colX from game_1")

    def test_grouped_nonkey_column_message(self, fc):
        with pytest.raises(
            Exception,
            match="col2 is not an aggregation function or the columns thats "
                  "grouped on",
        ):
            fc.sql("select col2 from game_1 group by col1")

    def test_agg_opcode_set(self, fc):
        # parse.py:81 — {prod, sum, max, min}
        out = fc.sql(
            "select col1, prod(col2), sum(col3), max(col4), min(col5) "
            "from game_1 group by col1"
        )
        df = pd.read_csv(DATA_CSV, skipinitialspace=True)
        expect = df.groupby("col1").agg(
            p=("col2", "prod"), s=("col3", "sum"),
            mx=("col4", "max"), mn=("col5", "min"),
        ).sort_index().reset_index()
        np.testing.assert_array_equal(out, expect.to_numpy())

    def test_futharkcontext_alias(self):
        fc = FutharkContext()
        fc.create_table("game_1", DATA_CSV)
        out = fc.sql("select col1, max(col3) from game_1 group by col1")
        np.testing.assert_array_equal(out, [[0, 0], [1, 3], [6, 6]])


class TestWhere:
    def test_filter_rows(self, fc):
        out = fc.sql("select col1, col3 from game_1 where col1 > 0")
        np.testing.assert_array_equal(out, [[6, 6], [6, 6], [1, 3]])

    def test_filter_order_preserved(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select v from t where k = 3 and v > 0")
        expect = df[(df.k == 3) & (df.v > 0)].v.to_numpy()[:, None]
        np.testing.assert_array_equal(out, expect)

    def test_compound_predicate(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select v from t where v % 2 = 0 or not w < 25")
        expect = df[(df.v % 2 == 0) | ~(df.w < 25)].v.to_numpy()[:, None]
        # C-style % differs from python % for negatives: even test stays valid
        # since |v%2|==0 iff v even under both conventions.
        np.testing.assert_array_equal(out, expect)

    def test_none_survive(self, fc):
        out = fc.sql("select col1 from game_1 where col1 > 100")
        assert out.shape == (0, 1)


class TestGroupByE2E:
    def test_vs_pandas(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql(
            "select k, sum(v), min(v), max(w), count(*) from t group by k"
        )
        e = df.groupby("k").agg(
            s=("v", "sum"), mn=("v", "min"), mx=("w", "max"), c=("v", "count")
        ).sort_index().reset_index()
        np.testing.assert_array_equal(out, e.to_numpy())

    def test_having(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql(
            "select k, sum(v) from t group by k having sum(v) > 0"
        )
        e = df.groupby("k")["v"].sum()
        e = e[e > 0].sort_index().reset_index()
        np.testing.assert_array_equal(out, e.to_numpy())

    def test_having_on_unselected_agg(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select k from t group by k having count(*) > 40")
        e = df.groupby("k").size()
        e = e[e > 40].sort_index()
        np.testing.assert_array_equal(out[:, 0], e.index.to_numpy())

    def test_where_then_group(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select k, sum(w) from t where v > 0 group by k")
        e = df[df.v > 0].groupby("k")["w"].sum().sort_index().reset_index()
        np.testing.assert_array_equal(out, e.to_numpy())

    def test_implicit_single_group(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select max(v), count(*) from t")
        assert out.shape == (1, 2)
        assert out[0, 0] == df.v.max()
        assert out[0, 1] == len(df)

    def test_bare_count_star_loads_capacity(self, ctx_rand):
        # Regression: a query touching no columns (projection pushdown loads
        # nothing) must still see the table's row capacity.
        c, df = ctx_rand
        out = c.sql("select count(*) from t")
        assert out.shape == (1, 1)
        assert out[0, 0] == len(df)

    def test_avg(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select k, avg(w) from t group by k")
        e = df.groupby("k")["w"].mean().sort_index()
        np.testing.assert_allclose(out[:, 1], e.to_numpy(), rtol=1e-6)

    def test_multi_key(self, ctx_rand):
        c, df = ctx_rand
        df2 = df.assign(k2=df.w % 3)
        c.create_table("t2", df2)
        out = c.sql("select k, k2, sum(v) from t2 group by k, k2")
        e = df2.groupby(["k", "k2"])["v"].sum().sort_index().reset_index()
        np.testing.assert_array_equal(out, e.to_numpy())


class TestOrderByLimit:
    def test_order_asc(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select v from t order by v")
        np.testing.assert_array_equal(out[:, 0], np.sort(df.v.to_numpy()))

    def test_order_desc_limit(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select v from t order by v desc limit 5")
        np.testing.assert_array_equal(
            out[:, 0], np.sort(df.v.to_numpy())[::-1][:5]
        )

    def test_order_by_unselected(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select v from t order by w, v limit 20")
        e = df.sort_values(["w", "v"], kind="stable").v.to_numpy()[:20]
        np.testing.assert_array_equal(out[:, 0], e)

    def test_limit_without_order(self, fc):
        out = fc.sql("select col1 from game_1 limit 2")
        np.testing.assert_array_equal(out, [[6], [0]])


class TestJoinE2E:
    def test_basic(self):
        c = Context()
        c.create_table("l", pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]}))
        c.create_table("r", pd.DataFrame({"k": [2, 3, 4], "b": [200, 300, 400]}))
        out = c.sql("select l.k, a, b from l join r on l.k = r.k")
        np.testing.assert_array_equal(out, [[2, 20, 200], [3, 30, 300]])

    def test_vs_pandas_order(self, rng):
        c = Context()
        nl, nr = 300, 200
        ldf = pd.DataFrame({
            "k": rng.integers(0, 30, nl).astype(np.int32),
            "a": np.arange(nl, dtype=np.int32),
        })
        rdf = pd.DataFrame({
            "k": rng.integers(0, 30, nr).astype(np.int32),
            "b": np.arange(nr, dtype=np.int32),
        })
        c.create_table("l", ldf)
        c.create_table("r", rdf)
        out = c.sql("select l.k, a, b from l join r on l.k = r.k")
        # reference ordering: sorted by key; stable left order; right order
        e = []
        for li in np.argsort(ldf.k.to_numpy(), kind="stable"):
            for ri in range(nr):
                if rdf.k[ri] == ldf.k[li]:
                    e.append([ldf.k[li], ldf.a[li], rdf.b[ri]])
        np.testing.assert_array_equal(out, np.array(e, np.int32).reshape(-1, 3))

    def test_join_then_groupby(self, rng):
        c = Context()
        ldf = pd.DataFrame({"k": rng.integers(0, 5, 100).astype(np.int32),
                            "a": rng.integers(0, 10, 100).astype(np.int32)})
        rdf = pd.DataFrame({"j": np.arange(5, dtype=np.int32),
                            "w": rng.integers(1, 4, 5).astype(np.int32)})
        c.create_table("l", ldf)
        c.create_table("r", rdf)
        out = c.sql(
            "select j, sum(a) from l join r on l.k = r.j group by j"
        )
        m = ldf.merge(rdf, left_on="k", right_on="j")
        e = m.groupby("j")["a"].sum().sort_index().reset_index()
        np.testing.assert_array_equal(out, e.to_numpy())

    def test_full_pipeline(self, rng):
        """scan→filter→join→groupby→having→sort: the TPC-H-style mix."""
        c = Context()
        ldf = pd.DataFrame({"k": rng.integers(0, 8, 400).astype(np.int32),
                            "v": rng.integers(-50, 50, 400).astype(np.int32)})
        rdf = pd.DataFrame({"k2": np.arange(8, dtype=np.int32),
                            "m": rng.integers(1, 5, 8).astype(np.int32)})
        c.create_table("l", ldf)
        c.create_table("r", rdf)
        out = c.sql(
            "select k, sum(v), max(m) from l join r on l.k = r.k2 "
            "where v > -10 group by k having count(*) > 10 "
            "order by k desc"
        )
        m = ldf.merge(rdf, left_on="k", right_on="k2")
        m = m[m.v > -10]
        g = m.groupby("k").agg(s=("v", "sum"), mx=("m", "max"), c=("v", "count"))
        g = g[g.c > 10].sort_index(ascending=False).reset_index()
        np.testing.assert_array_equal(out, g[["k", "s", "mx"]].to_numpy())


class TestExpressions:
    def test_arithmetic_projection(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select v + w * 2, v - 1 from t limit 50")
        e = np.stack([(df.v + df.w * 2)[:50], (df.v - 1)[:50]], axis=1)
        np.testing.assert_array_equal(out, e)

    def test_agg_of_expression(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select k, sum(v * w) from t group by k")
        e = df.assign(p=df.v * df.w).groupby("k")["p"].sum().sort_index()
        np.testing.assert_array_equal(out[:, 1], e.to_numpy())

    def test_expression_over_aggs(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select k, max(v) - min(v) from t group by k")
        g = df.groupby("k")["v"]
        e = (g.max() - g.min()).sort_index()
        np.testing.assert_array_equal(out[:, 1], e.to_numpy())


class TestAPI:
    def test_sql_df_headers(self, fc):
        df = fc.sql_df("select col1, max(col3) as m from game_1 group by col1")
        assert list(df.columns) == ["col1", "m"]

    def test_explain(self, fc):
        plan = fc.explain(
            "select col1, max(col3) from game_1 group by col1 order by col1"
        )
        assert "Aggregate" in plan and "Scan" in plan

    def test_plan_cache(self, fc):
        q = "select col1 from game_1"
        fc.sql(q)
        p1 = fc._plan(q)
        p2 = fc._plan(q)
        assert p1 is p2

    def test_drop_table(self, fc):
        fc.drop_table("game_1")
        with pytest.raises(Exception, match="is not in tables"):
            fc.sql("select col1 from game_1")


class TestDistinctInBetween:
    def test_distinct(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select distinct k from t")
        np.testing.assert_array_equal(out[:, 0], np.unique(df.k))

    def test_distinct_pairs(self, ctx_rand):
        c, df = ctx_rand
        df2 = df.assign(k2=df.w % 3)
        c.create_table("t2", df2)
        out = c.sql("select distinct k, k2 from t2")
        e = df2[["k", "k2"]].drop_duplicates().sort_values(
            ["k", "k2"]).to_numpy()
        np.testing.assert_array_equal(out, e)

    def test_distinct_order_desc(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select distinct k from t order by k desc limit 3")
        np.testing.assert_array_equal(out[:, 0], np.unique(df.k)[::-1][:3])

    def test_distinct_order_requires_selected(self, ctx_rand):
        c, _ = ctx_rand
        with pytest.raises(Exception, match="must appear in the select list"):
            c.sql("select distinct k from t order by v")

    def test_in_list(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select v from t where k in (2, 5, 7)")
        e = df[df.k.isin([2, 5, 7])].v.to_numpy()[:, None]
        np.testing.assert_array_equal(out, e)

    def test_not_in(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select v from t where k not in (0, 1, 2, 3, 4)")
        e = df[~df.k.isin([0, 1, 2, 3, 4])].v.to_numpy()[:, None]
        np.testing.assert_array_equal(out, e)

    def test_between(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select v from t where v between -10 and 10")
        e = df[(df.v >= -10) & (df.v <= 10)].v.to_numpy()[:, None]
        np.testing.assert_array_equal(out, e)

    def test_not_between(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql("select v from t where v not between -50 and 50")
        e = df[(df.v < -50) | (df.v > 50)].v.to_numpy()[:, None]
        np.testing.assert_array_equal(out, e)

    def test_between_in_compound(self, ctx_rand):
        c, df = ctx_rand
        out = c.sql(
            "select v from t where v between 0 and 50 and k in (1, 2)"
        )
        e = df[(df.v >= 0) & (df.v <= 50) & df.k.isin([1, 2])]
        np.testing.assert_array_equal(out, e.v.to_numpy()[:, None])


class TestMultiJoinChain:
    def _tables(self, rng):
        facts = pd.DataFrame({
            "k1": rng.integers(0, 6, 300).astype(np.int32),
            "k2": rng.integers(0, 4, 300).astype(np.int32),
            "v": rng.integers(-50, 50, 300).astype(np.int32),
        })
        d1 = pd.DataFrame({"a": np.arange(6, dtype=np.int32),
                           "w1": rng.integers(1, 9, 6).astype(np.int32)})
        d2 = pd.DataFrame({"b": np.arange(4, dtype=np.int32),
                           "w2": rng.integers(1, 9, 4).astype(np.int32)})
        return facts, d1, d2

    def test_two_joins_vs_pandas(self, rng):
        facts, d1, d2 = self._tables(rng)
        c = Context()
        c.create_table("f", facts)
        c.create_table("d1", d1)
        c.create_table("d2", d2)
        out = c.sql(
            "select k1, sum(v), max(w1), min(w2) from f "
            "join d1 on f.k1 = d1.a join d2 on f.k2 = d2.b "
            "where v != 0 group by k1"
        )
        m = facts.merge(d1, left_on="k1", right_on="a").merge(
            d2, left_on="k2", right_on="b")
        m = m[m.v != 0]
        g = m.groupby("k1").agg(s=("v", "sum"), w1=("w1", "max"),
                                w2=("w2", "min")).sort_index().reset_index()
        np.testing.assert_array_equal(out, g.to_numpy())

    def test_two_joins_distributed_matches(self, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        facts, d1, d2 = self._tables(rng)
        mesh = make_engine_mesh(8)
        dc = Context(mesh=mesh)
        sc = Context()
        for c in (dc, sc):
            c.create_table("f", facts)
            c.create_table("d1", d1)
            c.create_table("d2", d2)
        q = ("select k1, k2, v, w1, w2 from f "
             "join d1 on f.k1 = d1.a join d2 on f.k2 = d2.b "
             "order by k1, k2, v, w1, w2")
        np.testing.assert_array_equal(dc.sql(q), sc.sql(q))


class TestCLI:
    def test_cli_query(self, capsys):
        from harkdb_tpu.__main__ import main

        rc = main([
            "--table", f"game_1={DATA_CSV}",
            "select col1, max(col3) from game_1 group by col1",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "col1" in out and "max(col3)" in out

    def test_cli_explain(self, capsys):
        from harkdb_tpu.__main__ import main

        rc = main([
            "--table", f"game_1={DATA_CSV}", "--explain",
            "select col1 from game_1 where col2 > 1",
        ])
        assert rc == 0
        assert "Scan game_1" in capsys.readouterr().out
